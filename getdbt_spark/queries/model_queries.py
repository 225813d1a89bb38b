"""Driver-contract entries for the model-DAG layer.

Two families:

- ``fixture_*`` — every NPO-shaped fixture table (fixtures.py) exposed
  as a query whose oracle is the SAME dialect-common SQL text run by
  DuckDB.  These rows prove, per driver round, that both engines build
  bit-identical model inputs — the foundation the ``model_*`` oracles
  stand on.
- ``model_*`` — the ported reference models (models/) run over those
  fixtures, with DuckDB oracles re-expressing the model semantics over
  the same fixture CTEs (registered in models/ modules).

Plus ``fn_struct_field``: array-of-struct element/field access
(reference ``atinternet_smarttag_streams_daily_v4.sql:185-188``,
``poms_flattened.sql:9-13``) over the genuinely nested POMS fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import fixtures as FX
from ..functions import safe_offset
from . import query

# ---------------------------------------------------------------------------
# Fixture parity rows
# ---------------------------------------------------------------------------

_FIXTURE_QUERIES = {
    "fixture_media_events": "media_events",
    "fixture_advantedge": "advantedge_tv_viewer_density_per_show_daily_v1",
    "fixture_channel_mapping": "live_stream_name_mapping_v1",
    "fixture_dim_poms_episodes": "dim_poms_episodes",
    "fixture_vertaaltabel": "360_graden_rapportage_vertaaltabel_upload_20_21",
    "fixture_quintly_facebook": "quintly_facebook_pages_weekly",
    "fixture_quintly_instagram": "quintly_instagram_pages_weekly",
    "fixture_quintly_youtube_raw": FX.YT_RAW,
    "fixture_ati_pages": "atinternet_smarttag_pages_weekly_v2",
    "fixture_ati_pages_programmes": "atinternet_smarttag_pages_programmes_weekly_v2",
}


def _register_fixture(qid: str, fixture: str) -> None:
    @query(qid, oracle=FX.fixture_sql(fixture, "duckdb"))
    def _fx(spark, sf_dir, _name=fixture):
        return FX.fixture_df(spark, sf_dir, _name)

    _fx.__name__ = qid
    _fx.__doc__ = (
        f"Fixture parity: {fixture} built by Spark SQL vs the same "
        "dialect-common text in DuckDB (fixtures.py)."
    )


for _qid, _fixture in _FIXTURE_QUERIES.items():
    _register_fixture(_qid, _fixture)


# ---------------------------------------------------------------------------
# fn_struct_field — nested array-of-struct access (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "fn_struct_field",
    oracle=f"""
    WITH poms AS ({FX.fixture_sql(FX.POMS, "duckdb")})
    SELECT
      id,
      genres[1].id               AS genre0_id,
      genres[1].terms[1]         AS genre_main,
      genres[1].terms[2]         AS genre_sub,
      titles[1].value            AS title_main,
      titles[2].value            AS title_sub,
      episode_of[1].type         AS ep0_type,
      episode_of[1].mid_ref      AS ep0_mid,
      episode_of[1].index        AS ep0_index,
      len(descendant_of)         AS n_desc,
      len(broadcasters)          AS n_bcast,
      schedule_events[1].channel AS sched0_channel
    FROM poms
    """,
)
def fn_struct_field(spark, sf_dir):
    """BQ ``genres[SAFE_OFFSET(0)].terms[SAFE_OFFSET(1)]`` /
    ``titles[SAFE_OFFSET(0)].value`` semantics
    (``streams_daily_v4.sql:185-188``): 0-based, NULL-safe element
    access then struct-field extraction, over genuinely nested
    ``array<struct>`` columns.  Spark getItem/getField chains stay
    JVM-side; empty arrays yield NULL (not errors) at every level."""
    poms = FX.fixture_df(spark, sf_dir, FX.POMS)
    return poms.select(
        "id",
        safe_offset("genres", 0).getField("id").alias("genre0_id"),
        safe_offset(safe_offset("genres", 0).getField("terms"), 0).alias(
            "genre_main"
        ),
        safe_offset(safe_offset("genres", 0).getField("terms"), 1).alias(
            "genre_sub"
        ),
        safe_offset("titles", 0).getField("value").alias("title_main"),
        safe_offset("titles", 1).getField("value").alias("title_sub"),
        safe_offset("episode_of", 0).getField("type").alias("ep0_type"),
        safe_offset("episode_of", 0).getField("mid_ref").alias("ep0_mid"),
        safe_offset("episode_of", 0).getField("index").alias("ep0_index"),
        F.size("descendant_of").alias("n_desc"),
        F.size("broadcasters").alias("n_bcast"),
        safe_offset("schedule_events", 0).getField("channel").alias(
            "sched0_channel"
        ),
    )
