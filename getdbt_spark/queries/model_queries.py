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

import datetime as dt

from pyspark.sql import functions as F

from .. import fixtures as FX
from ..functions import safe_offset
from . import query


def _run_model(spark, sf_dir: str, name: str):
    """Build one ported model over the fixture sources (pure build mode
    — no warehouse writes; the driver collects the returned DataFrame).

    run_date is anchored two-phase to max(event date) — a tiny scalar
    action whose result is injected as a LITERAL so the incremental
    window predicate reaches the parquet scan as a prunable filter
    (same pattern as filter_partition_window; never current_date())."""
    from .. import models as M
    from ..fixtures import sources_map
    from ..io import load_table
    from ..runner import Runner

    M.load_all()
    anchor = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.to_date("ts")))
        .collect()[0][0]
    )
    run_date = anchor if anchor is not None else dt.date(2024, 1, 30)
    runner = Runner(spark, sources_map(spark, sf_dir), run_date)
    return runner.run([name])[name]

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


# ---------------------------------------------------------------------------
# model_poms_flattened — utils/poms_flattened.sql ported
# ---------------------------------------------------------------------------

_EXCL_B = "('PP','RVD','RNW','SOCU','BVN','MTNL','EXT')"


@query(
    "model_poms_flattened",
    oracle=f"""
    WITH poms AS ({FX.fixture_sql(FX.POMS, "duckdb")}),
    flags AS (
      SELECT
        id AS mid, type, sort_date, duration, age_rating,
        len(list_filter(genres,
            g -> starts_with(g.id, '3.0.1.1'))) > 0      AS is_youth_genre,
        len(list_filter(schedule_events,
            s -> s.net = 'ZAPP')) > 0                    AS is_zapp_net,
        len(list_filter(schedule_events,
            s -> s.net = 'ZAPPE')) > 0                   AS is_zappelin_net,
        list_max([e.mid_ref FOR e IN episode_of IF e.type = 'SERIES'])   AS episode_of_series,
        list_max([e.mid_ref FOR e IN episode_of IF e.type = 'SEASON'])   AS episode_of_season,
        list_max([e.mid_ref FOR e IN descendant_of IF e.type = 'SERIES']) AS descendant_of_series,
        list_max([e.mid_ref FOR e IN descendant_of IF e.type = 'SEASON']) AS descendant_of_season,
        list_max([e.mid_ref FOR e IN member_of IF e.type = 'SERIES'])    AS member_of_series,
        list_max([e.mid_ref FOR e IN member_of IF e.type = 'SEASON'])    AS member_of_season,
        len(broadcasters) AS n_broadcasters,
        list_filter(broadcasters,
            b -> b.id IS NULL OR b.id NOT IN {_EXCL_B})  AS bfilt
      FROM poms
    ),
    cols AS (
      SELECT
        mid, type,
        CASE WHEN type = 'BROADCAST'
               THEN coalesce(episode_of_series, member_of_series, descendant_of_series)
             WHEN type = 'SEASON' THEN member_of_series
             WHEN type = 'SEGMENT' THEN descendant_of_series
        END AS series_ref,
        CASE WHEN type = 'BROADCAST'
               THEN coalesce(member_of_season, descendant_of_season, episode_of_season)
             WHEN type = 'SEGMENT' THEN descendant_of_season
        END AS season_ref,
        sort_date, duration,
        CASE WHEN is_zappelin_net OR (age_rating = 'ALL' AND is_youth_genre) THEN 6
             WHEN is_zappelin_net OR (age_rating IN ('ALL','6') AND is_youth_genre) THEN 9
             WHEN is_zapp_net OR is_zappelin_net
                  OR (age_rating IN ('ALL','6','9') AND is_youth_genre) THEN 12
        END AS min_age_classification,
        bfilt[1].id AS first_broadcaster
      FROM flags
      WHERE n_broadcasters = 0 OR len(bfilt) > 0
    )
    SELECT
      mid, type,
      CASE WHEN series_ref IS NULL OR series_ref = '' THEN mid ELSE series_ref END AS series_id,
      CASE WHEN season_ref IS NULL OR season_ref = '' THEN mid ELSE season_ref END AS season_id,
      min_age_classification, sort_date, duration, first_broadcaster,
      coalesce(first_broadcaster = 'NOS', false) AS is_nos_content
    FROM cols
    """,
)
def model_poms_flattened(spark, sf_dir):
    """poms_flattened ported (see models/poms.py: the reference's 6-way
    LEFT JOIN UNNEST cross product collapsed to per-row array
    aggregations — identical output, no explode at any scale)."""
    return _run_model(spark, sf_dir, "poms_flattened")


# ---------------------------------------------------------------------------
# model_streams_daily_v4 — the incremental heart of the DAG
# ---------------------------------------------------------------------------

_STREAMS_FIXTURES = [
    "media_events",
    "advantedge_tv_viewer_density_per_show_daily_v1",
    "live_stream_name_mapping_v1",
    FX.POMS,
]


@query(
    "model_streams_daily_v4",
    oracle=f"""
    WITH {FX.fixture_ctes(_STREAMS_FIXTURES)},
    anchor AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
    adv_events AS (
      SELECT DISTINCT
        CAST(beginTimeCET AS DATE)  AS adv_date,
        beginTimeCET                AS adv_beginTimeCET,
        endTimeCET                  AS adv_endTimeCET,
        unnest(generate_series(beginTimeCET, endTimeCET, INTERVAL 1 MINUTE))
                                    AS adv_minute,
        title                       AS adv_title,
        channel                     AS adv_channel,
        mediaId                     AS adv_mid
      FROM advantedge_tv_viewer_density_per_show_daily_v1
      WHERE regexp_matches(channel, 'NPO')
    ),
    raw_events AS (
      SELECT
        e.d_rm_playid,
        e.d_visit_id || e.d_uv_id AS unique_user_id,
        e.d_date_hour_event,
        e.d_rm_action, e.d_rm_l2, e.d_rm_playback_time,
        string_split(e.d_rm_content, '_||_') AS content,
        a.adv_mid AS matched_livestream_id,
        string_split(e.d_rm_theme1, '_||_') AS theme1,
        CASE WHEN regexp_matches(e.d_rm_theme2, '_/|/|_')
             THEN string_split(e.d_rm_theme2, '_||_') END AS theme2,
        string_split(e.d_rm_theme3, '_||_') AS theme3,
        CASE WHEN a.adv_mid IS NOT NULL THEN 'livetvzender - streamID_matched'
             ELSE 'livetvzender - no_streamID_to_match' END AS stream_match_type,
        row_number() OVER (
          PARTITION BY e.d_rm_playid, e.d_visit_id || e.d_uv_id,
                       e.d_date_hour_event, e.d_rm_action, e.d_rm_playback_time
          ORDER BY date_diff('second', a.adv_beginTimeCET, e.d_date_hour_event) ASC
        ) AS dedup
      FROM media_events e
      JOIN live_stream_name_mapping_v1 m
        ON m.channel_id = NULLIF(string_split(e.d_rm_content, '_||_')[2], '')
      LEFT JOIN adv_events a
        ON m.channel = a.adv_channel
       AND date_trunc('minute', e.d_date_hour_event) = a.adv_minute
      WHERE e.d_rm_type <> 'Animations'
        AND e.d_rm_theme1 = 'livetvzender'
        AND CAST(e.d_date_hour_event AS DATE)
              BETWEEN (SELECT d - 8 FROM anchor) AND (SELECT d FROM anchor)

      UNION ALL
      SELECT
        d_rm_playid,
        d_visit_id || d_uv_id AS unique_user_id,
        d_date_hour_event,
        d_rm_action, d_rm_l2, d_rm_playback_time,
        string_split(d_rm_content, '_||_') AS content,
        NULL AS matched_livestream_id,
        string_split(d_rm_theme1, '_||_') AS theme1,
        CASE WHEN regexp_matches(d_rm_theme2, '_/|/|_')
             THEN string_split(d_rm_theme2, '_||_') END AS theme2,
        string_split(d_rm_theme3, '_||_') AS theme3,
        'regular streamid' AS stream_match_type,
        1 AS dedup
      FROM media_events
      WHERE d_rm_type <> 'Animations'
        AND (d_rm_theme1 IS NULL OR d_rm_theme1 <> 'livetvzender')
        AND CAST(d_date_hour_event AS DATE)
              BETWEEN (SELECT d - 8 FROM anchor) AND (SELECT d FROM anchor)
    ),
    agg_events_per_stream AS (
      SELECT
        d_rm_playid, unique_user_id,
        CAST(d_date_hour_event AS DATE) AS evt_date,
        NULLIF(content[2], '') AS evt_base_mid,
        stream_match_type,
        coalesce(matched_livestream_id, NULLIF(content[2], '')) AS evt_mid,
        NULLIF(content[1], '') AS evt_media_name,
        NULLIF(NULLIF(theme1[1], ''), 'null') AS evt_stream_type,
        NULLIF(theme2[1], 'null') AS evt_programme,
        NULLIF(theme2[2], 'null') AS evt_broadcaster,
        theme2[3] AS evt_programme_podcast,
        theme3[1] AS evt_player_platform,
        theme3[2] AS evt_player_version,
        d_rm_l2 AS evt_brand,
        sum(d_rm_playback_time) AS evt_playback_time_total_in_sec,
        count(DISTINCT CASE WHEN d_rm_action = 'Play'
                  OR stream_match_type = 'livetvzender - streamID_matched'
                  THEN d_rm_playid END) AS evt_play_count_total
      FROM raw_events
      WHERE dedup = 1
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14
    ),
    agg_events_per_date AS (
      SELECT
        evt_date, evt_mid, evt_base_mid, evt_media_name, stream_match_type,
        evt_stream_type, evt_programme, evt_broadcaster,
        evt_programme_podcast, evt_player_platform, evt_player_version,
        evt_brand,
        count(DISTINCT unique_user_id) AS n_unique_userids,
        sum(evt_playback_time_total_in_sec) AS evt_playback_time_total_in_sec,
        sum(evt_play_count_total) AS evt_play_count_total,
        sum(CASE WHEN evt_playback_time_total_in_sec >= 30
                 THEN evt_play_count_total ELSE 0 END) AS evt_play_count_over_30s
      FROM agg_events_per_stream
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12
    ),
    metadata_descendants AS (
      SELECT id, type, mid_ref,
             row_number() OVER (PARTITION BY id, type
                                ORDER BY id, type, mid_ref) AS idx
      FROM (
        SELECT md.id, (unnest(md.descendant_of)).type AS type,
               (unnest(md.descendant_of)).mid_ref AS mid_ref
        FROM audiovisual_metadata_poms_metadata_v1 md
      ) x
      WHERE type IN ('SEASON', 'SERIES')
    ),
    episode AS (
      SELECT id, max(CASE WHEN e_type = 'SEASON' THEN e_index END) AS idx
      FROM (
        SELECT md.id, (unnest(md.episode_of)).type AS e_type,
               (unnest(md.episode_of)).index AS e_index
        FROM audiovisual_metadata_poms_metadata_v1 md
      ) x
      GROUP BY 1
    ),
    bcast AS (
      SELECT id, string_agg(v, ',' ORDER BY v) AS broadcasters
      FROM (
        SELECT md.id, (unnest(md.broadcasters)).value AS v
        FROM audiovisual_metadata_poms_metadata_v1 md
      ) x
      GROUP BY 1
    ),
    channels AS (
      SELECT id, channel, row_number() OVER (PARTITION BY id
                                             ORDER BY id, channel) AS idx
      FROM (
        SELECT DISTINCT md.id, (unnest(md.schedule_events)).channel AS channel
        FROM audiovisual_metadata_poms_metadata_v1 md
      ) x
      WHERE channel IN ('NED1', 'NED2', 'NED3')
    ),
    metadata AS (
      SELECT
        md.id,
        md.duration // 1000 AS mtd_duration_in_sec,
        md.sort_date AS mtd_sort_date,
        md.type AS mtd_type,
        md.genres[1].terms[1] AS mtd_genre_main,
        md.genres[1].terms[2] AS mtd_genre_sub,
        md.titles[1].value AS mtd_title_main,
        md.titles[2].value AS mtd_title_sub,
        season.mid_ref AS mtd_season_mid,
        series.mid_ref AS mtd_series_mid,
        episode.idx AS mtd_episode_of_index,
        channels.channel AS mtd_channel,
        bcast.broadcasters AS mtd_broadcasters
      FROM audiovisual_metadata_poms_metadata_v1 md
      LEFT JOIN metadata_descendants season
        ON season.id = md.id AND season.type = 'SEASON' AND season.idx = 1
      LEFT JOIN metadata_descendants series
        ON series.id = md.id AND series.type = 'SERIES' AND series.idx = 1
      LEFT JOIN episode ON episode.id = md.id
      LEFT JOIN bcast ON bcast.id = md.id
      LEFT JOIN channels ON channels.id = md.id AND channels.idx = 1
    )
    SELECT
      a.evt_date, a.evt_mid, a.evt_base_mid, a.evt_media_name,
      a.stream_match_type, a.evt_stream_type, a.evt_programme,
      a.evt_broadcaster, a.evt_programme_podcast, a.evt_player_platform,
      a.evt_player_version, a.evt_brand, a.n_unique_userids,
      a.evt_playback_time_total_in_sec, a.evt_play_count_total,
      a.evt_play_count_over_30s,
      m.mtd_duration_in_sec, m.mtd_sort_date, m.mtd_type,
      m.mtd_genre_main, m.mtd_genre_sub, m.mtd_title_main, m.mtd_title_sub,
      m.mtd_season_mid, m.mtd_series_mid, m.mtd_episode_of_index,
      m.mtd_channel, m.mtd_broadcasters
    FROM agg_events_per_date a
    LEFT JOIN metadata m ON m.id = a.evt_mid
    """,
)
def model_streams_daily_v4(spark, sf_dir):
    """atinternet_smarttag_streams_daily_v4 ported (models/streams.py):
    minute-spine as-of match, nearest-show window dedup, two-stage
    aggregation, nested-metadata denormalization, 9-day incremental
    window anchored at max(event date)."""
    return _run_model(spark, sf_dir, "atinternet_smarttag_streams_daily_v4")
