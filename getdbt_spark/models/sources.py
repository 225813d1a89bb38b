"""Source-layer models — thin views over declared raw tables.

Mirrors ``models/source/{ingest_latest,static}/*.sql`` plus the two
intermediary passthroughs: every one is ``select *`` except
``quintly_youtube_allchannels_weekly``, which keeps only the newest
``partitionDate`` snapshot and drops the partition column
(``quintly_youtube_allchannels_weekly.sql:7-13`` — the
``scan_latest_partition`` operator).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import model

_PASSTHROUGH = (
    # (model name, fixture/source table) — reference file of each is the
    # same-named one-line `select *` model (SURVEY.md §2.1 scan_direct_table).
    "media_events",
    "advantedge_tv_viewer_density_per_show_daily_v1",
    "audiovisual_metadata_poms_metadata_v1",
    "quintly_facebook_pages_weekly",
    "quintly_instagram_pages_weekly",
    "live_stream_name_mapping_v1",
    "360_graden_rapportage_vertaaltabel_upload_20_21",
    "dim_poms_episodes",
    "atinternet_smarttag_pages_weekly_v2",
    "atinternet_smarttag_pages_programmes_weekly_v2",
)


def _register_passthrough(name: str) -> None:
    @model(name, sources=[("npo", name)])
    def _m(ctx, _name=name):
        return ctx.source("npo", _name)

    _m.__name__ = name
    _m.__doc__ = f"`select *` passthrough view (reference {name}.sql:1)."


for _name in _PASSTHROUGH:
    _register_passthrough(_name)


@model(
    "quintly_youtube_allchannels_weekly",
    sources=[("npo", "quintly_youtube_allchannels_weekly_raw")],
)
def quintly_youtube_allchannels_weekly(ctx):
    """Latest-partition dedup + ``* EXCEPT(partitionDate)``
    (``quintly_youtube_allchannels_weekly.sql:7-13``).

    Spark shape: max-over-empty-window would hit a single partition;
    instead compute the scalar max once and inject it as a literal
    filter so Parquet partition pruning fires on a partitioned layout
    (the two-phase pattern used by filter_partition_window)."""
    raw = ctx.source("npo", "quintly_youtube_allchannels_weekly_raw")
    latest = raw.agg(F.max("partitionDate")).collect()[0][0]
    return raw.filter(F.col("partitionDate") == F.lit(latest)).drop(
        "partitionDate"
    )
