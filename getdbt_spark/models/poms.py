"""``poms_flattened`` — nested POMS metadata → wide dimension table.

Reference: ``models/datamarts/npo-data-hub/utils/poms_flattened.sql``
(93 lines): six ``LEFT JOIN UNNEST`` lateral explodes cross-producted
per media row, ``MAX(CASE…)`` pivots over the product, a broadcaster
exclusion filter, and ``ROW_NUMBER() OVER (PARTITION BY mid ORDER BY
broadcaster_offset)`` keeping the first surviving broadcaster
(``poms_flattened.sql:23-30,66,93-94``).

Spark-first plan: the 6-way explode cross product (|episode_of| ×
|descendant_of| × |member_of| × |genres| × |schedule_events| ×
|broadcasters| rows per media item) exists in the reference only to
emulate per-array EXISTS/MAX aggregations in SQL.  Each aggregate
depends on exactly ONE array, so they collapse to higher-order array
functions evaluated per row — no explode, no shuffle, no row
explosion; at 100 TB this stage stays a narrow map.  The
broadcaster ranking collapses the same way: "first element of the
order-preserving filtered array" == rank-1 row of the reference's
offset-ordered window.  Output is bit-identical to the reference
shape (one row per surviving mid).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import safe_offset
from ..registry import model

EXCLUDED_BROADCASTERS = ("PP", "RVD", "RNW", "SOCU", "BVN", "MTNL", "EXT")


def _max_ref(arr: str, typ: str) -> Column:
    """MAX(CASE WHEN x.type = typ THEN x.mid_ref END) over one array
    (`poms_flattened.sql:15-20`) — array_max of the filtered refs
    (NULL when none match, matching MAX over an empty set)."""
    return F.array_max(
        F.transform(
            F.filter(F.col(arr), lambda x: x["type"] == typ),
            lambda x: x["mid_ref"],
        )
    )


def _exists(arr: str, pred) -> Column:
    """MAX(CASE WHEN pred THEN TRUE ELSE FALSE END) over one unnested
    array (`poms_flattened.sql:11-14`) == EXISTS; empty arrays (whose
    left-join-unnest row is NULL) yield FALSE on both paths."""
    return F.exists(F.col(arr), pred)


@model("poms_flattened", refs=["audiovisual_metadata_poms_metadata_v1"])
def poms_flattened(ctx):
    md = ctx.ref("audiovisual_metadata_poms_metadata_v1")

    flags = md.select(
        F.col("id").alias("mid"),
        "type",
        "sort_date",
        "duration",
        "age_rating",
        _exists("genres", lambda g: g["id"].startswith("3.0.1.1")).alias(
            "is_youth_genre"
        ),
        _exists("schedule_events", lambda s: s["net"] == "ZAPP").alias(
            "is_zapp_net"
        ),
        _exists("schedule_events", lambda s: s["net"] == "ZAPPE").alias(
            "is_zappelin_net"
        ),
        _max_ref("episode_of", "SERIES").alias("episode_of_series"),
        _max_ref("episode_of", "SEASON").alias("episode_of_season"),
        _max_ref("descendant_of", "SERIES").alias("descendant_of_series"),
        _max_ref("descendant_of", "SEASON").alias("descendant_of_season"),
        _max_ref("member_of", "SERIES").alias("member_of_series"),
        _max_ref("member_of", "SEASON").alias("member_of_season"),
        F.size("broadcasters").alias("n_broadcasters"),
        # Exclusion filter applied per element, order preserved — the
        # first element is the reference's broadcaster_row_number = 1
        # (ranked by the ORIGINAL array offset, filtered afterwards).
        F.filter(
            F.col("broadcasters"),
            lambda b: b["id"].isNull()
            | ~b["id"].isin(*EXCLUDED_BROADCASTERS),
        ).alias("bfilt"),
    )

    # Empty broadcasters → the left-join-unnest NULL row survives the
    # filter (`id IS NULL` branch); non-empty but all-excluded → every
    # row is filtered and the mid disappears.  (`poms_flattened.sql:30`)
    survived = flags.filter(
        (F.col("n_broadcasters") == 0) | (F.size("bfilt") > 0)
    )

    first_b = safe_offset("bfilt", 0)
    series_ref = (
        F.when(
            F.col("type") == "BROADCAST",
            F.coalesce(
                "episode_of_series", "member_of_series", "descendant_of_series"
            ),
        )
        .when(F.col("type") == "SEASON", F.col("member_of_series"))
        .when(F.col("type") == "SEGMENT", F.col("descendant_of_series"))
    )
    season_ref = (
        F.when(
            F.col("type") == "BROADCAST",
            F.coalesce(
                "member_of_season", "descendant_of_season", "episode_of_season"
            ),
        )
        .when(F.col("type") == "SEGMENT", F.col("descendant_of_season"))
    )

    # Age classification CASE replicated AS WRITTEN (first-match; the
    # 9-branch is partially shadowed by the 6-branch — SURVEY §2.8
    # fn_case note) — `poms_flattened.sql:83-86`.
    age = (
        F.when(
            F.col("is_zappelin_net")
            | ((F.col("age_rating") == "ALL") & F.col("is_youth_genre")),
            F.lit(6),
        )
        .when(
            F.col("is_zappelin_net")
            | (
                F.col("age_rating").isin("ALL", "6")
                & F.col("is_youth_genre")
            ),
            F.lit(9),
        )
        .when(
            F.col("is_zapp_net")
            | F.col("is_zappelin_net")
            | (
                F.col("age_rating").isin("ALL", "6", "9")
                & F.col("is_youth_genre")
            ),
            F.lit(12),
        )
    )

    with_refs = survived.select(
        "mid",
        "type",
        series_ref.alias("series_ref"),
        season_ref.alias("season_ref"),
        "sort_date",
        "duration",
        age.alias("min_age_classification"),
        first_b.getField("id").alias("first_broadcaster"),
        "is_zapp_net",
        "is_zappelin_net",
        "is_youth_genre",
        "age_rating",
    )

    return with_refs.select(
        "mid",
        "type",
        F.when(
            F.col("series_ref").isNull() | (F.col("series_ref") == ""),
            F.col("mid"),
        )
        .otherwise(F.col("series_ref"))
        .alias("series_id"),
        F.when(
            F.col("season_ref").isNull() | (F.col("season_ref") == ""),
            F.col("mid"),
        )
        .otherwise(F.col("season_ref"))
        .alias("season_id"),
        "min_age_classification",
        "sort_date",
        "duration",
        "first_broadcaster",
        F.coalesce(F.col("first_broadcaster") == "NOS", F.lit(False)).alias(
            "is_nos_content"
        ),
    )
