"""NPO-shaped fixture tables derived from the TPC-H-ish test corpus.

The reference DAG consumes AT Internet player events, AdvantEdge TV
ratings, POMS metadata, Quintly social stats, and small mapping tables
(FIXTURES.md).  The driver provides only the TPC-H-ish corpus, so every
NPO-shaped input is **derived deterministically** from those tables with
pure column arithmetic — no randomness, no current-date.

Single-source-of-truth trick: each fixture is ONE SQL text written in
the dialect intersection of Spark SQL and DuckDB (``||``, ``%``,
``CASE``, ``CAST``, ``date_trunc``, ``VALUES``…).  The Spark side runs
it via ``spark.sql`` after a mechanical ``TIMESTAMP → TIMESTAMP_NTZ``
token rewrite (fixtures are wall-clock CET semantics, SURVEY.md §1.2 —
NTZ avoids any instant↔wall-clock conversion under the pinned
Europe/Amsterdam session timezone); the DuckDB oracle embeds the SAME
text as a CTE.  Fixture parity is therefore driver-checkable
(``fixture_*`` query ids) and can never drift between engines.

The one exception is ``audiovisual_metadata_poms_metadata_v1`` (arrays
of structs — literal syntax differs per engine); both dialect variants
are generated from one Python spec below.

Domains are engineered to exercise every predicate edge the models
depend on (FIXTURES.md: corrupt theme2 values, ``'null'`` strings,
empty content ids, unmapped channels, NULL Naam rows, RERUN rows,
multi-snapshot partitionDate…).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .io import register_views

# ---------------------------------------------------------------------------
# Dialect-common fixture SQL (over the driver's corpus views)
# ---------------------------------------------------------------------------

_LIVE = "event_id % 3 = 0"  # livestream predicate shared by content/theme1

COMMON_SQL: dict[str, str] = {
    # -- AT Internet player events (FIXTURES.md §1) ---------------------
    "media_events": f"""
SELECT
  'p' || CAST(event_id % 2500 AS STRING)                       AS d_rm_playid,
  'v' || CAST(user_id % 97 AS STRING)                          AS d_visit_id,
  'u' || CAST(user_id AS STRING)                               AS d_uv_id,
  ts                                                           AS d_date_hour_event,
  CASE event_id % 5 WHEN 0 THEN 'Play' WHEN 1 THEN 'Pause'
       WHEN 2 THEN 'Stop' WHEN 3 THEN 'Resume' ELSE 'Move' END AS d_rm_action,
  CASE WHEN event_id % 10 = 0 THEN 'Animations'
       WHEN event_id % 2 = 0 THEN 'Video' ELSE 'Audio' END     AS d_rm_type,
  'brand' || CAST(user_id % 5 AS STRING)                       AS d_rm_l2,
  (event_id * 7) % 61                                          AS d_rm_playback_time,
  CASE WHEN {_LIVE} THEN
    'livestream_||_' ||
    CASE WHEN event_id % 13 = 0 THEN ''
         ELSE 'ls' || CAST(event_id % 6 AS STRING) END
  ELSE
    'name' || CAST(event_id % 80 AS STRING) || '_||_' ||
    CASE WHEN event_id % 13 = 0 THEN ''
         ELSE 'mid' || CAST(event_id % 60 AS STRING) END
  END                                                          AS d_rm_content,
  CASE WHEN {_LIVE} THEN 'livetvzender'
       WHEN event_id % 9 = 1 THEN NULL
       ELSE 'aod_||_ondemand' END                              AS d_rm_theme1,
  CASE WHEN event_id % 11 = 0 THEN '00:00:01'
       WHEN event_id % 11 = 1 THEN 'null_||_null_||_null'
       ELSE 'prog' || CAST(event_id % 12 AS STRING) || '_||_' ||
            CASE WHEN event_id % 11 = 2 THEN 'null'
                 ELSE 'omr' || CAST(event_id % 7 AS STRING) END ||
            '_||_' ||
            CASE WHEN event_id % 2 = 0 THEN 'podcast' ELSE 'nee' END
  END                                                          AS d_rm_theme2,
  'plat' || CAST(event_id % 3 AS STRING) ||
  '_||_v' || CAST(event_id % 4 AS STRING)                      AS d_rm_theme3
FROM events
""",
    # -- AdvantEdge TV ratings (FIXTURES.md §2).  Derived from a 1/17
    # sample of events so broadcast windows OVERLAP event minutes (the
    # as-of match must actually fire).  (channel, beginTimeCET) is made
    # unique by the GROUP BY so the nearest-show dedup has no ties.
    "advantedge_tv_viewer_density_per_show_daily_v1": """
SELECT
  CAST(b AS DATE)                                       AS date,
  b                                                     AS beginTimeCET,
  b + (5 + min(event_id) % 11) * INTERVAL 1 MINUTE      AS endTimeCET,
  'show' || CAST(min(event_id) % 30 AS STRING)          AS title,
  channel,
  'mid' || CAST(min(event_id) % 60 AS STRING)           AS mediaId,
  CASE WHEN min(event_id) % 3 = 0 THEN 'FIRST' ELSE 'RERUN' END AS RepeatType,
  CASE WHEN min(event_id) % 2 = 0 THEN '6+' ELSE '13+' END      AS audience,
  CASE WHEN min(event_id) % 4 < 3 THEN 'Nat[SKO]' ELSE 'Other' END AS universe,
  min(value)                                            AS kdh
FROM (
  SELECT
    CAST(date_trunc('minute', ts) AS TIMESTAMP)
      - (event_id % 7) * INTERVAL 1 MINUTE AS b,
    CASE event_id % 5 WHEN 0 THEN 'NPO1' WHEN 1 THEN 'NPO2'
         WHEN 2 THEN 'NPO3' WHEN 3 THEN 'RTL4' ELSE 'NPOZAPP' END AS channel,
    event_id, value
  FROM events WHERE event_id % 17 = 0
) base
GROUP BY channel, b
""",
    # -- channel mapping small dim (FIXTURES.md §5) ---------------------
    "live_stream_name_mapping_v1": """
SELECT * FROM (VALUES
  ('ls0', 'NPO1'), ('ls1', 'NPO2'), ('ls2', 'NPO3'),
  ('ls3', 'RTL4'), ('ls4', 'NPOZAPP')
) AS t(channel_id, channel)
""",
    # -- episode dimension (FIXTURES.md §4) -----------------------------
    "dim_poms_episodes": """
SELECT
  'mid' || CAST(p_partkey AS STRING)            AS episode_id,
  'ser' || CAST(p_partkey % 12 AS STRING)       AS series_ref,
  'sea' || CAST(p_partkey % 20 AS STRING)       AS season_ref,
  'Series ' || CAST(p_partkey % 12 AS STRING)   AS series_title,
  CASE WHEN p_partkey % 3 = 0 THEN 'CLIP' ELSE 'BROADCAST' END AS episode_type,
  CAST(p_partkey % 13 AS BIGINT)                AS index,
  CAST(p_partkey % 5 AS BIGINT)                 AS season_index,
  CASE WHEN p_partkey % 6 = 0 THEN NULL
       ELSE TIMESTAMP '2023-12-01 08:00:00'
            + ((p_partkey * 13) % 90) * INTERVAL 1 DAY END
                                                AS start_linear_first_broadcast
FROM part WHERE p_partkey < 60
""",
    # -- title translation table (FIXTURES.md §6) -----------------------
    "360_graden_rapportage_vertaaltabel_upload_20_21": """
SELECT
  CASE WHEN n_nationkey % 6 = 5 THEN NULL
       ELSE 'Title ' || CAST(n_nationkey AS STRING) END AS Naam,
  'NPO' || CAST(1 + n_nationkey % 3 AS STRING)          AS Net,
  'omr' || CAST(n_nationkey % 7 AS STRING)              AS Omroep,
  'ccc' || CAST(n_nationkey % 4 AS STRING)              AS CCC,
  'ser' || CAST(n_nationkey % 12 AS STRING)             AS Serie_mid,
  CASE WHEN n_nationkey % 4 = 3 THEN NULL
       ELSE 'Stream Title ' || CAST(n_nationkey % 12 AS STRING) END
                                                        AS Stream_Titel,
  'site' || CAST(n_nationkey % 15 AS STRING)            AS ATI_Titel,
  CAST(1000 + n_nationkey AS BIGINT)                    AS QL_FB_ID,
  CAST(2000 + n_nationkey AS BIGINT)                    AS QL_IG_ID,
  CAST(3000 + n_nationkey AS BIGINT)                    AS QL_YT_ID,
  CAST(n_nationkey AS DOUBLE) * 1000 + 500              AS Target_FB_pagelikes,
  CAST(n_nationkey AS DOUBLE) * 100 + 50                AS Target_FB_reachperpost,
  CAST(n_nationkey AS DOUBLE) * 800 + 400               AS Target_IG_followers,
  CAST(n_nationkey AS DOUBLE) * 90 + 45                 AS Target_IG_reachperpost,
  CAST(n_nationkey AS DOUBLE) * 600 + 300               AS Target_YT_subscribers,
  CAST(n_nationkey AS DOUBLE) * 5000 + 2500             AS Target_YT_views,
  CAST(n_nationkey AS DOUBLE) * 70 + 35                 AS Target_AT_app,
  CAST(n_nationkey AS DOUBLE) * 130 + 65                AS Target_AT_site
FROM nation
""",
    # -- Quintly weekly stats (FIXTURES.md §7).  One row per (profile,
    # ISO week); intervalBegin = Monday of the order's ISO week.
    "quintly_facebook_pages_weekly": """
SELECT
  CAST(1000 + o_custkey % 20 AS BIGINT)                 AS profileId,
  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)    AS intervalBegin,
  CAST(sum(o_orderkey % 1000) AS BIGINT)                AS fans,
  CAST(sum(o_orderkey % 21) - 10 * count(*) AS BIGINT)  AS fansChange,
  count(*) % 50                                         AS ownPosts,
  CAST(sum(o_orderkey % 5000) AS BIGINT)                AS pageImpressionsUnique,
  CAST(sum(o_orderkey % 83) AS DOUBLE) / 7              AS ownPostsEngagement
FROM orders WHERE o_custkey % 3 = 0
GROUP BY 1, 2
""",
    "quintly_instagram_pages_weekly": """
SELECT
  CAST(2000 + o_custkey % 20 AS BIGINT)                 AS profileId,
  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)    AS intervalBegin,
  CAST(sum(o_orderkey % 900) AS BIGINT)                 AS followers,
  CAST(sum(o_orderkey % 19) - 9 * count(*) AS BIGINT)   AS followersChange,
  count(*) % 40                                         AS posts,
  count(*) % 7 - 3                                      AS postschange,
  CAST(sum(o_orderkey % 4000) AS BIGINT)                AS reach,
  CAST(sum(o_orderkey % 77) AS BIGINT)                  AS totalengagement
FROM orders WHERE o_custkey % 3 = 1
GROUP BY 1, 2
""",
    # partitionDate gives the latest-partition dedup two snapshots
    # (scan_latest_partition, ``quintly_youtube_allchannels_weekly.sql:7-13``).
    "quintly_youtube_allchannels_weekly_raw": """
SELECT
  CAST(3000 + o_custkey % 20 AS BIGINT)                 AS profileId,
  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)    AS intervalBegin,
  CAST(sum(o_orderkey % 700) AS BIGINT)                 AS totalSubscribers,
  CAST(sum(o_orderkey % 17) - 8 * count(*) AS BIGINT)   AS totalSubscribersChange,
  count(*) % 60                                         AS totalVideos,
  CAST(sum(o_orderkey % 9000) AS BIGINT)                AS views,
  CAST(sum(o_orderkey % 601) AS BIGINT)                 AS estimatedminuteswatched,
  CAST(sum(o_orderkey % 59) AS BIGINT)                  AS totalengagement,
  CAST(min(o_orderkey) % 101 AS DOUBLE)                 AS averageViewPercentage,
  CAST(min(o_orderkey) % 600 AS DOUBLE)                 AS averageViewDuration,
  CASE WHEN o_orderkey % 2 = 0 THEN DATE '2024-02-01'
       ELSE DATE '2024-02-08' END                       AS partitionDate
FROM orders WHERE o_custkey % 3 = 2
GROUP BY 1, 2, o_orderkey % 2
""",
    # -- AT Internet site/app weekly pages (FIXTURES.md §8) -------------
    # weeknum/year are ISO week/year of weekdate; ISO year via the
    # Thursday rule (Monday + 3 days) keeps the text dialect-common.
    "atinternet_smarttag_pages_weekly_v2": """
SELECT
  'site' || CAST(o_custkey % 15 AS STRING)              AS level_2,
  CASE WHEN o_orderkey % 2 = 0 THEN 'app' ELSE 'site' END AS platform,
  CAST(date_trunc('week', o_orderdate) AS DATE)         AS weekdate,
  weekofyear(o_orderdate)                               AS weeknum,
  extract(year FROM CAST(date_trunc('week', o_orderdate) AS DATE)
               + INTERVAL 3 DAY)                        AS year,
  CAST(sum(o_orderkey % 300) AS BIGINT)                 AS weekly_visitors,
  CAST(sum(o_orderkey % 47) AS BIGINT)                  AS daily_visitors,
  CAST(sum(o_orderkey % 90) AS BIGINT)                  AS visits
FROM orders WHERE o_custkey % 4 < 2
GROUP BY 1, 2, 3, 4, 5
""",
    "atinternet_smarttag_pages_programmes_weekly_v2": """
SELECT
  'site' || CAST(o_custkey % 15 AS STRING)              AS level_2,
  'prog' || CAST(o_orderkey % 12 AS STRING)             AS programme,
  CASE WHEN o_orderkey % 2 = 0 THEN 'app' ELSE 'site' END AS platform,
  CAST(date_trunc('week', o_orderdate) AS DATE)         AS weekdate,
  weekofyear(o_orderdate)                               AS weeknum,
  extract(year FROM CAST(date_trunc('week', o_orderdate) AS DATE)
               + INTERVAL 3 DAY)                        AS year,
  CAST(sum(o_orderkey % 250) AS BIGINT)                 AS weekly_visitors,
  CAST(sum(o_orderkey % 41) AS BIGINT)                  AS daily_visitors,
  CAST(sum(o_orderkey % 80) AS BIGINT)                  AS visits
FROM orders WHERE o_custkey % 4 = 2
GROUP BY 1, 2, 3, 4, 5, 6
""",
}

# ---------------------------------------------------------------------------
# POMS nested metadata — per-dialect struct literals from ONE spec
# ---------------------------------------------------------------------------
# Spark: array(named_struct('k', v, ...)); DuckDB: [{'k': v, ...}].
# Field ORDER matters for Spark struct equality; keep spec order fixed.

_GENRE_IDS = ["3.0.1.1", "3.0.1.2", "3.0.1.7", "3.0.1.8"]
_TERMS = ["Jeugd", "Film", "Serie", "Sport", "Muziek", "Docu"]
_BCAST = ["NOS", "PP", "RVD", "AVRO", "KRO", "BNN", "EXT"]


def _arr(dialect: str, elems: list[str]) -> str:
    inner = ", ".join(elems)
    if dialect == "spark":
        return f"array({inner})" if elems else "array()"
    return f"[{inner}]"


def _struct(dialect: str, fields: list[tuple[str, str]]) -> str:
    if dialect == "spark":
        inner = ", ".join(f"'{k}', {v}" for k, v in fields)
        return f"named_struct({inner})"
    inner = ", ".join(f"'{k}': {v}" for k, v in fields)
    return f"{{{inner}}}"


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _mid(expr: str) -> str:
    return f"'mid' || CAST({expr} AS STRING)"


def poms_sql(dialect: str) -> str:
    """audiovisual_metadata_poms_metadata_v1 (FIXTURES.md §3) in the
    requested dialect.  i = p_partkey < 60; ids overlap media_events
    content ids, advantedge mediaIds and dim_poms_episodes."""
    d = dialect

    def genre(j: int) -> str:
        terms = [_q(_TERMS[j % 6])] + ([_q(_TERMS[(j + 1) % 6])] if j % 2 == 0 else [])
        return _struct(d, [("id", _q(_GENRE_IDS[j % 4])), ("terms", _arr(d, terms))])

    genres = (
        "CASE WHEN i % 7 = 0 THEN " + _arr(d, []) + " ELSE CASE"
        + "".join(
            f" WHEN i % 9 = {j} THEN "
            + _arr(d, [genre(j)] + ([genre(j + 1)] if j % 3 == 0 else []))
            for j in range(9)
        )
        + " END END"
    )
    titles = (
        "CASE WHEN i % 11 = 10 THEN " + _arr(d, []) + " WHEN i % 2 = 0 THEN "
        + _arr(
            d,
            [
                _struct(d, [("value", "'Main ' || CAST(i AS STRING)")]),
                _struct(d, [("value", "'Sub ' || CAST(i AS STRING)")]),
            ],
        )
        + " ELSE "
        + _arr(d, [_struct(d, [("value", "'Main ' || CAST(i AS STRING)")])])
        + " END"
    )

    def ref_struct(typ: str, mid_expr: str, index: str) -> str:
        return _struct(
            d, [("type", _q(typ)), ("mid_ref", _mid(mid_expr)), ("index", index)]
        )

    episode_of = (
        "CASE WHEN i % 4 = 0 THEN " + _arr(d, []) + " WHEN i % 2 = 0 THEN "
        + _arr(
            d,
            [
                ref_struct("SEASON", "(i + 3) % 60", "CAST(i % 3 + 1 AS BIGINT)"),
                ref_struct("SEASON", "(i + 9) % 60", "CAST(i % 5 + 2 AS BIGINT)"),
                ref_struct("SERIES", "(i + 5) % 60", "CAST(1 AS BIGINT)"),
            ],
        )
        + " ELSE "
        + _arr(d, [ref_struct("SEASON", "(i + 3) % 60", "CAST(i % 3 + 1 AS BIGINT)")])
        + " END"
    )

    def dstruct(typ: str, mid_expr: str) -> str:
        return _struct(d, [("type", _q(typ)), ("mid_ref", _mid(mid_expr))])

    descendant_of = (
        "CASE WHEN i % 5 = 4 THEN " + _arr(d, []) + " WHEN i % 2 = 0 THEN "
        + _arr(
            d,
            [
                dstruct("SEASON", "(i + 3) % 60"),
                dstruct("SEASON", "(i + 7) % 60"),
                dstruct("SERIES", "(i + 5) % 60"),
                dstruct("SEGMENT", "(i + 1) % 60"),
            ],
        )
        + " ELSE "
        + _arr(
            d,
            [
                dstruct("SERIES", "(i + 5) % 60"),
                dstruct("EPISODE", "(i + 2) % 60"),
            ],
        )
        + " END"
    )
    member_of = (
        "CASE WHEN i % 3 = 0 THEN " + _arr(d, [])
        + " ELSE " + _arr(d, [dstruct("GROUP", "(i + 11) % 60")]) + " END"
    )

    def sched(ch: str, net: str) -> str:
        return _struct(d, [("channel", _q(ch)), ("net", _q(net))])

    schedule_events = (
        "CASE WHEN i % 9 = 0 THEN " + _arr(d, []) + " WHEN i % 4 = 3 THEN "
        + _arr(d, [sched("RAD1", "RADIO")])
        + " WHEN i % 2 = 0 THEN "
        + _arr(
            d,
            [
                sched("NED3", "ZAPP"),
                sched("NED1", "NED1"),
                sched("NED2", "ZAPPE"),
            ],
        )
        + " ELSE " + _arr(d, [sched("NED2", "NED2")]) + " END"
    )

    def bc(j: int) -> str:
        b = _BCAST[j % 7]
        return _struct(
            d, [("id", _q(b)), ("value", _q("Omroep " + b.capitalize()))]
        )

    broadcasters = (
        "CASE WHEN i % 8 = 0 THEN " + _arr(d, []) + " ELSE CASE"
        + "".join(
            f" WHEN i % 7 = {j} THEN "
            + _arr(d, [bc(j)] + ([bc(j + 2), bc(j + 4)] if j % 2 == 0 else [bc(j + 3)]))
            for j in range(7)
        )
        + " END END"
    )

    ts_type = "TIMESTAMP_NTZ" if d == "spark" else "TIMESTAMP"
    return f"""
SELECT
  'mid' || CAST(i AS STRING) AS id,
  CASE i % 5 WHEN 0 THEN 'BROADCAST' WHEN 1 THEN 'SEASON' WHEN 2 THEN 'SERIES'
       WHEN 3 THEN 'SEGMENT' ELSE 'CLIP' END AS type,
  CAST((i + 1) * 60000 + i * 37 AS BIGINT) AS duration,
  {ts_type} '2024-01-01 00:00:00' + i * INTERVAL 1 DAY AS sort_date,
  CASE i % 5 WHEN 0 THEN 'ALL' WHEN 1 THEN '6' WHEN 2 THEN '9'
       WHEN 3 THEN '12' ELSE '16' END AS age_rating,
  {genres} AS genres,
  {titles} AS titles,
  {episode_of} AS episode_of,
  {descendant_of} AS descendant_of,
  {member_of} AS member_of,
  {schedule_events} AS schedule_events,
  {broadcasters} AS broadcasters
FROM (SELECT p_partkey AS i FROM part WHERE p_partkey < 60) ids
"""


POMS = "audiovisual_metadata_poms_metadata_v1"
YT_RAW = "quintly_youtube_allchannels_weekly_raw"

FIXTURES: tuple[str, ...] = tuple(COMMON_SQL) + (POMS,)


def fixture_sql(name: str, dialect: str) -> str:
    """Fixture SQL text for ``dialect`` in {'spark', 'duckdb'}."""
    if name == POMS:
        return poms_sql(dialect)
    sql = COMMON_SQL[name]
    if dialect == "spark":
        # Wall-clock semantics: every timestamp literal/cast is NTZ on
        # the Spark side (DuckDB TIMESTAMP is already naive).
        sql = re.sub(r"\bTIMESTAMP\b", "TIMESTAMP_NTZ", sql)
        # Spark's date_trunc on NTZ round-trips through the SESSION
        # time zone and bumps the DST skipped hour +1 h (DuckDB's is
        # wall-pure) — rebuild the minute trunc from fields instead.
        # Only sub-day truncs are affected; the week truncs operate on
        # dates (midnights, which Europe/Amsterdam never skips).
        sql = re.sub(
            r"date_trunc\('minute',\s*(\w+)\)",
            r"make_timestamp_ntz(year(\1), month(\1), day(\1), "
            r"hour(\1), minute(\1), 0)",
            sql,
        )
    return sql


# Per-SESSION (sf_dir, name) → analyzed fixture plan.  Each
# ``spark.sql`` call pays parse+analysis eagerly; sources_map builds
# all 11 fixtures and is invoked once per model query, so without
# memoization the driver's sweep re-analyzes the same SQL hundreds of
# times (~seconds per invocation at sf0.1).  This caches the immutable
# PLAN object only — no data is persisted (see fixture_df docstring).
# Weak-keyed on the SparkSession (like io._TABLE_CACHE): a plan built
# by ``spark.sql`` resolves against that session's temp views, so a
# ``newSession()`` must rebuild its own plans.
import weakref

_FIXTURE_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def fixture_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Build one fixture as a DataFrame (registers corpus views).

    Deliberately NOT cached/persisted as DATA: persisting the small
    source fixtures was measured to more than double the dashboard
    DAG's wall time at sf0.1 (InMemoryRelation blocks the optimizer's
    pushdown/broadcast reasoning and serializes cache materialization
    inside the first action) — recomputing the tiny aggregates is
    cheaper than caching them.  Only the analyzed plan is memoized.
    """
    # Always (re-)register: the docstring's side effect must hold on
    # cache hits too (a caller may have re-pointed the views at another
    # sf_dir in between), and registration itself is memoized.
    register_views(spark, sf_dir)
    per_session = _FIXTURE_PLAN_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is None:
        df = spark.sql(fixture_sql(name, "spark"))
        per_session[key] = df
    return df


def fixture_ctes(names: list[str]) -> str:
    """``"name" AS (sql), ...`` fragment for DuckDB oracle assembly
    (quoted — one fixture name starts with a digit)."""
    return ", ".join(f'"{n}" AS ({fixture_sql(n, "duckdb")})' for n in names)


def sources_map(
    spark: SparkSession, sf_dir: str
) -> dict[tuple[str, str], DataFrame]:
    """All fixtures keyed the way the model layer declares its sources."""
    out: dict[tuple[str, str], DataFrame] = {}
    for name in FIXTURES:
        out[("npo", name)] = fixture_df(spark, sf_dir, name)
    return out
