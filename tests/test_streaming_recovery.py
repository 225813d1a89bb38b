"""Checkpoint kill/restart recovery soak (VERDICT r7 #8).

The r6-r7 hostile-variant program proved the streaming TRANSFORMS'
semantics (stream == batch twin on poisoned feeds); what it never
exercised is the RECOVERY contract: a query killed mid-feed — possibly
mid-micro-batch, with sink files written but uncommitted and a state
store version pending — must, on restart from the same checkpoint,
deliver exactly-once sink contents: no duplicate rows from the
replayed batch, no lost rows from the interrupted one, and operator
state (dedup fingerprints, both sides of the interval join) carried
across the kill.

Mechanics under test (all public Spark semantics):
- the parquet file sink's ``_spark_metadata`` commit log — a reader
  sees only committed files, so a batch replay after an uncommitted
  write cannot double rows;
- source offset tracking in the checkpoint (the killed batch replays
  from the same file set);
- HDFS-backed state store versioning (the replayed batch reloads the
  last committed state version, so applyInPandasWithState dedup
  neither re-emits a committed fingerprint nor loses an uncommitted
  one, and the stream-stream join re-buffers the interrupted batch's
  rows).

The feed is built so every fingerprint's (ts, event_id)-minimal row
arrives in the EARLIEST file that contains that fingerprint and ts
increases with file index — then ANY micro-batch split (including the
nondeterministic kill point) yields output equal to the batch twin,
which is what makes the exactly-once assertion exact rather than
probabilistic.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest

from getdbt_spark.streaming import (
    attributed_conversions,
    first_seen_batch,
    first_seen_stream,
)

SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)

N_FILES = 12
BASE = dt.datetime(2024, 1, 10, 9, 0, 0)


def _feed_file(i: int) -> list[tuple]:
    """File i of the drip feed (ts strictly increasing with i).

    - 4 fresh payloads per file (fp first seen here), among them one
      ``view`` and one ``purchase`` per file;
    - 2 duplicates of payloads introduced in EARLIER files (suppressed
      by first-seen state — across the kill point for i past it);
    - purchases in file i match views from file i-1 (same user, 10 min
      gap < the 30-min attribution horizon): every adjacent file pair
      is a join match, so matches straddle the kill point wherever it
      lands.  user 77's view sits in file 0 and its purchase in file
      N-1 — guaranteed cross-restart join state (the kill lands
      strictly between: after >=1 committed batch, before the last).
    """
    t = BASE + dt.timedelta(minutes=10 * i)
    eid = 1000 * i
    rows = [
        (eid + 0, t, 10 + i, "view", 1.0, f"imp-{i}"),
        (eid + 1, t + dt.timedelta(minutes=1), 9 + i, "purchase", 5.0,
         f"conv-{i}"),
        (eid + 2, t + dt.timedelta(minutes=2), 200 + i, "click", 2.0,
         f"fresh-a-{i}"),
        (eid + 3, t + dt.timedelta(minutes=3), 300 + i, "error", 0.5,
         f"fresh-b-{i}"),
    ]
    if i > 0:  # duplicates of payloads born in earlier files (later ts)
        rows.append(
            (eid + 4, t + dt.timedelta(minutes=4), 400 + i, "click", 2.0,
             f"fresh-a-{i - 1}")
        )
        rows.append(
            (eid + 5, t + dt.timedelta(minutes=5), 500 + i, "view", 1.0,
             f"imp-{max(0, i - 2)}")
        )
    if i == 0:
        rows.append((7700, t, 77, "view", 1.0, "cross-restart-imp"))
    if i == N_FILES - 1:
        # 25 min after file 0's view — inside the 30-min horizon, and
        # the 8-day watermark has evicted nothing over a 2-hour feed
        rows.append(
            (7701, BASE + dt.timedelta(minutes=25), 77, "purchase", 9.0,
             "cross-restart-conv")
        )
    return rows


@pytest.fixture()
def drip_feed(spark, tmp_path):
    src = str(tmp_path / "src")
    for i in range(N_FILES):
        spark.createDataFrame(_feed_file(i), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src


def _start(spark, src, transform, sink, ck, trigger):
    reader = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch —
        # the kill lands between (or inside) per-file batches
        .parquet(src)
    )
    return (
        transform(reader)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(**trigger)
        .start()
    )


def _kill_mid_feed(spark, src, transform, sink, ck) -> int:
    """Phase 1: continuous trigger, stop after the first committed
    batch — with 12 one-file batches queued the stop lands mid-feed
    (asserted by the caller via rows-processed accounting).  Returns
    the number of input rows committed before the kill."""
    q = _start(
        spark, src, transform, sink, ck,
        {"processingTime": "50 milliseconds"},
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] > 0:
                break
            time.sleep(0.05)
        else:
            pytest.fail("stream made no progress within 120 s")
    finally:
        q.stop()
    q.awaitTermination()
    return sum(
        p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
    )


def _drain(spark, src, transform, sink, ck):
    """Phase 2: restart from the same checkpoint, drain to the end."""
    q = _start(spark, src, transform, sink, ck, {"availableNow": True})
    q.awaitTermination()


def test_first_seen_exactly_once_across_kill_restart(
    spark, drip_feed, tmp_path
):
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    processed = _kill_mid_feed(spark, drip_feed, first_seen_stream, sink, ck)
    total = spark.read.parquet(drip_feed).count()
    assert 0 < processed < total, (
        f"kill must land mid-feed (committed {processed} of {total} rows) "
        "— the feed is too small or the stop raced the drain"
    )
    _drain(spark, drip_feed, first_seen_stream, sink, ck)

    got = spark.read.parquet(sink)  # _spark_metadata: committed files only
    want = first_seen_batch(spark.read.parquet(drip_feed))
    key = lambda rows: sorted(  # noqa: E731
        (r["fp"], r["event_id"]) for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert len(got_rows) > 0
    # exactly-once: the replayed batch re-emitted nothing already
    # committed (no dups) and the interrupted batch lost nothing
    assert key(got_rows) == key(want_rows)


def test_attribution_join_exactly_once_across_kill_restart(
    spark, drip_feed, tmp_path
):
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    processed = _kill_mid_feed(
        spark, drip_feed, attributed_conversions, sink, ck
    )
    total = spark.read.parquet(drip_feed).count()
    assert 0 < processed < total
    _drain(spark, drip_feed, attributed_conversions, sink, ck)

    got = spark.read.parquet(sink)
    want = attributed_conversions(spark.read.parquet(drip_feed))
    key = lambda rows: sorted(  # noqa: E731
        (r["imp_id"], r["conv_id"]) for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert key(got_rows) == key(want_rows)
    # join state crossed the kill: user 77's view entered the left
    # buffer pre-kill (file 0 — inside the first committed batch) and
    # its purchase arrived post-restart (last file)
    assert (7700, 7701) in key(got_rows)


# ---------------------------------------------------------------------------
# Windowed-aggregation recovery: sliding + session variants (VERDICT r9 #8)
# ---------------------------------------------------------------------------
#
# Unlike the row-emitting transforms above, the windowed aggregations
# emit in APPEND mode only when the watermark finalizes a window, so
# the feed gains one far-later "flush" sentinel (BASE + 20 days, past
# the 8-day watermark for every real window): after the restart drains
# it, every January-10 window MUST be in the sink exactly once — the
# partial aggregates of windows straddling the kill recover from the
# state store, committed windows do not re-emit on the replayed batch.
# The sentinel's own (unfinalized) windows are excluded from the batch
# twin by its unique event_type / user_id.

FLUSH_TS = BASE + dt.timedelta(days=20)
FLUSH_USER = 999


@pytest.fixture()
def drip_feed_flush(spark, tmp_path):
    src = str(tmp_path / "srcf")
    for i in range(N_FILES):
        spark.createDataFrame(_feed_file(i), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    spark.createDataFrame(
        [(99990, FLUSH_TS, FLUSH_USER, "flush", 0.0, "wm-flush")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    return src


def test_sliding_stats_exactly_once_across_kill_restart(
    spark, drip_feed_flush, tmp_path
):
    from pyspark.sql import functions as F

    from getdbt_spark.streaming import sliding_window_stats

    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    processed = _kill_mid_feed(
        spark, drip_feed_flush, sliding_window_stats, sink, ck
    )
    total = spark.read.parquet(drip_feed_flush).count()
    assert 0 < processed < total
    _drain(spark, drip_feed_flush, sliding_window_stats, sink, ck)

    got = spark.read.parquet(sink)
    want = sliding_window_stats(
        spark.read.parquet(drip_feed_flush)
    ).filter(F.col("event_type") != "flush")
    key = lambda rows: sorted(  # noqa: E731
        (str(r["win_start"]), r["event_type"], r["n_events"],
         str(r["total_value"]))
        for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert len(want_rows) > 0
    assert key(got_rows) == key(want_rows), (
        "sliding windows lost or duplicated across the kill/restart"
    )


def test_session_stats_exactly_once_across_kill_restart(
    spark, drip_feed_flush, tmp_path
):
    from pyspark.sql import functions as F

    from getdbt_spark.streaming import session_stats

    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    processed = _kill_mid_feed(spark, drip_feed_flush, session_stats, sink, ck)
    total = spark.read.parquet(drip_feed_flush).count()
    assert 0 < processed < total
    _drain(spark, drip_feed_flush, session_stats, sink, ck)

    got = spark.read.parquet(sink)
    want = session_stats(spark.read.parquet(drip_feed_flush)).filter(
        F.col("user_id") != FLUSH_USER
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], str(r["total_value"]))
        for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert len(want_rows) > 0
    assert key(got_rows) == key(want_rows), (
        "sessions lost or duplicated across the kill/restart"
    )


def test_drift_histogram_exactly_once_across_kill_restart(
    spark, drip_feed_flush, tmp_path
):
    """The online drift monitor's histogram half recovers from a
    kill mid-feed: every finalized (day, bucket) count lands in the
    sink exactly once — partial day-window aggregates straddling the
    kill resume from the state store, committed windows do not
    re-emit.  (The flush sentinel's own day stays unfinalized and is
    excluded from the batch twin by its window.)"""
    from pyspark.sql import functions as F

    from getdbt_spark.streaming import drift_bucket_counts

    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    processed = _kill_mid_feed(
        spark, drip_feed_flush, drift_bucket_counts, sink, ck
    )
    total = spark.read.parquet(drip_feed_flush).count()
    assert 0 < processed < total
    _drain(spark, drip_feed_flush, drift_bucket_counts, sink, ck)

    got = spark.read.parquet(sink)
    flush_day = FLUSH_TS.date().isoformat()
    want = drift_bucket_counts(spark.read.parquet(drip_feed_flush)).filter(
        F.to_date("win_start") != F.lit(flush_day)
    )
    key = lambda rows: sorted(  # noqa: E731
        (str(r["win_start"]), r["bucket"], r["n_events"]) for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert len(want_rows) > 0
    assert key(got_rows) == key(want_rows), (
        "drift histogram lost or duplicated across the kill/restart"
    )
