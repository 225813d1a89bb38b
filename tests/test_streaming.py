"""Streaming variant tests (SURVEY §2.9): stream/batch parity and the
watermark late-data contract."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from getdbt_spark.io import load_table
from getdbt_spark.streaming import (
    batch_equivalent,
    daily_event_stats,
    first_seen_batch,
    first_seen_stream,
    run_available_now,
    session_stats,
    stream_source,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Copy the sf0.001 events into a writable dir (as normal parquet —
    the streaming reader gets the already-normalized batch schema)."""
    src = load_table(spark, SF, "events")
    path = str(tmp_path / "events_stream")
    src.write.parquet(path)
    return path, src


def _key(rows):
    return {
        (str(r["evt_date"]), r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in rows
    }


class TestStreamBatchParity:
    def test_available_now_matches_batch(self, spark, events_dir):
        path, src = events_dir
        got = run_available_now(spark, path, src, "t_parity")
        want = daily_event_stats(spark.read.parquet(path))
        assert _key(got.collect()) == _key(want.collect())
        assert _key(got.collect()) == _key(batch_equivalent(spark, SF).collect())

    def test_plan_has_event_time_watermark(self, spark, events_dir):
        path, src = events_dir
        stream = daily_event_stats(stream_source(spark, path, src))
        assert stream.isStreaming
        plan = stream._jdf.queryExecution().analyzed().toString()
        assert "EventTimeWatermark" in plan

    def test_session_window_stream_matches_batch(self, spark, events_dir):
        """The session_window agg produces identical sessions on the
        streaming and static paths (availableNow over the same files)."""
        path, src = events_dir
        got = run_available_now(
            spark, path, src, "t_sessions", transform=session_stats
        )
        want = session_stats(spark.read.parquet(path))
        key = lambda rows: sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["total_value"])
            for r in rows
        )
        assert key(got.collect()) == key(want.collect())
        assert got.count() > 0

    def test_first_seen_stream_matches_batch_single_generation(
        self, spark, events_dir, tmp_path
    ):
        """On a single batch of input, the stateful dedup and the
        window-SQL first-occurrence form agree row for row."""
        path, src = events_dir
        got = run_available_now(
            spark,
            path,
            src,
            "t_fs_1",
            transform=first_seen_stream,
            output_mode="append",
            checkpoint=str(tmp_path / "ck"),
        )
        want = first_seen_batch(spark.read.parquet(path))
        key = lambda rows: sorted(
            (r["fp"], r["event_id"]) for r in rows
        )
        assert key(got.collect()) == key(want.collect())
        assert got.count() > 0

    def test_first_seen_suppresses_across_generations(self, spark, tmp_path):
        """State carried through the checkpoint suppresses a duplicate
        fingerprint arriving in a LATER micro-batch generation — the
        behavior the batch window idiom cannot express."""
        import datetime as dt

        path = str(tmp_path / "fs_events")
        ck = str(tmp_path / "fs_ck")
        out = str(tmp_path / "fs_out")
        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        schema = (
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        rows1 = [(1, base, 1, "click", 10.0, "payload-A")]
        spark.createDataFrame(rows1, schema).write.mode("append").parquet(path)
        src = spark.read.parquet(path)
        r1 = run_available_now(
            spark, path, src, "t_fs_g1",
            transform=first_seen_stream, output_mode="append",
            checkpoint=ck, sink_dir=out,
        )
        assert [r["event_id"] for r in r1.collect()] == [1]

        # generation 2: a dup of payload-A (later ts) + a brand-new payload
        rows2 = [
            (2, base + dt.timedelta(minutes=5), 2, "click", 5.0, "payload-A"),
            (3, base + dt.timedelta(minutes=6), 3, "view", 1.0, "payload-B"),
        ]
        spark.createDataFrame(rows2, schema).write.mode("append").parquet(path)
        r2 = run_available_now(
            spark, path, src, "t_fs_g2",
            transform=first_seen_stream, output_mode="append",
            checkpoint=ck, sink_dir=out,
        )
        # cumulative file-sink output: first-seen of A and of B — the
        # generation-2 duplicate of A (event 2) was suppressed by state
        assert sorted(r["event_id"] for r in r2.collect()) == [1, 3]

    def test_late_data_merged_across_microbatches(self, spark, tmp_path):
        """A second micro-batch carrying a late (but within-watermark)
        event updates the already-seen day — the streaming analog of the
        reference recomputing a trailing partition."""
        import datetime as dt

        path = str(tmp_path / "late_events")
        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows1 = [(1, base, 1, "click", 10.0, "p")]
        schema = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
        spark.createDataFrame(rows1, schema).write.mode("append").parquet(path)
        src = spark.read.parquet(path)
        r1 = run_available_now(spark, path, src, "t_late_1")
        assert _key(r1.collect())[("2024-01-10", "click")] == (1, 10.0)

        # late event for the SAME day arrives in a later file
        rows2 = [(2, base + dt.timedelta(hours=1), 2, "click", 5.0, "p")]
        spark.createDataFrame(rows2, schema).write.mode("append").parquet(path)
        r2 = run_available_now(spark, path, src, "t_late_2")
        assert _key(r2.collect())[("2024-01-10", "click")] == (2, 15.0)


def test_dedup_replays_stream_matches_batch(spark, events_dir, tmp_path):
    """Replayed (duplicated) deliveries: the streaming
    dropDuplicatesWithinWatermark path and the batch dropDuplicates
    path reconstruct the same exactly-once feed."""
    from getdbt_spark.streaming import dedup_replays

    path, src = events_dir
    dup_path = str(tmp_path / "events_replayed")
    batch = spark.read.parquet(path)
    batch.unionAll(batch.filter(F.col("event_id") % 10 == 0)).write.parquet(
        dup_path
    )
    got = run_available_now(
        spark,
        dup_path,
        src,
        "t_dedup_replays",
        transform=dedup_replays,
        output_mode="append",
    )
    want = dedup_replays(spark.read.parquet(dup_path))
    key = lambda rows: sorted(
        (r["event_id"], r["user_id"], r["event_type"], str(r["ts"]))
        for r in rows
    )
    assert key(got.collect()) == key(want.collect())
    assert got.count() == batch.count()


def test_sliding_window_stream_matches_batch(spark, events_dir):
    """The overlapping F.window generator assigns each event to the
    same two windows on the streaming and static paths, and the
    total event mass doubles exactly (2 windows per event)."""
    from getdbt_spark.streaming import sliding_window_stats

    path, src = events_dir
    got = run_available_now(
        spark, path, src, "t_sliding", transform=sliding_window_stats
    )
    want = sliding_window_stats(spark.read.parquet(path))
    key = lambda rows: sorted(
        (r["win_start"], r["win_end"], r["event_type"],
         r["n_events"], r["total_value"])
        for r in rows
    )
    assert key(got.collect()) == key(want.collect())
    n_raw = spark.read.parquet(path).count()
    assert sum(r["n_events"] for r in want.collect()) == 2 * n_raw


def test_incremental_sink_accretes_per_generation(spark, tmp_path):
    """foreachBatch+merge streaming sink: after generation 1 the table
    holds exactly generation-1 days; after generation 2 it equals the
    full batch aggregate — updated keys overwritten, others kept."""
    from getdbt_spark.streaming import run_into_incremental_sink

    e = load_table(spark, SF, "events")
    lo, hi = e.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).collect()[0]
    mid = lo + (hi - lo) / 2
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")

    gen1 = e.filter(F.to_date("ts") <= F.lit(mid))
    gen2 = e.filter(F.to_date("ts") > F.lit(mid))
    assert gen1.count() and gen2.count()

    gen1.write.mode("append").parquet(src)
    t1 = run_into_incremental_sink(spark, src, e, table, ckpt)
    assert _key(t1.collect()) == _key(daily_event_stats(gen1).collect())

    gen2.write.mode("append").parquet(src)
    t2 = run_into_incremental_sink(spark, src, e, table, ckpt)
    assert _key(t2.collect()) == _key(daily_event_stats(e).collect())

def test_attribution_join_stream_matches_batch(spark, events_dir):
    """Stream-stream interval self-join (view -> purchase within 30
    min): the availableNow run over the file source must equal the
    static-path join row for row, and the streaming plan must carry
    watermarks on BOTH sides (that is what bounds the join state)."""
    from getdbt_spark.streaming import attributed_conversions

    path, src = events_dir
    stream = attributed_conversions(stream_source(spark, path, src))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2
    got = run_available_now(
        spark,
        path,
        src,
        "t_attr",
        transform=attributed_conversions,
        output_mode="append",
    )
    want = attributed_conversions(spark.read.parquet(path))
    key = lambda rows: sorted(  # noqa: E731
        (r["imp_id"], r["conv_id"], str(r["imp_ts"]), str(r["conv_ts"]))
        for r in rows
    )
    got_rows, want_rows = got.collect(), want.collect()
    assert len(got_rows) > 0
    assert key(got_rows) == key(want_rows)


def test_attribution_gap_is_dst_invariant(spark):
    """Round-5 ADVICE: the interval constraint must be evaluated on a
    DST-free instant mapping.  Events straddling the Europe/Amsterdam
    spring-forward (2024-03-31 02:00→03:00, skipped hour): a session-TZ
    shift bumps the nonexistent 02:xx wall times forward an hour,
    turning a 30-min raw gap into 90 min and dropping the pair.  The
    fixed-offset mapping must keep every raw-gap<=30min pair and reject
    every raw-gap>30min pair, exactly like the NTZ oracle arithmetic."""
    from getdbt_spark.streaming import attributed_conversions

    rows = [
        # raw gap 30:00 -> match (spring-forward: 02:20 doesn't exist locally)
        (1, 10, "view", "2024-03-31 01:50:00", 0.0),
        (2, 10, "purchase", "2024-03-31 02:20:00", 5.0),
        # raw gap 31:00 -> no match even though both sides exist locally
        (3, 11, "view", "2024-03-31 01:40:00", 0.0),
        (4, 11, "purchase", "2024-03-31 02:11:00", 7.0),
        # fall-back (2024-10-27 03:00->02:00): raw gap 25:00 -> match
        (5, 12, "view", "2024-10-27 02:45:00", 0.0),
        (6, 12, "purchase", "2024-10-27 03:10:00", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, s string, value double"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("s").cast("timestamp_ntz").alias("ts"),
        "value",
    )
    got = sorted(
        (r["imp_id"], r["conv_id"])
        for r in attributed_conversions(ev).collect()
    )
    assert got == [(1, 2), (5, 6)]


def test_late_data_audit_matches_real_stream_drops(spark, tmp_path):
    """VERDICT r5 #4: `streaming_late_data_audit` is the one twin whose
    semantics can silently diverge from the real stream — its batch
    accounting (event late iff it arrives >1 h behind the running
    high-water mark) must equal what a watermarked stateful operator
    actually drops.  Per-event drop granularity in Structured
    Streaming lives in the dedup operator (windowed aggs evict whole
    windows), so the real-stream side is
    ``withWatermark(1 hour) + dropDuplicatesWithinWatermark`` over
    unique events: every event the audit flags late must be dropped by
    the stream, every other event must survive.  Arrival order =
    generation order = event_id, matching the audit's contract."""
    import datetime as dt

    from getdbt_spark.queries import QUERIES, load_all
    from getdbt_spark.streaming import _ntz_instant

    load_all()
    path = str(tmp_path / "aud_src")
    ck = str(tmp_path / "aud_ck")
    out = str(tmp_path / "aud_out")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    t = lambda *a: dt.datetime(2024, 1, *a)  # noqa: E731
    gens = [
        # g0 establishes high-water 10:30
        [(1, t(5, 10, 0)), (2, t(5, 10, 30))],
        # g1: event 3 is 1.5 h behind high-water -> audit-late AND below
        # the 09:30 stream watermark; event 4 (45 min behind) survives
        [(3, t(5, 9, 0)), (4, t(5, 9, 45))],
        # g2: next-day event advances the watermark, nothing late
        [(5, t(6, 13, 0))],
    ]

    def audit_stream(ev):
        return (
            ev.withColumn("ts_evt", _ntz_instant("ts"))
            .withWatermark("ts_evt", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "ts", "event_type")
        )

    src = None
    res = None
    for i, rows in enumerate(gens):
        full = [(eid, ts, eid, "view", 1.0, "p") for eid, ts in rows]
        spark.createDataFrame(full, schema).write.mode("append").parquet(path)
        if src is None:
            src = spark.read.parquet(path)
        res = run_available_now(
            spark, path, src, f"t_aud_g{i}",
            transform=audit_stream, output_mode="append",
            checkpoint=ck, sink_dir=out,
        )
    kept = sorted(r["event_id"] for r in res.collect())

    # the registered audit twin over the same table (tmp sf layout)
    sf = str(tmp_path / "sf_aud")
    spark.read.parquet(path).coalesce(1).write.parquet(f"{sf}/events.parquet")
    audit = {
        r["event_type"]: r
        for r in QUERIES["streaming_late_data_audit"](spark, sf).collect()
    }["view"]
    assert audit["n_events"] == 5 and audit["n_late"] == 1
    assert kept == [1, 2, 4, 5], (
        "stream drops must equal audit accounting (event 3 late)"
    )
    assert audit["n_events"] - audit["n_late"] == len(kept)


def test_topk_trending_stream_matches_batch(spark, events_dir):
    """`streaming_topk_trending`'s documented production shape: a
    watermarked tumbling-day aggregate streams in APPEND mode (only
    days the watermark has closed are emitted), and the rank runs over
    the emitted rows in the sink exactly as the batch twin computes
    it.  The sink-side top-3 per closed day must equal the batch
    twin's rows for those days."""
    from pyspark.sql import Window

    path, src = events_dir
    closed = run_available_now(
        spark, path, src, "t_topk", output_mode="append"
    )  # daily_event_stats: (evt_date, event_type, n_events, ...)
    rows = closed.collect()
    assert rows, "8-day watermark over a 30-day corpus must close days"
    closed_days = {str(r["evt_date"]) for r in rows}

    w = Window.partitionBy("evt_date").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    got = sorted(
        (str(r["evt_date"]), r["event_type"], r["n_events"], r["rnk"])
        for r in closed.withColumn(
            "rnk", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rnk") <= 3)
        .collect()
    )
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    want = sorted(
        (str(r["d"]), r["event_type"], r["n"], r["rnk"])
        for r in QUERIES["streaming_topk_trending"](spark, SF).collect()
        if str(r["d"]) in closed_days
    )
    assert got == want


def test_ntz_instant_preserves_wall_clock_exactly(spark):
    """The `_ntz_instant` mapping contract, pinned directly: for every
    NTZ wall-clock value w (random sample across 2024 plus the exact
    Europe/Amsterdam transition hours), the mapped instant's UTC epoch
    must equal w interpreted as UTC plus EXACTLY the whole-day
    EPOCH_REBASE_DAYS shift (which clears Spark's epoch-0 watermark
    floor for pre-1970 wall clocks), byte-exact to the microsecond.
    The constant offset cancels in differences, so instant differences
    still equal raw NTZ differences everywhere."""
    import calendar
    import datetime as dt
    import random

    from getdbt_spark.streaming import EPOCH_REBASE_DAYS, _ntz_instant

    rng = random.Random(42)
    stamps = [
        dt.datetime(2024, 1, 1)
        + dt.timedelta(
            seconds=rng.randrange(366 * 86400), microseconds=rng.randrange(10**6)
        )
        for _ in range(500)
    ]
    # the skipped hour (spring-forward) and the repeated hour (fall-back)
    stamps += [
        dt.datetime(2024, 3, 31, 2, mm, ss)
        for mm in (0, 30, 59) for ss in (0, 30)
    ]
    stamps += [
        dt.datetime(2024, 10, 27, 2, mm, ss)
        for mm in (0, 30, 59) for ss in (0, 30)
    ]
    df = spark.createDataFrame(
        [(s,) for s in stamps], "ts timestamp_ntz"
    ).select("ts", F.unix_micros(_ntz_instant("ts")).alias("um"))
    shift_us = EPOCH_REBASE_DAYS * 86400 * 10**6
    for r in df.collect():
        w = r["ts"]
        want = calendar.timegm(w.timetuple()) * 10**6 + w.microsecond + shift_us
        assert r["um"] == want, f"{w}: {r['um']} != {want}"


def test_session_gap_boundary_is_closed(spark):
    """Round-6 seed-42 find: Spark's session_window merges an event at
    EXACTLY t+gap (closed boundary) and splits one microsecond later —
    the lag-rewrite oracle must split strictly greater, not >=."""
    import datetime as dt

    from getdbt_spark.streaming import session_stats

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, base, 1, "a", 1.0, "p"),
        (2, base + dt.timedelta(seconds=1800), 1, "a", 1.0, "p"),
        (3, base + dt.timedelta(seconds=3600, microseconds=1), 1, "a", 1.0, "p"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    got = sorted(
        (r["session_start"], r["n_events"])
        for r in session_stats(ev).collect()
    )
    assert got == [
        (base, 2),                                               # merged
        (base + dt.timedelta(seconds=3600, microseconds=1), 1),  # split
    ]


def test_pre1970_events_survive_a_real_streaming_run(spark, tmp_path):
    """Spark initializes the global event-time watermark at epoch 0
    (and it only moves forward), so without the EPOCH_REBASE_DAYS
    event-time rebase every pre-1970 event is "late" from the very
    first micro-batch and silently dropped (the pre-1970 random-corpus
    probe kept 5 of 913 groups).  A REAL availableNow run over a 1965
    feed must keep everything and match the batch twin exactly —
    including the original wall-clock date faces."""
    import datetime as dt

    rows = [
        (i, dt.datetime(1965, 6, 10 + (i % 5), 8 + i % 12, i % 60),
         i % 3, ("view", "purchase", "click")[i % 3], float(i), "p")
        for i in range(60)
    ]
    src = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    path = str(tmp_path / "events_1965")
    src.write.parquet(path)
    got = run_available_now(spark, path, src, "t_pre1970")
    want = daily_event_stats(spark.read.parquet(path))
    assert _key(got.collect()) == _key(want.collect())
    assert sum(r["n_events"] for r in got.collect()) == 60
    assert min(str(r["evt_date"]) for r in got.collect()) == "1965-06-10"


def test_one_future_event_cannot_poison_the_watermark(spark, tmp_path):
    """One corrupt far-future clock (the `futuredates` random-corpus
    probe: a 9999-12-30 event in an otherwise-2024 feed) must cost
    exactly that event, never the stream.  Without the ingestion-edge
    quarantine the 9999 event fast-forwards the global watermark past
    every legitimate 2024 event, and generation 2 is silently dropped
    wholesale — nothing crashes, the data is just gone.  With it, the
    stream (a) completes, (b) keeps every valid event across BOTH
    generations, (c) emits nothing for the poisoned one."""
    import datetime as dt

    def gen(ids, poison=()):
        return [
            (
                i,
                dt.datetime(9999, 12, 30, 23, 59)
                if i in poison
                else dt.datetime(2024, 5, 1 + (i % 5), 8 + i % 12, i % 60),
                i % 3,
                ("view", "purchase", "click")[i % 3],
                float(i),
                f"p{i}",
            )
            for i in ids
        ]

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    path = str(tmp_path / "events_future")
    ck = str(tmp_path / "ck_future")
    sink = str(tmp_path / "sink_future")

    # generation 1 carries the poisoned clock among 30 valid events
    g1 = spark.createDataFrame(gen(range(30), poison={7}), schema)
    g1.write.parquet(path)
    out1 = run_available_now(
        spark, path, g1, "t_future_1",
        transform=first_seen_stream, output_mode="append",
        checkpoint=ck, sink_dir=sink,
    )
    got1 = {r["event_id"] for r in out1.collect()}
    assert got1 == set(range(30)) - {7}, got1

    # generation 2 is all-valid 2024 data: a poisoned watermark would
    # have silently dropped every row of it as late
    g2 = spark.createDataFrame(gen(range(100, 130)), schema)
    g2.write.parquet(path, mode="append")
    out2 = run_available_now(
        spark, path, g1, "t_future_2",
        transform=first_seen_stream, output_mode="append",
        checkpoint=ck, sink_dir=sink,
    )
    got2 = {r["event_id"] for r in out2.collect()}
    assert set(range(100, 130)) <= got2, sorted(got2)
    assert 7 not in got2


def test_quarantine_rejects_is_the_exact_complement(spark):
    """Admitted ∪ rejected == input, disjointly: the dead-letter view
    captures exactly what the streaming edge drops (future-dated and
    NULL event times), so rejects can be sunk and alerted on instead
    of silently vanishing."""
    import datetime as dt

    from getdbt_spark.streaming import _quarantine_future, quarantine_rejects

    rows = [
        (1, dt.datetime(2024, 5, 1, 12), 0, "view", 1.0, "a"),
        (2, dt.datetime(2180, 1, 1, 0), 0, "view", 1.0, "b"),   # == bound
        (3, dt.datetime(9999, 12, 30), 0, "view", 1.0, "c"),
        (4, None, 0, "view", 1.0, "d"),
        (5, dt.datetime(1965, 1, 1, 8), 0, "view", 1.0, "e"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    rejected = {r["event_id"] for r in quarantine_rejects(df).collect()}
    assert rejected == {2, 3, 4}
    # the batch path passes everything through (no watermark to poison)
    assert _quarantine_future(df).count() == 5


def test_daily_stats_date_face_is_session_tz_free(spark):
    """The round-11 session-TZ registry sweep found the ONE zone leak
    in the NTZ wall-clock discipline: ``daily_event_stats`` read its
    date face via a direct instant→DATE cast, which renders through
    the SESSION time zone — any session west of UTC shifted every day
    bucket to the previous date.  Pin the fix: identical rows under
    sessions on both sides of UTC and at the home zone."""
    import datetime as dt

    from pyspark.sql import functions as F

    from getdbt_spark.streaming import daily_event_stats

    rows = [
        # midnight and 23:59 wall-clock edges — the rows a zone shift
        # moves across the date boundary
        (1, dt.datetime(2024, 5, 1, 0, 0, 0), 0, "view", 1.0, "a"),
        (2, dt.datetime(2024, 5, 1, 23, 59, 59), 0, "view", 2.0, "b"),
        (3, dt.datetime(2024, 5, 2, 0, 0, 1), 0, "click", 3.0, "c"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    home = spark.conf.get("spark.sql.session.timeZone")
    want = {
        (dt.date(2024, 5, 1), "view", 2),
        (dt.date(2024, 5, 2), "click", 1),
    }
    try:
        for tz in (home, "America/Los_Angeles", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {
                (r["evt_date"], r["event_type"], r["n_events"])
                for r in daily_event_stats(df)
                .select("evt_date", "event_type", "n_events")
                .collect()
            }
            assert got == want, (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", home)
