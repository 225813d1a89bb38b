"""SCD2 snapshot (check strategy) semantics tests."""

from __future__ import annotations

import datetime as dt

from getdbt_spark.snapshots import (
    VALID_FROM,
    VALID_TO,
    snapshot_apply,
    snapshot_init,
)

T1 = dt.datetime(2024, 1, 1, 0, 0, 0)
T2 = dt.datetime(2024, 1, 2, 0, 0, 0)
T3 = dt.datetime(2024, 1, 3, 0, 0, 0)


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, status string")


def _versions(snap, key_id):
    rows = [
        (str(r[VALID_FROM]), str(r[VALID_TO]), r["status"])
        for r in snap.filter(f"id = {key_id}").collect()
    ]
    return sorted(rows)


class TestScd2:
    def test_changed_row_closes_and_reopens(self, spark):
        s1 = snapshot_init(_src(spark, [(1, "a", "new")]), T1)
        s2 = snapshot_apply(
            s1, _src(spark, [(1, "a", "active")]), "id", ["status"], T2
        )
        assert _versions(s2, 1) == sorted(
            [
                (str(T1), str(T2), "new"),
                (str(T2), "None", "active"),
            ]
        )
        # A third run with no change is a no-op for this key.
        s3 = snapshot_apply(
            s2, _src(spark, [(1, "a", "active")]), "id", ["status"], T3
        )
        assert _versions(s3, 1) == _versions(s2, 1)

    def test_new_key_inserted_open(self, spark):
        s1 = snapshot_init(_src(spark, [(1, "a", "new")]), T1)
        s2 = snapshot_apply(
            s1, _src(spark, [(1, "a", "new"), (2, "b", "new")]),
            "id", ["status"], T2,
        )
        assert _versions(s2, 2) == [(str(T2), "None", "new")]

    def test_vanished_key_stays_open(self, spark):
        s1 = snapshot_init(_src(spark, [(1, "a", "new"), (2, "b", "new")]), T1)
        s2 = snapshot_apply(s1, _src(spark, [(1, "a", "new")]), "id", ["status"], T2)
        assert _versions(s2, 2) == [(str(T1), "None", "new")]

    def test_null_safe_change_detection(self, spark):
        s1 = snapshot_init(_src(spark, [(1, "a", None)]), T1)
        # NULL -> NULL is NOT a change; NULL -> value is.
        s2 = snapshot_apply(s1, _src(spark, [(1, "a", None)]), "id", ["status"], T2)
        assert _versions(s2, 1) == [(str(T1), "None", None)]
        s3 = snapshot_apply(s2, _src(spark, [(1, "a", "x")]), "id", ["status"], T3)
        assert _versions(s3, 1) == sorted(
            [(str(T1), str(T3), None), (str(T3), "None", "x")]
        )
