"""Generate a synthetic sf1 decade for scale-curve measurements.

The driver ships sf0.001/0.01/0.1 only, but VERDICT r4 #6 asks for a
measured scaling exponent on the two flagship MODELS one decade above
the bench SF — the 59-exchange dashboard's 100× claim rested on
plan-shape argument alone.  This tool derives sf1 from sf0.1 by
key-shifted 10× replication, matching the driver generator's own
growth law (TESTDATA.md cardinalities 0.01 → 0.1):

- ``customer/supplier/part/orders/lineitem/events`` grow 10× per
  decade → replicate 10 copies, shifting every key column by
  ``copy_idx * (max_key + 1)`` so join fan-outs and key uniqueness
  are preserved (o_custkey shifts with customer, l_orderkey with
  orders, …).  Non-key modulo-derived fixture attributes
  (``event_id % 2500`` play ids, ``% 17`` ratings rows) keep their
  FIXED cardinality exactly as the fixture SQL defines — groups get
  denser with SF, which is the corpus's own documented growth law,
  not an artifact of the replication.
- ``region/nation`` are scale-fixed in TPC-H → copied.
- ``documents/embeddings`` are copied unscaled: byte-identical text
  replicas would quadratically inflate every dedup family's candidate
  sets in a way natural corpus growth does not — the model DAG reads
  neither, so the models' sf1 measurement is unaffected.

Output: ``<repo>/.scale_data/sf1/*.parquet`` (gitignored; ~150 MB).
Deterministic — same input produces byte-stable rows (file order may
differ; all consumers aggregate).

Usage: python tools/gen_sf1.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale_data", "sf1")

# table -> {column: shift_group}; every column in the same shift group
# moves by the same per-copy offset so FK joins stay intact.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
}
COPIED = ["region", "nation", "documents", "embeddings"]
N_COPIES = 10


def main() -> None:
    import duckdb

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    con = duckdb.connect()

    # one offset per shift group = max(key)+1 over every column using it
    offsets: dict[str, int] = {}
    for table, cols in KEYED.items():
        for col, grp in cols.items():
            mx = con.execute(
                f"SELECT max({col}) FROM "
                f"read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()[0]
            offsets[grp] = max(offsets.get(grp, 0), int(mx) + 1)

    for table in COPIED:
        shutil.copyfile(
            f"{SRC}/{table}.parquet", f"{OUT}/{table}.parquet"
        )
        print(f"{table}: copied")

    for table, cols in KEYED.items():
        branches = []
        for i in range(N_COPIES):
            select = []
            all_cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM "
                    f"read_parquet('{SRC}/{table}.parquet')"
                ).fetchall()
            ]
            for c in all_cols:
                if c in cols:
                    select.append(
                        f"{c} + {i * offsets[cols[c]]} AS {c}"
                    )
                else:
                    select.append(c)
            branches.append(
                "SELECT "
                + ", ".join(select)
                + f" FROM read_parquet('{SRC}/{table}.parquet')"
            )
        sql = " UNION ALL ".join(branches)
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
