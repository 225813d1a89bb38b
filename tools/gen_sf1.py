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
- ``documents`` grow 10× (matching 0.01 → 0.1: 500 → 5000) by
  key-shifted replication with a PER-COPY TOKEN PREFIX (``c3tok``):
  byte-identical replicas would make every copy a near-dup of every
  other — the dedup families' candidate sets would inflate
  quadratically in a way natural corpus growth does not.  Prefixing
  every token gives each copy its own disjoint vocabulary: the
  WITHIN-copy duplicate structure replicates sf0.1's exactly (so
  cluster shapes and hit rates stay representative) while cross-copy
  shingle/minhash/simhash collisions stay at hash-accident level —
  the linear-growth corpus model a real ingestion sees.  ``n_chars``
  is recomputed from the rewritten text.
- ``embeddings`` grow 5× (matching 0.1's ×4 step: 500 → 2000 → 10000)
  by vec_id-shifted copies with seeded deterministic Gaussian noise
  (σ=0.05 per dim, seed = copy index): identical or merely scaled
  copies would collapse into the same LSH buckets / IVF cells and
  quadratically inflate per-bucket work; independent noise keeps the
  label structure while spreading copies across cells like real new
  data.

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Overridable so the same growth law can stack one more decade
# (VERDICT r6 #8): SRC=.scale_data/sf1 OUT=.scale_data/sf10 applies
# the identical 10x key-shifted replication to the derived decade.
SRC = os.environ.get("GEN_SF_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("GEN_SF_OUT", os.path.join(REPO, ".scale_data", "sf1"))
# Per-copy token-prefix letter for the documents table.  Stacking a
# second decade MUST use a different letter (e.g. 'd' for sf1→sf10):
# re-using 'c' would collide the new copies' prefixed tokens with the
# previous decade's already-'c{i}'-prefixed vocabulary — the
# disjointness integrity check below catches it, but only after the
# expensive generation.
PFX = os.environ.get("GEN_SF_PREFIX", "c")

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
COPIED = ["region", "nation"]
N_COPIES = 10
N_DOC_COPIES = 10
N_EMB_COPIES = 5


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

    _gen_documents(con)
    _gen_embeddings()
    _check(con)


def _check(con) -> None:
    """Integrity gate: replication must preserve keys and FK closure —
    a silent key collision would corrupt every sf1 measurement."""

    def one(sql: str) -> int:
        return con.execute(sql).fetchone()[0]

    p = lambda t: f"read_parquet('{OUT}/{t}.parquet')"  # noqa: E731
    checks = {
        "orders pk unique": one(
            f"SELECT count(*) - count(DISTINCT o_orderkey) FROM {p('orders')}"
        ),
        "customer pk unique": one(
            f"SELECT count(*) - count(DISTINCT c_custkey) FROM {p('customer')}"
        ),
        "docs pk unique": one(
            f"SELECT count(*) - count(DISTINCT doc_id) FROM {p('documents')}"
        ),
        "embs pk unique": one(
            f"SELECT count(*) - count(DISTINCT vec_id) FROM {p('embeddings')}"
        ),
        "lineitem->orders fk": one(
            f"SELECT count(*) FROM {p('lineitem')} l LEFT JOIN {p('orders')} o "
            "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
        ),
        "orders->customer fk": one(
            f"SELECT count(*) FROM {p('orders')} o LEFT JOIN {p('customer')} c "
            "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
        ),
        # cross-copy vocabulary disjointness.  Copies 1..9 are mutually
        # disjoint BY CONSTRUCTION (equal-length prefixes 'c1'..'c9'
        # differ in their second char), so the only collision surface is
        # copy 0's unprefixed tokens vs the union of ALL prefixed copies
        # — an original token that itself starts with 'c1'..'c9' (r5
        # ADVICE: the old copy-0-vs-copy-1 check missed 'c2'..'c9'
        # collisions).  Copy boundary derived from the source corpus,
        # not hard-coded.
        "doc vocab disjoint": one(
            f"""
            WITH off AS (
              SELECT max(doc_id) + 1 AS doc_off
              FROM read_parquet('{SRC}/documents.parquet')
            )
            SELECT count(*) FROM (
              SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
              FROM {p('documents')}, off WHERE doc_id < doc_off
            ) a JOIN (
              SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
              FROM {p('documents')}, off WHERE doc_id >= doc_off
            ) b USING (tok)
            """
        ),
    }
    bad = {k: v for k, v in checks.items() if v != 0}
    if bad:
        raise SystemExit(f"sf1 integrity check FAILED: {bad}")
    print("integrity checks: all OK")


def _gen_documents(con) -> None:
    doc_off = (
        con.execute(
            f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchone()[0]
        + 1
    )
    branches = []
    for i in range(N_DOC_COPIES):
        if i == 0:
            text = "text"
        else:
            # disjoint per-copy vocabulary; single-space corpus
            text = (
                "array_to_string(list_transform("
                f"string_split(text, ' '), x -> '{PFX}{i}' || x), ' ')"
            )
        branches.append(
            f"SELECT doc_id + {i * doc_off} AS doc_id, {text} AS text, "
            f"lang, source, CAST(length({text}) AS BIGINT) AS n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    sql = " UNION ALL ".join(branches)
    con.execute(
        f"COPY ({sql}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')"
    ).fetchone()[0]
    print(f"documents: {n} rows")


def _gen_embeddings() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    off = int(vec_ids.max()) + 1
    parts = []
    for i in range(N_EMB_COPIES):
        if i == 0:
            e = embs
        else:
            rng = np.random.default_rng(i)  # deterministic per copy
            e = embs + rng.normal(0.0, 0.05, embs.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_ids + i * off, pa.int64()),
                    "embedding": pa.array(
                        e.tolist(), pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {out.num_rows} rows")


if __name__ == "__main__":
    main()
