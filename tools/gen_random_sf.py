"""Seeded RANDOM corpus generator → .scale_data/rand_sf/.

The driver's correctness gate runs every query against the DuckDB
oracle on ONE fixed corpus — so any divergence that the fixture's
particular values happen to dodge (tie-break totality, float summation
boundaries, DST-straddling event times, degenerate group shapes) stays
invisible.  This tool generates a same-schema corpus with seeded but
DIFFERENT distributions, deliberately hostile where the fixed corpus
is gentle:

- events span 2024-03-01 .. 2024-11-15 — STRADDLING both
  Europe/Amsterdam DST transitions (the fixed corpus is January-only),
  with microsecond jitter, heavy user skew (Zipf-ish), duplicated
  timestamps (ties), and repeated (user, ts) pairs;
- documents mix random word-soup lengths with engineered EXACT
  duplicates, near-duplicate pairs (one-word edits), empty and
  single-word texts;
- lineitem/orders carry exact-tie prices and quantities so any
  non-total ORDER BY shows up as a cross-engine hash flip;
- embeddings are seeded normals with a few exactly-duplicated vectors.

Then `python tools/verify_local.py .scale_data/rand_sf` replays the
ENTIRE registry (Spark vs DuckDB) on data neither engine has seen —
a hash mismatch here is a real latent bug (or a documented
fixture-dependence), never noise.

Usage: python tools/gen_random_sf.py [seed] [variant]
       seed     default 20240814
       variant  default | ties | hostile

Variants (post-process ONE table; others unchanged):
- ``ties``:    every event on ONE timestamp, values quantized to 7
               levels — zero variance, zero gaps, total-order stress
               (found the dq_anomaly_zscore ANSI division crash).
- ``hostile``: ALL events on one user (extreme key skew), values
               shifted negative, sparse 1990-1995 hour-grid times
               (found the power-law-fit zero-denominator crash and the
               vodstreaming HUGEINT dtype-class latch).
- ``zerovec``: rewrites EMBEDDINGS instead — 5% all-zero vectors
               (zero L2 norm → cosine 0/0), 5% denormal-tiny values
               (norm underflows float32), plus a duplicated zero pair
               — the corrupt-embedding-feed path of a 100 TB corpus
               (found the ANSI cosine crash + NaN-ranks-first top-k
               divergence in both cosine implementations).
- ``multibyte``: rewrites DOCUMENTS with mixed-script UTF-8 text
               (accented Latin / Greek / Cyrillic / CJK / astral
               emoji) — chars≠bytes everywhere: byte-offset frame
               slicing mid-char, md5-of-token parity, n_chars vs
               octet_length divergence (closed the char-as-byte
               multimodal oracles, r7 ADVICE).
- ``dupdocs``: rewrites DOCUMENTS instead — the ENTIRE corpus is 3
               distinct texts (one ~40-word, one 2-word, one empty)
               → every dedup op degenerates to 3 giant cliques:
               maximal LSH bucket explosion, connected-components
               star collapse, canonical-selection total-order stress.
- ``pre1970``: shifts every event 59 years earlier (the default
               2024 corpus lands in 1965) — NEGATIVE
               epoch micros: floor-vs-truncate division, date spines
               older than the reporting anchor (found the Illegal
               sequence boundaries crash), and Spark's epoch-0
               streaming watermark floor (found the silent
               drop-everything in the incremental sink; fixed by the
               EPOCH_REBASE_DAYS event-time rebase).
- ``nanvalues``: poisons events.value — 2% NaN, 1% +Inf, 1% -Inf
               (the corrupt-double cells every 100 TB feed contains):
               ANSI CAST crashes, NaN-vs-NULL aggregate divergence,
               NaN ordering (Spark and DuckDB both sort NaN greatest
               — but any path materializing NaN vs NULL differs).
- ``badjson``: poisons events.props — malformed JSON, empty strings,
               missing keys, non-numeric / quoted / fractional /
               nested k values (the schemaless-feed reality): strict
               JSON parsers crash, typed extraction coerces
               differently per engine.
- ``hugedoc``: rewrites a handful of DOCUMENTS to book scale — three
               ~2 MB repetitive-paragraph docs, three ~500 KB
               word-soup docs, and one ~1 MB SINGLE-TOKEN doc (no
               whitespace at all) — the books/concatenated-crawl tail
               every 100 TB corpus has.  Probes Arrow batch memory in
               the shingle/minhash kernels, accidental O(L²) text
               ops, tokenizers meeting a megabyte token, and
               cross-engine parity on huge strings.
- ``nanvec``:  poisons embedding COMPONENTS (zerovec poisons whole
               norms): 2% of vectors get one NaN component, 1% one
               +Inf, 0.4% one -Inf, plus one ALL-NaN vector — the
               corrupt-embedding-feed reality.  Probes NaN/Inf
               propagation through dot products, norms, kmeans
               centroid updates (one NaN row can silently poison
               every centroid it touches), int8 quantization, and
               NaN-vs-NULL ranking divergence between engines.
- ``futuredates``: poisons ~0.75% of events.ts with far-future
               timestamps (year 2500, 9999-12-30, and 2262-04-12 —
               one tick past pandas' datetime64[ns] ceiling): the
               one-corrupt-clock feed that kills every Arrow/pandas
               kernel and toPandas() fetch that touches the raw
               column, plus max-date anchor / date-arithmetic
               overflow stress.  Both engines are us-int64 native,
               so JVM/DuckDB paths must agree exactly.
- ``nanprices``: poisons the TPC-H money columns instead
               (l_extendedprice, o_totalprice, c_acctbal with
               NaN/±Inf every 40th key) — found floor-saturation in
               round_to, collect_list-vs-list NULL handling, NULLS
               FIRST/LAST window divergence, and the percentile
               family's non-finite sensitivity.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Overridable so several variant corpora can coexist (parallel sweeps).
OUT = os.environ.get(
    "RAND_SF_OUT", os.path.join(REPO, ".scale_data", "rand_sf")
)

N_CUST, N_SUPP, N_PART, N_ORDERS, N_LINE = 150, 10, 200, 1500, 6000
N_EVENTS, N_DOCS, N_EMB, DIM = 1000, 500, 500, 64

WORDS = (
    "the a spark table scan join merge sort window filter agg group row "
    "column key value batch stream hash part order line customer data "
    "query small big fast slow dup vector alpha beta gamma delta epsilon "
    "zeta theta lambda sigma omega red blue green north south east west "
    "zero one two three four five six seven eight nine"
).split()


def _strings(rng, prefix, n, dom):
    return [f"{prefix}{rng.integers(dom)}" for _ in range(n)]


def _assert_ascii(texts) -> None:
    """Historical guard (r6 ADVICE): the text-as-bytes oracles used to
    zip per-CHAR splits against per-BYTE ranges, exact only on pure
    ASCII.  Those oracles now expand chars to true UTF-8 bytes
    (pipeline_queries._utf8_bytes_sql), so non-ASCII corpora are
    first-class — see the ``multibyte`` variant.  Kept as a no-op
    marker on the corpora that are INTENTIONALLY ASCII (so a future
    reader knows the default corpus being ASCII is a choice, not a
    requirement)."""


# Mixed-script vocabulary for the ``multibyte`` variant: accented
# Latin (2-byte chars), Greek + Cyrillic (2-byte), CJK (3-byte),
# astral-plane emoji (4-byte, surrogate pairs in UTF-16 engines), and
# plain ASCII mixed in so tokenizers see both.  Deliberately excludes
# locale-trap casings (İ, ẞ) — casing parity across engines is only
# contractual for the well-defined cases.
MB_WORDS = (
    "café señor über straße œuvre fjörd naïve résumé "
    "αλφα βητα γαμμα δελτα σιγμα ωμεγα "
    "привет мир данные поток таблица ключ "
    "你好 世界 数据 查询 分析 流式 "
    "データ 処理 分散 "
    "🎉 🚀 🤖 💾 📊 "
    "spark table scan join window filter the a data fast slow"
).split()


def multibyte_texts(n: int, seed: int = 20240814) -> list[str]:
    """Seeded mixed-script document texts with the default corpus's
    engineered shapes: exact-dup pairs, one-word-edit near-dups (the
    edit token is itself multibyte), empties and 1-word docs."""
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        k = int(rng.integers(0, 120))
        texts.append(" ".join(rng.choice(MB_WORDS, k)) if k else "")
    for i in range(0, min(40, n - 1), 4):      # exact duplicate pairs
        texts[i + 1] = texts[i]
    for i in range(40, min(80, n - 1), 4):     # near-dup: one-word edit
        base = texts[i].split()
        if base:
            base[len(base) // 2] = "编辑过"
            texts[i + 1] = " ".join(base)
    return texts


def clustered_embeddings(seed: int, n: int, dim: int, k: int):
    """16-component Gaussian-mixture embedding table (clustered-space
    regime for ANN quality eval).  Component centers are seeded
    normals (pairwise near-orthogonal in high dim → well separated);
    noise σ=0.15 per component vs center norm ≈ √dim keeps
    within-cluster cosine ≫ between-cluster cosine, so a correct IVF
    (nprobe=1, centers as the codebook) must score recall@5 ≈ 1."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, dim)).astype("float32")
    comp = np.arange(n) % k
    emb = centers[comp] + rng.normal(0, 0.15, (n, dim)).astype("float32")
    emb[:k] = centers          # vec_id 0..k-1 ARE the centers
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(comp.astype("int32"), pa.int32()),
    })


def main(seed: int = 20240814) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(OUT, exist_ok=True)

    def w(name, table):
        pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))

    # -- region / nation (tiny catalogs, same shape) --------------------
    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # -- customer / supplier / part -------------------------------------
    segs = ["AUTOMOBILE", "MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD"]
    w("customer", pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": [f"Customer#{rng.integers(10**6):06d}" for _ in range(N_CUST)],
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        # exact ties on purpose: acctbal quantized to 50 distinct values
        "c_acctbal": np.round(rng.integers(-20, 30, N_CUST) * 111.11, 2),
        "c_mktsegment": [segs[i] for i in rng.integers(0, 5, N_CUST)],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
        "s_name": [f"Supplier#{i:02d}" for i in range(N_SUPP)],
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, N_SUPP), 2),
    }))
    types = [f"{a} {b}" for a in ("STANDARD", "SMALL", "LARGE", "ECONOMY")
             for b in ("BRUSHED", "POLISHED", "PLATED")]
    w("part", pa.table({
        "p_partkey": pa.array(range(N_PART), pa.int64()),
        "p_name": [" ".join(rng.choice(WORDS, 3)) for _ in range(N_PART)],
        "p_brand": [f"Brand#{rng.integers(1, 6)}{rng.integers(1, 6)}"
                    for _ in range(N_PART)],
        "p_type": [types[i] for i in rng.integers(0, len(types), N_PART)],
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": np.round(900 + rng.integers(0, 200, N_PART) * 1.0, 2),
    }))

    # -- orders / lineitem (FK-closed, tie-heavy) -----------------------
    day = np.timedelta64(1, "D")
    o_dates = (np.datetime64("1995-01-01") +
               rng.integers(0, 2400, N_ORDERS) * day).astype("datetime64[us]")
    w("orders", pa.table({
        "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
        "o_orderstatus": [("F", "O", "P")[i] for i in
                          rng.choice([0, 1, 2], N_ORDERS, p=[.45, .45, .1])],
        # quantized prices: many exact cross-order ties
        "o_totalprice": np.round(rng.integers(10, 3000, N_ORDERS) * 97.0, 2),
        "o_orderdate": o_dates,
        "o_orderpriority": [f"{i}-{n}" for i, n in
                            (rng.choice([(1, "URGENT"), (2, "HIGH"),
                                         (3, "MEDIUM"), (4, "NOT SPECIFIED"),
                                         (5, "LOW")], N_LINE // 4))][:N_ORDERS],
    }))
    l_ok = rng.integers(0, N_ORDERS, N_LINE)
    l_ship = (o_dates[l_ok] + rng.integers(1, 120, N_LINE) * day
              ).astype("datetime64[us]")
    rf = rng.choice(["N", "A", "R"], N_LINE, p=[.5, .25, .25])
    w("lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), pa.int32()),
        "l_quantity": rng.integers(1, 51, N_LINE).astype("float64"),
        "l_extendedprice": np.round(rng.integers(1, 1000, N_LINE) * 101.0, 2),
        "l_discount": np.round(rng.integers(0, 11, N_LINE) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, N_LINE) * 0.01, 2),
        "l_returnflag": rf,
        "l_linestatus": np.where(rf == "N", "O", "F"),
        "l_shipdate": l_ship,
    }))

    # -- events: DST-straddling, skewed, tie-heavy ----------------------
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    span_us = int((np.datetime64("2024-11-15T00:00:00", "us") - t0)
                  / np.timedelta64(1, "us"))
    ts = t0 + rng.integers(0, span_us, N_EVENTS) * np.timedelta64(1, "us")
    # force exact-timestamp ties and transition-hour events
    ts[::50] = ts[1::50][: len(ts[::50])]
    ts[:6] = [np.datetime64(s, "us") for s in (
        "2024-03-31T01:55:00", "2024-03-31T02:10:00", "2024-03-31T02:40:00",
        "2024-10-27T02:05:00", "2024-10-27T02:35:00", "2024-10-27T03:05:00")]
    users = np.minimum(rng.zipf(1.4, N_EVENTS) - 1, 14).astype("int64")
    etypes = rng.choice(["view", "click", "purchase", "signup", "error"],
                        N_EVENTS, p=[.4, .3, .15, .1, .05])
    w("events", pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": ts,
        "user_id": pa.array(users, pa.int64()),
        "event_type": etypes,
        "value": np.round(rng.integers(1, 32768, N_EVENTS) * 0.01, 2),
        "props": [f'{{"k": {rng.integers(0, 100)}}}' for _ in range(N_EVENTS)],
    }))

    # -- documents: dup/near-dup engineered ----------------------------
    texts = []
    for i in range(N_DOCS):
        n = int(rng.integers(0, 120))
        texts.append(" ".join(rng.choice(WORDS, n)) if n else "")
    for i in range(0, 40, 4):          # exact duplicate pairs
        texts[i + 1] = texts[i]
    for i in range(40, 80, 4):         # near-dup: one-word edit
        base = texts[i].split()
        if base:
            base[len(base) // 2] = "EDITED"
            texts[i + 1] = " ".join(base)
    langs = rng.choice(["en", "de", "fr", "es", "zh"], N_DOCS,
                       p=[.4, .2, .2, .1, .1])
    _assert_ascii(texts)
    w("documents", pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{rng.integers(0, 20)}" for _ in range(N_DOCS)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # -- embeddings: seeded normals + exact duplicates ------------------
    emb = rng.normal(0, 1, (N_EMB, DIM)).astype("float32")
    emb[10] = emb[11]
    emb[12] = emb[13]
    w("embeddings", pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
    }))
    print(f"random corpus (seed {seed}) written to {OUT}")


def apply_variant(variant: str) -> None:
    """Rewrite OUT/events.parquet per the variant (see module doc)."""
    import duckdb

    if variant == "nanprices":
        for tbl, col, key in (
            ("lineitem", "l_extendedprice", "l_orderkey"),
            ("orders", "o_totalprice", "o_orderkey"),
            ("customer", "c_acctbal", "c_custkey"),
        ):
            tsrc = os.path.join(OUT, f"{tbl}.parquet")
            cols = duckdb.sql(
                f"SELECT * FROM read_parquet('{tsrc}') LIMIT 0"
            ).columns
            sel = ", ".join(
                (
                    f"CASE {key} % 40 WHEN 0 THEN 'NaN'::DOUBLE"
                    f" WHEN 1 THEN 'Infinity'::DOUBLE"
                    f" WHEN 2 THEN '-Infinity'::DOUBLE"
                    f" ELSE {c} END AS {c}"
                )
                if c == col
                else c
                for c in cols
            )
            duckdb.sql(
                f"COPY (SELECT {sel} FROM read_parquet('{tsrc}')) "
                f"TO '{tsrc}.variant' (FORMAT PARQUET)"
            )
            os.replace(tsrc + ".variant", tsrc)
            print(f"variant 'nanprices' applied to {tsrc}")
        return

    if variant == "hugedoc":
        # Deterministic rewrite of 7 rows (ids 0..6); the rest of the
        # corpus keeps its seeded texts, so dedup/TF-IDF stats remain
        # meaningful around the giants.
        dsrc = os.path.join(OUT, "documents.parquet")
        t = pq.read_table(dsrc)
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        srcs = t["source"].to_pylist()
        rng2 = np.random.default_rng(4242)
        para = " ".join(
            "the quick brown fox jumps over the lazy dog near the river"
            .split()
        )
        repetitive = ("\n\n".join([para] * 3) + "\n\n") * 6200   # ~2 MB
        soup_words = [
            f"w{rng2.integers(100)}" for _ in range(80000)       # ~0.5 MB
        ]
        soup = " ".join(soup_words)
        monster_token = "x" * 1_000_000                          # 1 token
        for i in range(len(ids)):
            if i in (0, 1, 2):
                texts[i] = repetitive
            elif i in (3, 4, 5):
                texts[i] = soup
            elif i == 6:
                texts[i] = monster_token
        _assert_ascii(texts)
        out = pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(x) if x is not None else 0
                                 for x in texts], pa.int64()),
        })
        tmp = dsrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, dsrc)
        print(f"variant 'hugedoc' applied to {dsrc}")
        return

    if variant == "clustered":
        # Rewrites embeddings as a 16-component Gaussian MIXTURE so the
        # ANN-quality measurement runs in a regime where IVF can work
        # (VERDICT r6 #6): isotropic vectors give recall@5 ≈ 0.20 no
        # matter what the index does — a number that cannot catch an
        # IVF regression.  vec_ids 0..15 ARE the component centers
        # (matching the `vec_id < 16` seed-codebook convention of
        # sim_ann_ivf / sim_recall_at_k), the rest are center + small
        # noise, labels = component id.
        esrc = os.path.join(OUT, "embeddings.parquet")
        t = pq.read_table(esrc)
        n = t.num_rows
        out = clustered_embeddings(4243, n, DIM, 16)
        tmp = esrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, esrc)
        print(f"variant 'clustered' applied to {esrc}")
        return

    if variant == "nanvec":
        # Component-level poison at deterministic positions (same rows
        # every seed): row%50==0 → NaN at dim (row%DIM), row%100==1 →
        # +Inf, row%250==3 → -Inf, row 11 → ALL NaN.  Unlike zerovec
        # (whole-norm pathologies) this probes element-wise kernels:
        # a single NaN component must cost that VECTOR, not the
        # centroid/topk/cluster that touches it.
        esrc = os.path.join(OUT, "embeddings.parquet")
        t = pq.read_table(esrc)
        emb = np.array([np.asarray(v, dtype="float32")
                        for v in t["embedding"].to_pylist()])
        n, dim = emb.shape
        for r in range(0, n, 50):
            emb[r, r % dim] = np.nan
        for r in range(1, n, 100):
            emb[r, (r * 7) % dim] = np.inf
        for r in range(3, n, 250):
            emb[r, (r * 13) % dim] = -np.inf
        if n > 11:
            emb[11, :] = np.nan
        out = pa.table({
            "vec_id": t["vec_id"],
            "embedding": pa.array([v.tolist() for v in emb],
                                  pa.list_(pa.float32())),
            "label": t["label"],
        })
        tmp = esrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, esrc)
        print(f"variant 'nanvec' applied to {esrc}")
        return

    if variant == "zerovec":
        # Rewrites embeddings.parquet: deterministic positions so every
        # seed corrupts the same rows (reproducible across re-runs).
        esrc = os.path.join(OUT, "embeddings.parquet")
        t = pq.read_table(esrc)
        emb = np.array([np.asarray(v, dtype="float32")
                        for v in t["embedding"].to_pylist()])
        n = len(emb)
        zero_rows = list(range(0, n, 20))          # 5% all-zero
        tiny_rows = list(range(7, n, 20))          # 5% denormal-tiny
        emb[zero_rows] = 0.0
        # 1e-42 is subnormal in float32; the SQUARED value underflows
        # to 0.0 in float32 (and to ~1e-84 in float64) — probes both
        # sum-of-squares precision paths.
        emb[tiny_rows] = np.float32(1e-42)
        if len(zero_rows) >= 2:                    # duplicated zero pair
            emb[zero_rows[1]] = emb[zero_rows[0]]
        out = pa.table({
            "vec_id": t["vec_id"],
            "embedding": pa.array([v.tolist() for v in emb],
                                  pa.list_(pa.float32())),
            "label": t["label"],
        })
        tmp = esrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, esrc)
        print(f"variant 'zerovec' applied to {esrc}")
        return

    if variant == "multibyte":
        # Rewrites DOCUMENTS with mixed-script UTF-8 text (2/3/4-byte
        # chars), preserving the default corpus's engineered shapes.
        # Exercises every char-vs-byte seam at once: byte-range frame
        # slicing that SPLITS a multibyte char across frames,
        # md5-of-token hashing (UTF-8 byte input on both engines),
        # lower()/substr() code-point semantics, n_chars (code points)
        # vs octet_length (bytes) diverging per row.
        dsrc = os.path.join(OUT, "documents.parquet")
        t = pq.read_table(dsrc)
        texts = multibyte_texts(t.num_rows, 20240814)
        out = pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array(texts),
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp = dsrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, dsrc)
        print(f"variant 'multibyte' applied to {dsrc}")
        return

    if variant == "dupdocs":
        dsrc = os.path.join(OUT, "documents.parquet")
        t = pq.read_table(dsrc)
        n = t.num_rows
        long_text = " ".join(
            ["the quick brown fox jumps over the lazy dog and then"] * 4
        )
        texts = [("", "two words", long_text)[i % 3] for i in range(n)]
        _assert_ascii(texts)
        out = pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array(texts),
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
        tmp = dsrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, dsrc)
        print(f"variant 'dupdocs' applied to {dsrc}")
        return

    if variant == "manysrc":
        # Catalog-grain stress: the source-grain operators (Hamilton
        # apportionment, epoch schedule, PSI drift, domain weights)
        # assume the source CATALOG is orders of magnitude below task
        # capacity — their GLOBAL_WINDOW_ALLOW budgets rest on it.
        # A 100 TB crawl can carry tens of thousands of registrable
        # domains; this variant widens the catalog to ~2,000 distinct
        # sources (≈1 doc per source at the default size, a worst-case
        # skewless catalog), probing exact-integer apportionment with
        # thousands of remainder ties and window inputs 3 orders wider
        # than the fixed corpus's 4 sources.
        dsrc = os.path.join(OUT, "documents.parquet")
        t = pq.read_table(dsrc)
        n = t.num_rows
        doc_ids = t["doc_id"].to_pylist()
        srcs = [f"src{(d * 2654435761) % 2000:04d}" for d in doc_ids]
        out = pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "lang": t["lang"],
            "source": pa.array(srcs),
            "n_chars": t["n_chars"],
        })
        tmp = dsrc + ".variant"
        pq.write_table(out, tmp)
        os.replace(tmp, dsrc)
        print(f"variant 'manysrc' applied to {dsrc} ({n} docs, 2000 sources)")
        return

    src = os.path.join(OUT, "events.parquet")
    if variant == "pre1970":
        sql = f"""
        SELECT event_id, ts - INTERVAL 59 YEAR AS ts, user_id,
               event_type, value, props
        FROM read_parquet('{src}')"""
    elif variant == "badjson":
        sql = f"""
        SELECT event_id, ts, user_id, event_type, value,
               CASE event_id % 20
                 WHEN 0 THEN '{{bad'
                 WHEN 1 THEN ''
                 WHEN 2 THEN 'not json at all'
                 WHEN 3 THEN '[1,2'
                 WHEN 4 THEN '{{"x": 3}}'
                 WHEN 5 THEN '{{"k": "abc"}}'
                 WHEN 6 THEN '{{"k": "7"}}'
                 WHEN 7 THEN '{{"k": 12.5}}'
                 WHEN 8 THEN '{{"k": {{"a": 1}}}}'
                 WHEN 9 THEN '{{"k": [1, 2, 3]}}'
                 WHEN 10 THEN '{{"k": null}}'
                 WHEN 11 THEN '{{"k": true}}'
                 WHEN 12 THEN NULL
                 ELSE props END AS props
        FROM read_parquet('{src}')"""
    elif variant == "futuredates":
        # One corrupt clock in a 100 TB feed: ~0.75% of events carry a
        # far-future timestamp.  Three poison flavors, each probing a
        # different cliff: year 2500 (past pandas' datetime64[ns]
        # 2262-04-11 ceiling → any Arrow/pandas kernel or toPandas()
        # fetch that receives the raw column dies), 9999-12-30 (one day
        # under the SQL timestamp max → date arithmetic overflow and
        # max-date scalar-anchor spine explosion), and 2262-04-12 (the
        # first nanosecond-overflow instant — exactly one ns past the
        # cliff).  Both engines store us-precision int64 natively, so
        # every JVM/DuckDB-side query must agree; the only legitimate
        # casualties are Python-boundary conversions, which must cost
        # the poisoned CELL, never the JOB.
        sql = f"""
        SELECT event_id,
               CASE event_id % 400
                 WHEN 0 THEN ts + INTERVAL 476 YEAR
                 WHEN 1 THEN TIMESTAMP '9999-12-30 23:59:59'
                 WHEN 2 THEN TIMESTAMP '2262-04-12 00:00:00'
                 ELSE ts END AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{src}')"""
    elif variant == "nanvalues":
        sql = f"""
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 50 = 0 THEN 'NaN'::DOUBLE
                    WHEN event_id % 100 = 1 THEN 'Infinity'::DOUBLE
                    WHEN event_id % 100 = 51 THEN '-Infinity'::DOUBLE
                    ELSE value END AS value,
               props
        FROM read_parquet('{src}')"""
    elif variant == "ties":
        sql = f"""
        SELECT event_id, TIMESTAMP '2024-01-15 12:00:00' AS ts, user_id,
               event_type, CAST(value::INT % 7 AS DOUBLE) AS value, props
        FROM read_parquet('{src}')"""
    elif variant == "hostile":
        sql = f"""
        SELECT event_id,
               TIMESTAMP '1990-06-15 00:00:00'
                 + (event_id * event_id % 40177) * INTERVAL 1 HOUR
                 + (event_id % 3600) * INTERVAL 1 SECOND AS ts,
               0 AS user_id, event_type, value - 160.0 AS value, props
        FROM read_parquet('{src}')"""
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    tmp = src + ".variant"
    duckdb.sql(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
    os.replace(tmp, src)
    print(f"variant '{variant}' applied to {src}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20240814)
    if len(sys.argv) > 2 and sys.argv[2] != "default":
        apply_variant(sys.argv[2])
