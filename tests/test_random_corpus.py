"""Guards for the two round-6 randomized-verification bug classes.

``tools/gen_random_sf.py`` + ``tools/verify_local.py`` replay the full
registry on seeded random data; that sweep found (1) session-TZ
coercion corrupting the DST skipped hour in five queries and (2) a
minhash signature whose 128 slots were all correlated.  The full sweep
is a tool run (too heavy for CI); these tests pin each class
permanently at a fraction of the cost.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


# -- class 2: minhash signature quality --------------------------------


def _rand_sigs(rng, n_shingles, jaccard):
    """Two equal-size shingle sets with ~the given Jaccard, plus their
    signatures.  |A|=|B|=n, |A∪B|=u=2n/(1+J), |A∩B|=2n-u."""
    from getdbt_spark.pipeline import MINHASH_N, _mix64

    seeds = _mix64(np.arange(1, MINHASH_N + 1, dtype=np.uint64))
    u = int(round(2 * n_shingles / (1 + jaccard)))
    union = np.unique(rng.integers(0, 2**63, u, dtype=np.uint64))
    n_inter = 2 * n_shingles - len(union)
    a = np.concatenate([union[:n_inter], union[n_inter:n_shingles]])
    b = np.concatenate([union[:n_inter], union[n_shingles:]])
    sig = lambda sh: _mix64(sh[:, None] ^ seeds[None, :]).min(axis=0)  # noqa: E731
    true_j = n_inter / len(union)
    return sig(a), sig(b), true_j


def test_minhash_slot_match_tracks_jaccard():
    """E[matching slots]/128 must equal J — the property the old
    non-wrapping ``min(lo + i*hi)`` scheme violated catastrophically
    (measured 1/128 at J=0.94).  Tolerance is ~4σ of Binomial(128, J)."""
    rng = np.random.default_rng(7)
    for j_target in (0.5, 0.8, 0.94):
        fracs = []
        for _ in range(20):
            sa, sb, true_j = _rand_sigs(rng, 200, j_target)
            fracs.append((sa == sb).mean())
        mean_frac = float(np.mean(fracs))
        assert abs(mean_frac - true_j) < 0.08, (
            f"J={true_j:.3f} but mean slot-match {mean_frac:.3f} — "
            "signature slots are not behaving as independent permutations"
        )


def test_minhash_banding_finds_high_jaccard_pairs():
    """A J>=0.9 pair must band-collide (p_miss ~ 1e-50); 100 trials."""
    from getdbt_spark.pipeline import LSH_ROWS

    rng = np.random.default_rng(11)
    misses = 0
    for _ in range(100):
        sa, sb, _ = _rand_sigs(rng, 150, 0.92)
        bands = (sa == sb).reshape(-1, LSH_ROWS).all(axis=1)
        misses += not bands.any()
    assert misses == 0, f"{misses}/100 high-similarity pairs missed by banding"


# -- class 1: DST skipped-hour parity ----------------------------------


@pytest.fixture(scope="session")
def dst_sf(spark, tmp_path_factory):
    """sf0.001 corpus with events REPLACED by a transition-straddling
    feed: wall times inside and around the Europe/Amsterdam skipped
    hour (2024-03-31 02:00→03:00) and the repeated hour (2024-10-27)."""
    import datetime as dt
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("dst_sf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        # single FILES (DuckDB's read_parquet pattern expects files,
        # not Spark part-directories)
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )
    base_days = [dt.datetime(2024, 3, 30, 22), dt.datetime(2024, 10, 26, 22)]
    ids, tss, users, types, values, props = [], [], [], [], [], []
    i = 0
    for b in base_days:
        for step in range(120):  # 10-min grid across each transition night
            ids.append(i)
            tss.append(b + dt.timedelta(minutes=10 * step))
            users.append(i % 15)
            types.append(
                ["view", "click", "purchase", "signup", "error"][i % 5]
            )
            values.append(round((i % 320) + 0.25, 2))
            props.append('{"k": %d}' % (i % 100))
            i += 1
    pq.write_table(
        pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": types,
            "value": pa.array(values, pa.float64()),
            "props": props,
        }),
        f"{out}/events.parquet",
    )
    return out


DST_SENSITIVE = [
    "fn_datetime_pipeline",
    "agg_ohlc_bars",
    "streaming_sliding_stats",
    "streaming_session_stats",
    "agg_interarrival_stats",
    "win_session_longest",
    "agg_time_to_convert",
    "agg_funnel_in_session",
    "join_asof_nearest",
    "fn_generate_timestamp_array",
    "model_integral_reporting_tvbroadcasts",
    "model_streams_daily_v4",
]


@pytest.mark.slow
def test_dst_skipped_hour_matches_oracle(spark, dst_sf):
    """Every wall-clock-arithmetic query must hash-match the DuckDB
    oracle on a corpus where events sit INSIDE the skipped hour — the
    round-6 class where Spark's session-TZ coercion bumped 02:xx wall
    times +1h (a 5-minute broadcast measured 65 minutes)."""
    import verify_local as V

    from getdbt_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    con = V.duck_con(dst_sf)
    bad = []
    for qid in DST_SENSITIVE:
        ok, _spd, _dkd = V.compare(
            qid, QUERIES[qid](spark, dst_sf), con, ORACLES.get(qid),
            verbose=False,
        )
        if not ok:
            bad.append(qid)
    assert not bad, f"DST-corpus oracle divergence: {bad}"


# -- multibyte UTF-8 corpus: char-vs-byte oracle parity ------------------


@pytest.fixture(scope="session")
def multibyte_sf(tmp_path_factory):
    """sf0.001 corpus with documents REPLACED by mixed-script UTF-8
    texts (2/3/4-byte chars, astral emoji) — chars ≠ bytes on 99% of
    rows, so any oracle or kernel that conflates code points with
    bytes (the r6 ASCII-invariant class) hash-diverges here."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gen_random_sf import multibyte_texts

    out = str(tmp_path_factory.mktemp("mb_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )
    texts = multibyte_texts(400)
    assert sum(not t.isascii() for t in texts) > 300
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(
                [("en", "de", "zh", "ru")[i % 4] for i in range(len(texts))]
            ),
            "source": pa.array([f"src{i % 7}" for i in range(len(texts))]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        f"{out}/documents.parquet",
    )
    return out


# Every char-vs-byte seam: byte-offset frame slicing (can split a
# multibyte char across frames), md5-of-token (UTF-8 byte input both
# engines), lower()/substr() code-point prefixes, n_chars (code
# points) vs octet_length (bytes), whitespace tokenization, per-char
# n-gram shingles.
MB_SENSITIVE = [
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_audio_chunks",
    "multimodal_scene_cuts",
    "text_token_stats",
    "text_normalize",
    "text_chunk_windows",
    "text_compression_ratio",
    "dedup_exact_prefix",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_paragraph_dedup",
    # round-8 curation family: md5-of-token bucketing, whitespace
    # tokenization, and char-count features over multibyte text
    "dedup_substring_spans",
    "dsir_importance_weights",
    "quality_logreg_score",
    "bpe_pair_stats",
    "text_hashed_ngram_features",
    "doc_winnow_fingerprints",
    # round-9 additions sharing the same md5-of-token / lower() /
    # regex-tokenization seams (BPE_TOKEN_RE treats every non-ascii
    # char as a single-char token — both engines must agree)
    "dedup_winnow_match",
    "dedup_winnow_cluster",
    "bpe_encode",
    "bpe_merge_table",
    "pack_bpe_budget",
    "dsir_resample",
    # round-10 additions on the same seams: md5-of-token bucketing
    # (NB filter, token drift), md5(doc_id:pos) over whitespace-token
    # positions (span corruption), the k-gram machinery (substring
    # remove), the BPE chain + char counts (fertility)
    "quality_nb_train",
    "quality_nb_score",
    "aug_span_corruption",
    "dq_psi_token_drift",
    "dedup_substring_remove",
    "bpe_fertility",
]


@pytest.mark.slow
def test_multibyte_corpus_matches_oracle(spark, multibyte_sf):
    """The byte-arithmetic oracles were rewritten from char-as-byte to
    true UTF-8 byte expansion (_utf8_bytes_sql, r7 ADVICE); this pins
    the whole text/multimodal family hash-green on a corpus where the
    two differ on nearly every row."""
    import verify_local as V

    from getdbt_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    con = V.duck_con(multibyte_sf)
    bad = []
    for qid in MB_SENSITIVE:
        ok, _spd, _dkd = V.compare(
            qid, QUERIES[qid](spark, multibyte_sf), con, ORACLES.get(qid),
            verbose=False,
        )
        if not ok:
            bad.append(qid)
    assert not bad, f"multibyte-corpus oracle divergence: {bad}"


# -- ANN quality on a CLUSTERED embedding space -------------------------


@pytest.fixture(scope="session")
def clustered_emb_sf(tmp_path_factory):
    """Embeddings-only corpus in the clustered regime (VERDICT r6 #6):
    a 16-component Gaussian mixture whose centers are vec_ids 0..15 —
    the regime where an IVF index is SUPPOSED to work.  The driver's
    isotropic corpus measures recall ≈ 0.20 by construction (neighbors
    rarely share 1 of 16 centroids at nprobe=1), so it validates
    plumbing but cannot catch an IVF regression; this one can."""
    import pyarrow.parquet as pq

    from gen_random_sf import clustered_embeddings

    out = str(tmp_path_factory.mktemp("clustered_emb"))
    pq.write_table(
        clustered_embeddings(4243, 500, 64, 16), f"{out}/embeddings.parquet"
    )
    return out


@pytest.mark.slow
def test_ivf_recall_high_on_clustered_embeddings(spark, clustered_emb_sf):
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    row = QUERIES["sim_recall_at_k"](spark, clustered_emb_sf).collect()[0]
    assert row["n_queries"] == 500
    # Well-separated mixture + centers as the codebook: a correct IVF
    # must recover nearly all exact neighbors at nprobe=1.  0.8 leaves
    # headroom for boundary vectors whose top-5 straddles components.
    assert row["recall_at_5"] >= 0.8, (
        f"IVF recall@5 {row['recall_at_5']} < 0.8 on a clustered space — "
        "the index is broken in the regime it exists for"
    )
