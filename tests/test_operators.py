"""Operator-level unit tests with inline golden values — the reference's
test strategy (SURVEY.md §5.1): pure operator, known input, exact output."""

import hashlib
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline_spark.operators import dedup as D
from pipeline_spark.operators import similarity as S
from pipeline_spark.operators.detector import ALPHA, detect_changes_batch, ewma_final_means
from pipeline_spark.operators.lww import lww_latest
from pipeline_spark.operators.multimodal import extract_media_meta


# ---------------------------------------------------------------- dedup

def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 0
        (2, "one two three four five six seven eight"),
        (3, "one two three four five six seven eight"),  # exact dup of 2
        (4, "completely different words entirely unrelated text here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r["keep_id"]: r["dup_count"] for r in D.exact_dedup(_docs(spark)).collect()}
    assert out[2] == 2  # docs 2,3 identical → kept id 2
    assert out[0] == 1 and out[1] == 1 and out[4] == 1


def test_ngram_jaccard_exact_values(spark):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(_docs(spark), threshold=0.5, n=1).collect()}
    assert out[(2, 3)] == 1.0
    assert out[(0, 1)] == pytest.approx(7 / 9)  # |∩|=7, |∪|=9
    assert (0, 4) not in out


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_dedup_pairs(_docs(spark), threshold=0.5, bands=8, rows=2, n=1).collect()}
    assert (2, 3) in pairs  # identical docs always collide
    assert (0, 1) in pairs  # jaccard 0.78 → P(collision) ≈ 1 at b=8,r=2
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_simhash_hamming_locality(spark):
    from pipeline_spark.functions import simhash64_udf

    d = _docs(spark).select("doc_id", simhash64_udf(F.col("text")).alias("simhash"))
    sims = {r["doc_id"]: r["simhash"] for r in d.collect()}
    assert sims[2] == sims[3]  # identical text → identical simhash
    ham = bin((sims[0] ^ sims[1]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((sims[0] ^ sims[4]) & ((1 << 64) - 1)).count("1")
    assert ham < ham_far  # near-dup closer in Hamming space


def _simhash_naive(t: str) -> int:
    """Pure-Python twin of simhash64_udf (the pre-vectorization form) —
    golden for the numpy implementation."""
    v = [0] * 64
    for tok in t.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        for i in range(64):
            v[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def test_simhash_vectorized_matches_naive(spark):
    from pipeline_spark.functions import simhash64_udf

    texts = [
        "alpha beta gamma delta",
        "alpha alpha alpha beta",  # repeated tokens count per occurrence
        "",  # no tokens → 0
        "one",
        None,  # null passthrough
        "unicode é中文 mixed 123 tokens",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["s"] for r in df.select("i", simhash64_udf("text").alias("s")).collect()}
    for i, t in enumerate(texts):
        exp = None if t is None else _simhash_naive(t)
        assert got[i] == exp, f"text {i}: {got[i]} != {exp}"


def test_simhash_banding_exact_for_radius(spark):
    """The ≤d contract: banded candidate generation must find EVERY pair at
    Hamming distance ≤ d (pigeonhole over d+1 bands), for a non-default d."""
    import itertools

    base = 0x0123456789ABCDEF
    # neighbors at controlled distances from base: flip 1..7 bits
    vals = [base] + [base ^ sum(1 << (9 * j + 3) for j in range(m)) for m in range(1, 8)]
    rows = [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    d = 5
    got = {(r["id_a"], r["id_b"]) for r in D.simhash_near_dup_pairs(df, max_hamming=d).collect()}
    exp = set()
    for (ia, va), (ib, vb) in itertools.combinations(enumerate(vals), 2):
        if bin((va ^ vb) & ((1 << 64) - 1)).count("1") <= d:
            exp.add((min(ia, ib), max(ia, ib)))
    assert got == exp


# ------------------------------------------------------------ similarity

def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    qs = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"]) for r in S.brute_force_topk(emb, qs, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_ann_topk(emb, qs, k=5, n_planes=4, n_tables=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall} too low"


def test_ivf_ann_recall_and_determinism(spark, sf_dir):
    """IVF-Flat: deterministic fit (same seed → identical centroids),
    candidate subset exactness (scores are true cosines), and recall vs
    brute force at moderate n_probe. Full-probe IVF (n_probe = k_c) must
    equal brute force exactly — every cell is scanned."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    qs = emb.filter(F.col("vec_id") < 10)
    cents = S.ivf_fit_centroids(emb, n_centroids=8, iters=2)
    assert cents == S.ivf_fit_centroids(emb, n_centroids=8, iters=2)  # deterministic
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # a corpus smaller than n_centroids clamps k instead of crashing on
    # the centroid-update indexing (review finding r4)
    tiny = emb.filter(F.col("vec_id") < 5)
    small = S.ivf_fit_centroids(tiny, n_centroids=16, iters=1)
    assert len(small) == 5
    # value-keyed sampling selects the same rows under any partitioning
    # (means may differ in last ulps from float summation order)
    import numpy as np
    cs = S.ivf_fit_centroids(emb, n_centroids=4, iters=1, sample_mod=2)
    cs2 = S.ivf_fit_centroids(emb.repartition(7), n_centroids=4, iters=1, sample_mod=2)
    assert np.allclose(np.array(cs), np.array(cs2), atol=1e-9)

    exact = {(r["query_id"], r["neighbor_id"]) for r in S.brute_force_topk(emb, qs, k=5).collect()}
    approx_rows = S.ivf_ann_topk(emb, qs, cents, k=5, n_probe=3).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall} too low"

    full = {(r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
            for r in S.ivf_ann_topk(emb, qs, cents, k=5, n_probe=8).collect()}
    brute = {(r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
             for r in S.brute_force_topk(emb, qs, k=5).collect()}
    assert full == brute  # probing every cell == exhaustive search


def test_near_dup_lsh_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    exact = {(r["id_a"], r["id_b"]) for r in S.embedding_near_dup_pairs(emb, threshold=0.3, method="exact").collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           S.embedding_near_dup_pairs(emb, threshold=0.3, method="lsh", n_planes=4, n_tables=16, dim=64).collect()}
    assert lsh <= exact  # candidates are exactly verified → no false positives
    assert exact, "test needs true pairs at this threshold"
    recall = len(lsh) / len(exact)
    assert recall >= 0.6, f"near-dup LSH recall {recall} too low"


def test_weighted_sample_grouped_and_global_consistent(spark, sf_dir):
    """Global top-k (TakeOrderedAndProject path) must select exactly the
    k best A-ExpJ keys — cross-checked against the window-ranked form."""
    from pipeline_spark.operators.sampling import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("n_chars") > 0)
    got = {r["doc_id"] for r in weighted_sample(d, k=15, weight_col="n_chars", id_col="doc_id").collect()}
    per_lang = weighted_sample(d, k=3, weight_col="n_chars", id_col="doc_id", by=["lang"])
    counts = {r["lang"]: r["n"] for r in per_lang.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(got) == 15
    assert all(n <= 3 for n in counts.values())


def test_cosine_golden(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<double>, b array<double>")
    got = [r[0] for r in df.select(S.cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """A3 approx variant: HLL estimate within ~3×rsd of the exact count."""
    import __spark_entry__ as entry_mod

    got = entry_mod.queries()["global_stats_approx"](spark, sf_dir).collect()[0]
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = e.select(F.countDistinct("user_id"), F.countDistinct("event_type")).collect()[0]
    assert abs(got["n_users_approx"] - exact[0]) <= max(3, 0.06 * exact[0])
    assert abs(got["n_types_approx"] - exact[1]) <= max(1, 0.06 * exact[1])


# -------------------------------------------------------------- detector

def test_ewma_golden_series(spark):
    """Hand-checkable fold: constant x=1 crosses upper=0.1 at n=6 because
    mean_n = 1-(0.98**n): 0.98**5=0.9039→0.0961<0.1, 0.98**6→0.1141>0.1."""
    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(seconds=i), 1.0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double, event_id long")
    changes = detect_changes_batch(df, keys=["event_type"], ts_col="ts", value_col="value").collect()
    assert len(changes) == 1
    assert changes[0]["blocked"] is True
    assert changes[0]["ts"] == datetime(2024, 1, 1, 0, 0, 5)  # 6th point (0-indexed 5)
    assert changes[0]["mean"] == pytest.approx(1 - 0.98**6)

    final = ewma_final_means(df, keys=["event_type"], ts_col="ts", value_col="value").collect()[0]
    assert final["mean"] == pytest.approx(1 - 0.98**10)
    assert final["blocked"] is True and final["n"] == 10


def test_ewma_hysteresis_unblocks(spark):
    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(seconds=i), 1.0 if i < 10 else 0.0, i) for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double, event_id long")
    changes = sorted(detect_changes_batch(df, ["event_type"]).collect(), key=lambda r: r["ts"])
    assert [c["blocked"] for c in changes] == [True, False]  # flip on, then clear below 0.05


# ------------------------------------------------------------ multimodal

def test_media_meta_plumbing(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\nrest-of-png"),
        (2, b"\xff\xd8\xff\xe0jpegdata"),
        (3, b"plain text bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in extract_media_meta(df, "payload").collect()}
    assert out[1]["media_type"] == "image/png" and out[1]["byte_len"] == 19
    assert out[2]["media_type"] == "image/jpeg"
    assert out[3]["media_type"] == "application/octet-stream"
    assert out[4]["media_type"] is None and out[4]["byte_len"] is None
    assert out[1]["width"] == 1 + 0x89 % 64 and len(out[1]["feature"]) == 4


def test_media_decoder_dispatch(monkeypatch):
    """The decode branch is feature-gated: 'auto' picks PIL when it
    imports (simulated here — no codec libs in this container) and the
    deterministic stub otherwise; explicit names force a branch."""
    import io
    import sys
    import types

    from pipeline_spark.operators import multimodal as MM

    # this container: PIL absent → auto == stub
    assert MM.resolve_decoder("auto") is MM._decode_image_stub
    assert MM.resolve_decoder("stub") is MM._decode_image_stub
    assert MM.resolve_decoder("pil") is MM._decode_image_pil
    with pytest.raises(ValueError):
        MM.resolve_decoder("libvips")

    # simulate a cluster whose workers have PIL: auto flips to the real
    # branch, and the real branch decodes through the codec API
    class FakeImg:
        size = (640, 480)

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            assert wh == (2, 2)
            return self

        def getdata(self):
            return [10, 20, 30, 40]

    fake_pil = types.ModuleType("PIL")
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda buf: FakeImg()
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    assert MM.resolve_decoder("auto") is MM._decode_image_pil
    w, h, feat = MM._decode_image_pil(b"\x89PNG....")
    assert (w, h) == (640, 480) and feat == [10.0, 20.0, 30.0, 40.0]


def test_media_meta_real_branch_nulls_on_undecodable(spark):
    """With the real decoder forced where no codec exists, blobs must
    degrade to NULL metadata (codec rejection is data, not a crash) —
    magic-type and byte_len stay populated."""
    df = spark.createDataFrame([(1, b"\x89PNGnotreallyapng")], "id long, payload binary")
    r = extract_media_meta(df, "payload", decoder="pil").collect()[0]
    assert r["media_type"] == "image/png" and r["byte_len"] == 17
    assert r["width"] is None and r["feature"] is None


# -------------------------------------------------------------- functions

def test_trivial_id_matches_hashlib(spark):
    from pipeline_spark.functions import trivial_id_udf

    df = spark.createDataFrame([("20240101", b"hello")], "day string, raw binary")
    got = df.select(trivial_id_udf("day", "raw").alias("tid")).collect()[0]["tid"]
    assert got == "01" + "20240101" + hashlib.shake_128(b"hello").hexdigest(15)


def test_lww_salted_equals_unsalted(spark):
    import numpy as np

    rs = np.random.RandomState(7)
    rows = [(f"k{rs.randint(5)}", int(rs.randint(100)), int(i), float(rs.rand())) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, v long, off long, x double")
    a = {r["key"]: (r["v"], r["off"]) for r in lww_latest(df, "key", ["v", "off"]).collect()}
    b = {r["key"]: (r["v"], r["off"]) for r in lww_latest(df, "key", ["v", "off"], salt_buckets=8).collect()}
    assert a == b


def test_connected_components_hand_graph(spark):
    """Label propagation on a known graph: chains collapse to the min id,
    singletons label themselves."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    got = {r["doc_id"]: r["component"] for r in D.connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping makes convergence O(log diameter): a 60-node path
    graph (diameter 59) must converge well inside max_iter=25, where
    plain one-hop min propagation would need 59 rounds."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 60)], "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(1, 61)], "doc_id bigint")
    got = {r["doc_id"]: r["component"] for r in D.connected_components(edges, nodes).collect()}
    assert got == {i: 1 for i in range(1, 61)}
