"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine` — JVM-side cosine via ``zip_with`` + ``aggregate`` (no
  Python, whole-stage codegen).
* :func:`brute_force_topk` — exact top-k: broadcast the (small) query set
  against the corpus; one pass, no quadratic shuffle. The correctness
  baseline.
* :func:`lsh_ann_topk` — random-hyperplane LSH: P deterministic
  pseudo-random planes (seeded integer arithmetic, reproducible) → P sign
  bits → bucket id; queries probe their own bucket (plus optional
  multi-probe neighbors at Hamming distance 1). The 100 TB path: the
  corpus is bucketed once (one shuffle), each query touches ~corpus/2^P.
* :func:`ivf_fit_centroids` / :func:`ivf_ann_topk` — IVF-Flat: a
  deterministic Lloyd's-k-means coarse quantizer partitions the corpus
  into data-dependent cells; queries probe the ``n_probe`` nearest cells
  via an equi-join. The data-adaptive counterpart to the LSH path (cells
  follow cluster structure; recall tunes with n_probe at a fixed index).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return dot / (norm(a) * norm(b))


def norm(a: Column) -> Column:
    """L2 norm — the exact sub-expression :func:`cosine` uses, exposed so
    pair-scoring paths can precompute it once per ROW before a join
    instead of once per PAIR after it (higher-order array functions are
    interpreted per element, not codegen'd: at k queries that is k× the
    norm work on every corpus row — guide §2.3 shuffle/compute fewer
    bytes early). Same fold, same order ⇒ bit-identical doubles."""
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (excluding itself).

    Norms are computed per ROW on each side before the cross-join (the
    corpus norm otherwise re-evaluates per (query, corpus) pair — k× the
    interpreted higher-order-function work); only the dot product is
    per-pair. Same fold order as :func:`cosine` ⇒ identical doubles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"), norm(F.col(emb_col)).alias("q_nrm")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"), norm(F.col(emb_col)).alias("c_nrm")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim)).round(6).tolist()


def bucket_ids(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from P hyperplanes (deterministic literals)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in plane])
        dot = F.aggregate(F.zip_with(emb, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _infer_dim(df: DataFrame, emb_col: str) -> int:
    """Fallback embedding-dim inference — costs one extra Spark job and a
    driver hop, so hot paths should pass ``dim`` explicitly."""
    row = df.select(emb_col).filter(F.col(emb_col).isNotNull()).first()
    if row is None:
        raise ValueError(
            f"cannot infer embedding dim: no non-null '{emb_col}' rows; pass dim= explicitly"
        )
    return len(row[0])


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with
    the query in ANY of ``n_tables`` independent hash tables are scored
    (multi-table LSH; ``multiprobe`` additionally probes the Hamming-1
    neighbor buckets of each table). Recall/cost is tuned by
    (n_planes, n_tables): more planes → smaller buckets, more tables →
    higher recall. Candidate generation is one equi-join per table keyed
    on (table, bucket) — linear, never quadratic. Pass ``dim`` (the
    embedding length) to keep the plan fully lazy — omitting it costs an
    extra inference job."""
    if dim is None:
        dim = _infer_dim(corpus, emb_col)
    # ALL tables' bucket keys are computed in ONE pass and exploded —
    # a union of per-table selects would scan the corpus n_tables times
    # (the difference between 1× and 8× input I/O at 100 TB)
    tables = [_planes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)]
    c_entries = F.array(
        *[
            F.named_struct(
                F.lit("tbl"), F.lit(t), F.lit("bucket"), bucket_ids(F.col(emb_col), planes)
            )
            for t, planes in enumerate(tables)
        ]
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),  # once per corpus row, BEFORE the explode
        F.explode(c_entries).alias("tb"),
    ).select("neighbor_id", "c_emb", "c_nrm", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    def q_buckets(t: int, planes) -> list[Column]:
        base = bucket_ids(F.col(emb_col), planes)
        probes = [base]
        if multiprobe:
            probes += [base.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        return [F.named_struct(F.lit("tbl"), F.lit(t), F.lit("bucket"), b) for b in probes]

    q_entries = F.array(*[s for t, planes in enumerate(tables) for s in q_buckets(t, planes)])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_nrm"),
        F.explode(q_entries).alias("tb"),
    ).select("query_id", "q_emb", "q_nrm", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "q_nrm", "c_emb", "c_nrm")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim", _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    ``method="lsh"`` (default — the scale path): both sides are bucketed by
    ``n_tables`` independent random-hyperplane tables; only same-(table,
    bucket) pairs are candidate-joined (EQUI-join, linear shuffle) and then
    exactly cosine-verified. Approximate recall — a true pair colliding in
    no table is missed; recall rises with ``n_tables`` and falls with
    ``n_planes`` (recall floor per pair at angle θ: 1-(1-(1-θ/π)^P)^T).

    ``method="exact"``: all-pairs nested-loop — O(n²), the small-scale
    verify/oracle path ONLY (same role as ``ngram_jaccard_pairs`` next to
    MinHash-LSH). Never run it on a real corpus.
    """
    if method == "exact":
        a = df.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"), norm(F.col(emb_col)).alias("n_a"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"), norm(F.col(emb_col)).alias("n_b"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", _dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        )
    assert method == "lsh", method
    if dim is None:
        dim = _infer_dim(df, emb_col)
    # one corpus pass for all tables (explode, not union — see lsh_ann_topk)
    tables = [_planes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)]
    entries = F.array(
        *[
            F.named_struct(
                F.lit("tbl"), F.lit(t), F.lit("bucket"), bucket_ids(F.col(emb_col), planes)
            )
            for t, planes in enumerate(tables)
        ]
    )
    keyed = df.select(
        F.col(id_col), F.col(emb_col), norm(F.col(emb_col)).alias("nrm"), F.explode(entries).alias("tb")
    ).select(id_col, emb_col, "nrm", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    a = keyed.select(
        F.col("tbl"), F.col("bucket"), F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"), F.col("nrm").alias("n_a")
    )
    b = keyed.select(
        F.col("tbl"), F.col("bucket"), F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"), F.col("nrm").alias("n_b")
    )
    cand = (
        a.join(b, ["tbl", "bucket"])  # equi-join per (table, bucket): linear, never a nested loop
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos_sim", _dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


# ----------------------------------------------------------------- IVF-Flat


def _centroid_arr(centroids: list[list[float]]) -> Column:
    """Centroids as a literal array<array<double>> (bounded model state —
    k×dim scalars baked into the plan, the same pattern as the LSH
    plane literals)."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def _dist_idx_arr(emb: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d,double idx,int>> of squared-L2 distances to every
    centroid — struct comparison orders by the leading field, so
    ``array_min`` / ``array_sort`` give argmin / probe order JVM-side."""
    cols = []
    for i, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(emb, arr, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, x: a + x
        )
        # named_struct: alias-inside-struct does not survive for aggregate
        # lambda expressions (fields came out col1/col2)
        cols.append(F.named_struct(F.lit("d"), d, F.lit("idx"), F.lit(i)))
    return F.array(*cols)


def ivf_assign(emb: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (the IVF coarse quantizer) — pure JVM exprs."""
    return F.array_min(_dist_idx_arr(emb, centroids))["idx"]


def ivf_fit_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the ``n_centroids`` corpus vectors with the smallest
    ``xxhash64(id, seed)`` — a seeded uniform data sample with no RNG
    state. Each iteration is two distributed passes: (1) assign every
    vector to its nearest centroid (JVM argmin over centroid literals),
    (2) per-cluster mean via ``posexplode`` + one groupBy — the shuffle
    carries (cluster, pos, component), ~12 B/row. Only the k×dim centroid
    matrix ever reaches the driver (bounded model state, like a fitted
    scaler — NOT per-row data). Empty clusters keep their previous
    centroid. At 100 TB, fit on a deterministic sample via
    ``sample_mod=m`` (keeps rows where ``xxhash64(id, seed) % m == 0`` —
    a ~1/m VALUE-keyed sample, reproducible regardless of partitioning,
    unlike ``DataFrame.sample``); assignment stays a full-scan column
    expression.
    """
    if sample_mod:
        corpus = corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 7)), F.lit(sample_mod)) == 0
        )
    sample = (
        corpus.select(F.col(emb_col).alias("e"), F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r["e"]] for r in sample]
    if not centroids:
        raise ValueError("ivf_fit_centroids: corpus (after sampling) is empty")
    # a corpus smaller than n_centroids can only seed len(corpus) cells —
    # clamp instead of indexing past the init sample on the update step
    n_centroids = len(centroids)
    for _ in range(iters):
        assigned = corpus.select(
            ivf_assign(F.col(emb_col), centroids).alias("c"), F.posexplode(F.col(emb_col))
        )
        means = (
            assigned.groupBy("c", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("c")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("c", F.transform("pm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        new = {r["c"]: [float(x) for x in r["centroid"]] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(n_centroids)]
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k (the inverted-file counterpart to
    :func:`lsh_ann_topk`): the corpus is partitioned once by nearest
    centroid (one column expression, one shuffle key); each query scores
    only the ``n_probe`` nearest cells. Candidate generation is an
    EQUI-join on the cell id — each query touches ~corpus×(n_probe/k_c)
    vectors, never the full corpus. Exact cosine + windowed top-k on the
    candidates. Data-dependent cells adapt to cluster structure, which
    random hyperplanes cannot; recall is tuned by ``n_probe`` alone at a
    fixed index."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),
        ivf_assign(F.col(emb_col), centroids).alias("cell"),
    )
    probes = F.slice(F.array_sort(_dist_idx_arr(F.col(emb_col), centroids)), 1, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_nrm"),
        F.explode(F.transform(probes, lambda s: s["idx"])).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
