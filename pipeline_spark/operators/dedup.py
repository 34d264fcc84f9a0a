"""Deduplication operators for web-scale training-data pipelines.

All stages are DataFrame-native so Catalyst plans them with partial
aggregation and AQE; nothing here collects to the driver.

* :func:`exact_dedup` — hash-groupBy exact dedup (md5 of the text).
* :func:`shingles` / :func:`ngram_jaccard_pairs` — exact n-gram Jaccard
  via shingle self-join (the verify stage / small-scale oracle-checkable
  path).
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash+LSH:
  per-row shingle set → K min-hashes (narrow array expressions, zero
  shuffles) → b bands → bucket join. The 100 TB path: cost is O(docs ×
  shingles) for signatures plus ONE shuffle keyed on (band, band
  signature); no quadratic blow-up. Candidates can then be verified with
  exact Jaccard (``array_intersect``) on the (tiny) candidate set.
* :func:`simhash_near_dup_pairs` — SimHash bucketing by 16-bit sub-keys
  (any pair within Hamming distance d<=3 shares at least one of 4 sub-keys
  — the classic pigeonhole trick), then exact Hamming check via
  ``bit_count(xor)``.
* :func:`embedding_near_dup_pairs` — cosine near-duplicates over an
  embedding column (delegates to operators.similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text (md5 grouping); adds
    ``dup_count``. Hash-groupBy → map-side partial agg, one shuffle."""
    h = F.md5(F.col(text_col)).alias("text_md5")
    return (
        df.select(F.col(id_col), h)
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def doc_shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-doc DISTINCT shingle set as ONE narrow projection:
    (id, shset: array<string>). ``array_distinct`` of the per-row gram
    array is equivalent to the global ``(id, shingle) DISTINCT`` whenever
    ``id_col`` is unique in ``df`` (a doc's shingles all come from its own
    row) — but it is a map-side expression, so the shingle relation costs
    ZERO shuffles instead of one distinct Exchange per consumer (r6
    optimization; the old explode→distinct shape put 26 Exchanges and 7
    document scans in the minhash plan)."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return df.select(F.col(id_col), F.array_distinct(grams).alias("shset"))


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle). Built with
    JVM array functions — no UDF, and (since r6) no shuffle: the per-row
    ``array_distinct`` replaces the global DISTINCT (equivalent for a
    unique ``id_col``, which every caller has)."""
    base = doc_shingle_sets(df, text_col, id_col, n)
    return base.select(F.col(id_col), F.explode("shset").alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold via shingle self-join.

    Quadratic in docs *sharing a shingle* — the exact/verify path. At scale
    use :func:`lsh_candidate_pairs` to generate candidates first and feed
    them here for verification.
    """
    sh = shingles(df, text_col, id_col, n).cache()
    # set size from the per-doc array — a narrow projection, not an
    # exploded-row count (one Exchange fewer per side, r6)
    sizes = doc_shingle_sets(df, text_col, id_col, n).select(
        F.col(id_col), F.size("shset").cast("long").alias("sz")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def _shingle_hash_sql(col: str, i: int, hash_basis: str) -> str:
    """SQL text for hash #i of a shingle column. Built as ONE ``F.expr``
    string per aggregate rather than nested Column calls: the k×(bands)
    expression fan-out makes py4j round-trips the dominant plan-BUILD
    cost (measured 3.7× faster as text, 0.26s → 0.07s for k=32), and
    this query's cost is fixed overhead, not data (see the cold-cost
    floor note in :func:`lsh_candidate_pairs`)."""
    if hash_basis == "xxhash64":
        return f"xxhash64(concat({col}, '#{i}'))"
    # md5 basis: first 8 digest bytes big-endian as unsigned decimal —
    # bit-identical to DuckDB's CAST('0x'||substr(md5(x),1,16) AS UBIGINT),
    # which makes the whole MinHash+LSH pipeline oracle-expressible in SQL
    assert hash_basis == "md5", hash_basis
    return f"CAST(conv(substring(md5(concat({col}, '#{i}')), 1, 16), 16, 10) AS DECIMAL(20,0))"


def minhash_signatures(
    df: DataFrame, k: int = 32, text_col: str = "text", id_col: str = "doc_id", n: int = 3,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """K min-hash values per doc: h_i = min(hash(shingle || i)).

    K ``array_min(transform(shset, ...))`` expressions over the per-doc
    shingle set — one narrow projection, NO explode, NO groupBy, NO
    shuffle (r6: the old explode + K-min-agg shape cost an Exchange and a
    two-level HashAggregate per consumer; per-element hash work is
    unchanged). ``hash_basis="xxhash64"`` (default) is the fast JVM path;
    ``"md5"`` trades ~2× hash cost for an exact DuckDB oracle twin.
    Docs whose shingle set is empty get NULL signatures (they previously
    vanished at the explode) — NULL band keys never match an equi-join,
    so candidate generation is unaffected.
    """
    base = doc_shingle_sets(df, text_col, id_col, n)
    cols = [
        F.expr(f"array_min(transform(shset, s -> {_shingle_hash_sql('s', i, hash_basis)})) AS mh{i}")
        for i in range(k)
    ]
    return base.select(F.col(id_col), *cols)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows: int = 4, id_col: str = "doc_id",
    hash_basis: str = "xxhash64", checkpoint: str = "none",
) -> DataFrame:
    """LSH banding: docs agreeing on all ``rows`` hashes of any band become
    a candidate pair. Band signatures are built as ONE array column and
    ``posexplode``d — a single evaluation of the (expensive) signature
    plan, vs a union of per-band scans that would recompute it ``bands``
    times. One shuffle keyed on (band, band-signature).

    ``checkpoint`` controls how the bucket relation is shared between the
    self-join sides: ``"none"`` (default) recomputes the signature plan
    per side — measured faster than materializing both cold (19.5-26.3s
    vs 29.9-37.3s, sf0.1, interleaved) and warm (1.7s vs 3.0s); the
    signatures are cheap JVM hash work, while a localCheckpoint pays
    executor-disk write+read of the whole bucket relation. ``"lazy"`` localCheckpoints it — worth
    it only when the UPSTREAM of the signatures is expensive (e.g. a
    non-reusable source or a heavy transform) and scanning it twice costs
    more than one materialization.

    Cold-cost floor: the plan+codegen overhead of this pipeline is
    sf-invariant (the bench query is 100 docs), so fresh-session cost is
    dominated by plan size. Round-4 profiling of the old
    explode/distinct/K-min-agg shape (BENCH/experiments/minhash_cold.py)
    measured ~9s cold regardless of checkpoint variant; the r6 array
    rewrite (per-row shingle sets, no shingle shuffle — 26 Exchanges →
    8, 7 scans → 4 for the full pair pipeline) cut the fresh-session
    first run to ~4s and the warm-session first run to ~2.5-4s (warm
    re-exec ~1.1s). Residual cold swing is codegen/host variance on the
    remaining fixed overhead — at real scale the same plan cost is
    amortized over the full corpus."""
    k = bands * rows
    assert all(f"mh{i}" in sigs.columns for i in range(k)), "need mh0..mh{k-1}"
    if hash_basis == "md5":
        def band_key(b):
            cols = ", ".join(f"CAST(mh{b * rows + r} AS STRING)" for r in range(rows))
            return f"md5(concat_ws('#', {cols}))"
    else:
        def band_key(b):
            cols = ", ".join(f"mh{b * rows + r}" for r in range(rows))
            return f"CAST(xxhash64({cols}) AS STRING)"
    band_arr = F.expr(f"array({', '.join(band_key(b) for b in range(bands))})")
    buckets = sigs.select(F.col(id_col), F.posexplode(band_arr).alias("band", "bsig"))
    if checkpoint == "lazy":
        buckets = buckets.localCheckpoint(eager=False)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "bsig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    bands: int = 8,
    rows: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hash_basis: str = "xxhash64",
    checkpoint: str = "none",
) -> DataFrame:
    """Full MinHash-LSH pipeline: candidates from banding, then exact
    Jaccard computed ONLY for the candidate pairs — the verify cost is
    O(candidates × shingles), never O(docs²).

    The verify stage (r6) joins each candidate pair back to the two docs'
    per-row shingle-set arrays and intersects them in place
    (``size(array_intersect(a, b))`` — hash-set intersection, O(|a|+|b|)
    per pair): identical counts to the old shingle-equality re-join +
    groupBy, with two joins + one aggregation Exchange fewer, and only
    ids ever cross a shuffle (the arrays stay where the docs are;
    candidates are the small side — guide §8's move-keys-not-payloads
    rule). The old 26-Exchange/7-scan plan shape also made the
    fresh-session plan+codegen cost (~9 s, sf-invariant) dominate the
    bench; this shape is 5 Exchanges / 3 scans."""
    sigs = minhash_signatures(df, bands * rows, text_col, id_col, n, hash_basis=hash_basis)
    cand = lsh_candidate_pairs(sigs, bands, rows, id_col, hash_basis=hash_basis, checkpoint=checkpoint)

    base = doc_shingle_sets(df, text_col, id_col, n)
    if checkpoint == "lazy":
        base = base.localCheckpoint(eager=False)
    a = base.select(F.col(id_col).alias("id_a"), F.col("shset").alias("sh_a"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("shset").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    sz_a, sz_b = F.size("sh_a").cast("long"), F.size("sh_b").cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / (sz_a + sz_b - inter), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", sim_col: str = "simhash"
) -> DataFrame:
    """ALL pairs at SimHash Hamming distance ≤ d — exact, via pigeonhole
    banding: the 64 bits split into d+1 contiguous sub-keys, so any pair
    within distance d agrees on at least one sub-key (d bit flips cannot
    touch all d+1 bands). Candidates come from d+1 equi-joins on a sub-key,
    then the exact ``bit_count(xor)`` check.

    Cost scales with band selectivity: band width = 64/(d+1) bits. d=3 →
    4×16-bit bands (cheap); large d → narrow bands → near-quadratic
    candidate sets, the honest price of an exact wide-radius contract.

    All bands are keyed in ONE ``posexplode`` relation and matched by a
    single equi-join on (band, sub-key) — r6: the previous union of
    per-band self-joins duplicated the upstream plan 2×(d+1) times, which
    re-ran the (Python) simhash computation on every copy; this shape
    evaluates it once per join side and the band match set is identical
    (same (position, value) equality).
    """
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    parts = F.array(
        *[
            F.shiftrightunsigned(F.col(sim_col), offs[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))
            for i in range(n_bands)
        ]
    )
    keyed = df.select(F.col(id_col), F.col(sim_col), F.posexplode(parts).alias("band", "bkey"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col(f"a.{sim_col}").bitwiseXOR(F.col(f"b.{sim_col}"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over the
    dup-pair graph, labelling every doc with the MIN id of its component
    (singletons label themselves) — the step that turns near-dup PAIRS
    into "keep one per cluster" decisions.

    Min-label propagation WITH pointer jumping: each round (1) takes the
    per-node neighborhood min over the symmetrized edge list, then (2)
    shortcuts every label through its own label (``comp(v) ←
    min(comp(v), comp(comp(v)))`` — label doubling), so label distance
    halves per round and convergence is O(log diameter), not
    O(diameter): a 60-node chain converges in ~7 rounds where plain
    propagation needs 59. Each round localCheckpoints (truncating
    lineage so the loop's plan doesn't grow) and runs one narrow
    driver-side convergence count on an O(nodes)-row relation. Raises
    if ``max_iter`` passes without convergence (never silently returns
    a half-propagated labelling).
    """
    sym = edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionAll(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = nodes.select(F.col(id_col).alias("v"), F.col(id_col).alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["v"])
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = labels.join(nbr_min, labels["v"] == nbr_min["src"], "left").select(
            F.col("v"),
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
        )
        # pointer jumping: comp is itself a node id, so look its label up
        ptr = stepped.select(F.col("v").alias("pv"), F.col("comp").alias("pcomp"))
        new = (
            stepped.join(ptr, stepped["comp"] == ptr["pv"], "left")
            .select(
                stepped["v"],
                F.least(stepped["comp"], F.coalesce(ptr["pcomp"], stepped["comp"])).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("comp", "old"), "v")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels.select(F.col("v").alias(id_col), F.col("comp").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
