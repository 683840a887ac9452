"""Deduplication operators: exact, n-gram/word Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale notes (100 TB posture):
- exact dedup is one hash-groupBy shuffle on a 128-bit digest (no raw-text
  shuffle);
- the exact word-Jaccard pair join is quadratic in documents sharing a word
  — it exists as the small-scale oracle; the scale path is MinHash-LSH,
  whose shuffles are (doc, band-bucket) sized, linear in corpus size, with
  candidate verification touching only same-bucket pairs;
- SimHash gives O(n) near-dup clustering by prefix-bucketing the signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest key per identical text: one groupBy on md5(text)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(key_col).alias(key_col), F.count(F.lit(1)).alias("n_copies"))
        .select(key_col, "text_md5", "n_copies")
    )


def word_sets(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """(key, word) distinct pairs — the exact-Jaccard building block."""
    return docs.select(
        F.col(key_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("word")
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.9, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Exact word-set Jaccard >= threshold pairs (d1 < d2). Quadratic in
    co-occurring docs — the small-scale oracle for MinHash-LSH."""
    w = word_sets(docs, text_col, key_col)
    sz = w.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = w.alias("a"), w.alias("b")
    co = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")))
        .groupBy(F.col(f"a.{key_col}").alias("d1"), F.col(f"b.{key_col}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sz.select(F.col(key_col).alias("d1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col(key_col).alias("d2"), F.col("n").alias("n2"))
    return (
        co.join(s1, "d1")
        .join(s2, "d2")
        .where(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")) >= threshold)
        .select("d1", "d2")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 64, text_col: str = "text", key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """k-component MinHash over word sets, all in JVM expressions:
    sig_i = min(xxhash64(word, i)) — one independent 64-bit hash per
    component. (An affine (a*h+b) mod M family over a 32-bit h is NOT a
    random permutation — it wraps at most once, stays order-preserving in
    h, and collapses the signature; measured 3/64 agreeing components on a
    J=0.8 pair where ~51 are expected.)"""
    w = word_sets(docs, text_col, key_col)
    aggs = [
        F.min(F.xxhash64(F.col("word"), F.lit(seed + i))).alias(f"mh{i}") for i in range(k)
    ]
    return w.groupBy(key_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    k: int = 64,
    bands: int = 32,
    text_col: str = "text",
    key_col: str = "doc_id",
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """MinHash-LSH candidates (band buckets) + exact Jaccard verification.

    With k=64, bands=32 (rows=2), P(miss | J=0.9) = (1-0.81)^32 ~ 1e-23, so
    the verified output equals the exact jaccard_pairs result while shuffles
    stay linear in corpus size.

    Degenerate buckets (identical/boilerplate content — run ``exact_dedup``
    first as the documented contract) are capped at ``bucket_cap`` members:
    above it the all-pairs join degrades to verified sub-bucket pairs +
    an anchor chain (see _capped_band_pairs), keeping candidates
    O(C * sqrt(cap)) per bucket instead of C^2/2. Pass
    ``bucket_cap=None`` to disable the guard and restore the exact
    "equals jaccard_pairs" contract regardless of bucket size.
    """
    rows = k // bands
    sig = minhash_signatures(docs, k, text_col, key_col)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(key_col, *band_cols)
    stacked = banded.select(
        key_col,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("val")) for b in range(bands)])
        ).alias("bv"),
    ).select(key_col, F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    small, star = _capped_band_pairs(stacked, key_col, bucket_cap)
    x, y = small.alias("x"), small.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col(f"x.{key_col}") < F.col(f"y.{key_col}")),
        )
        .select(F.col(f"x.{key_col}").alias("d1"), F.col(f"y.{key_col}").alias("d2"))
        .unionByName(star.select("d1", "d2"))
        .distinct()
    )
    # exact verification on candidates only
    w = word_sets(docs, text_col, key_col)
    sz = w.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = w.alias("a"), w.alias("b")
    co = (
        cand.join(a, cand["d1"] == F.col(f"a.{key_col}"))
        .join(b, (cand["d2"] == F.col(f"b.{key_col}")) & (F.col("a.word") == F.col("b.word")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sz.select(F.col(key_col).alias("d1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col(key_col).alias("d2"), F.col("n").alias("n2"))
    return (
        co.join(s1, "d1")
        .join(s2, "d2")
        .where(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")) >= threshold)
        .select("d1", "d2")
    )


def _capped_band_pairs(stacked: DataFrame, key_col: str, bucket_cap: int,
                       carry: list[str] | None = None):
    """Degenerate-bucket guard for banded LSH self-joins.

    A bucket of C identical-or-boilerplate documents yields C^2/2
    candidates from an uncapped (band, val) self-join — the one real
    scale-killer in the dedup tier at web-corpus skew. Contract: run
    ``exact_dedup`` first so byte-identical copies never reach LSH; this
    guard then bounds whatever residual mega-buckets remain:

    - bucket sizes come from one map-combinable groupBy; buckets above
      ``bucket_cap`` are few by construction (at most rows/cap), so the
      oversized-bucket list is broadcast, never shuffled;
    - rows in small buckets take the normal all-pairs equi-join;
    - rows in oversized buckets split into SUB-BUCKETS of ~sqrt(cap)
      members (by key order): ALL pairs inside each sub-bucket, plus a
      chain linking consecutive sub-bucket anchors — O(C * sqrt(cap))
      candidates instead of C^2/2. Unlike a single global anchor, no
      lone hash-collision outlier can void a whole bucket's recall:
      within a sub-bucket recall is exact, and every candidate (intra or
      chain) still passes the caller's exact verification, so genuine
      near-dup clusters stay connected for dup_clusters (whose pointer
      doubling handles the chain depth in O(log) rounds).

    Honest limit: pair-level recall ACROSS sub-buckets of a degenerate
    bucket is not exhaustive — by construction, that is the price of
    bounding C^2. Exact-recall contracts (simhash's pigeonhole) hold
    whenever buckets stay within ``bucket_cap``.

    ``bucket_cap=None`` (or <= 0) DISABLES the guard: every bucket takes
    the exhaustive all-pairs join, restoring the exact-recall contracts
    (minhash "equals exact jaccard_pairs", simhash's pigeonhole) for
    callers who need them and accept the C^2 worst case (ADVICE round-5:
    the default cap silently weakened those published contracts with no
    opt-out).

    Returns ``(small_rows, extra_pairs)``: ``small_rows`` has stacked's
    schema; ``extra_pairs`` has (d1, d2) plus ``<c>_1``/``<c>_2`` for
    every carried column, with d1 < d2.
    """
    from pyspark.sql import Window

    if bucket_cap is None or bucket_cap <= 0:
        # guard off: no bucket is "big", so small_rows = all rows and the
        # extra-pairs side is structurally empty (same plan, zero rows)
        bucket_cap = 1 << 62
    carry = carry or []
    sub_size = max(2, int(bucket_cap ** 0.5))
    sizes = stacked.groupBy("band", "val").agg(F.count(F.lit(1)).alias("_bn"))
    big = sizes.where(F.col("_bn") > bucket_cap).select("band", "val")
    small = stacked.join(F.broadcast(big), ["band", "val"], "left_anti")
    big_rows = stacked.join(F.broadcast(big), ["band", "val"], "left_semi")
    w = Window.partitionBy("band", "val").orderBy(key_col)
    sub = big_rows.withColumn("_rn", F.row_number().over(w) - 1).withColumn(
        "_sub", F.floor(F.col("_rn") / sub_size)
    )
    x, y = sub.alias("x"), sub.alias("y")
    within = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.val") == F.col("y.val"))
        & (F.col("x._sub") == F.col("y._sub"))
        & (F.col(f"x.{key_col}") < F.col(f"y.{key_col}")),
    ).select(
        F.col(f"x.{key_col}").alias("d1"),
        F.col(f"y.{key_col}").alias("d2"),
        *[F.col(f"x.{c}").alias(f"{c}_1") for c in carry],
        *[F.col(f"y.{c}").alias(f"{c}_2") for c in carry],
    )
    anchors = sub.where(F.col("_rn") % sub_size == 0)
    wa = Window.partitionBy("band", "val").orderBy(key_col)
    chained = anchors.withColumn("_nxt", F.lead(key_col).over(wa))
    for c in carry:
        chained = chained.withColumn(f"_nxt_{c}", F.lead(c).over(wa))
    chain = chained.where(F.col("_nxt").isNotNull()).select(
        F.col(key_col).alias("d1"),
        F.col("_nxt").alias("d2"),
        *[F.col(c).alias(f"{c}_1") for c in carry],
        *[F.col(f"_nxt_{c}").alias(f"{c}_2") for c in carry],
    )
    return small, within.unionByName(chain)


def _word_hash64(col, hash_fn: str):
    """Per-word 64-bit hash. ``xxhash64`` is the fast production path;
    ``md5_60`` (60 bits from the md5 hex prefix) is bit-reproducible in
    ANSI SQL, which lets an external system (the DuckDB oracle) recompute
    identical SimHash signatures."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = 63,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash: per-word hash, sign-aggregate each bit, rebuild.

    Pure DataFrame expressions (bits unrolled into agg columns, JVM-side).
    """
    w = word_sets(docs, text_col, key_col).withColumn("h", _word_hash64(F.col("word"), hash_fn))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = w.groupBy(key_col).agg(*aggs)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select(key_col, sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 60,
    text_col: str = "text",
    key_col: str = "doc_id",
    hash_fn: str = "md5_60",
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole band bucketing: the signature is split into ``max_hamming+1``
    bands; two signatures within Hamming k MUST agree exactly on at least
    one band, so an equi-join on (band_idx, band_value) finds every true
    pair — recall is exactly 1, not probabilistic. Candidates are then
    verified JVM-side with bit_count(xor) <= k. Shuffle volume is
    (k+1) rows per document (linear); bucket sizes stay tiny because a
    15-bit band collides only for genuinely similar text — except for
    identical/boilerplate clusters, which the ``bucket_cap`` guard
    degrades to verified sub-bucket pairs (run ``exact_dedup`` first;
    see _capped_band_pairs). ``bucket_cap=None`` disables the guard,
    making the recall-exactly-1 pigeonhole contract unconditional.
    """
    nb = max_hamming + 1
    width = bits // nb
    sig = simhash(docs, text_col, key_col, bits=bits, hash_fn=hash_fn)
    # last band absorbs the remainder bits
    widths = [width] * (nb - 1) + [bits - width * (nb - 1)]
    offs = [width * i for i in range(nb)]
    band_vals = [
        (F.shiftrightunsigned(F.col("simhash"), offs[b]).bitwiseAND(F.lit((1 << widths[b]) - 1))).alias(
            f"band{b}"
        )
        for b in range(nb)
    ]
    banded = sig.select(key_col, "simhash", *band_vals)
    stacked = banded.select(
        key_col,
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("val")) for b in range(nb)])
        ).alias("bv"),
    ).select(key_col, "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    small, star = _capped_band_pairs(stacked, key_col, bucket_cap, carry=["simhash"])
    x, y = small.alias("x"), small.alias("y")
    joined = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col(f"x.{key_col}") < F.col(f"y.{key_col}")),
        )
        .where(
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))) <= F.lit(max_hamming)
        )
        .select(F.col(f"x.{key_col}").alias("d1"), F.col(f"y.{key_col}").alias("d2"))
    )
    chained = star.where(
        F.bit_count(F.col("simhash_1").bitwiseXOR(F.col("simhash_2"))) <= F.lit(max_hamming)
    ).select("d1", "d2")
    return joined.unionByName(chained).distinct()


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Pairs with cosine similarity >= threshold (v1 < v2), via zip_with dot
    products on pre-normalized vectors — all JVM-side higher-order funcs."""
    dot = lambda l, r: F.aggregate(  # noqa: E731
        F.zip_with(l, r, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    e = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            (dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.norm") * F.col("b.norm"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("v1", "v2")
    )


def dup_clusters(pairs: DataFrame, a: str = "d1", b: str = "d2", max_iter: int = 30) -> DataFrame:
    """Connected components over a near-dup pair graph: every document maps
    to its component's minimum id (`cluster_id`) — the canonical "keep one
    per duplicate cluster" step after pair mining.

    Iterative min-label propagation with POINTER DOUBLING: each round every
    node takes the min of its own label and its neighbors' labels (one
    shuffle join per round), then shortcuts label -> label(label) — the
    path-halving step of parallel union-find — so convergence is
    O(log diameter) rounds, not O(diameter). A 10^4-node chain graph (the
    pathological case for plain propagation) converges in ~15 rounds.
    Convergence check is one count per round; lineage is truncated via
    localCheckpoint so plans don't grow with iterations. Driver-side loop
    is over ROUNDS, never over rows.
    """
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = edges.union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    edges = edges.localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        hooked = labels.join(nbr_min, labels["node"] == nbr_min["src"], "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        # pointer doubling: label <- label(label). Labels are node ids and
        # only ever decrease, so the shortcut halves label-chain depth.
        lut = hooked.select(F.col("node").alias("lnode"), F.col("label").alias("llabel"))
        new_labels = (
            hooked.join(lut, hooked["label"] == lut["lnode"], "left")
            .select("node", F.least("label", F.coalesce("llabel", "label")).alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    score_col,
    key_col: str = "doc_id",
) -> DataFrame:
    """The keep-one-per-cluster policy that ends every dedup pipeline:
    join docs to their cluster (docs without a cluster are their own
    keeper), rank by (score DESC, doc_id ASC) inside each cluster, keep
    rank 1. One window over cluster_id — clusters are small by
    construction, so no skew; docs outside any cluster never shuffle into
    the window (they pass through with keep=true).
    """
    from pyspark.sql import Window

    scored = docs.select(key_col, score_col.alias("_score"))
    joined = scored.join(clusters, key_col, "left")
    in_cluster = joined.where(F.col("cluster_id").isNotNull())
    solo = joined.where(F.col("cluster_id").isNull()).select(
        key_col, F.col(key_col).alias("cluster_id"), F.lit(True).alias("keep")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("_score").desc(), F.col(key_col).asc())
    ranked = in_cluster.withColumn("keep", F.row_number().over(w) == 1).select(
        key_col, "cluster_id", "keep"
    )
    return ranked.unionByName(solo)


def _verify_cos_pairs(embeddings: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact cosine verification of candidate (v1, v2) pairs: join each side
    to its (pre-normed) vector, JVM-side zip_with dot product."""
    dot = lambda l, r: F.aggregate(  # noqa: E731
        F.zip_with(l, r, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    e = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a = e.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("emb1"), F.col("norm").alias("n1")
    )
    b = e.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("emb2"), F.col("norm").alias("n2")
    )
    return (
        cand.join(a, "v1")
        .join(b, "v2")
        .where(dot(F.col("emb1"), F.col("emb2")) / (F.col("n1") * F.col("n2")) >= threshold)
        .select("v1", "v2")
    )


def embedding_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    bands: int = 32,
    rows_per_band: int = 2,
    dim: int = 64,
    seed: int = 42,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """Bucketed embedding near-dup pairs: banded random-hyperplane LSH
    candidates + exact cosine verification (the minhash_lsh_pairs pattern
    applied to vectors). Shuffle volume is ``bands`` rows per vector —
    linear in corpus size — vs the cartesian join of embedding_dup_pairs.

    Band math: a hyperplane agrees on a pair with p = 1 - arccos(cos)/pi;
    a pair survives if all rows_per_band bits of any band agree, so
    P(miss) = (1 - p^r)^bands. Defaults (32x2) give P(miss) = 9e-8 at
    cos = 0.4 (p = 0.631) — recall ~1, which is what lets the exact-SQL
    oracle double as this operator's oracle. HONEST LIMIT: at thresholds
    this low, random pairs (p = 0.5) also collide somewhere in 32 bands
    with high probability, so pruning only pays for tight near-dups — at
    cos >= 0.9 (p = 0.856), bands=32 x rows=8 gives P(miss) = 2e-5 while
    a random pair collides in any band with only ~12% probability; for
    genuinely low thresholds use embedding_block_pairs instead.
    """
    from orc_rs_spark.textops.similarity import band_signatures

    sigs = band_signatures(
        embeddings, bands=bands, rows_per_band=rows_per_band, dim=dim, seed=seed
    )
    stacked = sigs.select(
        "vec_id", F.posexplode("band_vals").alias("band", "val")
    )
    small, star = _capped_band_pairs(stacked, "vec_id", bucket_cap)
    x, y = small.alias("x"), small.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("v1"), F.col("y.vec_id").alias("v2"))
        .unionByName(star.select(F.col("d1").alias("v1"), F.col("d2").alias("v2")))
        .distinct()
    )
    return _verify_cos_pairs(embeddings, cand, threshold)


def _unpack_vec_block(col, r: int):
    """One packed block row -> (ids int64[n], matrix float64[n, dim]),
    via Arrow buffer views (flatten + field), zero Python objects per
    vector."""
    vecs = col.slice(r, 1).flatten()  # StructArray: this row's vectors
    ids = vecs.field("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emb = vecs.field("embedding")
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    mat = np.ascontiguousarray(
        flat.reshape(len(ids), -1) if len(ids) else flat.reshape(0, 1),
        dtype=np.float64,
    )
    return ids, mat


def embedding_block_pairs(
    embeddings: DataFrame, threshold: float = 0.4, block_size: int = 1024, dim: int = 64
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via tiled matrix multiplication:
    vectors are grouped into blocks, block pairs are enumerated once
    (bi <= bj), and each block pair is one BLAS matmul inside mapInArrow.

    This is the scale-correct EXACT path when the threshold is too low for
    LSH to prune (see embedding_lsh_pairs): the row-level cartesian join of
    embedding_dup_pairs becomes (n/block)^2 block tasks doing vectorized
    (block x dim) @ (dim x block) products — same O(n^2 d) flops, but BLAS
    throughput and block-level (not row-level) shuffle. Honest limit: n^2
    flops stop being feasible past ~10^7-10^8 vectors on any cluster; past
    that, near-dup mining needs LSH (tight thresholds) or ANN graphs.
    """
    from collections.abc import Iterator

    import pyarrow as pa_mod

    n_parts = max(embeddings.sparkSession.sparkContext.defaultParallelism, 1)
    blocks = embeddings.select(
        F.floor(F.col("vec_id") / F.lit(block_size)).cast("long").alias("blk"),
        "vec_id",
        "embedding",
    )
    packed = blocks.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("vecs")
    )
    a = packed.select(F.col("blk").alias("blk_a"), F.col("vecs").alias("vecs_a"))
    b = packed.select(F.col("blk").alias("blk_b"), F.col("vecs").alias("vecs_b"))
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(n_parts)

    def block_cos(batches: Iterator[pa_mod.RecordBatch]) -> Iterator[pa_mod.RecordBatch]:
        for batch in batches:
            col_a = batch.column("vecs_a")
            col_b = batch.column("vecs_b")
            for r in range(batch.num_rows):
                # Arrow struct-field extraction + flatten: ids and the
                # (block x dim) matrix come straight from Arrow buffers —
                # no per-vector Python lists on the hot path
                ids_a, mat_a = _unpack_vec_block(col_a, r)
                ids_b, mat_b = _unpack_vec_block(col_b, r)
                na = np.linalg.norm(mat_a, axis=1)
                nb = np.linalg.norm(mat_b, axis=1)
                na[na == 0] = np.inf
                nb[nb == 0] = np.inf
                sims = (mat_a / na[:, None]) @ (mat_b / nb[:, None]).T
                ii, jj = np.nonzero(sims >= threshold)
                v1, v2 = ids_a[ii], ids_b[jj]
                keep = v1 < v2  # dedups the diagonal block and orients pairs
                if keep.any():
                    yield pa_mod.RecordBatch.from_arrays(
                        [pa_mod.array(v1[keep]), pa_mod.array(v2[keep])], names=["v1", "v2"]
                    )

    return pairs.mapInArrow(block_cos, "v1 bigint, v2 bigint")


def ngram_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(key, character n-gram) distinct pairs — shingle-level dedup basis."""
    # expression-level transform: F.substring requires a literal position,
    # so the sliding window is built in SQL
    shingles = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 0)), "
        f"i -> substring({text_col}, CAST(i AS INT), {n}))"
    )
    return docs.select(
        F.col(key_col), F.explode(F.array_distinct(shingles)).alias("g")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.75,
    n: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact character-n-gram Jaccard >= threshold pairs (d1 < d2)."""
    g = ngram_sets(docs, n, text_col, key_col)
    sz = g.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = g.alias("a"), g.alias("b")
    co = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")))
        .groupBy(F.col(f"a.{key_col}").alias("d1"), F.col(f"b.{key_col}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sz.select(F.col(key_col).alias("d1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col(key_col).alias("d2"), F.col("n").alias("n2"))
    return (
        co.join(s1, "d1")
        .join(s2, "d2")
        .where(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")) >= threshold)
        .select("d1", "d2")
    )
