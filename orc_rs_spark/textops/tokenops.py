"""Token-sequence operators for training-data preparation: sequence
packing, vocabulary statistics, deterministic sampling.

These operate on the engine's token table shape (doc_id string,
tokens array<int32>, n_tok int, source string) — the north-star input —
and are all exactly SQL-expressible, so the DuckDB oracle certifies them
value-for-value.

Scale notes (100 TB posture):
- pack_sequences needs a GLOBAL running token count; a naive
  ``sum() over (order by doc_id)`` collapses to one partition. The
  implementation uses the standard two-phase distributed prefix sum:
  per-partition totals (tiny driver collect, one row per partition) are
  broadcast back as offsets and the within-partition cumsum runs as a
  window partitioned BY partition id — every stage parallel, nothing
  driver-side scales with rows;
- token_vocab_stats is one map-combinable groupBy on token id (shuffle
  linear in distinct tokens, bounded by vocab size) + a broadcastable
  top-K;
- hash_sample is a stateless per-row expression (no shuffle, no RNG
  state): md5-derived Bernoulli keep with an exact integer threshold,
  reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, window: int, key_col: str = "doc_id",
                   len_col: str = "n_tok", partitions: int | None = None) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid head-to-tail
    in ``key_col`` order and each is assigned to the context-window bin
    where it STARTS (``bin_id = start_offset // window``), with its offset
    inside that bin — the deterministic whole-document variant of the
    standard LLM pack-into-context-windows step (a bin may overrun by at
    most one document's tail, which the downstream tokenizer truncates or
    carries).

    Returns (key_col, len_col, bin_id, bin_offset), one row per document.
    Equivalent SQL: ``SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` feeding integer division —
    which is the oracle, while this implementation keeps the prefix sum
    distributed (see module scale notes)."""
    from pyspark.sql import Window

    n_part = partitions or docs.sparkSession.sparkContext.defaultParallelism
    ranged = (
        docs.select(key_col, len_col)
        .repartitionByRange(n_part, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint()  # pin partitioning for the two phases
    # phase 1: per-partition totals -> prefix offsets (one tiny collect,
    # rows == partitions, never rows == table)
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(F.sum(len_col).alias("t")).collect()
    }
    prefix = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in prefix.items()], "_pid int, _prefix bigint"
        )
    )
    # phase 2: parallel within-partition cumsum + broadcast offset
    w = (
        Window.partitionBy("_pid")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(prefix_df, "_pid")
        .withColumn("_start", F.coalesce(F.sum(len_col).over(w), F.lit(0)) + F.col("_prefix"))
        .select(
            key_col,
            len_col,
            # integer DIV, not `/`: the float path would round-trip the
            # running offset through a double, which loses exactness past
            # 2^53 total tokens — reachable at the 10^12-sequence scale
            F.expr(f"_start DIV {int(window)}").alias("bin_id"),
            (F.col("_start") % window).cast("long").alias("bin_offset"),
        )
    )


def token_vocab_stats(docs: DataFrame, top_k: int = 100,
                      tokens_col: str = "tokens") -> DataFrame:
    """Top-K token ids by corpus frequency with counts and corpus share —
    the vocabulary histogram a tokenizer-audit step reads. One
    map-combinable groupBy on token id; ties broken by token id so the
    result is deterministic (and oracle-comparable)."""
    # denominator WITHOUT exploding (size() is per-row, no shuffle) — an
    # exploded .count() would run the most expensive pass twice
    total = docs.agg(F.sum(F.size(tokens_col))).first()[0] or 0
    exploded = docs.select(F.explode(tokens_col).alias("token"))
    counts = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_k)
        .select(
            "token",
            "n",
            (F.col("n") / F.lit(float(total))).alias("share"),
        )
    )


def hash_sample(docs: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "orc_rs") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 15 hex
    digits of md5(salt || key) fall under ``rate`` — reproducible across
    runs, engines (the oracle computes the identical expression in SQL),
    and table versions; no RNG state, no shuffle, no driver involvement.
    Use distinct salts for disjoint samples (train/validation splits).

    The keep-threshold is computed EXACTLY as floor(rate * 2^60) over the
    rate float's true binary value. (The Fraction form is for clarity, not
    necessity: 2^60 is a power of two, so ``rate * float(1 << 60)`` is also
    exact in IEEE-754 for every representable rate — both forms yield the
    same bound.) Cross-engine bit-reproducibility is unconditional for
    dyadic-rational rates (0.25, 0.5, 1/1024, ...) where the float is the
    rate itself; for rates like 0.1 the oracle must floor the same float's
    value (decimal-arithmetic engines computing 0.1 * 2^60 exactly land on
    a different integer)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"hash_sample: rate {rate} outside [0, 1]")
    from fractions import Fraction

    bound = int(Fraction(rate) * (1 << 60))
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col))), 1, 15), 16, 10).cast("long")
    return docs.where(h < F.lit(bound))


def weighted_repartition(df: DataFrame, partitions: int,
                         weight_col: str = "n_tok",
                         key_col: str = "doc_id") -> DataFrame:
    """Repartition so every partition carries a near-equal WEIGHT total
    (token count), not a near-equal row count — the defense against
    document-length skew, where a handful of giant documents make some
    tasks token-heavy under plain row-based range partitioning.

    Mechanism: the same two-phase distributed prefix sum as
    pack_sequences computes each row's running weight offset; partition
    id = offset DIV ceil(total/partitions), so boundaries fall on weight
    quantiles exactly (one document may straddle a boundary and lands in
    the partition where it starts). Costs one extra pass (per-partition
    totals, one row per partition on the driver) plus the final
    repartition shuffle; rows keep ``key_col`` order inside partitions."""
    if partitions <= 0:
        raise ValueError("weighted_repartition: partitions must be positive")
    ranged = (
        df.repartitionByRange(partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
    ).localCheckpoint()
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(F.sum(weight_col).alias("t")).collect()
    }
    grand = sum(totals.values()) or 1
    budget = -(-grand // partitions)  # ceil
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in prefix.items()], "_pid int, _prefix bigint"
        )
    )
    binned = (
        ranged.join(prefix_df, "_pid")
        .withColumn(
            "_wbin",
            F.expr(f"(coalesce(sum({weight_col}) over (partition by _pid "
                   f"order by {key_col} rows between unbounded preceding "
                   f"and 1 preceding), 0) + _prefix) DIV {int(budget)}"),
        )
        .drop("_pid", "_prefix")
    )
    # range partitioning, not hash: ~`partitions` distinct bin ids hashed
    # into `partitions` slots would birthday-collide (two bins sharing a
    # task, another empty); ranges keep the bin -> partition map bijective
    return (
        binned.repartitionByRange(partitions, F.col("_wbin"), F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop("_wbin")
    )
