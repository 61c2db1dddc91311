"""Portable Bloom-filter membership — the join-pruning primitive.

At 100 TB the cheapest join is the one that never shuffles: when one
side's KEY SET compresses into a few KB of bits, the other side can be
pre-filtered map-side before any exchange (the same idea behind Spark's
own runtime bloom-filter join, `spark.sql.optimizer.runtime.bloomFilter
.enabled` — which, like `approx_count_distinct`, uses engine-private
hashing no oracle can reproduce). This module is the engine-portable
version over the package's md5 hash contract: the filter a Spark job
builds here is bit-identical to one DuckDB builds from the same rows,
so probes are oracle-checkable.

Representation: the SPARSE form — a DataFrame of the set bit positions
(``bit`` int, <= ``num_bits`` rows, typically far fewer). That makes the
filter a first-class, mergeable table artifact (union two filters'
rows = the OR of the bitmaps) instead of an opaque binary blob, and the
probe a broadcast equi-join instead of a UDF.

Guarantees (exhibited by tests): NO false negatives ever; false-positive
rate ~ (1 - e^(-k·n/m))^k — with the default m = 8192, k = 3 that is
<1% up to ~1000 distinct keys and degrades gracefully (the filter stays
correct, only less selective).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import md5_i64

#: default geometry: 8192 bits, 3 hash functions. Chosen so the sparse
#: bit table broadcasts trivially (<= 8192 ints) while holding ~1% FP
#: at 10^3 keys; callers sizing for 10^6-key dimension filters should
#: raise num_bits to ~10^7 (still a broadcast-sized table).
_BLOOM_BITS = 8192
_BLOOM_K = 3


def _bit(i: int, col: Column, num_bits: int) -> Column:
    """Bit position of hash ``i`` for a key — md5-derived, engine-
    portable (same contract as ``md5_i64``)."""
    return F.pmod(
        md5_i64(F.concat(F.lit(f"bf{i}:"), col.cast("string"))),
        F.lit(num_bits),
    ).cast("int")


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_K,
) -> DataFrame:
    """Build the sparse Bloom filter of ``key_col``: one row per SET
    bit position. Plan shape: a map-side k-way explode + one distinct
    over <= ``num_bits`` integers — the shuffle moves at most
    ``num_bits`` rows per partition regardless of build-side size.
    NULL keys are ignored (membership of NULL is undefined in joins
    anyway). Two filters with the same geometry merge by
    ``union().distinct()`` — the bitmap OR."""
    if num_bits < 8:
        raise ValueError(f"num_bits must be >= 8, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    c = F.col(key_col)
    return (
        df.filter(c.isNotNull())
        .select(
            F.explode(
                F.array(*[_bit(i, c, num_bits) for i in range(num_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_K,
) -> DataFrame:
    """Flag each probe row with ``maybe_member``: true iff ALL
    ``num_hashes`` bit positions of its key are set in ``bloom``
    (which must share the build geometry). No false negatives; false
    positives at the documented rate.

    Plan shape: the sparse bit table (geometry-bounded: <= ``num_bits``
    rows, NEVER data-bounded) is packed into ``num_bits/64`` int64
    words and embedded as ONE array<long> literal in the probe
    projection — no join node of any kind (a one-row broadcast
    crossJoin would plan as BroadcastNestedLoopJoin, the node the plan
    audit forbids); each probe row then does ``num_hashes`` O(1)
    word-index + bit tests, entirely map-side inside codegen — the
    probe side never shuffles and nothing data-sized ever reaches the
    driver (the literal costs ``num_bits/8`` bytes per serialized task
    binary, ~1.2 MB at the 10^7-bit ceiling callers are pointed to). (An
    earlier version re-joined a distinct-probe-key-sized aggregate back
    to the fact under a forced broadcast — at 100-TB fact scale that
    collects billions of keys to the driver; this shape is immune by
    construction.) Use it as the map-side pre-filter in front of an
    expensive shuffle join: semantically a superset of the true
    semi-join, never a subset."""
    n_words = (num_bits + 63) // 64
    # Pack the sparse bits into words distributively (one agg over
    # <= num_bits rows), then collect the <= num_bits/64 packed words —
    # bounded by the FILTER GEOMETRY the caller chose, independent of
    # either table's row count (num_bits = 10^7 -> ~1.2 MB collected).
    packed = (
        bloom.select(
            (F.col("bit") / 64).cast("int").alias("_w"),
            F.expr("shiftleft(1L, int(pmod(bit, 64)))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
        .collect()
    )
    words = [0] * n_words
    for r in packed:
        words[r["_w"]] = r["_word"]
    c = F.col(key_col)
    # the CAST is load-bearing: F.lit over small ints infers array<int>,
    # and getbit on an int restricts positions to [0, 32) — a probe
    # whose packed words all happen to fit 32 bits would then crash on
    # any bit position >= 32 (caught by the Hypothesis no-false-negative
    # sweep on a 1-member filter)
    fanned = df.withColumn("_words", F.lit(words).cast("array<long>"))
    pos_cols = [f"_bp{i}" for i in range(num_hashes)]
    for i, name in enumerate(pos_cols):
        fanned = fanned.withColumn(name, _bit(i, c, num_bits))
    member = F.lit(True)
    for name in pos_cols:
        member = member & F.expr(
            f"getbit(element_at(_words, int({name} / 64) + 1), "
            f"int(pmod({name}, 64))) = 1"
        )
    return fanned.withColumn(
        "maybe_member",
        F.when(c.isNull(), F.lit(False)).otherwise(member),
    ).drop("_words", *pos_cols)


def bloom_prune_report(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_K,
) -> DataFrame:
    """One-row effectiveness report of bloom-pruning ``fact`` against
    ``dim``'s key set: ``(n_fact, n_pass, n_true_match, n_false_pos)``
    — how many fact rows survive the filter vs how many truly join.
    ``n_pass >= n_true_match`` always (no false negatives);
    ``n_false_pos = n_pass - n_true_match`` is the selectivity loss.
    The real-join comparison is a distinct-key-sized broadcast semi
    join — this diagnostic is for sizing ``num_bits``, not the hot
    path."""
    bloom = bloom_build(dim, dim_key, num_bits, num_hashes)
    probed = bloom_probe(fact, fact_key, bloom, num_bits, num_hashes)
    true_keys = dim.select(F.col(dim_key).alias("_tk")).distinct()
    flagged = probed.join(
        F.broadcast(true_keys),
        probed[fact_key].eqNullSafe(F.col("_tk")),
        "left",
    ).select(
        "maybe_member", F.col("_tk").isNotNull().alias("_true")
    )
    return flagged.agg(
        F.count("*").cast("long").alias("n_fact"),
        F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
        F.sum(F.when(F.col("_true"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_match"),
        F.sum(
            F.when(F.col("maybe_member") & ~F.col("_true"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_K,
) -> DataFrame:
    """The bloom-accelerated LEFT SEMI join, packaged: probe the fact
    against the dim-key filter map-side, then exact-verify only the
    survivors — row-identical to ``fact.join(dim, key, "left_semi")``
    (the bloom pass admits a superset, never drops a true match; the
    verify join removes the false positives).

    Why at 100 TB: the exact semi join shuffles BOTH sides on the key
    (or broadcasts the whole distinct dim-key set); the bloom pass
    cuts the fact to ~selectivity × rows BEFORE any exchange with a
    ≤ ``num_bits``-row broadcast, so the expensive join runs on the
    pre-filtered fraction. Wins when the filter is selective and the
    dim-key set is too large to broadcast raw but compresses into
    bits; with a non-selective filter it degenerates gracefully to
    the plain join plus one cheap map pass.
    """
    bloom = bloom_build(dim, dim_key, num_bits, num_hashes)
    survivors = bloom_probe(fact, fact_key, bloom, num_bits, num_hashes).filter(
        F.col("maybe_member")
    ).drop("maybe_member")
    d = dim.select(F.col(dim_key).alias("_vk")).distinct()
    return survivors.join(
        d, survivors[fact_key] == F.col("_vk"), "left_semi"
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR-combine sparse Bloom filters (union + distinct over set-bit
    rows) — the lossless merge that makes the filter an incrementally
    maintainable artifact like the HLL/KMV/histogram/zone states:
    merge(shard filters) == filter(union of shards), bit-for-bit,
    proven by ``q_bloom_merged``'s oracle being the WHOLE-set SQL.
    All inputs must share (num_bits, num_hashes) — merging mismatched
    geometries produces a filter that is wrong silently, so keep the
    geometry with the stored artifact (the ``lsh_index`` meta pattern).
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_build_by(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_K,
) -> DataFrame:
    """Per-group sparse Bloom filters: ``(*group_cols, bit)``, one row
    per SET bit per group — the grouped twin of :func:`bloom_build`,
    exactly as ``hll_state_by``/``kmv_state_by`` twin their scalar
    forms (one filter per tenant/day/source in one pass). State is
    ≤ ``num_bits`` rows PER GROUP after the distinct's map-side
    partial; same-geometry groups merge by union + distinct (the
    bitmap OR, per group automatically since the group columns ride
    the row). Probe a single group by filtering its rows out and
    passing them to :func:`bloom_probe`."""
    if num_bits < 8:
        raise ValueError(f"num_bits must be >= 8, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    c = F.col(key_col)
    return (
        df.filter(c.isNotNull())
        .select(
            *group_cols,
            F.explode(
                F.array(*[_bit(i, c, num_bits) for i in range(num_hashes)])
            ).alias("bit"),
        )
        .distinct()
    )
