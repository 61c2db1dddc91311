"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force cosine against one query vector: the
  exact baseline. Pure builtins (zip_with + aggregate fold), double
  precision, deterministic fold order — oracle-reproducible.
* ``pairwise_neardup`` — blocked pairwise cosine (block column bounds
  the candidate set, e.g. a label, an LSH bucket, or an IVF cell).
* ``ivf_topk`` — the scale path: coarse-quantize vectors to the
  nearest of C centroids once (offline), probe only the closest
  ``nprobe`` cells at query time. Candidate set shrinks ~C/nprobe ×;
  at 100 TB this is the difference between scanning 500B vectors and
  scanning a few cells. Centroids here are taken deterministically
  (first C by id) — a seeded k-means refinement would slot in without
  changing the query path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column, decimals: int | None = 6) -> Column:
    c = _dot(a, b) / (_norm(a) * _norm(b))
    return F.round(c, decimals) if decimals is not None else c


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    One narrow projection + TakeOrderedAndProject: no shuffle, no
    collect; each partition keeps a k-heap. Rounded cosine + id
    tiebreak ⇒ deterministic ranking.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def pairwise_neardup(
    emb: DataFrame,
    block_col: str = "label",
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine, candidate-blocked on ``block_col``.

    The self-join shuffles on the block key only — pairs never cross
    blocks, which is what keeps this sub-quadratic at scale.
    """
    a = emb.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    b = emb.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    return (
        a.join(b, on="blk")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos_sim", cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "cos_sim")
    )


def assign_cells(
    emb: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: (centroids, emb+cell_id).

    Centroids = first ``num_centroids`` vectors by id (deterministic; a
    seeded k-means refinement would slot in here). They are *model
    parameters*, C ≪ corpus by construction, so they're collected once
    and inlined as plan literals: the argmax-cosine assignment becomes a
    pure map-side expression — zero joins, zero shuffles over the
    corpus. (The previous shape, broadcast crossJoin + groupBy-argmax,
    costs a C× row blowup plus a full corpus shuffle.)
    """
    centroids = emb.orderBy(id_col).limit(num_centroids).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec")
    )
    cents = centroids.collect()
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(r["cell_id"])).cast("long").alias("cell_id"),
                F.array(*[F.lit(float(x)) for x in r["cvec"]]).alias("cvec"),
            )
            for r in cents
        ]
    )
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            cosine(F.col(vec_col), c["cvec"], decimals=None).alias("sim"),
            c["cell_id"].alias("cell_id"),
        ),
    )
    # argmax by (sim, cell_id) — same tiebreak as max_by(struct(sim, cell_id))
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(float("-inf")).alias("sim"), F.lit(-1).cast("long").alias("cell_id")
        ),
        lambda acc, x: F.when(
            (x["sim"] > acc["sim"])
            | ((x["sim"] == acc["sim"]) & (x["cell_id"] > acc["cell_id"])),
            x,
        ).otherwise(acc),
    )
    assigned = emb.select(
        F.col(id_col), F.col(vec_col), best["cell_id"].alias("cell_id")
    )
    return centroids, assigned


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the ``nprobe`` cells
    whose centroids are closest to the query."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.withColumn("_sim", cosine(F.col("cvec"), q, decimals=None))
        .orderBy(F.desc("_sim"), "cell_id")
        .limit(nprobe)
        .select("cell_id")
    )
    cands = assigned.join(F.broadcast(probe), on="cell_id", how="left_semi")
    scored = cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def group_normalize(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding z-score normalization via grouped-map pandas.

    ``applyInPandas`` receives each group as ONE pandas frame (numpy
    vectorized inside), the shape for per-group model-ish transforms
    that builtins can't express cleanly (whitening, PCA-per-tenant,
    learned scalers). Output: (id, group, norm_embedding) where each
    dimension is (x − group mean) / group std (population, ddof=0;
    zero-variance dims map to 0).

    Scale note: one shuffle on the group key; a group must fit in one
    executor's memory — for billion-row groups use a two-pass builtin
    aggregate instead (the stats themselves are a groupBy).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_col, emb.schema[group_col].dataType),
            T.StructField("norm_embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def norm(pdf):
        import numpy as np
        import pandas as pd

        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        mu = mat.mean(axis=0)
        sd = mat.std(axis=0)
        centered = np.where(sd == 0, 0.0, (mat - mu) / np.where(sd == 0, 1.0, sd))
        rounded = np.floor(centered * 1e6 + np.where(centered >= 0, 0.5, -0.5)) / 1e6
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                group_col: pdf[group_col],
                "norm_embedding": list(rounded),
            }
        )

    return emb.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        norm, schema=out_schema
    )
