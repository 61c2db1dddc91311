"""Two-level (coarse → fine) centroid assignment: parity with the flat
driver-collected pass at C >= 4096 — the scale regime the hierarchy
exists for (the flat path's driver bound is the one documented limit
of auto_cells)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators import similarity as S

_C = 4096  # fine centroid count — at/above the auto_cells switch point
_D = 64


@pytest.fixture(scope="module")
def clustered(spark):
    """n = C + 500 vectors: the first C rows ARE the fine centroids
    (well-separated random unit vectors at d=64); the tail rows are
    perturbed copies (relative noise 1e-8 — random coarse argmax
    margins at d=64 sit far above 2e-8, fixed seed keeps it
    deterministic), so the globally-nearest fine centroid shares each
    row's coarse bucket and two-level == flat exactly. (At 1e-4 noise
    exactly one of 500 rows straddled a coarse margin — the documented
    within-bucket approximation, kept out of THIS parity test by
    construction.)"""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((_C, _D))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(_C)]
    for j in range(500):
        src = (j * 37) % _C
        noisy = base[src] + 1e-8 * rng.standard_normal(_D)
        rows.append((_C + j, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_two_level_matches_flat_at_4096_cells(spark, clustered):
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in clustered.filter(F.col("vec_id") < _C).collect()
    ]
    flat = {
        r["vec_id"]: r["cell_id"]
        for r in S._assign_vectorized(
            clustered, cents, "vec_id", "embedding"
        ).collect()
    }
    cdf = clustered.filter(F.col("vec_id") < _C).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
    )
    two = {
        r["vec_id"]: r["cell_id"]
        for r in S.assign_two_level(clustered, cdf).collect()
    }
    assert two == flat
    # sanity: every base row is its own centroid, every noisy row maps
    # to its source centroid
    assert all(two[i] == i for i in range(_C))


def test_auto_cells_switches_to_two_level_past_threshold(spark, clustered):
    # num_centroids > threshold → hierarchy engages; same contract
    # (id, centroid_id) as the flat path, no rows lost
    out = S.auto_cells(
        clustered, num_centroids=_C, two_level_threshold=1024
    )
    got = {r["vec_id"]: r["centroid_id"] for r in out.collect()}
    assert len(got) == _C + 500
    assert all(got[i] == i for i in range(_C))
    with pytest.raises(ValueError, match="refine_iters"):
        S.auto_cells(
            clustered,
            num_centroids=_C,
            refine_iters=1,
            two_level_threshold=1024,
        )


def test_full_probe_equals_flat_on_unclustered_data(spark, sf_dir):
    # data-independent identity: probing ALL K coarse buckets makes
    # the candidate union the whole centroid table, so two-level ==
    # flat on arbitrary (here: real, unclustered) embeddings — the
    # exactness dial for corpora the clustered-data assumption fails on
    from cdc_system_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id < 64").collect()
    )
    flat = {
        r["vec_id"]: r["cell_id"]
        for r in S._assign_vectorized(emb, cents, "vec_id", "embedding").collect()
    }
    cdf = spark.createDataFrame(
        [(i, v) for i, v in cents], "cell_id long, cvec array<double>"
    )
    two = {
        r["vec_id"]: r["cell_id"]
        for r in S.assign_two_level(
            emb, cdf, coarse_count=8, coarse_probe=8
        ).collect()
    }
    assert two == flat


def test_two_level_small_case_parity(spark):
    # tiny corpus, forced hierarchy: rows are EXACT copies of the 16
    # distinct fine-centroid directions, so each row's global best is
    # its source (cos = 1.0, unique) and its coarse tag is bitwise
    # identical to its source centroid's — parity by construction
    dirs = []
    for i in range(16):
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i + 3) % 8] = 0.25 if i >= 8 else 0.0
        dirs.append(v)
    rows = [(i, dirs[i]) for i in range(16)]
    rows += [(16 + j, dirs[(j * 7) % 16]) for j in range(24)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(int(i), list(v)) for i, v in rows[:16]]
    flat = {
        r["vec_id"]: r["cell_id"]
        for r in S._assign_vectorized(emb, cents, "vec_id", "embedding").collect()
    }
    cdf = spark.createDataFrame(
        [(i, v) for i, v in cents], "cell_id long, cvec array<double>"
    )
    two = {
        r["vec_id"]: r["cell_id"]
        for r in S.assign_two_level(emb, cdf, coarse_count=4).collect()
    }
    assert two == flat
