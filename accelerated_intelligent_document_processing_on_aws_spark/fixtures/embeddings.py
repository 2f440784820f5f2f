"""Deterministic clustered (mixture-of-Gaussians) embedding corpus.

The driver testdata's ``embeddings.parquet`` vectors are near-uniform
on the unit sphere — the structureless WORST case for IVF/PQ, whose
whole premise is that real embedding spaces are clustered.  This
fixture generates the regime those legs are built for, so the ANN
curves (scripts/ann_curves.py --structured) and the recall gates
measure both ends honestly.

Construction (all from one seeded numpy Generator, no data files):
``n_clusters`` unit-norm centers drawn N(0, I); each vector = its
cluster's center + ``sigma`` * N(0, I) noise, re-normalized to unit
length.  Cluster sizes follow a mild Zipf tilt so centroid training
sees realistic imbalance.  ``label`` carries the true cluster id for
diagnostics; the similarity operators never read it.
"""

from __future__ import annotations

import numpy as np


def generate_clustered_embeddings(
    n_vecs: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.25,
    seed: int = 617,
):
    """Returns (vec_ids int64[n], vectors float32[n, dim], labels int32[n])."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # mild Zipf tilt over cluster sizes, deterministic assignment
    weights = 1.0 / np.arange(1, n_clusters + 1) ** 0.5
    weights /= weights.sum()
    labels = rng.choice(n_clusters, size=n_vecs, p=weights).astype(np.int32)
    vecs = centers[labels] + sigma * rng.standard_normal((n_vecs, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return (
        np.arange(n_vecs, dtype=np.int64),
        vecs.astype(np.float32),
        labels,
    )


def clustered_embeddings_df(
    spark,
    n_vecs: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.25,
    seed: int = 617,
):
    """Spark DataFrame (vec_id long, embedding array<float>, label int)
    matching the testdata embeddings.parquet schema."""
    import pandas as pd

    ids, vecs, labels = generate_clustered_embeddings(
        n_vecs, dim, n_clusters, sigma, seed
    )
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": list(vecs), "label": labels}
    )
    return spark.createDataFrame(pdf).selectExpr(
        "CAST(vec_id AS long) AS vec_id",
        "CAST(embedding AS array<float>) AS embedding",
        "CAST(label AS int) AS label",
    )
