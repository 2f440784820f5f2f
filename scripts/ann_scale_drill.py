#!/usr/bin/env python
"""IVF-vs-brute-force crossover on a large structured corpus (round 6).

BENCH/ANN_CURVES.md measures recall-vs-knob at 2,000 vectors, where the
exact scan is always cheaper and IVF's value is a design argument
("wins at 10^12 vectors with cluster structure").  This drill measures
the claim: on a mixture-of-Gaussians corpus large enough that the scan
dominates, IVF probing a few % of lists should beat brute force on
wall time at matched (high) recall.

Two serving shapes are timed: INLINE (ivf_topk assigns the corpus to
lists inside the call — pays O(C·dim) per vector per call) and
PREBUILT (assign_ivf_lists once, cached, as a persisted index table
would be — queries pay only probe cost).  The first run of this drill
measured the inline shape LOSING to brute force at 16 queries (0.3x):
assignment at C=64 costs 64 dots/vector while the brute scan costs
n_queries=16 dots/vector — the index must be amortized to win, which
is exactly how a production corpus serves it.

Usage: python scripts/ann_scale_drill.py [n_vecs] [dim] [n_clusters] [n_queries]
Defaults 400000 x 64, 32 clusters, 256 queries; C = n_clusters
centroids trained on a 5% sample.  Prints a markdown table + one JSON
line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

K = 10


def main() -> None:
    from accelerated_intelligent_document_processing_on_aws_spark.fixtures.embeddings import (
        clustered_embeddings_df,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators import (
        similarity as sim,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.sources.session import (
        get_spark,
    )

    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_clusters = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ann-scale-drill",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        clustered_embeddings_df(
            spark, n_vecs=n_vecs, dim=dim, n_clusters=n_clusters
        )
        .select("vec_id", "embedding")
        .repartition(cpus)
        .cache()
    )
    emb.count()  # materialize
    q = emb.limit(n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def timed(df):
        df.count()  # warm (plan + codegen; cache already hot)
        t0 = time.time()
        rows = df.count()
        return rows, round(time.time() - t0, 2)

    exact = sim.brute_force_topk(emb, q, k=K)
    _, t_exact = timed(exact)

    t0 = time.time()
    cents = sim.train_centroids(
        emb, n_centroids=n_clusters, sample_fraction=0.05
    )
    t_train = round(time.time() - t0, 2)

    # index build (once per corpus version; persists as a list_id-
    # partitioned table in production — cache stands in for the table)
    t0 = time.time()
    index = sim.assign_ivf_lists(emb, cents).cache()
    index.count()
    t_build = round(time.time() - t0, 2)

    rows = []
    for shape, corp in (("inline", emb), ("prebuilt", index)):
        for nprobe in (2, 4):
            ivf = sim.ivf_topk(
                corp, q, cents, k=K, nprobe=nprobe, prebuilt=(shape == "prebuilt")
            )
            _, t_ivf = timed(ivf)
            rec = sim.recall_at_k(ivf, exact, K)
            rows.append(
                {
                    "shape": shape,
                    "nprobe": nprobe,
                    "probe_frac": round(nprobe / n_clusters, 3),
                    "recall_at_10": round(rec, 3),
                    "sec": t_ivf,
                    "speedup_vs_exact": round(t_exact / t_ivf, 2),
                }
            )

    print(
        f"\ncorpus={n_vecs} vecs dim={dim} clusters={n_clusters}, "
        f"{n_queries} queries, k={K}; exact brute-force: {t_exact}s; "
        f"centroid training (5% sample): {t_train}s; "
        f"index build+cache: {t_build}s\n"
    )
    print("| leg | setting | recall@10 | sec | speedup vs exact |")
    print("|---|---|---|---|---|")
    print(f"| exact | full scan | 1.0 | {t_exact} | 1.0 |")
    for r in rows:
        print(
            f"| ivf-{r['shape']} | nprobe={r['nprobe']}/C={n_clusters} "
            f"({r['probe_frac']:.0%} of lists) | {r['recall_at_10']} "
            f"| {r['sec']} | {r['speedup_vs_exact']}x |"
        )
    print()
    print(
        json.dumps(
            {
                "n_vecs": n_vecs,
                "dim": dim,
                "n_clusters": n_clusters,
                "n_queries": n_queries,
                "exact_sec": t_exact,
                "train_sec": t_train,
                "index_build_sec": t_build,
                "ivf": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
