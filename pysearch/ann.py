"""Approximate nearest neighbor search over embedding columns.

Two tiers (training-data pipeline similarity-search family):
- brute-force cosine top-k (exact baseline; also exposed SQL-checkably in
  ops.ann_cosine_top5)
- IVF (inverted-file) index: deterministic k-means coarse quantizer trained
  on a driver-side sample, cluster assignment + per-cluster search fully
  distributed.  The scale path: queries probe only ``n_probe`` clusters, so
  work per query drops from O(N) to O(N * n_probe / n_clusters).

All numerics are float64 numpy with fixed iteration counts and seeds, so
results are deterministic across runs and parallelism levels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a (driver-side) sample."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample.astype(np.float64))
    idx = rng.choice(x.shape[0], size=min(n_clusters, x.shape[0]), replace=False)
    cents = x[np.sort(idx)].copy()
    for _ in range(n_iter):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IVFIndex:
    """IVF over a Spark DataFrame (id_col, vec_col: array<float>)."""

    def __init__(self, spark, df, id_col: str = "vec_id",
                 vec_col: str = "embedding", n_clusters: int = 16,
                 sample_size: int = 2048, seed: int = 42):
        from pyspark.sql import functions as F

        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        # deterministic UNBIASED sample: order by a hash of the id and take
        # the first sample_size rows.  A global sort+limit compiles to
        # per-partition top-K + merge, so it is cheap at scale AND
        # partition-layout independent (plain limit() is not); hashing
        # removes the low-id bias a sorted take would have.
        sample = np.array(
            [r[2] for r in df.select(
                F.md5(F.col(id_col).cast("string")).alias("_h"), id_col, vec_col)
             .orderBy("_h", id_col).limit(sample_size).collect()],
            dtype=np.float64,
        )
        self.centroids = train_centroids(sample, n_clusters, seed=seed)
        bc = spark.sparkContext.broadcast(self.centroids)

        def assign(batches):
            for pdf in batches:
                vecs = _normalize(np.stack(pdf["_v"].to_numpy()).astype(np.float64))
                pdf = pdf.drop(columns=["_v"])
                pdf["cluster"] = np.argmax(vecs @ bc.value.T, axis=1)
                yield pdf

        base = df.select(
            F.col(id_col), F.col(vec_col), F.col(vec_col).alias("_v")
        )
        schema = f"{id_col} long, {vec_col} array<float>, cluster int"
        # cluster-partitioned posting lists of vectors (repartition so each
        # cluster's members are co-located for the probe scan)
        self.assigned = (
            base.mapInPandas(assign, schema=schema)
            .repartition("cluster")
            .persist()
        )
        self.assigned.count()  # materialize

    def search(self, queries: np.ndarray, k: int = 5, n_probe: int = 4
               ) -> pd.DataFrame:
        """queries: (m, dim) -> DataFrame (q, nn, cos, rnk). Exact within
        the probed clusters; deterministic ties by nn asc."""
        from pyspark.sql import functions as F

        q = _normalize(np.asarray(queries, dtype=np.float64))
        sims = q @ self.centroids.T
        probe = np.argsort(-sims, axis=1)[:, :n_probe]
        clusters = sorted({int(c) for row in probe for c in row})
        bq = self.spark.sparkContext.broadcast((q, probe))

        id_col, vec_col = self.id_col, self.vec_col  # closures must not
        # capture self (it holds the SparkContext and cannot pickle)

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = _normalize(
                    np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                )
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                cl = pdf["cluster"].to_numpy()
                qs, probes = bq.value
                out_q, out_nn, out_cos = [], [], []
                for qi in range(qs.shape[0]):
                    mask = np.isin(cl, probes[qi])
                    if not mask.any():
                        continue
                    cos = vecs[mask] @ qs[qi]
                    sub_ids = ids[mask]
                    o = np.lexsort((sub_ids, -cos))[:k]
                    out_q.extend([qi] * o.size)
                    out_nn.extend(sub_ids[o])
                    out_cos.extend(cos[o])
                yield pd.DataFrame({"q": out_q, "nn": out_nn, "cos": out_cos})

        cand = self.assigned.filter(F.col("cluster").isin(clusters))
        parts = cand.mapInPandas(score, schema="q int, nn long, cos double")
        from pyspark.sql.window import Window

        w = Window.partitionBy("q").orderBy(F.desc("cos"), "nn")
        return (
            parts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .orderBy("q", "rnk")
        )

    def unpersist(self):
        self.assigned.unpersist()
