"""Distributed k-means clustering over embedding columns.

The reference engine has no clustering surface (its scope ends at the
WAP loop — see ``/root/reference`` ``src/wap_flow.py``); this is part
of the LLM-corpus layer: cluster-based corpus curation (semantic
dedup, diversity sampling, domain bucketing) needs a k-means that
runs ON the cluster, not on a driver-side sample like the IVF coarse
trainer (:func:`..similarity.ivf_train_centroids`).

Spark-first shape (the same layout Spark MLlib's KMeans uses, minus
its RDD API):

- **Assignment is a map-only stage**: the centroid matrix is k x dim
  doubles (bounded state, shipped in the UDF closure = broadcast);
  distances are one ``(rows, k, dim)`` numpy kernel per Arrow batch;
  argmin happens per row inside the projection. No shuffle, no
  per-row Python.
- **Update is one partial-aggregable shuffle** keyed by
  ``(cluster, dim)`` — cardinality k x dim after map-side combine,
  regardless of corpus size. The driver collects exactly k x dim
  (sum, count) pairs per iteration; a 100 TB corpus costs the driver
  the same as a 100 MB one.

Cross-engine determinism (the DuckDB oracle replays the identical
fixed-iteration schedule):

- Seeds are the k lowest-id vectors (no RNG — reproducible on any
  cluster size and in plain SQL).
- Distances are quantized to DECIMAL(20,6) BEFORE the argmin; ties
  break toward the lower cluster id. Raw double argmin would let
  last-ulp summation-order noise flip borderline assignments.
- Centroid updates stage each component through DECIMAL(20,6) before
  the exact decimal sum, then divide in double space — both engines
  produce bit-identical centroid doubles, so iteration 2 sees the
  same geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

# coarse on purpose: DuckDB casts double->decimal via 10^scale double
# multiplication (±1e-16 relative noise); finer scales make
# cross-engine flips MORE likely, not less (see NOTES.md determinism
# rules, measured on similarity_label_centroid_stats)
DIST_SCALE = "decimal(20,6)"


def _dist_udf(cmat: np.ndarray):
    """Arrow-batched squared-L2 distances to every centroid.

    Returns an ``array<double>`` of len(cmat) per row, aligned with
    the centroid order the caller tracks. Direct ``(x - c)**2``
    expansion (not the ``|x|^2 - 2xc + |c|^2`` trick): it matches the
    oracle's SUM((val-cval)^2) term-for-term and cannot cancel
    catastrophically for near-duplicate vectors.
    """
    mat = np.ascontiguousarray(cmat, dtype=np.float64)
    dim = mat.shape[1]

    @F.pandas_udf("array<double>")
    def _dists(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else np.full(dim, np.inf)
                for v in vs
            ]
        )
        # (rows, k, dim) diff; Arrow batches bound the temporary
        d = ((x[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(list(d))

    return _dists


def _assign(
    df: DataFrame, id_col: str, vec_col: str, ids: list[int], cmat: np.ndarray
) -> DataFrame:
    """Map-only nearest-centroid assignment: (id_col, cluster)."""
    udf = _dist_udf(cmat)
    id_arr = F.array(*[F.lit(int(c)) for c in ids])
    out = df.select(
        F.col(id_col),
        udf(F.col(vec_col).cast("array<double>")).alias("_kd"),
    )
    qd = F.transform("_kd", lambda d: d.cast(DIST_SCALE))
    # first position of the min = lowest cluster id on ties (ids are
    # kept sorted ascending by the caller)
    pos = F.array_position(qd, F.array_min(qd)).cast("int")
    return out.select(
        F.col(id_col), F.element_at(id_arr, pos).cast("int").alias("cluster")
    )


def kmeans_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic fixed-schedule Lloyd k-means; returns
    ``(id_col, cluster, cluster_size)``.

    ``iters`` counts assignment rounds: seeds -> assign -> update ->
    assign ... (``iters - 1`` centroid updates). Clusters that lose
    all members are dropped (their id never reappears), mirroring the
    SQL replay where an empty cluster simply vanishes from the
    centroid CTE.
    """
    corpus = fan_out(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    )
    seeds = (
        corpus.filter(F.col(id_col) < k)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .collect()
    )  # bounded: k rows
    seeds.sort(key=lambda r: r[id_col])
    ids = [int(r[id_col]) for r in seeds]
    cmat = np.array([r["_v"] for r in seeds], dtype=np.float64)

    for _ in range(iters - 1):
        assigned = _assign(corpus, id_col, vec_col, ids, cmat)
        # one (cluster, dim)-keyed shuffle; k*dim rows reach the driver
        flat = assigned.join(corpus, id_col).select(
            "cluster",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "_ord", "_val"
            ),
        )
        rows = (
            flat.groupBy("cluster", "_ord")
            .agg(
                F.sum(F.col("_val").cast(DIST_SCALE)).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            # float(Decimal) and CAST(decimal AS DOUBLE) are both
            # correctly rounded -> bit-identical centroid components
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["_ord"])] = (
                float(r["_s"]) / int(r["_n"])
            )
        ids = sorted(by_cluster)
        dim = cmat.shape[1]
        cmat = np.array(
            [[by_cluster[c][d] for d in range(dim)] for c in ids],
            dtype=np.float64,
        )

    final = _assign(corpus, id_col, vec_col, ids, cmat)
    sizes = final.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return final.join(sizes, "cluster").select(
        id_col, "cluster", "cluster_size"
    )


@register(
    "embedding_kmeans_clusters",
    """
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    seeds AS (
      SELECT vec_id AS cluster, ord, val FROM flat WHERE vec_id < 8
    ),
    d1 AS (
      SELECT f.vec_id, s.cluster,
             CAST(CAST(SUM((f.val - s.val) * (f.val - s.val))
                       AS DECIMAL(20,6)) AS DOUBLE) AS d
      FROM flat f JOIN seeds s USING (ord)
      GROUP BY 1, 2
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, cluster) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    c2 AS (
      SELECT a.cluster, f.ord,
             CAST(SUM(CAST(f.val AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(*) AS val
      FROM a1 a JOIN flat f USING (vec_id)
      GROUP BY 1, 2
    ),
    d2 AS (
      SELECT f.vec_id, c.cluster,
             CAST(CAST(SUM((f.val - c.val) * (f.val - c.val))
                       AS DECIMAL(20,6)) AS DOUBLE) AS d
      FROM flat f JOIN c2 c USING (ord)
      GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, cluster) AS rn
        FROM d2
      ) WHERE rn = 1
    )
    SELECT a2.vec_id, CAST(a2.cluster AS INT) AS cluster,
           CAST(sz.n AS BIGINT) AS cluster_size
    FROM a2 JOIN (SELECT cluster, COUNT(*) AS n FROM a2 GROUP BY 1) sz
      USING (cluster)
    """,
    doc="distributed Lloyd k-means (k=8, 2 assignment rounds, "
    "lowest-id seeds) over the embeddings corpus; the oracle replays "
    "the identical fixed schedule in SQL. Assignment is map-only "
    "(centroids broadcast in the UDF closure, one numpy kernel per "
    "Arrow batch); each update is one (cluster,dim)-keyed shuffle "
    "whose reduced cardinality is k*dim regardless of corpus size.",
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, "vec_id", "embedding", k=8, iters=2)
