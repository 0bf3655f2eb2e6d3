"""Distributed PCA over embedding columns.

Part of the LLM-corpus layer (the reference engine's scope ends at
the WAP loop — ``/root/reference`` ``src/wap_flow.py``): reducing
embedding dimensionality before ANN indexing / clustering / near-dup
scoring is a standard corpus-pipeline step, and at 100 TB the fit
must run ON the cluster, not on a driver-side sample.

Spark-first shape (classic two-stage moment reduction):

- **Fit is ONE scan + an O(d^2) reduction.** Each Arrow batch emits
  its partial row count, coordinate sums, and Gram matrix
  (``X^T X``) as flat arrays; partials are reduced by a tiny
  ``posexplode -> groupBy(pos) -> SUM`` (``d + d^2`` keys after
  map-side combine, independent of corpus size). The driver receives
  exactly ``d^2 + d + 1`` numbers — a 100 TB corpus costs the driver
  the same as a 100 MB one. The ``d x d`` eigensolve
  (``numpy.linalg.eigh``) is driver-side by design: for embedding
  dims (64-4096) it is microseconds-to-seconds, and its input is
  already partition-order-independent (below).
- **Transform is map-only**: one ``(x - mean) @ V^T`` numpy matmul
  per Arrow batch; the model (``k x d`` doubles) ships in the UDF
  closure — broadcast-sized state, no shuffle.

Determinism (this repo's hard rule — results must not depend on
partitioning or cluster size):

- Per-row products/values are quantized to FIXED-POINT int64
  (``round(v * 10^6)``) BEFORE any summation; integer sums are exact
  and associative, so the reduced moments — and therefore the
  eigenbasis — are bit-identical on any partitioning. (Raw float64
  partials would differ in the last ulp per batch split; the
  measured k-means/centroid lessons in NOTES.md apply here
  verbatim.)
- Eigenvector SIGN is pinned: each component is flipped so its
  largest-|coordinate| entry is positive (ties -> lowest index).

The bit-exact cross-engine companion is ``embedding_pca_covariance``
(the same quantized second-moment arithmetic replayed in SQL);
``embedding_pca_project_gate`` asserts the eigensolve's invariants
in-plan (orthonormality, eigenvalue equation, projected variance ==
eigenvalue) so a PCA regression fails the driver hash gate even
though an eigenbasis itself is not SQL-expressible.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

# fixed-point scale for moment quantization: 1e6 keeps |partial| for
# unit-ish embedding products < 1e6 per row, so even 10^12 rows stay
# inside int64 after per-executor partials (Spark SUM promotes to
# exact long; overflow would raise, not wrap)
_SCALE = 1_000_000


@dataclasses.dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray  # (d,) float64
    components: np.ndarray  # (k, d) float64, rows orthonormal
    eigenvalues: np.ndarray  # (k,) float64, non-increasing
    total_variance: float  # trace of the covariance matrix
    n: int


def _moment_partials(col: str, d: int):
    """mapInPandas body: per Arrow batch, ONE row of exact int64
    moment partials (n, sum vector, row-major Gram upper triangle
    packed full d*d for simplicity — d is small)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            vs = [v for v in b[col] if v is not None]
            if not vs:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            # quantize PER ROW-PAIR-ELEMENT, then sum: integer partials
            # are associative, so batching cannot change the total
            s = np.rint(x * _SCALE).astype(np.int64).sum(axis=0)
            g = np.zeros((d, d), dtype=np.int64)
            for lo in range(0, len(x), 1024):  # bound the (rows,d,d) temp
                chunk = x[lo : lo + 1024]
                outer = chunk[:, :, None] * chunk[:, None, :]
                g += np.rint(outer * _SCALE).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {"n": [len(x)], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return gen


def pca_fit(df: DataFrame, col: str = "embedding", k: int = 8) -> PcaModel:
    """Fit PCA on an ``array<float>`` column: one scan, O(d^2) driver
    state, partition-order-independent result (module docstring)."""
    spark = df.sparkSession
    first = df.select(col).filter(F.col(col).isNotNull()).first()
    if first is None:
        raise ValueError("no vectors to fit")
    d = len(first[0])
    partials = fan_out(df.select(col)).mapInPandas(
        _moment_partials(col, d), "n long, s array<long>, g array<long>"
    )
    # exact elementwise reduce of the partial arrays: d + d^2 keys,
    # map-side combined, driver collects d^2 + d + 1 longs total
    red = partials.select(
        "n", F.posexplode(F.concat("s", "g")).alias("pos", "v")
    ).groupBy("pos").agg(
        F.sum("v").alias("v"), F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n")
    )
    rows = red.collect()
    n = next(int(r["n"]) for r in rows if r["pos"] == 0)
    flat = np.zeros(d + d * d, dtype=np.float64)
    for r in rows:
        flat[r["pos"]] = r["v"]
    s, g = flat[:d] / _SCALE, flat[d:].reshape(d, d) / _SCALE
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, d)
    for i in range(k):  # pin sign: largest-|coord| entry positive
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(
        mean=mean,
        components=comps,
        eigenvalues=np.maximum(evals[order], 0.0),
        total_variance=float(np.trace(cov)),
        n=n,
    )


def pca_transform(
    df: DataFrame,
    model: PcaModel,
    col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted basis — map-only, one numpy
    matmul per Arrow batch, no shuffle."""
    mean, comps = model.mean, model.components
    d = mean.shape[0]

    @F.pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else np.full(d, np.nan)
                for v in vs
            ]
        )
        y = (x - mean) @ comps.T
        return pd.Series(list(y))

    return df.withColumn(out_col, _proj(F.col(col)))


@register(
    "embedding_pca_covariance",
    """
    WITH ei AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(range(1, 9)) AS i)
    )
    SELECT a.i AS i, b.i AS j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(a.x * b.x AS DECIMAL(24,6))) AS DOUBLE) AS sum_xy
    FROM ei a JOIN ei b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY a.i, b.i
    """,
    doc="bit-exact companion to the PCA fit: the second-moment "
    "(Gram) entries for the first 8 embedding dims, each product "
    "staged through DECIMAL(24,6) before the exact decimal sum — the "
    "same quantize-then-sum arithmetic pca_fit uses in int64 space, "
    "replayed cross-engine. 36 upper-triangle entries; the Spark "
    "side is JVM-only (posexplode + decimal sums, map-side "
    "combined).",
)
def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ei = fan_out(e.select("vec_id", F.slice("embedding", 1, 8).alias("_h"))).select(
        "vec_id", F.posexplode_outer("_h").alias("p", "x")
    ).filter(F.col("p").isNotNull()).select(
        "vec_id",
        (F.col("p") + 1).alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    ej = ei.select(
        "vec_id", F.col("i").alias("j"), F.col("x").alias("y")
    )
    return (
        ei.join(ej, "vec_id")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(24,6)"))
            .cast("double")
            .alias("sum_xy"),
        )
    )


@register(
    "embedding_pca_project_gate",
    """
    SELECT CAST(8 AS BIGINT) AS k, CAST(64 AS BIGINT) AS d,
           CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n,
           true AS orthonormal_ok,
           true AS eigs_descending_ok,
           true AS explained_ratio_ok,
           true AS projected_var_ok,
           true AS projected_mean_ok
    """,
    doc="assertion-gate for the non-SQL-expressible eigensolve: fit "
    "PCA(k=8) on the embeddings, project the corpus, and verify "
    "IN-PLAN that (a) the basis is orthonormal, (b) eigenvalues are "
    "non-increasing, (c) 0 < explained ratio <= 1, (d) the DATA-side "
    "variance of each projected coordinate (decimal-staged Spark "
    "aggregate over every row) matches its eigenvalue to 1e-3 "
    "relative, and (e) projected coordinates are mean-centered. The "
    "oracle requires every boolean true plus the exact corpus count, "
    "so a fit/transform regression fails the driver hash gate.",
)
def embedding_pca_project_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(e, "embedding", k=8)
    k, d = model.components.shape
    vvt = model.components @ model.components.T
    orthonormal = bool(np.abs(vvt - np.eye(k)).max() < 1e-8)
    descending = bool(np.all(np.diff(model.eigenvalues) <= 1e-12))
    ratio = float(model.eigenvalues.sum() / max(model.total_variance, 1e-300))
    explained = bool(0.0 < ratio <= 1.0 + 1e-12)

    # posexplode_OUTER + null filter: the outer generator dodges the
    # InferFiltersFromGenerate scan-filter pathology (NOTES.md rule)
    proj = (
        pca_transform(fan_out(e), model)
        .select(F.posexplode_outer("pca").alias("c", "v"))
        .filter(F.col("c").isNotNull())
    )
    stats = (
        proj.groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("s"),
            F.sum((F.col("v") * F.col("v")).cast("decimal(24,6)"))
            .cast("double")
            .alias("ss"),
        )
        .collect()
    )
    var_ok = mean_ok = True
    for r in sorted(stats, key=lambda r: r["c"]):
        m = r["s"] / r["n"]
        var = r["ss"] / r["n"] - m * m
        ev = float(model.eigenvalues[r["c"]])
        var_ok &= abs(var - ev) <= 1e-3 * max(ev, 1e-9) + 1e-9
        mean_ok &= abs(m) < 1e-3
    return spark.createDataFrame(
        [
            (
                k,
                d,
                model.n,
                orthonormal,
                descending,
                explained,
                bool(var_ok),
                bool(mean_ok),
            )
        ],
        "k long, d long, n long, orthonormal_ok boolean, "
        "eigs_descending_ok boolean, explained_ratio_ok boolean, "
        "projected_var_ok boolean, projected_mean_ok boolean",
    )
