"""Similarity search over embedding columns (``array<float>``).

Two paths, same output contract (query_id, neighbor_id, cosine, rank):

- **brute force** — the correctness baseline: broadcast the (small)
  query set against the full corpus; cosine via ``zip_with`` +
  ``aggregate`` folds (pure JVM, codegen'd — no UDF, no Python).
  At 100 TB this is a single scan of the corpus per query batch:
  Catalyst turns the crossJoin into BroadcastNestedLoopJoin, so the
  big side is never shuffled.
- **random-hyperplane LSH (ANN)** — the scale path: L hash tables of
  b sign-bits each (seeded, driver-generated hyperplanes shipped as
  literals); candidates = bucket collisions in any table; exact
  cosine re-rank of candidates only. Cost O(corpus × L·b dots) for
  bucketing + O(candidates) re-rank, instead of O(queries × corpus).

Scores are emitted as DECIMAL(10,6): both engines' double→decimal
casts are correctly-rounded, which makes cross-engine comparison
exact, whereas double ``round()`` implementations can differ in the
last ulp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from no_jvm_wap_with_iceberg_spark.functions.overlap import overlap_actions
from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out
from no_jvm_wap_with_iceberg_spark.functions.vector import cosine_similarity
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

COSINE_SCALE = "decimal(10,6)"

# ANN quality floor asserted by the recall gate (driver query, pytest,
# AND the sf0.1 bench run): tuned defaults measure 0.93-0.98 across
# sf0.001/0.01/0.1 (LSH 16 tables x 4 bits; IVF 96 cells, nprobe=48 —
# finer cells at the same probed fraction as the old 16/8: round-8
# grid over (cells, nprobe) recorded in NOTES.md), so 0.8 holds with
# wide margin everywhere the gate executes
RECALL_BOUND = 0.8


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: every query against the whole corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        )
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv"))
            .cast(COSINE_SCALE)
            .cast("double")
            .alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _exact_topk_batched(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via one numpy matmul per Arrow batch —
    the recall gate's ground-truth oracle, vectorized (guide §4.2).

    Same semantics as :func:`brute_force_topk` (every query scored
    against the whole corpus, self excluded, float64 arithmetic) at a
    fraction of its cost: the JVM-expression cosine evaluates the
    dot/norm fold per PAIR (queries × corpus rows), where one
    ``Q @ C.T`` per batch amortizes it to a BLAS call; per-batch
    top-k bounds the shuffle to queries × k rows per batch, and one
    tiny window picks the global top-k. Tie handling differs from the
    decimal-quantized ranker only in float ulps — the gate's boolean
    asserts recall >= 0.8 against a measured 0.93–0.98, so ulp-order
    tie shifts can never flip it (and its oracle rows are literals).
    The query side is the gate's fixed probe set (bounded by
    construction), so collecting it to the driver is O(k·dim), never
    O(corpus)."""
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        Qn = np.where(qn > 0, Q / qn, 0.0)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                Cn = np.where(cn > 0, C / cn, 0.0)
            S = Qn @ Cn.T  # (queries, batch)
            # zero-norm rows score NULL in the expression form and
            # sort last under DESC — exclude them outright here
            S[:, (cn == 0).ravel()] = -np.inf
            S[:, :][np.equal.outer(q_ids, ids)] = -np.inf  # self
            kk = min(k, S.shape[1])
            top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            out_q, out_n, out_s = [], [], []
            for i in range(len(q_ids)):
                cols = top[i]
                keep = cols[np.isfinite(S[i, cols])]
                out_q.extend([q_ids[i]] * len(keep))
                out_n.extend(ids[keep])
                out_s.extend(S[i, keep])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                    "cosine": np.array(out_s, dtype=np.float64),
                }
            )

    parts = fan_out(
        corpus.select(
            F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
        )
    ).mapInPandas(
        score, "query_id bigint, neighbor_id bigint, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return parts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_bucket_codes(
    df: DataFrame,
    vec_col: str,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Add ``_codes`` (array<long>, one bucket id per hash table):
    sign-bit codes of the vector against each table's hyperplanes.

    One Arrow-batched numpy kernel — ``(rows, dim) @ (dim, T*B)`` per
    batch — replaces the earlier per-plane ``zip_with``/``aggregate``
    expressions: higher-order functions are interpreted per element,
    and T*B*dim interpreted multiply-adds per row measured 20-40x
    slower than the matmul at sf0.1. Hyperplanes are seeded
    driver-side and closed over the UDF (shipped once per executor);
    the compact one-row-per-vector output is what callers cache before
    exploding per table."""
    planes = _hyperplanes(n_tables, n_bits, dim, seed)
    mat = planes.reshape(n_tables * n_bits, dim).T.copy()  # (dim, T*B)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _codes(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else np.zeros(dim)
                for v in vs
            ]
        )
        bits = (x @ mat) > 0  # (rows, T*B)
        codes = (
            bits.reshape(len(x), n_tables, n_bits) * weights
        ).sum(axis=2)
        return pd.Series(list(codes.astype(np.int64)))

    return fan_out(df).withColumn(
        "_codes", _codes(F.col(vec_col).cast("array<double>"))
    )


def lsh_bucket_ids(
    df: DataFrame,
    vec_col: str,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Add (table, bucket) rows per input row — the exploded view of
    :func:`lsh_bucket_codes` (table = position in the code array)."""
    coded = lsh_bucket_codes(df, vec_col, n_tables, n_bits, dim, seed)
    return coded.select(
        *df.columns, F.posexplode("_codes").alias("table", "bucket")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: LSH bucket collision candidates, exact
    cosine re-rank. Recall < 1 by construction (see pytest which
    measures it against brute force)."""
    qb = lsh_bucket_ids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv",
        n_tables,
        n_bits,
        dim,
    )
    cb = lsh_bucket_ids(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "_cv",
        n_tables,
        n_bits,
        dim,
    )
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_cv"))
        .cast(COSINE_SCALE)
        .cast("double")
        .alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ----------------------------------------------------------------------
# registered correctness queries
# ----------------------------------------------------------------------
@register(
    "similarity_cosine_topk",
    """
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM flat GROUP BY 1),
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.val*b.val) AS dot
      FROM flat a JOIN flat b ON a.ord = b.ord AND b.vec_id <> a.vec_id
      WHERE a.vec_id < 10
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(CAST(dot / (na.nrm * nb.nrm) AS DECIMAL(10,6)) AS DOUBLE) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = query_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="brute-force cosine top-5 for query vectors vec_id<10 "
    "(exact baseline for the ANN path)",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 10))


@register(
    "similarity_label_centroid_stats",
    """
    WITH flat AS (
      SELECT label, vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    )
    SELECT label,
           COUNT(DISTINCT vec_id) AS n_vectors,
           CAST(SUM(CAST(val AS DECIMAL(20,6))) AS DOUBLE) AS component_sum,
           CAST(MIN(val) AS DOUBLE) AS min_component,
           CAST(MAX(val) AS DOUBLE) AS max_component
    FROM flat GROUP BY label
    """,
    doc="per-label embedding statistics (cluster sanity profile)",
)
def similarity_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", "vec_id", F.explode(F.col("embedding").cast("array<double>")).alias("val")
    )
    return flat.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vectors"),
        # DECIMAL(20,6), NOT finer: DuckDB casts double->decimal by
        # multiplying by 10^scale in double arithmetic (±1e-16
        # relative noise) while Spark goes through the exact shortest
        # repr — the flip probability per value is (1e-16*|v|)/step,
        # so a FINER scale makes divergence MORE likely (measured:
        # scale 9 flipped 1 addend in 200k at sf0.1, scale 12 flipped
        # 3 labels). At scale 6 the noise is 10 orders below the step.
        F.sum(F.col("val").cast("decimal(20,6)")).cast("double").alias("component_sum"),
        F.min("val").cast("double").alias("min_component"),
        F.max("val").cast("double").alias("max_component"),
    )


@register(
    "similarity_ann_lsh_topk",
    None,  # approximate by construction -> rows-only check; pytest
    # measures recall against the brute-force baseline
    doc="ANN via random-hyperplane LSH (16 tables x 4 bits) with exact re-rank",
)
def similarity_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(e, e.filter(F.col("vec_id") < 10))


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means cells + probed exact re-rank
# ----------------------------------------------------------------------
def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 3,
    max_train_vectors: int = 100_000,
    seed: int = 11,
) -> np.ndarray:
    """Lloyd-iterate coarse centroids on a BOUNDED sample of the corpus.

    Driver-side numpy over at most ``max_train_vectors`` rows — exactly
    how IVF indexes are trained in production (the index is small; the
    DATA never leaves the cluster except this sample). The cap holds
    regardless of corpus size: the sample fraction is derived from the
    corpus count and a ``limit`` hard-bounds the collect, so a 100 TB
    corpus costs the driver the same memory as a 100 MB one.
    Deterministic: seeded sample, seeded init.
    """
    # probe with limit(cap+1): in the common under-cap case this IS the
    # training set and no count job runs at all; only an over-cap corpus
    # pays the count (footer-only under parquet aggregate pushdown) to
    # derive a uniform sampling fraction, then a bounded re-collect
    probe = corpus.select(vec_col).limit(max_train_vectors + 1).toPandas()
    if len(probe) > max_train_vectors:
        del probe  # free the over-cap probe BEFORE the re-collect:
        # holding both doubles peak driver memory at the default cap
        n = corpus.count()
        # oversample by 10% so the post-sample limit() almost always
        # has the full budget to draw from, then hard-cap
        frac = min(1.0, 1.1 * max_train_vectors / n)
        probe = (
            corpus.select(vec_col)
            .sample(fraction=frac, seed=seed)
            .limit(max_train_vectors)
            .toPandas()
        )
    x = np.array(probe[vec_col].tolist(), dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_assign_cells(
    df: DataFrame, vec_col: str, cents: np.ndarray, nprobe: int = 1
) -> DataFrame:
    """Attach the ``nprobe`` nearest cell ids as an array column
    ``_cells`` (normalized-dot; centroids are unit vectors so dot
    order == cosine order, ties broken by lower cell id).

    Arrow-batched numpy kernel — one ``(rows, dim) @ (dim, cells)``
    matmul per batch; the earlier per-centroid ``dot_product``
    expressions were interpreted per element (same pathology as the
    LSH codes, see :func:`lsh_bucket_codes`)."""
    cmat = np.asarray(cents, dtype=np.float64).T.copy()  # (dim, cells)
    dim = cmat.shape[0]
    probe = min(nprobe, cmat.shape[1])

    @F.pandas_udf("array<int>")
    def _cells(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else np.zeros(dim)
                for v in vs
            ]
        )
        scores = x @ cmat  # (rows, cells)
        # stable argsort on descending score = ascending on -score,
        # ties resolved toward the lower cell id (matches the previous
        # array_sort(struct(score, cell)) ordering)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :probe]
        return pd.Series(list(order.astype(np.int32)))

    return fan_out(df).withColumn(
        "_cells", _cells(F.col(vec_col).cast("array<double>"))
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 96,
    nprobe: int = 48,
) -> DataFrame:
    """IVF ANN: corpus rows live in their 1 nearest cell; queries
    probe their ``nprobe`` nearest cells; exact cosine re-rank runs
    only within probed cells.

    The cell equi-join is the only shuffle and it is keyed by a small
    int — at 100 TB the corpus side is written partitioned by cell
    (the inverted file), so probes prune to nprobe/n_cells of data.
    Defaults probe 50% of cells, same scan fraction as the previous
    16/8 defaults, but the FINER cells lift measured recall from a
    0.82 floor to 0.93-0.98 across sf0.001/0.01/0.1 (round-8 grid in
    NOTES.md; more Lloyd iterations were measured NOT to help at the
    old granularity — the wins come from cell count). At larger
    corpora lower nprobe/n_cells fractions regain their usual
    recall/cost dial.
    """
    cents = ivf_train_centroids(corpus, vec_col, n_cells)
    c_assigned = (
        ivf_assign_cells(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
            ),
            "_cv",
            cents,
            nprobe=1,
        )
        .select("neighbor_id", "_cv", F.element_at("_cells", 1).alias("_cell"))
    )
    q_assigned = ivf_assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv",
        cents,
        nprobe=nprobe,
    ).select("query_id", "_qv", F.explode("_cells").alias("_cell"))
    scored = (
        q_assigned.join(c_assigned, "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv"))
            .cast(COSINE_SCALE)
            .cast("double")
            .alias("cosine"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@register(
    "similarity_ann_ivf_topk",
    None,  # approximate by construction -> rows-only check; pytest
    # measures recall against the brute-force baseline
    doc="ANN via IVF (96 coarse k-means cells, nprobe=48) with exact re-rank",
)
def similarity_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(e, e.filter(F.col("vec_id") < 10))


@register(
    "embedding_quantize_int8",
    """
    WITH x AS (
      SELECT vec_id, CAST(u.v AS DOUBLE) AS v
      FROM embeddings, UNNEST(embedding) AS u(v)
    ),
    m AS (SELECT vec_id, MAX(ABS(v)) AS m FROM x GROUP BY 1),
    q AS (
      SELECT x.vec_id, v, m,
             CASE WHEN m = 0 THEN 0
                  ELSE LEAST(CAST(FLOOR(v / m * 127 + 0.5) AS INTEGER), 127)
             END AS q
      FROM x JOIN m USING (vec_id)
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(MAX(m) AS DOUBLE) AS maxabs,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           CAST(SUM(CAST(ABS(v - q * m / 127) AS DECIMAL(18,9)))
                AS DOUBLE) AS recon_err
    FROM q GROUP BY vec_id
    """,
    doc="symmetric int8 vector quantization (the ANN-at-scale "
    "compression step: 4x smaller vectors, SIMD int8 dot products): "
    "per-vector maxabs scale, q = clamp(round(v/m*127)), plus exact "
    "reconstruction-error stats. floor(x+0.5) instead of round() "
    "because round() half-way behavior differs across engines while "
    "floor of identical doubles cannot; the per-element error is "
    "staged through DECIMAL(18,9) so the per-vector sum is "
    "order-independent. Plan: one posexplode, two shuffles on vec_id "
    "(scale agg, final agg) — at 100 TB this is a scan-shaped pass.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("_pos", "_f")
    ).select("vec_id", F.col("_f").cast("double").alias("v"))
    m = x.groupBy("vec_id").agg(F.max(F.abs(F.col("v"))).alias("m"))
    q = x.join(m, "vec_id").withColumn(
        "q",
        F.when(F.col("m") == 0, F.lit(0)).otherwise(
            F.least(
                F.floor(F.col("v") / F.col("m") * 127 + 0.5).cast("int"),
                F.lit(127),
            )
        ),
    )
    return q.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.max("m").cast("double").alias("maxabs"),
        F.sum("q").cast("bigint").alias("sum_q"),
        F.sum(
            F.abs(F.col("v") - F.col("q") * F.col("m") / 127).cast(
                "decimal(18,9)"
            )
        )
        .cast("double")
        .alias("recon_err"),
    )


# ----------------------------------------------------------------------
# Product quantization (PQ)
# ----------------------------------------------------------------------
def _pq_dist_udf(cmats: np.ndarray):
    """Arrow-batched per-subspace squared-L2 distances to every
    codebook entry: returns a flat ``array<double>`` of M*k values
    per row (subspace-major). One numpy kernel per batch — the
    codebooks (M x k x sub doubles, bounded state) ship in the
    closure, i.e. broadcast."""
    mats = np.ascontiguousarray(cmats, dtype=np.float64)
    n_sub, k, sub_dim = mats.shape
    dim = n_sub * sub_dim

    @F.pandas_udf("array<double>")
    def _d(vs: pd.Series) -> pd.Series:
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
        out = np.empty((len(x), n_sub * k))
        for m in range(n_sub):
            xm = x[:, m * sub_dim : (m + 1) * sub_dim]
            out[:, m * k : (m + 1) * k] = (
                (xm[:, None, :] - mats[m][None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series(list(out))

    return _d


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    k: int = 8,
) -> DataFrame:
    """Product-quantize vectors: ``(id, code_0..code_{M-1}, q_err)``.

    The ANN-at-scale compression step beyond int8
    (:func:`embedding_quantize_int8`): M sub-codebooks of k entries
    turn a D-dim float vector into M small codes (here 64 dims ->
    4 bytes, 64x), and asymmetric-distance search scans codes with
    per-query lookup tables instead of touching floats.

    Spark-first shape: codebooks are bounded state broadcast in the
    UDF closure; encoding is MAP-ONLY (one Arrow kernel per batch +
    JVM argmin); nothing shuffles until the caller aggregates. A
    100 TB corpus encodes at scan speed.

    Determinism (same rules as :mod:`.clustering`): codebooks are the
    k lowest-id vectors' sub-slices (no RNG; iterative refinement is
    proven separately by ``embedding_kmeans_clusters``); distances
    quantize to DECIMAL(20,6) BEFORE the argmin, ties break toward
    the lower code; ``q_err`` sums the per-subspace quantized minima
    through exact decimal arithmetic so partitioning cannot reorder
    a float sum.
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
    full = np.array([r["_v"] for r in seeds], dtype=np.float64)
    dim = full.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    cmats = full.reshape(len(ids), n_sub, sub).transpose(1, 0, 2)

    udf = _pq_dist_udf(cmats)
    id_arr = F.array(*[F.lit(int(c)) for c in ids])
    out = corpus.select(
        F.col(id_col),
        udf(F.col(vec_col).cast("array<double>")).alias("_kd"),
    ).select(
        id_col,
        F.transform("_kd", lambda d: d.cast("decimal(20,6)")).alias("_qd"),
    )
    cols = [F.col(id_col)]
    err = None
    for m in range(n_sub):
        sub_arr = F.slice("_qd", m * k + 1, k)
        pos = F.array_position(sub_arr, F.array_min(sub_arr)).cast("int")
        cols.append(
            F.element_at(id_arr, pos).cast("int").alias(f"code_{m}")
        )
        # already exact at scale 6 (came through the decimal cast), so
        # the cross-subspace sum is exact decimal arithmetic
        e = F.array_min(sub_arr)
        err = e if err is None else err + e
    cols.append(err.cast("double").alias("q_err"))
    return out.select(*cols)


@register(
    "embedding_pq_codes",
    """
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    sub AS (
      SELECT vec_id, CAST((ord - 1) // 16 AS INT) AS m,
             (ord - 1) % 16 AS p, val
      FROM flat
    ),
    seeds AS (SELECT vec_id AS code, m, p, val FROM sub WHERE vec_id < 8),
    d AS (
      SELECT s.vec_id, s.m, c.code,
             CAST(CAST(SUM((s.val - c.val) * (s.val - c.val))
                       AS DECIMAL(20,6)) AS DOUBLE) AS dist
      FROM sub s JOIN seeds c ON s.m = c.m AND s.p = c.p
      GROUP BY 1, 2, 3
    ),
    a AS (
      SELECT vec_id, m, code, dist FROM (
        SELECT vec_id, m, code, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM d
      ) WHERE rn = 1
    )
    SELECT vec_id,
           CAST(MAX(CASE WHEN m = 0 THEN code END) AS INT) AS code_0,
           CAST(MAX(CASE WHEN m = 1 THEN code END) AS INT) AS code_1,
           CAST(MAX(CASE WHEN m = 2 THEN code END) AS INT) AS code_2,
           CAST(MAX(CASE WHEN m = 3 THEN code END) AS INT) AS code_3,
           CAST(SUM(CAST(dist AS DECIMAL(20,6))) AS DOUBLE) AS q_err
    FROM a GROUP BY vec_id
    """,
    doc="product quantization: 64-dim vectors -> 4 sub-codes from "
    "8-entry seed codebooks (lowest-id slices; iterative codebook "
    "refinement is proven bit-exact separately by "
    "embedding_kmeans_clusters) + exact quantization error. The "
    "oracle replays the identical encode in SQL. Plan: codebooks "
    "broadcast in the UDF closure, encoding map-only at scan speed "
    "(one numpy kernel per Arrow batch, JVM decimal argmin), zero "
    "shuffles before the output.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return pq_encode(e, "vec_id", "embedding", n_sub=4, k=8)


def pq_adc_topk(
    codes: DataFrame,
    cmats: np.ndarray,
    code_ids: list[int],
    query_vecs: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query: precompute the M x k table of squared distances from
    the query's sub-slices to every codebook entry (driver-side numpy
    on bounded state), then score each corpus row as the SUM of M map
    lookups on its codes — pure JVM expressions, no floats touched,
    no Python in the scan. Each query is one map-only pass +
    ``TakeOrderedAndProject`` (per-partition top-k, driver merge of
    k-sized heads); the query set is small and effectively broadcast
    as plan literals. Returns ``(query_id, id_col, adc_dist, rank)``.

    This is the search half of :func:`pq_encode` — at 100 TB the
    scan touches 4 bytes/vector instead of 256, the classic PQ trade
    (approximate by construction: exactness of the ENCODE side is
    oracle-checked by ``embedding_pq_codes``; the table-lookup
    mechanics are asserted against a numpy reference in
    tests/test_operators.py).
    """
    mats = np.ascontiguousarray(cmats, dtype=np.float64)
    n_sub, kk, sub_dim = mats.shape
    outs = []
    for qid, qv in query_vecs:
        q = np.asarray(qv, dtype=np.float64).reshape(n_sub, sub_dim)
        table = ((q[:, None, :] - mats) ** 2).sum(axis=2)  # (M, k)
        dist = None
        for m in range(n_sub):
            lut = F.map_from_arrays(
                F.array(*[F.lit(int(c)) for c in code_ids]),
                F.array(*[F.lit(float(v)) for v in table[m]]),
            )
            term = F.element_at(lut, F.col(f"code_{m}"))
            dist = term if dist is None else dist + term
        outs.append(
            codes.select(
                F.lit(int(qid)).alias("query_id"),
                F.col(id_col),
                dist.alias("adc_dist"),
            )
            .orderBy("adc_dist", id_col)  # unique tie-break key
            .limit(k)
        )
    from functools import reduce

    ranked = reduce(lambda a, b: a.unionByName(b), outs)
    w = W.partitionBy("query_id").orderBy("adc_dist", id_col)
    return ranked.withColumn("rank", F.row_number().over(w))


@register(
    "dedup_pq_buckets",
    """
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    sub AS (
      SELECT vec_id, CAST((ord - 1) // 16 AS INT) AS m,
             (ord - 1) % 16 AS p, val
      FROM flat
    ),
    seeds AS (SELECT vec_id AS code, m, p, val FROM sub WHERE vec_id < 8),
    d AS (
      SELECT s.vec_id, s.m, c.code,
             CAST(CAST(SUM((s.val - c.val) * (s.val - c.val))
                       AS DECIMAL(20,6)) AS DOUBLE) AS dist
      FROM sub s JOIN seeds c ON s.m = c.m AND s.p = c.p
      GROUP BY 1, 2, 3
    ),
    a AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    codes AS (
      SELECT vec_id,
             CAST(MAX(CASE WHEN m = 0 THEN code END) AS INT) AS code_0,
             CAST(MAX(CASE WHEN m = 1 THEN code END) AS INT) AS code_1,
             CAST(MAX(CASE WHEN m = 2 THEN code END) AS INT) AS code_2,
             CAST(MAX(CASE WHEN m = 3 THEN code END) AS INT) AS code_3
      FROM a GROUP BY vec_id
    )
    SELECT code_0, code_1, code_2, code_3,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(vec_id) AS BIGINT) AS keep_vec_id,
           CAST(SUM(vec_id) AS BIGINT) AS member_sum
    FROM codes GROUP BY 1, 2, 3, 4 HAVING COUNT(*) > 1
    """,
    doc="semantic dedup candidates via PQ buckets: vectors sharing "
    "all 4 sub-codes land in one bucket (keep lowest id, the same "
    "keep-first convention as exact dedup); the coarse stage of "
    "embedding dedup at 100 TB — encode map-only, then ONE shuffle "
    "on the 4-byte code tuple instead of any pairwise work; exact "
    "verification over bucket members is dedup_embedding_lsh's "
    "verify stage. Oracle replays the encode + bucket in SQL.",
)
def dedup_pq_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(e, "vec_id", "embedding", n_sub=4, k=8)
    return (
        codes.groupBy("code_0", "code_1", "code_2", "code_3")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("keep_vec_id"),
            F.sum("vec_id").alias("member_sum"),
        )
        .filter(F.col("n_vectors") > 1)
    )


@register(
    "similarity_ann_recall_gate",
    """
    SELECT 'lsh' AS method, true AS recall_ok
    UNION ALL
    SELECT 'ivf', true
    """,
    doc="assertion-gate companion to the two rows-only ANN queries: "
    "Spark computes approximate AND brute-force top-5 for the same "
    "20 queries, measures recall in-plan (a count ratio over the "
    "joined result sets), and emits one boolean per method asserting "
    "recall >= 0.8 (measured 0.93-0.98 across sf0.001/0.01/0.1 for "
    "LSH 16x4 and IVF 96/48; pytest enforces the same bound at "
    "sf0.001); the "
    "oracle states both must be true. An ANN recall regression now "
    "fails the driver hash gate instead of hiding behind a rows-only "
    "row count.",
)
def similarity_ann_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 20)
    # the brute-force oracle is the expensive half; it runs as one
    # numpy matmul per Arrow batch with per-batch top-k
    # (_exact_topk_batched — guide §4.2) instead of the
    # JVM-expression-per-pair cross join, and its 20*k-row result is
    # cached ONCE — uncached it re-ran for every recall count (hit +
    # total per method = four full brute-force passes, guide §5)
    exact = _exact_topk_batched(e, queries, k=5).select(
        "query_id", "neighbor_id"
    ).cache()
    total = exact.count()

    def hit_count(build) -> int:
        return exact.join(
            build().select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()

    # the two hit counts are independent once the exact cache is warm
    # (the count above materialized it), so they run in sibling driver
    # threads and the cheaper method's wall hides inside the other's
    # (guide §2.6). Construction happens INSIDE each thunk so IVF's
    # driver-side centroid training job overlaps the LSH count too.
    n_lsh, n_ivf = overlap_actions(
        lambda: hit_count(lambda: ann_lsh_topk(e, queries, k=5)),
        lambda: hit_count(lambda: ann_ivf_topk(e, queries, k=5)),
    )
    # both rows are plain literals; the oracle cache is dead weight
    # past this point
    exact.unpersist()

    def gate_row(method: str, hit: int) -> DataFrame:
        return spark.createDataFrame(
            [(method, bool(hit >= RECALL_BOUND * total))],
            "method string, recall_ok boolean"
        )

    return gate_row("lsh", n_lsh).unionByName(gate_row("ivf", n_ivf))
