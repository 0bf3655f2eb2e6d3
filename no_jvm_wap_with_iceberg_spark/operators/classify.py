"""Distributed logistic-regression training for corpus quality
classification.

The reference engine has no learned-filter surface (its scope ends at
the WAP loop — ``/root/reference`` ``src/wap_flow.py``); this extends
the LLM-corpus layer: production corpus curation pairs rule-based
quality filters (:mod:`.text`) with a LEARNED classifier trained on
labeled documents, then scores the whole corpus with it (the
fastText-style quality-filter stage of public LLM data pipelines).

Spark-first shape (the same layout a parameter server degenerates to
when the model is tiny):

- **Gradient is one partial-aggregable job per iteration**: the
  weight vector (k doubles) ships in the plan as literals =
  broadcast; each executor computes sigmoid scores and per-feature
  gradient contributions inside whole-stage codegen; map-side combine
  reduces the shuffle to k scalars per partition. The driver collects
  exactly k (sum) values + a count per iteration — a 100 TB corpus
  costs the driver the same as a 100 MB one.
- **Scoring is map-only**: final weights are plan literals; no
  shuffle, no Python (the sigmoid is JVM ``exp``).

Cross-engine determinism (the DuckDB oracle replays the identical
fixed-iteration schedule in SQL CTEs — same pattern as
:mod:`.clustering`):

- Weights start at exactly 0.0 (no RNG).
- The sigmoid output is quantized to DECIMAL(20,6) BEFORE the
  gradient products: ``exp`` is not required to be correctly rounded,
  so Java's and DuckDB's libm can differ in the last ulp; the coarse
  decimal stage absorbs it (NOTES.md scale rule: keep raw-double
  staging scale <= 6).
- Gradient sums go through exact DECIMAL(20,6) arithmetic; the weight
  update ``w - lr * (g / n)`` uses the same double expression tree on
  the driver and in the SQL replay, so iteration 2 sees bit-identical
  weights.
- ``z = ((w0 + w1*x1) + w2*x2) + ...`` is built left-associated in
  both engines: each IEEE op is correctly rounded, so a fixed tree
  gives bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

# coarse on purpose — see NOTES.md: DuckDB casts double->decimal via a
# 10^scale double multiply (±1e-16 relative noise); finer scales are
# MORE flip-prone, not less
GRAD_SCALE = "decimal(20,6)"


def _z(weights: list[float], feature_cols: list[str]) -> Column:
    """Left-associated ``((w0 + w1*x1) + w2*x2) + ...`` — the fixed
    expression tree both engines evaluate, so z is bit-identical."""
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def _prob(weights: list[float], feature_cols: list[str]) -> Column:
    """Sigmoid quantized to DECIMAL(20,6) (absorbs libm exp ulps)."""
    z = _z(weights, feature_cols)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(0.0) - z))
    return p.cast(GRAD_SCALE).cast("double")


def logreg_fit(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    iters: int = 2,
    lr: float = 0.5,
) -> list[float]:
    """Batch gradient descent; returns ``[bias, w1, .., wk]``.

    One Spark job per iteration: a full-scan aggregate whose map-side
    combine reduces the shuffle to ``len(feature_cols) + 2`` scalars
    per partition. ``df`` is scanned ``iters`` times — cache it
    upstream for small corpora; at 100 TB the re-scan is the cheap
    part (no shuffle of row data at all).
    """
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        # stage the sigmoid through a projection so each gradient
        # aggregate references ONE computed column instead of
        # embedding its own exp() copy (inline-split hazard,
        # NOTES.md); CollapseProject keeps it staged (non-cheap expr,
        # referenced k+1 times)
        staged = df.select(
            F.col(label_col).alias("_y"),
            *[F.col(c) for c in feature_cols],
            _prob(w, feature_cols).alias("_p"),
        )
        aggs = [
            F.sum((F.col("_p") - F.col("_y")).cast(GRAD_SCALE)).alias("_g0")
        ]
        for j, c in enumerate(feature_cols, start=1):
            aggs.append(
                F.sum(
                    ((F.col("_p") - F.col("_y")) * F.col(c)).cast(GRAD_SCALE)
                ).alias(f"_g{j}")
            )
        aggs.append(F.count(F.lit(1)).alias("_n"))
        row = staged.agg(*aggs).collect()[0]  # bounded: k+2 scalars
        n = int(row["_n"])
        # float(Decimal) is correctly rounded; the update tree
        # ``w - lr * (g / n)`` matches the SQL replay op-for-op
        w = [
            w[j] - lr * (float(row[f"_g{j}"]) / n) for j in range(len(w))
        ]
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    prob_col: str = "prob",
    pred_col: str = "predicted",
) -> DataFrame:
    """Map-only scoring: appends quantized probability + 0/1 label."""
    p = _prob(weights, feature_cols)
    return df.withColumn(prob_col, p).withColumn(
        pred_col, (F.col(prob_col) >= F.lit(0.5)).cast("int")
    )


def text_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic numeric features from raw text alone —
    ``(id_col, x1, x2, x3)``: scaled char length, scaled word count,
    punctuation ratio. The schema-independent feature set the
    curation pipeline's learned-classifier gate uses (train with
    :func:`logreg_fit` on a labeled sample, score the corpus
    map-only with :func:`logreg_score`)."""
    text = F.col(text_col)
    punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[.,!?;:]", "")
    )
    return docs.select(
        id_col,
        (F.length(text).cast("double") / F.lit(1000)).alias("x1"),
        (F.size(F.split(text, " ")).cast("double") / F.lit(100)).alias("x2"),
        (
            punct.cast("double")
            / F.greatest(F.length(text), F.lit(1))
        ).alias("x3"),
    )


def _doc_features(docs: DataFrame) -> DataFrame:
    """Deterministic numeric features from the documents table.

    All integer-derived then exactly-rounded double divisions, so both
    engines compute bit-identical feature values.
    """
    punct = F.length("text") - F.length(
        F.regexp_replace("text", r"[.,!?;:]", "")
    )
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (F.col("n_chars").cast("double") / F.lit(1000)).alias("x1"),
        (
            F.size(F.split("text", " ")).cast("double") / F.lit(100)
        ).alias("x2"),
        (punct.cast("double") / F.col("n_chars")).alias("x3"),
    )


@register(
    "text_quality_logreg",
    """
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CAST(n_chars AS DOUBLE) / 1000 AS x1,
             CAST(len(string_split(text, ' ')) AS DOUBLE) / 100 AS x2,
             CAST(length(text)
                  - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS DOUBLE) / n_chars AS x3
      FROM documents
    ),
    it1 AS (
      SELECT f.*,
             CAST(CAST(1 / (1 + exp(0 - (((CAST(0 AS DOUBLE)
                  + CAST(0 AS DOUBLE) * x1) + CAST(0 AS DOUBLE) * x2)
                  + CAST(0 AS DOUBLE) * x3)))
                  AS DECIMAL(20,6)) AS DOUBLE) AS p
      FROM feat f
    ),
    g1 AS (
      SELECT SUM(CAST((p - y) AS DECIMAL(20,6))) AS g0,
             SUM(CAST((p - y) * x1 AS DECIMAL(20,6))) AS g1,
             SUM(CAST((p - y) * x2 AS DECIMAL(20,6))) AS g2,
             SUM(CAST((p - y) * x3 AS DECIMAL(20,6))) AS g3,
             COUNT(*) AS n
      FROM it1
    ),
    w1 AS (
      SELECT CAST(0 AS DOUBLE)
               - CAST(0.5 AS DOUBLE) * (CAST(g0 AS DOUBLE) / n) AS w0,
             CAST(0 AS DOUBLE)
               - CAST(0.5 AS DOUBLE) * (CAST(g1 AS DOUBLE) / n) AS w1,
             CAST(0 AS DOUBLE)
               - CAST(0.5 AS DOUBLE) * (CAST(g2 AS DOUBLE) / n) AS w2,
             CAST(0 AS DOUBLE)
               - CAST(0.5 AS DOUBLE) * (CAST(g3 AS DOUBLE) / n) AS w3
      FROM g1
    ),
    it2 AS (
      SELECT f.*,
             CAST(CAST(1 / (1 + exp(0 - (((w.w0
                  + w.w1 * x1) + w.w2 * x2) + w.w3 * x3)))
                  AS DECIMAL(20,6)) AS DOUBLE) AS p
      FROM feat f CROSS JOIN w1 w
    ),
    g2_ AS (
      SELECT SUM(CAST((p - y) AS DECIMAL(20,6))) AS g0,
             SUM(CAST((p - y) * x1 AS DECIMAL(20,6))) AS g1,
             SUM(CAST((p - y) * x2 AS DECIMAL(20,6))) AS g2,
             SUM(CAST((p - y) * x3 AS DECIMAL(20,6))) AS g3,
             COUNT(*) AS n
      FROM it2
    ),
    w2 AS (
      SELECT w.w0 - CAST(0.5 AS DOUBLE) * (CAST(g.g0 AS DOUBLE) / g.n) AS w0,
             w.w1 - CAST(0.5 AS DOUBLE) * (CAST(g.g1 AS DOUBLE) / g.n) AS w1,
             w.w2 - CAST(0.5 AS DOUBLE) * (CAST(g.g2 AS DOUBLE) / g.n) AS w2,
             w.w3 - CAST(0.5 AS DOUBLE) * (CAST(g.g3 AS DOUBLE) / g.n) AS w3
      FROM w1 w CROSS JOIN g2_ g
    )
    SELECT f.doc_id, f.y,
           CAST(CAST(1 / (1 + exp(0 - (((w.w0
                + w.w1 * x1) + w.w2 * x2) + w.w3 * x3)))
                AS DECIMAL(20,6)) AS DOUBLE) AS prob,
           CAST(CAST(CAST(1 / (1 + exp(0 - (((w.w0
                + w.w1 * x1) + w.w2 * x2) + w.w3 * x3)))
                AS DECIMAL(20,6)) AS DOUBLE) >= 0.5 AS INT) AS predicted
    FROM feat f CROSS JOIN w2 w
    """,
    doc="learned quality classifier: logistic regression (bias + 3 "
    "deterministic text features, 2 gradient-descent iterations from "
    "zero weights, lr=0.5) trained distributed and scored map-only; "
    "the oracle replays the identical fixed schedule in SQL. Each "
    "iteration is one scan whose map-side combine reduces the "
    "shuffle to k scalars; weights travel as plan literals.",
)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = fan_out(_doc_features(load_table(spark, sf_dir, "documents")))
    feat = feat.localCheckpoint(eager=False)  # train + score reuse
    w = logreg_fit(feat, "y", ["x1", "x2", "x3"], iters=2, lr=0.5)
    return logreg_score(feat, w, ["x1", "x2", "x3"]).select(
        "doc_id", "y", "prob", "predicted"
    )
