"""Corpus-level training-data pipeline operators.

Four ops a 100 TB pretraining-data pipeline runs after per-doc quality
and dedup (complementing operators/dedup.py and operators/text.py):

- **decontamination**: drop corpus documents sharing word n-grams with
  a held-out eval set. At scale the eval set is tiny (benchmarks are
  MBs) while the corpus is the 100 TB side, so the plan is a broadcast
  semi-join: explode corpus shingles once, broadcast the distinct eval
  shingle set, aggregate hits per doc. Cost O(corpus tokens), no
  corpus-side shuffle beyond the per-doc hit aggregation.
- **repetition profile**: Gopher-style intra-document repetition
  signal (fraction of duplicate word 2-grams + the hottest gram's
  count). One shuffle keyed (doc_id, gram) — fully parallel.
- **stratified sampling**: deterministic per-source downsampling via
  an md5-hex threshold compare. No RNG state: the same row always
  makes the same decision on any cluster size or retry, which is what
  makes a 100 TB sampling job resumable and its output reproducible.
- **sequence packing**: assign documents to fixed-size context bins
  by cumulative token count within a shard (source). The window is
  partitioned by shard, so packing parallelizes across shards while
  staying byte-deterministic; no global sort.

Reference parity note: the reference pipeline
(BauplanLabs/no-jvm-wap-with-iceberg, src/serverless/app.py) stops at
WAP quality gates; these ops extend the same documents table toward
LLM-corpus curation, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from no_jvm_wap_with_iceberg_spark.functions.textfn import (
    fan_out,
    gram_strings,
    words,
)
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

# eval-set membership: doc_id % EVAL_MOD == 0 — a deterministic stand-in
# for "doc appears in a benchmark"; DECON_N-gram overlap marks contamination
EVAL_MOD = 83
DECON_N = 5

# per-source sampling rates keyed by numeric source suffix % 4; thresholds
# are floor(rate * 16^8) as fixed-width lowercase hex so a lexicographic
# compare against md5's first 8 hex chars implements P(keep) = rate
# identically in Spark and DuckDB (no RNG, no float boundary)
_RATE_HEX = ["33333333", "66666666", "99999999", "cccccccc"]  # .2 .4 .6 .8
_RATES = [0.2, 0.4, 0.6, 0.8]

PACK_CONTEXT = 512  # tokens per packed context window

CHUNK_TOKENS = 64  # tokens per embedding chunk
CHUNK_STRIDE = 32  # overlap stride between consecutive chunks


# ----------------------------------------------------------------------
# library operators
# ----------------------------------------------------------------------
def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = DECON_N,
) -> DataFrame:
    """Per-corpus-doc eval-overlap counts: (id, n_grams, n_hit) for
    every doc sharing >= 1 word n-gram with the eval set.

    Plan: corpus shingles exploded once; the eval shingle set is
    DISTINCT'd and broadcast (benchmarks are tiny next to a 100 TB
    corpus), so the join is a broadcast hash semi-join with no
    corpus-side shuffle; the only exchange is the per-doc hit count.
    """
    # per-doc gram count is row-local (size of the gram array), so it
    # rides along the explode instead of costing a second aggregation
    # over every exploded gram; the only wide stage left is the
    # per-doc hit count, whose input is already filtered to hits.
    # explode_OUTER (+ post-generate null filter, same rows) because a
    # plain explode lets InferFiltersFromGenerate infer size(_g) > 0
    # and push the WHOLE gram-construction expression into the scan
    # filter — below the fan_out exchange, single-task, evaluated
    # twice more per row (measured 10.5 s vs 0.5 s at sf0.1)
    sh = (
        fan_out(corpus)
        .select(
            F.col(id_col).alias("_id"), words(F.col(text_col)).alias("_w")
        )
        .select("_id", gram_strings("_w", n).alias("_g"))
        .select(
            "_id",
            F.size("_g").alias("_n"),
            F.explode_outer("_g").alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
    )
    ev = (
        eval_set.select(words(F.col(text_col)).alias("_w"))
        .select(F.explode(gram_strings("_w", n)).alias("_s"))
        .distinct()
    )
    return (
        sh.join(F.broadcast(ev), "_s")
        .groupBy("_id")
        .agg(
            F.max("_n").alias("n_grams"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "n_hit")
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Intra-document repetition: duplicate word-2-gram fraction and
    the hottest gram's occurrence count (Gopher repetition filters).

    The stats are per-document, so no cross-row grouping is needed at
    all: sort the gram array in-row, then a single-pass ``aggregate``
    counts the longest equal-run — ZERO shuffles; the whole profile
    runs at scan speed on any corpus size (an explode + groupBy
    (doc, gram) formulation would shuffle every gram occurrence). All
    counters integer; the ratio is the only float and is derived from
    integers identically in both engines.
    """
    w = F.col("_w")
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # longest equal-run over the sorted grams: carry (prev, run, best)
    def max_run(g):
        return F.aggregate(
            F.array_sort(g),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.run + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc.best,
                    F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        )

    # two staging projections (textfn.py contract): tokens once per
    # row, then the gram array once per row; stats read the attribute.
    # The >=2-token filter runs EARLY on the cheap token count: the
    # equivalent late filter (n_grams_total > 0) is a predicate on a
    # computed column, and pushdown would substitute the whole gram
    # expression into the scan filter — single-task, below fan_out
    # (n_grams_total = size(w) - 1 when size(w) >= 2, so the two
    # predicates keep exactly the same rows)
    staged = (
        fan_out(df.filter(F.size(words(F.col(text_col))) >= 2))
        .select(F.col(id_col), words(F.col(text_col)).alias("_w"))
        .select(F.col(id_col), grams.alias("_g"))
    )
    n_total = F.size("_g")
    n_distinct = F.size(F.array_distinct("_g"))
    return staged.select(
        id_col,
        n_total.cast("long").alias("n_grams_total"),
        n_distinct.cast("long").alias("n_grams_distinct"),
        max_run(F.col("_g")).cast("long").alias("max_gram_count"),
        ((n_total - n_distinct).cast("double") / n_total).alias("dup_ratio"),
    )


def stratified_keep(df: DataFrame, id_col: str, rate_bucket) -> DataFrame:
    """Add a deterministic ``keep`` flag: md5(id) hex prefix compared
    against the bucket's rate threshold. ``rate_bucket`` is an int
    Column in [0, 3] selecting from the fixed rate ladder."""
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr = F.element_at(
        F.array(*[F.lit(h) for h in _RATE_HEX]), rate_bucket + F.lit(1)
    )
    return df.withColumn("_bucket", rate_bucket).withColumn(
        "keep", (key < thr).cast("int")
    )


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep each row with probability ``rate``, decided by an md5-hex
    threshold on the id — stateless, reproducible on any cluster size
    or retry, and nested across rates (raising the rate only adds
    rows). ``rate >= 1`` is the identity."""
    if rate >= 1.0:
        return df
    thr = format(max(0, int(rate * 16**8)), "08x")
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return df.filter(key < F.lit(thr))


def quality_resample(
    df: DataFrame,
    id_col: str,
    weight_col,
    target_frac: float,
) -> DataFrame:
    """Deterministic WEIGHTED downsample: keep each row with
    probability ``clip(target_frac * w / max(w), 0, 1)`` — the
    pretraining reweighting step (upsample high-quality documents,
    thin the tail) with zero RNG state: the keep decision is an
    md5-hex threshold per row, so any retry/cluster size/partitioning
    reproduces the same sample, and raising ``target_frac`` only ADDS
    rows (nested samples, same property as
    :func:`deterministic_sample`).

    ``weight_col`` should be integral or exactly-representable: the
    per-row threshold is one multiply + one divide on doubles (IEEE,
    bit-identical across engines — this is what lets DuckDB replay
    the exact sample), normalized by the corpus max (an exact
    aggregate; an average would accumulate in engine-dependent order
    and flip boundary rows)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wmax = df.agg(F.max(w).alias("m")).first()["m"]
    if not wmax or wmax <= 0:
        raise ValueError("quality_resample needs a positive max weight")
    p = F.least(
        F.lit(1.0), F.lit(float(target_frac)) * w / F.lit(float(wmax))
    )
    thr = F.lower(
        F.lpad(
            F.hex(F.floor(p * F.lit(float(2**32 - 1))).cast("bigint")),
            8,
            "0",
        )
    )
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return df.filter(key < thr)


def pack_bins(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    token_count,
    context: int = PACK_CONTEXT,
) -> DataFrame:
    """Assign each doc to a packing bin: cumulative token count within
    the shard (ordered by ``order_col``), bin = floor(start / context).

    The window partitions by shard, so each shard packs independently
    in one task — deterministic, parallel across shards, no global
    sort. A doc whose tokens straddle a boundary belongs to the bin
    where it starts (the padding/overflow policy is the trainer's).
    """
    win = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = token_count.cast("long")
    cum = F.sum(tok).over(win)
    return df.withColumn("_tok", tok).withColumn(
        "bin", ((cum - tok) / F.lit(context)).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split documents into overlapping token windows (the unit an
    embedding model consumes). Output: (id, chunk_id, chunk_text,
    n_tokens), chunk_id 0-based in document order.

    All JVM expressions: chunk start offsets are a ``sequence`` with
    step ``stride``, each chunk a ``slice`` of the token array —
    per-row work with no shuffle at all, so chunking runs at scan
    speed on any corpus size. The last window starts at the largest
    offset still introducing new tokens (standard sliding-window
    cover; a doc shorter than one chunk yields exactly one chunk).
    """
    w = F.col("_w")
    n = F.size(w)
    # smallest k with (k-1)*stride + chunk >= n gives last start
    # (k-1)*stride + 1 = ceil((n-chunk)/stride)*stride + 1, clamped to
    # 1 so a doc shorter than one chunk still yields a single chunk
    last_start = F.greatest(
        F.lit(1),
        (
            F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride) * stride
            + 1
        ).cast("int"),
    )
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(w, s, chunk_tokens)).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s + 1).alias("n_tokens"),
        ),
    )
    # token array staged once per row (textfn.py performance contract);
    # posexplode_OUTER + null filter so the inferred non-empty check
    # cannot push the chunk construction into the scan (see
    # decontaminate) — chunks is never empty anyway (>= 1 window/doc)
    return fan_out(df).select(
        F.col(id_col), words(F.col(text_col)).alias("_w")
    ).select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_id", "_c")
    ).filter(F.col("chunk_id").isNotNull()).select(
        id_col,
        "chunk_id",
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


# ----------------------------------------------------------------------
# registered queries (driver correctness gate)
# ----------------------------------------------------------------------
@register(
    "corpus_decontaminate_eval",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS s
           FROM toks, UNNEST(range(1, len(w)-3)) AS t(i)),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh
              WHERE doc_id % {EVAL_MOD} != 0 GROUP BY 1),
    hits AS (SELECT doc_id, COUNT(*) AS n_hit
             FROM sh JOIN ev USING (s)
             WHERE doc_id % {EVAL_MOD} != 0 GROUP BY 1)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hit AS BIGINT) AS n_hit
    FROM hits JOIN sizes USING (doc_id)
    """,
    doc="benchmark decontamination: corpus docs sharing any word "
    f"{DECON_N}-gram with the deterministic eval subset "
    f"(doc_id % {EVAL_MOD} = 0); broadcast semi-join, no corpus shuffle",
)
def corpus_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    corpus = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    out = decontaminate(corpus, ev, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit").cast("long").alias("n_hit"),
    )


@register(
    "corpus_repetition_profile",
    """
    WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    grams AS (SELECT doc_id, w[i]||' '||w[i+1] AS g
              FROM toks, UNNEST(range(1, len(w))) AS t(i)),
    per_gram AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams_total,
           CAST(COUNT(*) AS BIGINT) AS n_grams_distinct,
           CAST(MAX(c) AS BIGINT) AS max_gram_count,
           CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS dup_ratio
    FROM per_gram GROUP BY doc_id
    """,
    doc="intra-document repetition (duplicate word-2-gram fraction, "
    "hottest gram count) — Gopher-style repetition quality signal",
)
def corpus_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = repetition_profile(d, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_grams_total",
        F.col("n_grams_distinct").cast("long").alias("n_grams_distinct"),
        "max_gram_count",
        "dup_ratio",
    )


@register(
    "corpus_stratified_sample",
    """
    WITH marked AS (
      SELECT source,
             CAST(substr(source, 4) AS INTEGER) % 4 AS bucket,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                       (['33333333','66666666','99999999','cccccccc'])[
                         CAST(substr(source, 4) AS INTEGER) % 4 + 1]
                  THEN 1 ELSE 0 END AS keep
      FROM documents
    )
    SELECT source, CAST(MIN(bucket) AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_sampled
    FROM marked GROUP BY source
    """,
    doc="deterministic stratified downsampling: per-source keep rates "
    "(.2/.4/.6/.8 by source-suffix bucket) decided by md5-hex "
    "threshold compare — reproducible on any cluster size, no RNG",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring("source", 4, 10).cast("int") % 4
    marked = stratified_keep(d, "doc_id", bucket)
    return marked.groupBy("source").agg(
        F.min("_bucket").cast("int").alias("bucket"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum("keep").cast("long").alias("n_sampled"),
    )


@register(
    "corpus_quality_resample",
    """
    WITH mw AS (SELECT MAX(LENGTH(text)) AS m FROM documents),
    kept AS (
      SELECT doc_id, LENGTH(text) AS len
      FROM documents, mw
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
            lower(lpad(to_hex(CAST(floor(
              least(1.0, 0.3 * LENGTH(text) / m) * 4294967295
            ) AS BIGINT)), 8, '0'))
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(len) AS BIGINT) AS sum_len
    FROM kept
    """,
    doc="deterministic WEIGHTED downsample (quality_resample): keep "
    "with P = clip(0.3 * len / max_len) decided by an md5-hex "
    "threshold per row — the pretraining reweighting step with zero "
    "RNG state (retries/cluster size reproduce the sample; raising "
    "the fraction only adds rows). Weight = integer doc length and "
    "max-normalization keep the per-row threshold ONE IEEE multiply + "
    "divide, bit-identical across engines, which is why DuckDB can "
    "replay the exact sample.",
)
def corpus_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kept = quality_resample(
        d.withColumn("len", F.length("text")), "doc_id", "len", 0.3
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
        F.sum("len").alias("sum_len"),
    )


@register(
    "corpus_chunk_windows",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    bounds AS (
      SELECT doc_id, w, len(w) AS n,
             GREATEST(1, CAST(CEIL(CAST(len(w) - {CHUNK_TOKENS} AS DOUBLE)
                / {CHUNK_STRIDE}) AS INTEGER) * {CHUNK_STRIDE} + 1) AS last_start
      FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           array_to_string(w[s : s + {CHUNK_TOKENS} - 1], ' ') AS chunk_text,
           CAST(LEAST({CHUNK_TOKENS}, n - s + 1) AS INTEGER) AS n_tokens
    FROM bounds, UNNEST(range(1, last_start + 1, {CHUNK_STRIDE})) AS t(s)
    """,
    doc=f"document chunking: overlapping {CHUNK_TOKENS}-token windows at "
    f"stride {CHUNK_STRIDE} (the embedding-model input unit) — pure "
    "per-row JVM expressions, zero shuffle, runs at scan speed",
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = chunk_documents(d, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "chunk_text",
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


@register(
    "corpus_pack_sequences",
    f"""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text,' ')) AS tok
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, tok,
             CAST(FLOOR(CAST(SUM(tok) OVER (PARTITION BY source
                    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
                  AS DOUBLE) / {PACK_CONTEXT}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM binned GROUP BY source, bin
    """,
    doc=f"sequence packing: docs -> {PACK_CONTEXT}-token context bins by "
    "cumulative token count per source shard; parallel across shards, "
    "no global sort",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    binned = pack_bins(
        d, "source", "doc_id", F.size(words(F.col("text"))), PACK_CONTEXT
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").cast("long").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.9,
    val_frac: float = 0.05,
) -> DataFrame:
    """Attach a deterministic ``split`` column (train/val/test) by
    md5-hex threshold on the id — the standard held-out split for a
    training corpus, computed statelessly per row.

    Properties a 100 TB pipeline needs and RNG-based splits lack:
    reproducible on any cluster size/retry/engine, stable under
    re-partitioning, and NESTED — growing ``train_frac`` only moves
    rows out of val/test, never reshuffles existing membership.
    Zero shuffle: pure per-row JVM expressions at scan speed.
    """
    t_train = format(max(0, int(train_frac * 16**8)), "08x")
    t_val = format(max(0, int((train_frac + val_frac) * 16**8)), "08x")
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return df.withColumn(
        "split",
        F.when(key < F.lit(t_train), F.lit("train"))
        .when(key < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


@register(
    "corpus_train_val_split",
    """
    WITH s AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS tok,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       < 'e6666666' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       < 'f3333333' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM s GROUP BY source, split
    """,
    doc="deterministic 90/5/5 train/val/test split by md5-hex "
    "threshold on doc_id (thresholds e6666666/f3333333 = the exact "
    "hex images of .90/.95): per-(source,split) doc and token "
    "tallies. Stateless and nested; one aggregation shuffle keyed "
    "by (source,split).",
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    s = train_val_test_split(d, "doc_id", 0.9, 0.05).select(
        "source",
        "split",
        "doc_id",
        F.size(words(F.col("text"))).alias("_tok"),
    )
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int] | None = None,
    default_budget: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Data mixing under per-source token budgets: greedily keep each
    source's documents — in a deterministic md5(id) order — until the
    source's token budget is reached (the last kept document may
    overshoot by less than one document, the standard greedy-prefix
    rule, so every budgeted source with data makes progress).

    This is the mixture-weights step of a pretraining pipeline: given
    target token counts per source ("2T web, 300B code, 50B books"),
    emit exactly that mixture, reproducibly. The md5 order makes the
    selection independent of partitioning, cluster size, and retries
    (same discipline as ``stratified_sample``); per-source windows
    keep the cumulative sum parallel across sources — no global sort,
    one shuffle on ``source``.
    """
    toks = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.withColumn("_toks", toks).withColumn(
        "_cum", F.sum("_toks").over(w)
    )
    if budgets:
        b = F.lit(default_budget)
        for src, n in budgets.items():
            b = F.when(F.col(source_col) == src, F.lit(n)).otherwise(b)
    else:
        b = F.lit(default_budget)
    return staged.filter(F.col("_cum") - F.col("_toks") < b).drop(
        "_toks", "_cum"
    )


@register(
    "corpus_token_budget_mix",
    """
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS toks,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
                  THEN 600 ELSE 300 END AS budget
      FROM documents
    ),
    c AS (
      SELECT *, SUM(toks) OVER (PARTITION BY source ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS mixed_tokens,
           CAST(MAX(cum) AS BIGINT) AS cum_at_cut
    FROM c WHERE cum - toks < budget
    GROUP BY source
    """,
    doc="token-budgeted data mixing (the pretraining mixture-weights "
    "step): per-source greedy prefix in deterministic md5(doc_id) "
    "order until the source's token budget fills — even sources get "
    "600 whitespace-token budgets, odd 300 (derived from the source "
    "name so the oracle reconstructs the exact budgets). Selection is "
    "partitioning/cluster-size/retry-invariant; one shuffle on "
    "source. cum_at_cut asserts the greedy boundary (budget overshoot "
    "< one document) hashes identically.",
)
def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    budget = F.when(
        (F.substring(F.col("source"), 4, 10).cast("int") % 2) == 0,
        F.lit(600),
    ).otherwise(F.lit(300))
    toks = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        docs.withColumn("_toks", toks)
        .withColumn("_cum", F.sum("_toks").over(w))
        .withColumn("_b", budget)
    )
    return (
        staged.filter(F.col("_cum") - F.col("_toks") < F.col("_b"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("mixed_tokens"),
            F.max("_cum").alias("cum_at_cut"),
        )
    )


def epoch_shuffle(
    docs: DataFrame,
    seed: int = 0,
    shards: int = 64,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic training-epoch shuffle: place each document into
    one of ``shards`` shards by an md5 of (seed, id) and order it
    within the shard by the same hash. Different seeds produce
    different permutations; the same seed produces the SAME
    permutation on any partitioning, cluster size, or retry — which
    is what makes a multi-epoch 100 TB data-loading job resumable
    mid-epoch.

    Spark-first shape: the shard assignment is a pure projection; the
    within-shard order materializes with one ``repartition(shard) +
    sortWithinPartitions`` when the caller writes shards out — no
    global sort, no single-partition row_number.
    """
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = docs.withColumn("_h", h).withColumn(
        shard_col,
        (F.conv(F.substring("_h", 1, 8), 16, 10).cast("long") % shards).cast(
            "int"
        ),
    )
    return (
        out.repartition(shards, shard_col)
        .sortWithinPartitions(shard_col, "_h", id_col)
        .drop("_h")
    )


@register(
    "corpus_epoch_shuffle",
    """
    WITH h AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS toks,
             md5('7' || '|' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, hx,
             CAST(CAST(('0x' || SUBSTR(hx, 1, 8)) AS BIGINT) % 16 AS INT)
               AS shard
      FROM h
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS shard_tokens,
           MIN(hx) AS first_hash,
           MIN(doc_id) AS min_doc
    FROM s GROUP BY shard
    """,
    doc="deterministic epoch shuffle (seed 7, 16 shards): documents "
    "placed and ordered by md5(seed|id) — the same permutation on any "
    "partitioning/cluster size/retry, different per seed; no global "
    "sort (shard projection + within-shard sort). The gate hashes "
    "per-shard composition incl. the first in-order hash; the oracle "
    "reconstructs the identical shards from md5 in SQL.",
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = epoch_shuffle(docs, seed=7, shards=16)
    h = F.md5(
        F.concat_ws("|", F.lit("7"), F.col("doc_id").cast("string"))
    )
    return (
        out.withColumn("_h", h)
        .withColumn("_toks", F.size(F.split(F.col("text"), " ")))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("shard_tokens"),
            F.min("_h").alias("first_hash"),
            F.min("doc_id").alias("min_doc"),
        )
    )
