"""Text-analysis operators for training-data pipelines.

All hot-path computation is built-in SQL functions (JVM, codegen'd):
tokenization via split/regexp, ratios as exact integer divisions,
fingerprints via md5. The language-ID heuristic is a pure-expression
n-gram/stopword scorer — a CASE ladder over marker-token hit counts —
so it runs at scan speed with no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.functions.textfn import words
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

# Marker stopwords per language for the heuristic language identifier.
# (Tiny on purpose: the technique — per-language marker-hit scoring —
# is the operator; swap in real frequency tables for production.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "est", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in the marker set (JVM-only)."""
    w = words(F.lower(text))
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(w, lambda t: F.array_contains(marker_arr, t)))


def lang_id(text: Column) -> Column:
    """Heuristic language guess: argmax of marker-hit counts, 'und'
    (undetermined) when nothing matches."""
    scores = [(lang, marker_hits(text, ms)) for lang, ms in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    out: Column = F.lit("und")
    for lang, s in reversed(scores):  # earlier entries win ties
        out = F.when(s == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def quality_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: length, token stats, type-token
    ratio, all as exact integer-derived values."""
    w = words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.try_divide(F.size(F.array_distinct(w)).cast("double"), F.size(w)).alias(
            "type_token_ratio"
        ),
        F.try_divide(
            (F.length(text_col) - F.size(w) + 1).cast("double"), F.size(w)
        ).alias("avg_word_len"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


# ----------------------------------------------------------------------
# registered correctness queries
# ----------------------------------------------------------------------
@register(
    "text_quality_profile",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS type_token_ratio,
           CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_word_len
    FROM documents
    """,
    doc="per-document quality features (length / token / type-token stats)",
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_profile(d, "doc_id", "text")


@register(
    "text_corpus_token_stats",
    """
    WITH tok AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS t FROM documents)
    SELECT lang,
           COUNT(*) AS total_tokens,
           COUNT(DISTINCT t) AS distinct_tokens,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS tokens_per_doc
    FROM tok GROUP BY lang
    """,
    doc="corpus-level token counting per language (explode + two-level agg)",
)
def text_corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(words(F.col("text"))).alias("t"))
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("t").alias("distinct_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.try_divide(
            F.count(F.lit(1)).cast("double"), F.countDistinct("doc_id")
        ).alias("tokens_per_doc"),
    )


@register(
    "text_fingerprints",
    """
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint
    FROM documents
    """,
    doc="deterministic md5 content fingerprints (dedup key / provenance)",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return fingerprint(d, "doc_id", "text")


@register(
    "text_source_lang_matrix",
    """
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source, lang
    """,
    doc="source x language inventory of the corpus",
)
def text_source_lang_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "text_bpe_token_counts",
    """
    WITH tok AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_ws,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe
      FROM documents
    )
    SELECT lang,
           CAST(SUM(n_ws) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS bpe_ish_tokens,
           CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS expansion_ratio
    FROM tok GROUP BY lang
    """,
    doc="token counting both ways: whitespace vs BPE-ish regex "
    "(letters / digit runs / single punctuation), per language",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        F.size(words(F.col("text"))).alias("n_ws"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))
        ).alias("n_bpe"),
    )
    return tok.groupBy("lang").agg(
        F.sum("n_ws").alias("whitespace_tokens"),
        F.sum("n_bpe").alias("bpe_ish_tokens"),
        F.try_divide(F.sum("n_bpe").cast("double"), F.sum("n_ws")).alias(
            "expansion_ratio"
        ),
    )


def _lang_case_sql() -> str:
    """DuckDB CASE ladder mirroring ``lang_id`` exactly (same marker
    sets, same first-entry-wins tie-break, same und guard)."""
    hits = {
        lang: (
            "len(list_filter(string_split(lower(text), ' '), "
            f"x -> x IN ({', '.join(repr(m) for m in ms)})))"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    best = "GREATEST(" + ", ".join(hits.values()) + ")"
    whens = "\n".join(
        f"WHEN {h} = best THEN '{lang}'" for lang, h in hits.items()
    )
    return f"""
    WITH scored AS (SELECT doc_id, lang AS actual_lang, {best} AS best,
                           {', '.join(f'{h} AS h_{lang}' for lang, h in hits.items())}
                    FROM documents)
    SELECT CASE WHEN best = 0 THEN 'und'
                {"".join(f" WHEN h_{lang} = best THEN '{lang}'" for lang in hits)}
           END AS predicted_lang,
           actual_lang, COUNT(*) AS n_docs
    FROM scored GROUP BY 1, 2
    """


@register(
    "text_lang_id_confusion",
    _lang_case_sql(),
    doc="heuristic language-ID (marker-token argmax) evaluated against "
    "the corpus labels as a confusion matrix",
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            lang_id(F.col("text")).alias("predicted_lang"),
            F.col("lang").alias("actual_lang"),
        )
        .groupBy("predicted_lang", "actual_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_punct_stopword_profile",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
             / length(text) AS punct_ratio,
           len(list_filter(string_split(lower(text), ' '),
               x -> x IN ('the','and','of','to','a','in','is','that'))) AS n_stopwords,
           CAST(len(list_filter(string_split(lower(text), ' '),
               x -> x IN ('the','and','of','to','a','in','is','that'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
    """,
    doc="per-doc punctuation and (en) stopword ratios — quality-score "
    "inputs alongside text_quality_profile",
)
def text_punct_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9 ]"), F.lit(0)))
    stop = marker_hits(F.col("text"), LANG_MARKERS["en"])
    n_words = F.size(words(F.col("text")))
    return d.select(
        "doc_id",
        punct.alias("n_punct"),
        F.try_divide(punct.cast("double"), F.length("text")).alias("punct_ratio"),
        stop.alias("n_stopwords"),
        F.try_divide(stop.cast("double"), n_words).alias("stopword_ratio"),
    )


def normalize_text(text: Column) -> Column:
    """Canonicalize for dedup: lowercase, strip punctuation to spaces,
    collapse whitespace, trim — pure JVM regex, codegen'd. The
    standard pre-hash normalization so near-identical docs (case/
    punctuation/spacing variants) become exact duplicates."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


@register(
    "dedup_normalized_fingerprints",
    """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS norm_fp,
           COUNT(*) AS group_size,
           MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) >= 1
    """,
    doc="normalized-content dedup: case/punct/whitespace-canonical "
    "md5 groups (catches variants exact dedup misses)",
)
def dedup_normalized_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(normalize_text(F.col("text"))).alias("norm_fp"))
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("keep_id"),
        )
    )


# ----------------------------------------------------------------------
# rule-based quality gate (Gopher-style document filters): every rule
# is evaluated with INTEGER cross-multiplication so both engines make
# identical boundary decisions (no float-threshold ambiguity)
# ----------------------------------------------------------------------
_ALL_MARKERS: tuple[str, ...] = tuple(
    sorted({m for ms in LANG_MARKERS.values() for m in ms})
)


def quality_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc pass/fail against four document-quality rules:

    1. 5 <= word count <= 2000
    2. 2 <= mean word length <= 12        (2*n_words <= sum_len <= 12*n_words)
    3. symbol chars <= 20% of all chars   (5*n_symbols <= n_chars)
    4. at least one common function word  (any language's marker set)

    The filter set follows the published rule-based corpus filters
    (word-count bounds, mean-word-length bounds, symbol ratio,
    stop-word presence); rows keep the underlying counters so
    downstream tuning can re-threshold without a rescan.
    """
    w = words(F.lower(F.col(text_col)))
    n_words = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_chars = F.length(text_col)
    n_sym = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", "")
    )
    marker_arr = F.array(*[F.lit(m) for m in _ALL_MARKERS])
    n_stop = F.size(F.array_intersect(F.array_distinct(w), marker_arr))
    passes = (
        (n_words >= 5)
        & (n_words <= 2000)
        & (2 * n_words <= sum_len)
        & (sum_len <= 12 * n_words)
        & (5 * n_sym <= n_chars)
        & (n_stop >= 1)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        sum_len.cast("long").alias("sum_word_len"),
        n_sym.alias("n_symbol_chars"),
        n_stop.alias("n_stopword_types"),
        passes.cast("int").alias("passes"),
    )


@register(
    "text_quality_rules",
    """
    WITH feats AS (
      SELECT doc_id,
             string_split(lower(text), ' ') AS t,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
               AS n_sym
      FROM documents
    ),
    agg AS (
      SELECT doc_id,
             len(t) AS n_words,
             CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
               AS sum_word_len,
             n_chars,
             n_sym,
             len(list_intersect(list_distinct(t),
                 ['a','and','das','de','der','die','el','est','et','ein',
                  'en','is','ist','in','la','le','les','los','nicht','of',
                  'que','that','the','to','un','und','y','zu',
                  '的','是','了','在','我','有','和','不'])) AS n_stop
      FROM feats
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           sum_word_len,
           CAST(n_sym AS INTEGER) AS n_symbol_chars,
           CAST(n_stop AS INTEGER) AS n_stopword_types,
           CAST(CASE WHEN n_words >= 5 AND n_words <= 2000
                      AND 2 * n_words <= sum_word_len
                      AND sum_word_len <= 12 * n_words
                      AND 5 * n_sym <= n_chars
                      AND n_stop >= 1
                THEN 1 ELSE 0 END AS INTEGER) AS passes
    FROM agg
    """,
    doc="rule-based quality gate: word-count bounds, mean-word-length "
    "bounds, symbol ratio, stop-word presence — all boundary decisions "
    "integer-exact in both engines",
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_rules(d, "doc_id", "text")


# ----------------------------------------------------------------------
# PII scrubbing (training-data pipelines must redact before training)
# ----------------------------------------------------------------------
# Patterns restricted to the Java-regex / RE2 common subset (explicit
# character classes, bounded repetition, no lookaround) so the Spark
# plan and any RE2-based engine (DuckDB, Go services) agree exactly.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
# Redaction order matters: emails go first (their domains would
# otherwise leave dotted digit runs for the IP pass), then IPs, then
# phones; the three languages are disjoint after each earlier pass.
PII_ORDER = ("email", "ip", "phone")


def pii_scrub(df: DataFrame, text_col: str) -> DataFrame:
    """Count and redact PII spans in ``text_col`` — pure JVM regexes
    at scan speed, no UDF. Adds ``n_<kind>`` counts per pattern and
    replaces ``text_col`` with the scrubbed string (spans become
    ``<KIND>`` placeholders), preserving all other columns."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    scrubbed = F.col(text_col)
    for kind in PII_ORDER:
        scrubbed = F.regexp_replace(
            scrubbed, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return df.select(
        *[c for c in df.columns if c != text_col],
        *counts,
        scrubbed.alias(text_col),
    )


@register(
    "text_pii_scrub",
    """
    WITH laced AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com'
                  || CASE WHEN doc_id % 3 = 0
                     THEN ' or 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
                  || CASE WHEN doc_id % 2 = 0
                     THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
             AS n_email,
           CAST(len(regexp_extract_all(text,
             '\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(text,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS INTEGER)
             AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g'),
             '\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
    FROM laced
    """,
    doc="PII redaction over a deterministically PII-laced corpus (the "
    "synthetic documents carry none, so the query plants an email per "
    "doc, a phone on every 3rd, an IPv4 on every 2nd — from doc_id, "
    "reproducible in both engines). Verifies counts per kind and the "
    "md5 of the scrubbed text so a single mis-redacted byte fails",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    laced = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            did.cast("string"),
            F.lit("@example.com"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" or 555-867-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(laced, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ip").cast("int").alias("n_ip"),
        F.md5("text").alias("scrub_md5"),
    )


@register(
    "text_vocab_top_terms",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (
      SELECT source, word, COUNT(*) AS cnt FROM tok
      WHERE word IS NOT NULL AND word <> ''
      GROUP BY source, word
    )
    SELECT source, word, cnt, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT source, word, cnt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, word) AS rnk
      FROM counts
    )
    WHERE rnk <= 3
    """,
    doc="per-source vocabulary head: explode tokens, integer counts, "
    "top-3 per source with a deterministic (count desc, word asc) "
    "tie-break. Spark plan: one shuffle for the (source, word) count, "
    "one for the per-source window — the explode uses explode_outer on "
    "a pre-staged token array so gram construction never leaks into "
    "scan filters (see functions/textfn.py)",
)
def text_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out, words
    from pyspark.sql.window import Window as W

    d = fan_out(load_table(spark, sf_dir, "documents").select("source", "text"))
    tok = (
        d.select("source", words(F.col("text")).alias("_w"))
        .select("source", F.explode_outer("_w").alias("word"))
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
    )
    counts = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("word"))
    )
    return (
        counts.select("source", "word", "cnt", rnk.cast("int").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    t2 AS (SELECT source, word FROM tok
           WHERE word IS NOT NULL AND word <> ''),
    tf AS (SELECT source, word, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
    df AS (SELECT word, CAST(COUNT(DISTINCT source) AS BIGINT) AS df
           FROM t2 GROUP BY 1),
    n AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n FROM t2),
    scored AS (
      SELECT tf.source, tf.word, tf.tf, df.df,
             CAST(tf.tf * ln((SELECT n FROM n) / df.df) AS DECIMAL(18,4))
               AS score_dec
      FROM tf JOIN df USING (word)
    )
    SELECT source, word, CAST(tf AS BIGINT) AS tf, df,
           CAST(score_dec AS DOUBLE) AS tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT source, word, tf, df, score_dec,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score_dec DESC, word) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """,
    doc="per-source TF-IDF head: tf * ln(N_sources/df), top-3 per "
    "source. The float score is staged through DECIMAL(18,4) BEFORE "
    "ranking in BOTH engines: ln() differs across engines in the last "
    "ulp (measured: 3.7%% of values), so ranking raw doubles could "
    "order algebraically-equal scores differently; the decimal stage "
    "collapses ulp noise ahead of the comparator and the emitted "
    "score. Spark plan: two shuffles (tf agg, source window) plus a "
    "broadcast df join — same shape as text_vocab_top_terms.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out, words
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    d = fan_out(load_table(spark, sf_dir, "documents").select("source", "text"))
    tok = (
        d.select("source", words(F.col("text")).alias("_w"))
        .select("source", F.explode_outer("_w").alias("word"))
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
    )
    # ONE corpus tokenization pass: df and N both derive from the
    # already-aggregated tf relation (vocab x sources sized, its
    # shuffle output is reused across these jobs) instead of
    # re-exploding the corpus per aggregate
    tf = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("tf"))
    n_sources = tf.select("source").distinct().count()  # bounded scalar
    df_ = tf.groupBy("word").agg(
        F.countDistinct("source").alias("df")
    )
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "score_dec",
        (
            F.col("tf")
            * F.log(F.lit(float(n_sources)) / F.col("df"))
        ).cast("decimal(18,4)"),
    )
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("score_dec").desc(), F.col("word"))
    )
    return (
        scored.withColumn("rnk", rnk.cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            "source",
            "word",
            "tf",
            "df",
            F.col("score_dec").cast("double").alias("tfidf"),
            "rnk",
        )
    )


@register(
    "text_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    t2 AS (SELECT doc_id, word FROM tok
           WHERE word IS NOT NULL AND word <> ''),
    freq AS (SELECT word, COUNT(*) AS c FROM t2 GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM freq)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ln(CAST(c AS DOUBLE) / (SELECT t FROM tot))
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_logprob
    FROM t2 JOIN freq USING (word)
    GROUP BY doc_id
    """,
    doc="unigram language-model quality proxy: each doc scored by the "
    "sum of corpus-unigram log-probabilities of its tokens (the "
    "KenLM-style filter signal, computed from the corpus itself). "
    "Per-token ln(p) is staged through DECIMAL(18,6) before the "
    "per-doc sum in BOTH engines: cross-engine ln() ulp noise plus "
    "order-dependent double addition would otherwise break the hash. "
    "Spark plan: token counts (one shuffle), broadcast join of the "
    "frequency table (vocab-sized), one per-doc aggregation; at "
    "100 TB the frequency table is the only broadcast state.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out, words
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    tok = (
        d.select("doc_id", words(F.col("text")).alias("_w"))
        .select("doc_id", F.explode_outer("_w").alias("word"))
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
    )
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = float(
        freq.agg(F.sum("c").cast("double")).first()[0]
    )  # bounded scalar (one double)
    scored = tok.join(F.broadcast(freq), "word").withColumn(
        "_lp",
        F.log(F.col("c").cast("double") / F.lit(total)).cast("decimal(18,6)"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_lp").cast("double").alias("sum_logprob"),
    )


@register(
    "text_bigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS bigram
      FROM tok, UNNEST(range(1, len(w))) AS t(i)
      WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    f2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY 1),
    f1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_logprob
    FROM bg JOIN f2 USING (bigram) JOIN f1 USING (w1)
    GROUP BY doc_id
    """,
    doc="bigram LM fluency score: sum of ln P(w_i | w_{i-1}) with MLE "
    "conditionals estimated from the corpus itself (the next step up "
    "from text_unigram_logprob in the KenLM-style quality ladder — "
    "repetitive machine-generated text scores near 0, incoherent "
    "token soup scores very negative). Per-pair ln() staged through "
    "DECIMAL(18,6) before the per-doc sum in both engines. Spark "
    "plan: the staged token array yields in-row bigrams via zip_with "
    "over two slices (no self-join on token position); bigram and "
    "prefix frequency tables are vocab-sized broadcasts; the only "
    "wide stages are the two frequency counts and the per-doc sum.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out, words
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # stage tokens once (textfn.py contract: never reference split()
    # at multiple expression sites), then build in-row bigram strings
    w = F.col("_w")
    pairs = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (
        d.select("doc_id", words(F.col("text")).alias("_w"))
        .select("doc_id", pairs.alias("_p"))
        .select("doc_id", F.explode_outer("_p").alias("_b"))
        .filter(
            F.col("_b").isNotNull()
            & (F.col("_b.w1") != "")
            & (F.col("_b.w2") != "")
        )
        .select(
            "doc_id",
            F.col("_b.w1").alias("w1"),
            F.concat_ws(" ", "_b.w1", "_b.w2").alias("bigram"),
        )
    )
    f2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    f1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(F.broadcast(f2), "bigram")
        .join(F.broadcast(f1), "w1")
        .withColumn(
            "_lp",
            F.log(F.col("c2").cast("double") / F.col("c1").cast("double")).cast(
                "decimal(18,6)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_lp").cast("double").alias("sum_logprob"),
    )


PPL_FILTER_THRESHOLD = -3.4  # avg ln P(w_i|w_{i-1}); ppl ~ e^3.4 ~ 30


@register(
    "text_perplexity_filter",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS bigram
      FROM tok, UNNEST(range(1, len(w))) AS t(i)
      WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    f2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY 1),
    f1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    per AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                           AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM bg JOIN f2 USING (bigram) JOIN f1 USING (w1)
      GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams
    FROM per WHERE s / n_bigrams > {PPL_FILTER_THRESHOLD}
    """,
    doc="perplexity-based quality filter (the CCNet/KenLM pretraining "
    "gate): per-doc average bigram log-likelihood under the corpus's "
    "own MLE LM; keep docs above the threshold (fluent under the "
    "corpus distribution), drop the incoherent tail. Composition of "
    "the proven text_bigram_logprob scorer — per-pair ln() staged "
    "through DECIMAL(18,6) in both engines, the per-doc average ONE "
    "IEEE division, so the oracle replays the exact keep set.",
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = text_bigram_logprob(spark, sf_dir)
    kept = per.filter(
        F.col("sum_logprob") / F.col("n_bigrams")
        > F.lit(PPL_FILTER_THRESHOLD)
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
        F.sum("n_bigrams").alias("sum_bigrams"),
    )
