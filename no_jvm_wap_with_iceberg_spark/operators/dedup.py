"""Deduplication operators for large-scale training-data pipelines.

Four families, each a DataFrame-in → DataFrame-out transform plus a
registered correctness query:

- **exact**: hash-groupBy on normalized content — one shuffle on the
  content key; at 100 TB, group on a 128-bit digest instead of the
  raw text so shuffle rows stay small.
- **n-gram Jaccard (exact)**: the quadratic ground truth — shingle
  explode + equi-join on shingle + integer cross-multiplied threshold
  test. Correct at any scale but O(pairs sharing a shingle); used as
  the oracle for the sub-quadratic paths.
- **MinHash + LSH**: per-doc signatures from k seeded hash functions
  (JVM ``xxhash64``, no UDF), banded; candidate pairs join only
  within a band bucket, then exact-verify. This is the 100 TB path:
  cost is O(docs × k) + O(candidates), not O(docs²).
- **SimHash**: 64-bit fingerprints via token-hash bit voting
  (Arrow-batched pandas UDF — the documented slow-path escape hatch);
  near-dup candidates share a fingerprint prefix.

Threshold semantics are identical across paths: word-3-gram Jaccard
>= 0.7 (the testdata's planted near-dups sit at ~0.9+, background
noise below 0.3 — verified against the corpus).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.functions.textfn import (
    fan_out,
    gram_strings,
    words,
)
from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

JACCARD_THRESHOLD = 0.7  # as a ratio p/q below
_JT_P, _JT_Q = 7, 10  # threshold as integers: i/u >= p/q  <=>  q*i >= p*u
MINHASH_K = 64  # signature length
MINHASH_R = 4  # rows per band -> 16 bands; per-pair miss probability at
# similarity s is (1-s^4)^16: ~2e-7 at s=0.9, ~0.02 at s=0.7 — band
# noise stays tiny (false-candidate rate s^4*16 ≈ 1e-4 at s≈0.1), so
# candidate volume scales with true dups, not with pairs


# ----------------------------------------------------------------------
# library operators (DataFrame -> DataFrame)
# ----------------------------------------------------------------------
def exact_dedup(df: DataFrame, cols: list[str], keep_col: str) -> DataFrame:
    """Keep one representative row (min ``keep_col``) per duplicate
    group. One hash-shuffle on ``cols``; no sort."""
    keep = (
        df.groupBy(*cols).agg(F.min(keep_col).alias(keep_col)).select(keep_col)
    )
    return df.join(keep, on=keep_col, how="left_semi")


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingle sets + per-doc sizes.

    The token array is staged through a projection so the split runs
    once per row — inlining it re-evaluates a copy per ``element_at``
    reference (the textfn.py performance contract; measured 11x).
    explode_OUTER + null filter rather than plain explode: the
    inferred ``size(_sh) > 0`` filter would otherwise push the whole
    shingle expression into the scan (see corpus.decontaminate)."""
    return (
        fan_out(df)
        .select(
            F.col(id_col).alias("_id"), words(F.col(text_col)).alias("_w")
        )
        .select("_id", gram_strings("_w", n).alias("_sh"))
        .select("_id", F.explode_outer("_sh").alias("_s"))
        .filter(F.col("_s").isNotNull())
    )


def exact_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """All pairs with shingle-Jaccard >= threshold (exact, quadratic
    in shared-shingle pairs). Columns: id_a, id_b, jaccard."""
    sh = shingle_sets(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_id").alias("id_a"), F.col("_s"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_s"))
    inter = (
        a.join(b, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_u", F.col("_na") + F.col("_nb") - F.col("_i"))
        .filter(_JT_Q * F.col("_i") >= _JT_P * F.col("_u"))  # integer-exact
        .select(
            "id_a",
            "id_b",
            (F.col("_i").cast("double") / F.col("_u")).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = MINHASH_K,
    n: int = 3,
    r: int = MINHASH_R,
) -> DataFrame:
    """Per-doc shingle set + banded MinHash bucket hashes.

    Output: ``(_id, _sh array<long>, _bh array<long>)`` where ``_bh``
    has k/r entries — one 64-bit bucket id per LSH band, with the band
    index mixed in so a single-column equi-join on the bucket value
    implements the banded collision test (cross-band collisions are
    ~2^-64 and are removed by exact verification anyway).

    Split: the JVM does the cheap vectorizable part (whitespace split +
    per-word ``xxhash64``); shingle construction, min-hashing, and band
    folding run in one Arrow-batched numpy kernel — building n-gram
    STRINGS with interpreted ``concat_ws`` and hashing k times per
    shingle JVM-side were both measured bottlenecks at sf0.1.
    """
    # CPU-bound stage: spread rows across all cores even when the
    # input is a single small file (one split = one task otherwise)
    par = df.sparkSession.sparkContext.defaultParallelism
    word_hashes = F.transform(
        F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
    )
    base = df.repartition(par).select(
        F.col(id_col).alias("_id"), word_hashes.alias("_wh")
    )
    n_bands = k // r

    @F.pandas_udf("struct<sh: array<long>, bh: array<long>>")
    def _sh_bands(wh: pd.Series) -> pd.DataFrame:
        import numpy as np

        rng = np.random.default_rng(0xC0FFEE)
        a = (rng.integers(1, 2**62, size=k, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        b = rng.integers(0, 2**63, size=k, dtype=np.uint64)
        # splitmix64-style mixing constants for n-gram combination
        c1, c2, c3 = (
            np.uint64(0x9E3779B97F4A7C15),
            np.uint64(0xBF58476D1CE4E5B9),
            np.uint64(0x94D049BB133111EB),
        )
        band_ix = np.arange(n_bands, dtype=np.uint64)
        shs, bhs = [], []
        for hs in wh:
            if hs is None or len(hs) < n:
                shs.append(np.array([], dtype=np.int64))
                bhs.append(np.array([], dtype=np.int64))
                continue
            x = np.asarray(hs, dtype=np.int64).view(np.uint64)
            # shingle hash = mix of the n consecutive word hashes
            g = x[: len(x) - n + 1] * c1
            for j in range(1, n):
                g = g ^ (x[j : len(x) - n + 1 + j] * (c2 if j == 1 else c3))
            g = np.unique(g * c1)  # distinct shingles (set semantics)
            shs.append(g.view(np.int64))
            sig = (g[:, None] * a[None, :] + b[None, :]).min(axis=0)
            # fold each band's r signature values + band index into one
            # 64-bit bucket id (splitmix-style avalanche per step)
            acc = band_ix * c1
            for v in sig.reshape(n_bands, r).T:
                acc = (acc ^ v) * c2
                acc ^= acc >> np.uint64(33)
            bhs.append(acc.view(np.int64))
        return pd.DataFrame({"sh": shs, "bh": bhs})

    packed = base.select("_id", _sh_bands("_wh").alias("_p"))
    return packed.select(
        "_id", F.col("_p.sh").alias("_sh"), F.col("_p.bh").alias("_bh")
    )


def band_hashes_for_shingles(
    df: DataFrame,
    sh_col: str,
    k: int = MINHASH_K,
    r: int = MINHASH_R,
) -> DataFrame:
    """Recompute the banded MinHash bucket hashes from a STORED
    shingle set — bit-identical to :func:`minhash_signatures`' ``_bh``
    for the same shingles (same seeded permutations, same band fold;
    pinned by a test). Lets maintenance address a persisted band index
    by ``band_hash`` (its partition/sort/bloom key) without
    re-tokenizing documents: e.g. the near pipeline's forget reads the
    victims' shingle sets from the signature table (key-pruned), folds
    them back into band hashes here, and deletes band rows by
    ``(band_hash, key)`` so the delete prunes on the index's OWN
    layout instead of scanning for a secondary column. Appends an
    ``_bh array<long>`` column; empty shingle sets yield empty bands.
    """
    n_bands = k // r

    @F.pandas_udf("array<long>")
    def _bands(sh: pd.Series) -> pd.Series:
        import numpy as np

        rng = np.random.default_rng(0xC0FFEE)
        a = (
            rng.integers(1, 2**62, size=k, dtype=np.uint64) << np.uint64(1)
        ) | np.uint64(1)
        b = rng.integers(0, 2**63, size=k, dtype=np.uint64)
        c1, c2 = (
            np.uint64(0x9E3779B97F4A7C15),
            np.uint64(0xBF58476D1CE4E5B9),
        )
        band_ix = np.arange(n_bands, dtype=np.uint64)
        out = []
        for hs in sh:
            if hs is None or len(hs) == 0:
                out.append(np.array([], dtype=np.int64))
                continue
            g = np.asarray(hs, dtype=np.int64).view(np.uint64)
            sig = (g[:, None] * a[None, :] + b[None, :]).min(axis=0)
            acc = band_ix * c1
            for v in sig.reshape(n_bands, r).T:
                acc = (acc ^ v) * c2
                acc ^= acc >> np.uint64(33)
            out.append(acc.view(np.int64))
        return pd.Series(out)

    return df.withColumn("_bh", _bands(F.col(sh_col)))


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = MINHASH_K,
    r: int = MINHASH_R,
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs with their shingle sets attached.

    Docs collide when one of the k/r bands (r consecutive signature
    values hashed together) matches. The band join is a single-column
    equi-join on the band-salted bucket hash — one shuffle keyed by a
    bare long; bucket sizes stay tiny because a band only collides at
    similarity ~(s^r)."""
    # persist signatures+shingles once; the band self-join and the
    # verification joins all reuse this (at cluster scale: a written
    # signature table plays this role)
    # docs with no shingles (< n words) have no bands and cannot pass
    # a Jaccard threshold — drop them before banding
    sigs = (
        minhash_signatures(df, id_col, text_col, k, n, r)
        .filter(F.size("_sh") > 0)
        .cache()
    )
    shingles = sigs.select("_id", "_sh")
    bands = sigs.select("_id", F.explode("_bh").alias("_h"))
    a = bands.select(F.col("_id").alias("id_a"), "_h")
    b = bands.select(F.col("_id").alias("id_b"), "_h")
    # candidate pairs travel the shuffle as bare (id, id) longs; the
    # heavy shingle arrays are attached afterwards by two hash joins
    # against the persisted shingle table
    cands = (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = shingles.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sh_b = shingles.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    return cands.join(sh_a, "id_a").join(sh_b, "id_b")


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K, n: int = 3
) -> DataFrame:
    """LSH candidates -> exact Jaccard verification (same output
    contract as ``exact_jaccard_pairs`` given sufficient recall).

    Verification is pure array math on the two shingle sets carried
    through the band join (``array_intersect`` size) — no second
    explode/join pass over the corpus."""
    cands = minhash_candidate_pairs(df, id_col, text_col, k=k, n=n)
    sized = cands.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("_sha", "_shb")).alias("_i"),
        F.size("_sha").alias("_na"),
        F.size("_shb").alias("_nb"),
    )
    return (
        sized.withColumn("_u", F.col("_na") + F.col("_nb") - F.col("_i"))
        .filter(_JT_Q * F.col("_i") >= _JT_P * F.col("_u"))
        .select(
            "id_a",
            "id_b",
            (F.col("_i").cast("double") / F.col("_u")).alias("jaccard"),
        )
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum over token xxhash64 bits.

    Token hashes are computed JVM-side; the bit voting runs as an
    Arrow-batched pandas UDF over the hash arrays (the idiomatic
    slow-path: batch-columnar, never row-at-a-time Python).
    """
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)).alias(
            "_hashes"
        ),
    )

    @F.pandas_udf("long")
    def _simhash(hashes: pd.Series) -> pd.Series:
        import numpy as np

        out = np.zeros(len(hashes), dtype=np.int64)
        for row_i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            # bits matrix: (n_tokens, 64) of {0,1} -> votes in {-1,+1}
            bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int32
            )
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            out[row_i] = np.int64(fp)
        return pd.Series(out)

    return hashed.select("_id", _simhash("_hashes").alias("simhash"))


# ----------------------------------------------------------------------
# registered correctness queries
# ----------------------------------------------------------------------
@register(
    "dedup_exact_stats",
    """
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique_texts,
           COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups,
           COUNT(DISTINCT md5(text)) AS n_unique_digests
    FROM documents
    """,
    doc="exact-duplicate profile of the corpus (content-hash groupBy)",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dups"),
        F.countDistinct(F.md5("text")).alias("n_unique_digests"),
    )


@register(
    "dedup_exact_keep_first",
    """
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS group_size
    FROM documents GROUP BY text
    """,
    doc="exact dedup keep-first: representative id per content group",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size")
    ).select("keep_id", "group_size")


_EXACT_JACCARD_ORACLE = """
    WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s
           FROM toks, UNNEST(range(1, len(w)-1)) AS t(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 10 * i >= 7 * (sa.n + sb.n - i)
"""


@register(
    "dedup_ngram_jaccard",
    _EXACT_JACCARD_ORACLE,
    doc="exact word-3-gram Jaccard near-dup pairs at threshold 0.7 "
    "(integer cross-multiplied threshold: no float boundary effects)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_jaccard_pairs(d, "doc_id", "text")


@register(
    "dedup_minhash_lsh",
    _EXACT_JACCARD_ORACLE,
    doc="MinHash(32)+LSH candidates, exact-verified — must equal the "
    "exact pairs (recall ~1-1e-16 at the 0.7 threshold); the oracle "
    "IS the exact algorithm",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(d, "doc_id", "text")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs with embedding cosine >= threshold (id_a < id_b).

    This is the exact verification path: a self cross-join with the
    smaller side broadcast, scored JVM-side (``zip_with``/``aggregate``
    — no Python in the loop). At 100 TB the candidate-generation step
    in front of this is the LSH bucketing in
    ``operators/similarity.py`` (``lsh_bucket_ids``); this exact
    scorer then runs only over bucket-collision pairs. The threshold
    test happens on the rounded DECIMAL(10,6) score so both engines
    make the same boundary decision.
    """
    from no_jvm_wap_with_iceberg_spark.functions.vector import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    # the probe side carries the per-pair scoring work, so it must be
    # spread across cores even when the corpus is one input split (the
    # broadcast side's split count is irrelevant)
    b = fan_out(
        df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    )
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb"))
            .cast("decimal(10,6)")
            .cast("double")
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM flat GROUP BY 1),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.val*b.val) AS dot
      FROM flat a JOIN flat b ON a.ord = b.ord AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT id_a, id_b,
             CAST(CAST(dot / (na.nrm * nb.nrm) AS DECIMAL(10,6)) AS DOUBLE) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = id_a
      JOIN norms nb ON nb.vec_id = id_b
    ) WHERE cosine >= 0.4
    """,
    doc="embedding-cosine near-dup pairs at threshold 0.4 (exact "
    "all-pairs verification; LSH bucketing is the candidate filter at scale)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e)


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_tables: int = 12,
    n_bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Near-dup pairs via LSH candidate filter + exact cosine verify —
    the scale path for ``embedding_near_dup_pairs``, same output
    contract (id_a < id_b, rounded cosine, thresholded).

    Candidates are bucket collisions in any of ``n_tables``
    random-hyperplane tables (``similarity.lsh_bucket_ids`` — seeded
    plan literals, one bucket equi-join per corpus row per table);
    the exact scorer then runs only over collisions. At cos >= 0.9
    (12 tables x 6 bits) the miss probability per true pair is
    ~(1-0.82^6)^12 ~ 1e-9 while candidates shrink ~5x vs all-pairs —
    and the gap widens with more bits at the higher thresholds real
    dedup uses. NOTE: hyperplane LSH cannot beat all-pairs at
    thresholds near 0.4 (collision prob for theta=66deg is barely
    above random); for that regime the exact blocked scorer IS the
    right plan.
    """
    from no_jvm_wap_with_iceberg_spark.functions.vector import cosine_similarity
    from no_jvm_wap_with_iceberg_spark.operators.similarity import lsh_bucket_codes

    # codes computed ONCE on the compact one-row-per-vector table and
    # cached; both self-join sides explode the cached result (the
    # earlier two lsh_bucket_ids calls re-ran the whole bucketing
    # kernel per side — 2x the dominant cost at any scale)
    coded = lsh_bucket_codes(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        "_v",
        n_tables,
        n_bits,
        dim,
    ).cache()
    a = coded.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.posexplode("_codes").alias("table", "bucket"),
    )
    b = coded.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.posexplode("_codes").alias("table", "bucket"),
    )
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "_va", "id_b", "_vb")
        .distinct()
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb"))
            .cast("decimal(10,6)")
            .cast("double")
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@register(
    "dedup_embedding_lsh",
    """
    WITH flat0 AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    flat AS (
      SELECT vec_id, ord, val FROM flat0
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, ord,
             val * (1.0 + 0.3 * SIN(vec_id * 13 + (ord - 1))) AS val
      FROM flat0
    ),
    norms AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM flat GROUP BY 1),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.val*b.val) AS dot
      FROM flat a JOIN flat b ON a.ord = b.ord AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT id_a, id_b,
             CAST(CAST(dot / (na.nrm * nb.nrm) AS DECIMAL(10,6)) AS DOUBLE) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = id_a
      JOIN norms nb ON nb.vec_id = id_b
    ) WHERE cosine >= 0.9
    """,
    doc="LSH-bucketed embedding dedup at cos>=0.9 over a corpus with "
    "planted near-duplicates (deterministic sine perturbation, "
    "reproducible in both engines); the oracle is the EXACT all-pairs "
    "computation on the same derived corpus, so any LSH recall miss "
    "fails the gate. The base table's own 0.4-threshold pairs stay "
    "with the exact scorer (dedup_embedding_cosine): hyperplane LSH "
    "is provably ineffective at theta ~ 66 degrees",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    orig_id = F.col("vec_id").cast("long")
    v = F.col("embedding").cast("array<double>")
    base = e.select(orig_id.alias("vec_id"), v.alias("vec"))
    # NOTE the intermediate _oid/_v names: re-aliasing ``vec_id`` to the
    # shifted id in the SAME select that reads it inside the transform
    # lambda lets the optimizer rebind the lambda's reference to the
    # shifted alias after the union — the perturbation must see the
    # ORIGINAL id
    perturbed = e.select(orig_id.alias("_oid"), v.alias("_v")).select(
        (F.col("_oid") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            F.col("_v"),
            lambda x, i: x * (F.lit(1.0) + 0.3 * F.sin(F.col("_oid") * 13 + i)),
        ).alias("vec"),
    )
    derived = base.unionByName(perturbed)
    return embedding_near_dup_pairs_lsh(derived, id_col="vec_id", vec_col="vec")


@register(
    "dedup_simhash_profile",
    None,  # hash family not reproducible in SQL -> rows-only check;
    # dedup_simhash_agreement_gate asserts the fingerprints' QUALITY
    doc="SimHash64 fingerprint profile: docs per 16-bit prefix bucket",
)
def dedup_simhash_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = simhash64(d, "doc_id", "text")
    return (
        fp.groupBy(F.shiftrightunsigned(F.col("simhash"), 48).alias("prefix16"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("prefix16")
    )


# SimHash quality gate: hamming distance of two docs' fingerprints
# must track their exact shingle-Jaccard. HAM_CUT splits the regimes;
# bounds are set from measured cohort distributions across
# sf0.001/0.01/0.1 — near pairs (exact Jaccard >= 0.7) hammed 0-12
# (frac <= CUT was 1.0 everywhere), far pairs' 5th percentile was
# 11-12 (frac <= CUT ~0.1) — so 0.9 / 0.35 hold with wide margin
SIMHASH_HAM_CUT = 13
SIMHASH_NEAR_AGREE = 0.9  # frac of true near-dups at hamming <= CUT
SIMHASH_FAR_LEAK = 0.35  # max frac of far pairs at hamming <= CUT


@register(
    "dedup_simhash_agreement_gate",
    """
    SELECT 'near' AS cohort, true AS agreement_ok
    UNION ALL
    SELECT 'far', true
    """,
    doc="assertion-gate companion to the rows-only simhash profile: "
    "two pair cohorts — verified near-dups (exact shingle-Jaccard "
    ">= 0.7 via MinHash candidates) and deterministic far pairs "
    "(doc_id offset pairing) — and for each the fraction whose "
    "SimHash hamming distance lands at or under SIMHASH_HAM_CUT, "
    "asserted in-plan against measured bounds (near >= 0.9 agree, "
    "far <= 0.35 leak). A hash-family regression now fails the "
    "driver hash gate instead of hiding behind a bucket-count "
    "profile.",
)
def dedup_simhash_agreement_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = d.count()
    # cache the simhash fingerprints: they feed BOTH sides of BOTH
    # cohort joins, and uncached the Arrow-UDF hashing pass over every
    # document ran four times (guide §5 — reused and expensive to
    # recompute; same internal-cache convention as
    # minhash_candidate_pairs' signature table)
    fp = simhash64(d, "doc_id", "text").cache()
    a = fp.select(F.col("_id").alias("id_a"), F.col("simhash").alias("_sa"))
    b = fp.select(F.col("_id").alias("id_b"), F.col("simhash").alias("_sb"))

    def hammed(pairs: DataFrame, cohort: str) -> DataFrame:
        h = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
        return (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .agg(
                F.avg(
                    (h <= SIMHASH_HAM_CUT).cast("double")
                ).alias("_frac")
            )
            .select(F.lit(cohort).alias("cohort"), "_frac")
        )

    near = hammed(
        minhash_dedup_pairs(d, "doc_id", "text").select("id_a", "id_b"),
        "near",
    ).select(
        "cohort", (F.col("_frac") >= SIMHASH_NEAR_AGREE).alias("agreement_ok")
    )
    far = hammed(
        d.select(F.col("doc_id").alias("id_a"))
        .withColumn("id_b", (F.col("id_a") + F.lit(n // 2)) % F.lit(n))
        .filter(F.col("id_a") < F.col("id_b")),
        "far",
    ).select(
        "cohort", (F.col("_frac") <= SIMHASH_FAR_LEAK).alias("agreement_ok")
    )
    return near.unionByName(far)


def connected_components(
    pairs: DataFrame,
    max_iters: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Union-find over a pair graph: label every node with the minimum
    id reachable from it (= component id). Input columns ``id_a`` /
    ``id_b``; output ``(doc_id, component_id)``.

    Implementation is alternating **large-star / small-star** (Kiveris
    et al., "Connected Components in MapReduce and Beyond"): each round
    re-points nodes at the minimum of their neighborhood, contracting
    path lengths geometrically — O(log diameter) rounds instead of the
    O(diameter) that per-round min-label propagation needs on chain
    graphs. Near-dup clusters are tiny cliques (1-2 rounds either
    way); the win is the pathological long-chain tail that otherwise
    hits ``max_iters``. Everything is groupBy/join shuffles on node
    ids; ``localCheckpoint`` cuts lineage each round so plans stay
    flat; no driver-side graph state. ``stats["rounds"]`` reports the
    number of rounds when a dict is passed (tests assert the
    chain-graph count).
    """
    # symmetric neighbor list (u, v)
    adj = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # eager ON PURPOSE: making this lazy so the `nodes` job would
        # materialize it measured ~3x SLOWER (13 s vs 4 s at sf0.1) —
        # the nodes job's column-pruned scan does not populate the
        # checkpoint blocks the rounds need, so every round recomputed
        # the symmetric-edge subtree
        .localCheckpoint(eager=True)
    )
    nodes = adj.select(F.col("u").alias("node")).distinct().localCheckpoint(
        eager=True
    )

    def star(edges: DataFrame, large: bool) -> DataFrame:
        # m(u) = min(neighborhood(u) + {u}); re-point the strictly
        # larger neighbors (large-star) / the <= u neighbors plus u
        # itself (small-star) at m. Edges stored directed (child ->
        # smaller parent); both halves are one groupBy + one join on u.
        m = edges.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        j = edges.join(m, "u")
        if large:
            out = j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = j.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            ).unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        return out.filter(F.col("u") != F.col("v")).distinct()

    rounds = 0
    prev_sig = None
    for _ in range(max_iters):
        rounds += 1
        # large-star needs the symmetric view; small-star the directed.
        # The distinct looks redundant (adj is directed child->parent,
        # so the union carries no duplicate rows, and the groupBy-min
        # ignores duplicates anyway) but REMOVING it measured ~0.5 s
        # SLOWER at sf0.1 in paired A/B runs both orderings (medians
        # 3.98 vs 4.93 and 3.47 vs 4.06): the materializing exchange
        # is reused by both consumers of each star pass and feeds AQE
        # accurate sizes. Kept on measurement (guide §1.1).
        sym = adj if rounds == 1 else adj.unionByName(
            adj.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        # lazy checkpoint: the signature aggregation just below is the
        # round's first action, so it materializes the checkpoint
        # blocks as a side effect — one Spark job per round instead of
        # an eager-materialize job followed by a re-scan (guide §1.2)
        new = star(star(sym, large=True), large=False).localCheckpoint(
            eager=False
        )
        # convergence probe: (count, hash-sum) signature — one scan of
        # the checkpointed result instead of an exceptAll join shuffle
        # per round (collision odds ~2^-64; a false stop would surface
        # as a wrong component id in the oracle gate)
        sig = tuple(
            new.agg(
                F.count(F.lit(1)),
                # decimal sum: an ANSI long sum of 64-bit hashes overflows
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )
        adj = new
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    # converged star graph: every edge is (node -> component min);
    # roots have no outgoing edge and label themselves
    return nodes.join(
        adj.select(F.col("u").alias("node"), F.col("v").alias("parent")),
        "node",
        "left",
    ).select(
        F.col("node").alias("doc_id"),
        F.coalesce(F.col("parent"), F.col("node")).alias("component_id"),
    )


@register(
    "dedup_components",
    f"""
    WITH RECURSIVE pairs AS (
      {_EXACT_JACCARD_ORACLE}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           LEAST(src, MIN(dst)) AS component_id
    FROM reach GROUP BY src
    """,
    doc="near-dup clustering: connected components over the verified "
    "pair graph (large-star/small-star contraction, O(log diameter) "
    "rounds; keep-one-per-group follows as min(doc_id) == "
    "component_id)",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text")
    return connected_components(pairs)


def cluster_representatives(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Resolve each near-dup cluster to ONE canonical document: the
    highest-``quality_col`` member (ties -> lowest id). Output one row
    per component: (component_id, keep_doc_id, n_members, n_purged).

    The last step of the dedup pipeline — pairs -> components ->
    keep/purge decision. Components are tiny relative to the corpus
    (only docs with at least one near-dup edge appear), so the join
    back to the docs table broadcasts the component map and the
    per-component window shuffles only the clustered minority.
    """
    from pyspark.sql.window import Window as W

    member_quality = components.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    rk = F.row_number().over(
        W.partitionBy("component_id").orderBy(
            F.col(quality_col).desc(), F.col(id_col)
        )
    )
    return (
        member_quality.withColumn("_rk", rk)
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(F.when(F.col("_rk") == 1, F.col(id_col))).alias(
                "keep_doc_id"
            ),
            (F.count(F.lit(1)) - 1).alias("n_purged"),
        )
    )


@register(
    "dedup_cluster_representatives",
    f"""
    WITH RECURSIVE pairs AS (
      {_EXACT_JACCARD_ORACLE}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT c.component_id, c.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT component_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
             AS keep_doc_id,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_purged
    FROM ranked GROUP BY component_id
    """,
    doc="end-to-end near-dup resolution: MinHash+LSH pairs -> "
    "connected components -> one canonical doc per cluster (longest "
    "text wins, ties to the lowest doc_id) with purge counts — the "
    "decision artifact a 100 TB dedup pass feeds back into curation",
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text")
    comps = connected_components(pairs)
    return cluster_representatives(d, comps)


# ----------------------------------------------------------------------
# exact-substring dedup: duplicated token spans ACROSS documents
# (whole-doc near-dup misses boilerplate/copied passages inside
# otherwise-distinct documents — the training-data case where a span
# repeated across the corpus should be down-weighted or cut)
# ----------------------------------------------------------------------
def substring_span_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-document profile of ``k``-token spans shared with OTHER docs.

    Spark-first shape: explode positions 1..n_tokens-k+1, build the
    span by ``slice`` + ``concat_ws`` (all JVM), md5 it to a fixed-width
    key, one shuffle on the span hash to count distinct holders, one
    shuffle back on the doc id. At 100 TB the span-hash aggregation is
    the only wide stage and it partial-aggregates map-side; md5 keeps
    shuffle rows at 32 bytes + ids regardless of span text size.
    Output: (doc_id, n_spans, n_dup_spans, dup_ratio) for EVERY doc
    (docs shorter than ``k`` tokens report 0/0/NULL).
    """
    # token array staged once per row (textfn.py performance contract:
    # an inline split would re-run per exploded position)
    n = F.size(F.col("_t"))
    idxs = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    spans = fan_out(docs).select(
        F.col(id_col), words(F.col(text_col)).alias("_t")
    ).select(
        F.col(id_col), F.explode_outer(idxs).alias("_i"), F.col("_t")
    ).filter(F.col("_i").isNotNull()).select(
        id_col,
        F.md5(
            F.encode(F.concat_ws(" ", F.slice("_t", F.col("_i"), k)), "UTF-8")
        ).alias("_h"),
    )
    holders = spans.groupBy("_h").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    per_doc = (
        spans.join(holders, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_docs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                (
                    F.col("n_dup_spans").cast("decimal(18,9)")
                    / F.col("n_spans")
                ).cast("decimal(10,6)"),
            )
            .cast("double")
            .alias("dup_ratio"),
        )
    )


@register(
    "dedup_substring_spans",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS h
      FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
    ),
    holders AS (
      SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY h
    ),
    per_doc AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans
      FROM sh JOIN holders ON holders.h = sh.h
      GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CASE WHEN COALESCE(n_spans, 0) > 0
                THEN CAST(CAST(CAST(n_dup_spans AS DECIMAL(18,9)) / n_spans
                          AS DECIMAL(10,6)) AS DOUBLE)
                ELSE NULL END AS dup_ratio
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
    """,
    doc="exact-substring dedup: per-doc count/ratio of 8-token spans "
    "that also appear in at least one other document (md5 span keys, "
    "one wide stage on the span hash)",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return substring_span_profile(d)


@register(
    "dedup_source_matrix",
    f"""
    WITH pairs AS (
      {_EXACT_JACCARD_ORACLE}
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY 1, 2
    """,
    doc="cross-source contamination matrix: near-dup pair counts by "
    "(source, source) — the curation signal for which ingest feeds "
    "duplicate each other (mirror sites, scraped re-posts). Source "
    "pair is normalized LEAST/GREATEST so the matrix is triangular. "
    "Plan: the LSH pair generation dominates; the pair set (small by "
    "construction) joins against the corpus-sized doc->source map — "
    "AQE broadcasts the PAIR side; broadcasting the doc map would be "
    "an O(corpus) driver payload at 100 TB.",
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text")
    src = d.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
