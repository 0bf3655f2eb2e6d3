"""Operator-level tests: dedup, similarity, text analysis, multimodal
plumbing — semantics the oracle harness can't express (recall of
approximate paths, stub behavior, library transforms)."""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    exact_jaccard_pairs,
    minhash_dedup_pairs,
    simhash64,
)
from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
    as_media_table,
    extract_features,
)
from no_jvm_wap_with_iceberg_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
)
from no_jvm_wap_with_iceberg_spark.operators.text import lang_id
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_fan_out_spreads_undersplit_inputs_only(spark):
    """fan_out must repartition a single-split input to the core count
    and leave an already-well-split input untouched (no gratuitous
    shuffle on a 100 TB scan)."""
    from no_jvm_wap_with_iceberg_spark.functions.textfn import fan_out

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    assert fan_out(narrow).rdd.getNumPartitions() == par

    wide = spark.range(1000).repartition(par + 4)
    assert fan_out(wide) is wide  # identity, not just same count


def test_exact_dedup_keeps_one_per_group(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "aaa")], "id long, text string"
    )
    out = exact_dedup(df, ["text"], "id")
    rows = {(r["id"], r["text"]) for r in out.collect()}
    assert rows == {(1, "aaa"), (3, "bbb")}


def test_minhash_equals_exact_on_corpus(spark, documents):
    exact = {
        (r["id_a"], r["id_b"]) for r in exact_jaccard_pairs(documents, "doc_id", "text").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(documents, "doc_id", "text").collect()
    }
    assert exact, "corpus should contain planted near-dup pairs"
    assert lsh == exact  # full recall at threshold 0.7 with k=32, r=1


def test_simhash_near_dups_have_close_fingerprints(spark, documents):
    fp = simhash64(documents, "doc_id", "text")
    pairs = exact_jaccard_pairs(documents, "doc_id", "text")
    a = fp.select(F.col("_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("_id").alias("id_b"), F.col("simhash").alias("hb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    dist = joined.select(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
    )
    avg_near = dist.agg(F.avg("hamming")).collect()[0][0]
    assert avg_near is not None and avg_near <= 16  # near-dups land close in simhash space
    # determinism: same input -> same fingerprints
    fp2 = simhash64(documents, "doc_id", "text")
    assert fp.exceptAll(fp2).count() == 0


def test_ann_lsh_recall_against_brute_force(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(embeddings, queries, k=5)
    approx = ann_lsh_topk(embeddings, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall {recall:.2f} too low"


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and looked at the dog",),
            ("el gato y el perro en la casa de los abuelos",),
            ("der hund und die katze sind nicht ein problem",),
            ("le chat et le chien sont dans les jardins",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert got == ["en", "es", "de", "fr", "und"]


def test_multimodal_feature_extraction_stub(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, None)],
        "id long, payload binary",
    )
    media = as_media_table(df, "id", "payload", "image")
    feats = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["checksum"] == ord("a") + ord("b") + ord("c")
    # +1 form, shared with resize_plan (composing the stubs must not
    # report contradictory dims; width can never be 0)
    assert feats[1]["width"] == 4 and feats[1]["height"] == 1
    assert feats[2]["n_bytes"] == 0
    assert feats[3]["n_bytes"] == 0

    # decode_stub=False now runs the REAL BMP codec; non-BMP bytes
    # fail at the codec with the honest magic error
    with pytest.raises(Exception, match="BMP|magic"):
        extract_features(media, decode_stub=False).collect()
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        encode_bmp24,
    )

    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    real = spark.createDataFrame(
        [(7, bytearray(encode_bmp24(px)))], "id long, payload binary"
    )
    got = extract_features(
        as_media_table(real, "id", "payload", "image"), decode_stub=False
    ).collect()[0]
    flat = px.reshape(-1).astype(np.int64)
    assert (got["width"], got["height"]) == (3, 2)
    assert got["checksum"] == int(((np.arange(18) + 1) * flat).sum())


def test_bmp_codec_roundtrip_and_stride():
    """Real BMP codec: round-trips pixel-exact across odd widths
    (non-trivial stride padding) and both row orders; refuses
    non-24bpp honestly."""
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp24,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (2, 3), (5, 4), (21, 13), (3, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_bmp24(px)
        # file size must include per-row padding to a 4-byte stride
        assert len(blob) == 54 + h * ((3 * w + 3) // 4 * 4)
        d = decode_bmp(blob)
        assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
        assert np.array_equal(d["pixels"], px), f"{w}x{h} roundtrip"

    # top-down variant (negative height) decodes to the same image order
    import struct

    px = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp24(px[::-1]))  # rows as stored = image order
    blob[22:26] = struct.pack("<i", -3)
    d = decode_bmp(bytes(blob))
    assert np.array_equal(d["pixels"], px)

    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG...")
    bad = bytearray(encode_bmp24(px))
    bad[28] = 8  # bpp=8
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(bytes(bad))


def test_wav_codec_roundtrip_and_chunk_walk():
    """Real WAV codec: PCM16 round-trip, duration math, and a chunk
    walk that survives extra/odd-sized chunks before fmt/data."""
    import struct

    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    blob = encode_wav_pcm16(s, 8000)
    assert len(blob) == 44 + 2 * len(s)
    d = decode_wav(blob)
    assert d["sample_rate"] == 8000 and d["channels"] == 1
    assert d["n_frames"] == 6 and d["duration_ms"] == 0  # 6/8000 s
    assert np.array_equal(d["samples"], s)
    assert decode_wav(encode_wav_pcm16(np.zeros(8000, np.int16), 8000))[
        "duration_ms"
    ] == 1000

    # insert a LIST chunk with an ODD size between WAVE and fmt: the
    # walk must skip it (word-aligned) and still find fmt/data
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
    patched = blob[:12] + extra + blob[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    d2 = decode_wav(patched)
    assert np.array_equal(d2["samples"], s)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    # a truncated data chunk (partial object-store read) must refuse,
    # not silently decode fewer samples than declared
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(blob[:-4])
    # non-PCM format code refuses honestly
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_wav(bytes(bad))


def test_decode_media_features_mixed_and_unknown(spark):
    """decode_media_features: BMP and WAV payloads in one frame, each
    through its real codec; an unknown magic raises the honest stub."""
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        decode_media_features,
        encode_bmp24,
        encode_wav_pcm16,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    s = np.array([5, -5, 7], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp24(px))), (2, bytearray(encode_wav_pcm16(s, 16000)))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in decode_media_features(df).collect()}
    flat = px.reshape(-1).astype(np.int64)
    assert got[1]["media_kind"] == "bmp"
    assert (got[1]["width"], got[1]["height"]) == (3, 2)
    assert got[1]["checksum"] == int(((np.arange(flat.size) + 1) * flat).sum())
    assert got[2]["media_kind"] == "wav"
    assert got[2]["sample_rate"] == 16000 and got[2]["n_frames"] == 3
    assert got[2]["checksum"] == 1 * 5 + 2 * -5 + 3 * 7

    bad = spark.createDataFrame(
        [(3, bytearray(b"\x89PNG\r\n"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        decode_media_features(bad).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )

    # NULL payloads (nullable per MEDIA_SCHEMA) must not crash the
    # stage: decode emits a null-featured row, the frame fan-out
    # emits no frames, resize emits a null-dims row
    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        resize_bmp_nearest,
        wav_frame_features,
    )

    nulls = spark.createDataFrame(
        [(9, None)], "media_id long, payload binary"
    )
    nrow = decode_media_features(nulls).collect()[0]
    assert nrow["media_kind"] is None and nrow["n_bytes"] == 0
    assert wav_frame_features(nulls).count() == 0
    rrow = resize_bmp_nearest(nulls).collect()[0]
    assert rrow["dst_width"] is None and rrow["resized"] is None


def test_resize_bmp_nearest_matches_numpy(spark):
    """Real resize: output pixels equal direct numpy fancy-indexed
    sampling; 1-px floors; never upscales."""
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp24,
        resize_bmp_nearest,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 20, 3), dtype=np.uint8)
    tall = rng.integers(0, 256, size=(40, 2, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp24(px))), (2, bytearray(encode_bmp24(tall)))],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in resize_bmp_nearest(df, max_side=8).collect()
    }
    # 20x10 -> fit 8: dw=8, dh=10*8//20=4
    assert (out[1]["dst_width"], out[1]["dst_height"]) == (8, 4)
    got = decode_bmp(bytes(out[1]["resized"]))["pixels"]
    xi = np.arange(8) * 20 // 8
    yi = np.arange(4) * 10 // 4
    assert np.array_equal(got, px[yi][:, xi])
    # 2x40 -> dw = max(1, 2*8//40) = 1 (clamped), dh=8
    assert (out[2]["dst_width"], out[2]["dst_height"]) == (1, 8)
    # no upscale: small image passes through identity
    small = spark.createDataFrame(
        [(3, bytearray(encode_bmp24(px[:4, :5])))], "media_id long, payload binary"
    )
    r3 = resize_bmp_nearest(small, max_side=8).collect()[0]
    assert (r3["dst_width"], r3["dst_height"]) == (5, 4)
    assert np.array_equal(
        decode_bmp(bytes(r3["resized"]))["pixels"], px[:4, :5]
    )


def test_wav_frame_features_matches_reference(spark):
    """Frame features vs a plain-Python reference: energy, in-frame
    zero crossings (boundary pairs excluded), ragged last frame."""
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_frame_features,
    )

    v = np.array([5, -3, 2, -1, 0, 4, -4, 9, -9, 1], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(v, 8000)))],
        "media_id long, payload binary",
    )
    got = {
        r["frame_index"]: r.asDict()
        for r in wav_frame_features(df, frame_len=4).collect()
    }
    # reference: frames [5,-3,2,-1], [0,4,-4,9], [-9,1]
    assert got[0]["n_samples"] == 4 and got[0]["energy"] == 11
    assert got[0]["zero_crossings"] == 3  # 5/-3, -3/2, 2/-1
    assert got[1]["n_samples"] == 4 and got[1]["energy"] == 17
    # 0/4 no cross (0 counts as >=0), 4/-4 cross, -4/9 cross; the
    # -1/0 boundary pair belongs to neither frame
    assert got[1]["zero_crossings"] == 2
    assert got[2]["n_samples"] == 2 and got[2]["energy"] == 10
    assert got[2]["zero_crossings"] == 1  # -9/1 (9/-9 is the boundary)


def test_ann_ivf_recall_against_brute_force(spark, embeddings):
    from no_jvm_wap_with_iceberg_spark.operators.similarity import ann_ivf_topk

    queries = embeddings.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(embeddings, queries, k=5)
    approx = ann_ivf_topk(embeddings, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF recall {recall:.2f} too low"
    # determinism: seeded training -> identical output
    a2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(embeddings, queries, k=5).collect()
    }
    assert a == a2


def test_sketch_error_bounds(spark):
    """Approximate sketches stay within their advertised error of the
    exact answers (HLL rsd=1%, percentile_approx accuracy=1e4)."""
    from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r.event_type: r
        for r in get_queries()["sketch_events_approx_stats"].spark(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap.approx_users - ex.users) <= max(3, 0.05 * ex.users)
        assert abs(ap.approx_p50 - ex.p50) <= max(0.5, 0.05 * abs(ex.p50))


def test_substring_span_profile_semantics(spark):
    """Hand-built corpus: doc 1 and 2 share an 8-token span; doc 3 is
    unique; doc 4 is too short for any span."""
    from no_jvm_wap_with_iceberg_spark.operators.dedup import (
        substring_span_profile,
    )

    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "head1 " + shared),
            (3, "a b c d e f g h i j"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_span_profile(df).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_spans"] == 3 and out[3]["n_dup_spans"] == 0
    assert out[4]["n_spans"] == 0 and out[4]["dup_ratio"] is None
    assert abs(out[1]["dup_ratio"] - 1 / 3) < 1e-6


def test_quality_rules_semantics_and_oracle_marker_parity(spark):
    import re

    from no_jvm_wap_with_iceberg_spark.operators.text import (
        _ALL_MARKERS,
        quality_rules,
    )
    from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries

    # the oracle's inline stopword list must stay identical to the
    # Spark-side marker union — drift silently flips rule 4
    sql = get_queries()["text_quality_rules"].oracle
    m = re.search(r"list_intersect\(list_distinct\(t\),\s*\[(.*?)\]\)", sql, re.S)
    sql_list = sorted(x.strip().strip("'") for x in m.group(1).replace("\n", "").split(","))
    assert sql_list == sorted(_ALL_MARKERS)

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # passes
            (2, "word " * 3),  # too few words
            (3, "@#$% ^&*! @#$% ^&*! the @#$%"),  # symbol-heavy
            (4, "qqqq wwww eeee rrrr tttt"),  # no stopword
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["passes"] for r in quality_rules(df, "doc_id", "text").collect()}
    assert out == {1: 1, 2: 0, 3: 0, 4: 0}


def _py_components(pairs):
    """Reference union-find for small fixtures."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 200-node chain: per-round min-label propagation needs 199
    rounds (and silently returned WRONG labels under the old
    max_iters=20 cap); large-star/small-star contracts paths
    geometrically and must land well under the cap."""
    n = 200
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats = {}
    out = connected_components(pairs, stats=stats)
    rows = {r.doc_id: r.component_id for r in out.collect()}
    assert rows == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, stats


def test_connected_components_matches_union_find_reference(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r.doc_id: r.component_id
        for r in connected_components(df).collect()
    }
    ref = _py_components(pairs)
    # same node set, and component ids are the component minimum
    assert got == ref


def test_connected_components_cliques_and_pairs(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 20)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.component_id for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


# ----------------------------------------------------------------------
# k-means (operators/clustering.py)
# ----------------------------------------------------------------------
def test_kmeans_separates_obvious_blobs(spark):
    from no_jvm_wap_with_iceberg_spark.operators.clustering import kmeans_assign

    # two well-separated blobs in 4d; seeds (ids 0 and 1) land one in
    # each blob, so even one assignment round must split them cleanly
    blob_a = [[0.0 + i * 0.01] * 4 for i in range(10)]
    blob_b = [[5.0 + i * 0.01] * 4 for i in range(10)]
    rows = [(i, v) for i, v in enumerate(blob_a + blob_b)]
    rows[1] = (1, blob_b[0])  # make id 1 (a seed) a blob-b member
    rows[10] = (10, blob_a[1])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(df, k=2, iters=2).collect()
    }
    a_ids = {i for i, v in rows if v[0] < 2.5}
    b_ids = {i for i, v in rows if v[0] >= 2.5}
    assert {got[i] for i in a_ids} == {0}
    assert {got[i] for i in b_ids} == {1}


def test_kmeans_deterministic_across_runs_and_layouts(spark, embeddings):
    from no_jvm_wap_with_iceberg_spark.operators.clustering import kmeans_assign

    r1 = {
        r.vec_id: (r.cluster, r.cluster_size)
        for r in kmeans_assign(embeddings, k=4, iters=2).collect()
    }
    # different physical layout: repartitioned input, same result
    r2 = {
        r.vec_id: (r.cluster, r.cluster_size)
        for r in kmeans_assign(
            embeddings.repartition(7), k=4, iters=2
        ).collect()
    }
    assert r1 == r2
    assert len(r1) == embeddings.count()


def test_kmeans_drops_emptied_cluster(spark):
    from no_jvm_wap_with_iceberg_spark.operators.clustering import kmeans_assign

    # seed id 2 starts far from everything; after the update it keeps
    # only itself -> still a singleton cluster (never NULL/crash). A
    # cluster that catches nothing simply vanishes from the output.
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [100.0, 100.0])] + [
        (i, [0.5, 0.5]) for i in range(3, 20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, iters=3).collect()
    got = {r.vec_id: r.cluster for r in out}
    assert got[2] == 2  # the far point stays its own cluster
    assert set(got) == {r[0] for r in rows}
    sizes = {r.cluster: r.cluster_size for r in out}
    assert sizes[2] == 1


def test_bigram_logprob_orders_fluency(spark):
    """A doc made of one repeated bigram scores ln(1)=0-ish per pair;
    a doc of unique transitions scores strictly lower per pair."""
    from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries
    import math

    rows = [
        (1, "a b a b a b a b", "s"),
        # prefix 'x' fans out to y/z/w -> P(.|x) < 1, so the doc scores
        # strictly negative (unique-bigram docs score 0 under MLE:
        # every c2 == c1 == 1)
        (2, "x y x z x y x w", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.createOrReplaceTempView("_bigram_probe")
    # reuse the registered plan by pointing it at a temp parquet dir
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = get_queries()["text_bigram_logprob"].spark(spark, d)
        got = {r.doc_id: (r.n_bigrams, r.sum_logprob) for r in out.collect()}
    assert got[1][0] == 7 and got[2][0] == 7
    # doc1 transitions: P(b|a)=1 except last 'a b' context... all 'a'->'b'
    # and 'b'->'a' are the only transitions: each P=c2/c1 with c2==c1
    assert math.isclose(got[1][1], 0.0, abs_tol=1e-9)
    assert got[2][1] < got[1][1] - 1.0


def test_logreg_learns_separable_labels(spark):
    from no_jvm_wap_with_iceberg_spark.operators.classify import (
        logreg_fit,
        logreg_score,
    )

    # cleanly separable on x1 with margin; x2 is noise
    rows = [(i, 1 if i % 2 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(
        [(i, y, (2.0 if y else -2.0) + (i % 7) * 0.1, (i % 5) * 0.3)
         for i, y in rows],
        "id long, y int, x1 double, x2 double",
    )
    w = logreg_fit(df, "y", ["x1", "x2"], iters=8, lr=0.5)
    assert w[1] > 0.5  # positive weight on the separating feature
    out = {
        r["id"]: r["predicted"]
        for r in logreg_score(df, w, ["x1", "x2"]).collect()
    }
    acc = sum(out[i] == y for i, y in rows) / len(rows)
    assert acc >= 0.95


def test_logreg_deterministic_across_runs_and_layouts(spark):
    from no_jvm_wap_with_iceberg_spark.operators.classify import logreg_fit

    df = spark.createDataFrame(
        [(i, i % 3 == 0 and 1 or 0, i * 0.01, (i % 11) * 0.2)
         for i in range(300)],
        "id long, y int, x1 double, x2 double",
    )
    w1 = logreg_fit(df, "y", ["x1", "x2"], iters=3, lr=0.5)
    w2 = logreg_fit(df.repartition(7), "y", ["x1", "x2"], iters=3, lr=0.5)
    assert w1 == w2  # bit-identical regardless of partitioning


def test_logreg_gradient_matches_single_node_replay(spark):
    """The distributed gradient equals a sequential replay of the same
    quantized schedule (decimal sums are exact, so partitioning can't
    change the result)."""
    from decimal import Decimal, ROUND_HALF_UP

    from no_jvm_wap_with_iceberg_spark.operators.classify import logreg_fit

    data = [(i, 1 if (i * 7) % 13 < 6 else 0, (i % 9) * 0.25)
            for i in range(120)]
    df = spark.createDataFrame(data, "id long, y int, x1 double")
    got = logreg_fit(df, "y", ["x1"], iters=1, lr=0.5)

    # sequential replay: w=0 -> p = round6(sigmoid(0)) = 0.5 exactly
    q = lambda v: Decimal(repr(v)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    g0 = sum(q(0.5 - y) for _, y, _ in data)
    g1 = sum(q((0.5 - y) * x) for _, y, x in data)
    n = len(data)
    want = [0.0 - 0.5 * (float(g0) / n), 0.0 - 0.5 * (float(g1) / n)]
    assert got == want


def test_pq_encode_roundtrip_and_determinism(spark, embeddings):
    from no_jvm_wap_with_iceberg_spark.operators.similarity import pq_encode

    out = pq_encode(embeddings, "vec_id", "embedding", n_sub=4, k=8)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == embeddings.filter("embedding is not null").count()
    # codes are valid seed ids; seeds encode to themselves with 0 err
    for vid, r in rows.items():
        for m in range(4):
            assert 0 <= r[f"code_{m}"] < 8
        if vid < 8:
            assert all(r[f"code_{m}"] == vid for m in range(4))
            assert r["q_err"] == 0.0
    again = {
        r["vec_id"]: tuple(r)
        for r in pq_encode(
            embeddings.repartition(7), "vec_id", "embedding", n_sub=4, k=8
        ).collect()
    }
    assert {v: tuple(r) for v, r in rows.items()} == again


def test_pq_adc_matches_numpy_reference(spark, embeddings):
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    seeds = sorted(
        embeddings.filter("vec_id < 8")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids = [r["vec_id"] for r in seeds]
    full = np.array([r["v"] for r in seeds])
    cmats = full.reshape(8, 4, 16).transpose(1, 0, 2)

    codes = pq_encode(embeddings, "vec_id", "embedding", n_sub=4, k=8)
    qs = [
        (r["vec_id"], r["v"])
        for r in embeddings.filter("vec_id IN (100, 101)")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]
    got = pq_adc_topk(codes, cmats, ids, qs, k=5).collect()
    assert {r["query_id"] for r in got} == {100, 101}

    # numpy replay: same codes, same tables, same ranking
    code_rows = {
        r["vec_id"]: [r[f"code_{m}"] for m in range(4)]
        for r in codes.collect()
    }
    for qid, qv in qs:
        q = np.asarray(qv).reshape(4, 16)
        table = ((q[:, None, :] - cmats) ** 2).sum(axis=2)
        ref = sorted(
            (
                sum(table[m][c] for m, c in enumerate(cs)),
                vid,
            )
            for vid, cs in code_rows.items()
        )[:5]
        mine = sorted(
            (r["adc_dist"], r["vec_id"])
            for r in got
            if r["query_id"] == qid
        )
        assert [v for _, v in mine] == [v for _, v in ref]
        # a query whose vector IS in the corpus finds a 0-ish self hit
        for d, v in mine:
            if v == qid:
                assert d == min(x for x, _ in ref)


def _bpe_reference(texts, n_merges, min_count=2):
    """Sequential pure-Python BPE with the trainer's exact tie-break
    (max count, then lexicographically smallest pair)."""
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_sequential_reference(spark, documents):
    from no_jvm_wap_with_iceberg_spark.operators.bpe import bpe_train

    texts = [r["text"] for r in documents.select("text").collect()]
    want = _bpe_reference(texts, 8)
    got = bpe_train(documents, n_merges=8)
    assert got == want
    # determinism across partitioning
    got2 = bpe_train(documents.repartition(9), n_merges=8)
    assert got2 == want


def test_bpe_segment_applies_merges_greedily(spark):
    from no_jvm_wap_with_iceberg_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "aaab aab"), (2, "aaab aaab aab ab")], "id long, text string"
    )
    merges = bpe_train(df, n_merges=2, min_count=1)
    # most frequent pair is (a,a) -> aa, then greedy remerge
    assert merges[0][:2] == ("a", "a")
    out = {
        r["id"]: r["bpe_tokens"]
        for r in bpe_segment(df, merges).collect()
    }
    # replay sequentially
    texts = {1: "aaab aab", 2: "aaab aaab aab ab"}
    for i, t in texts.items():
        syms = []
        for w in t.split(" "):
            s = list(w)
            for a, b, _ in merges:
                o, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        o.append(a + b)
                        j += 2
                    else:
                        o.append(s[j])
                        j += 1
                s = o
            syms.extend(s)
        assert out[i] == syms


def test_pca_fit_partition_invariant_and_correct(spark):
    """The fixed-point moment quantization makes the fitted basis
    BIT-identical on any partitioning, and the model agrees with a
    plain numpy PCA on the collected data."""
    import numpy as np

    from no_jvm_wap_with_iceberg_spark.operators.pca import (
        pca_fit,
        pca_transform,
    )
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")
    m1 = pca_fit(e, k=4)
    m2 = pca_fit(e.repartition(13), k=4)
    assert np.array_equal(m1.mean, m2.mean)
    assert np.array_equal(m1.components, m2.components)
    assert np.array_equal(m1.eigenvalues, m2.eigenvalues)

    # vs numpy reference on the same data (quantization bounds the gap)
    x = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in e.select("embedding").collect()]
    )
    np.testing.assert_allclose(m1.mean, x.mean(axis=0), atol=2e-6)
    cov = np.cov(x, rowvar=False, bias=True)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    np.testing.assert_allclose(m1.eigenvalues, ev, rtol=1e-3, atol=1e-6)
    # sign convention: largest-|coord| entry of each component positive
    for row in m1.components:
        assert row[int(np.argmax(np.abs(row)))] > 0

    # transform matches the closed form for the first row
    first = pca_transform(e.limit(1), m1).select("pca").first()[0]
    np.testing.assert_allclose(
        np.asarray(first),
        (np.asarray(e.first()["embedding"], dtype=np.float64) - m1.mean)
        @ m1.components.T,
        rtol=1e-12,
    )


def test_bpe_batched_rounds_fewer_than_merges(spark, documents):
    """Batched merge selection (VERDICT r3 #5): the same merge
    sequence in strictly fewer driver rounds than merges."""
    from no_jvm_wap_with_iceberg_spark.operators.bpe import bpe_train

    rounds: list[int] = []
    got = bpe_train(documents, n_merges=12, rounds_out=rounds)
    # exactness vs a TRUE sequential baseline: top_k=1 fetches one
    # pair per driver round, so batching cannot mask a divergence
    # (comparing two batched runs would only check determinism)
    assert got == bpe_train(documents, n_merges=12, top_k=1)
    assert got == _bpe_reference(
        [r["text"] for r in documents.select("text").collect()], 12
    )
    assert sum(rounds) == len(got)
    assert len(rounds) < len(got), (rounds, len(got))


def test_bpe_batch_stops_on_output_symbol_collision():
    """ADVICE r4: an accepted merge's OUTPUT string is a used symbol.
    If ('a','bc') is accepted while symbol 'abc' already exists,
    applying the merge inflates counts of pairs touching 'abc', so a
    later candidate touching 'abc' must stop the batch rather than
    ride the (now-broken) invariance proof."""
    from no_jvm_wap_with_iceberg_spark.operators.bpe import _exact_batch

    top = [
        {"a": "a", "b": "bc", "cnt": 100},
        {"a": "abc", "b": "d", "cnt": 90},  # touches the merged output
        {"a": "x", "b": "y", "cnt": 80},
    ]
    batch = _exact_batch(top, n_want=10, min_count=1)
    # the collision stops the batch at ('abc','d'); stop_cnt=90 then
    # strictly bounds everything after the head
    assert batch == [("a", "bc", 100)]

    # the OVERTAKE variant (code-review r5): 'abc' already exists
    # from a PRIOR round. Sequentially, merging ('a','bc') converts
    # ('bc','d') adjacencies into ('abc','d'), whose count can reach
    # 84 + 85 > 90 and overtake ('x','y') — so accepting anything
    # after the colliding head is unsound; the batch must cut to it
    top2 = [
        {"a": "a", "b": "bc", "cnt": 100},
        {"a": "x", "b": "y", "cnt": 90},
        {"a": "bc", "b": "d", "cnt": 85},
        {"a": "abc", "b": "d", "cnt": 84},
    ]
    assert _exact_batch(
        top2, n_want=10, min_count=1, existing=frozenset({"abc"})
    ) == [("a", "bc", 100)]
    # without the pre-existing symbol the same list batches two pairs
    assert _exact_batch(top2, n_want=10, min_count=1) == [
        ("a", "bc", 100),
        ("x", "y", 90),
    ]
