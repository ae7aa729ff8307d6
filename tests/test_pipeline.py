"""Unit tests for the training-data pipeline library on constructed data:
sketch quality bounds, recall floors, multimodal Arrow plumbing.

Oracle-gate coverage for the deterministic pipeline queries lives in
test_queries_oracle.py (q_dedup_*, q_ngram_jaccard, q_ann_topk, ...).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash60,
    simhash_pairs,
    word_shingles,
)
from clickhouse_23_3_19_32_lts_spark.pipeline.similarity import (
    brute_force_topk,
    ivf_topk,
)
from clickhouse_23_3_19_32_lts_spark.pipeline.text import (
    doc_fingerprint,
    language_id,
    quality_score,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again until dawn "
    "breaks slowly while the river runs cold through the silent valley and "
    "every bird waits quietly for the first light of morning to arrive"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit => jaccard ~0.93
FAR = "completely different content about spark engines and columnar execution at scale"


@pytest.fixture(scope="module")
def doc_df(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=NEAR), Row(doc_id=3, text=FAR),
         Row(doc_id=4, text=BASE)]  # exact dup of 1
    )


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="x"), Row(id=2, t="x"), Row(id=3, t="y")]
    )
    out = {r["canonical_id"]: r["dup_count"] for r in exact_dedup(df, ["t"], "id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_estimates_jaccard(spark, doc_df):
    # exact duplicate docs => identical signatures => est == 1.0
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(doc_df, "doc_id", "text", threshold=0.0).collect()
    }
    assert pairs[(1, 4)] == 1.0
    # near-dup found with high estimate; far doc shares no band
    assert pairs.get((1, 2), 0) >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_signature_stable(spark, doc_df):
    sig = doc_df.filter("doc_id = 1").select(
        minhash_signature(word_shingles("text", 3), 16).alias("s")
    )
    a = sig.collect()[0]["s"]
    b = sig.collect()[0]["s"]
    assert a == b and len(a) == 16


def test_simhash_identity_and_near(spark, doc_df):
    rows = doc_df.select("doc_id", simhash60("text").alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}
    assert h[1] == h[4]  # identical text => identical simhash
    ham_near = bin(h[1] ^ h[2]).count("1")
    ham_far = bin(h[1] ^ h[3]).count("1")
    assert ham_near < ham_far  # one-word edit closer than unrelated text
    out = simhash_pairs(doc_df, "doc_id", "text", max_hamming=ham_near, n_blocks=ham_near + 2)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 4) in got and (1, 2) in got


def test_simhash_requires_exact_blocking(spark, doc_df):
    with pytest.raises(ValueError):
        simhash_pairs(doc_df, "doc_id", "text", max_hamming=12, n_blocks=10)


def test_ngram_jaccard_exact_values(spark, doc_df):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(doc_df, "doc_id", "text", k=2, threshold=0.0).collect()
    }
    assert out[(1, 4)] == 1.0
    assert 0.5 < out[(1, 2)] < 1.0


def test_ngram_jaccard_hot_shingle_correction(spark):
    """Round-10 collision-count rewrite: a shingle dropped by the hot guard
    (freq > max_bucket) must still count toward the reported jaccard of
    pairs that qualify via a non-hot shingle — |A∩B| = non-hot collisions
    + |A_hot ∩ B_hot|. Docs 1,2 share hot 'aa bb' AND non-hot 'bb cc':
    exact jaccard 2/(3+3-2)=0.5. Docs 3-6 share only the hot shingle, so
    (like the pre-rewrite guarded plan) they are not candidates at all."""
    rows = [
        Row(doc_id=1, text="aa bb cc dd"),
        Row(doc_id=2, text="aa bb cc ee"),
        Row(doc_id=3, text="aa bb ff gg"),
        Row(doc_id=4, text="aa bb hh ii"),
        Row(doc_id=5, text="aa bb jj kk"),
        Row(doc_id=6, text="aa bb ll mm"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", k=2, threshold=0.0, max_bucket=5
        ).collect()
    }
    assert out == {(1, 2): 0.5}


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_recall_floor(emb):
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    centroids = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    exact = brute_force_topk(emb, probes, k=10).select("probe_id", "vec_id")
    approx = ivf_topk(emb, probes, centroids, k=10, nprobe=4).select("probe_id", "vec_id")
    hits = exact.intersect(approx).count()
    total = exact.count()
    assert total == 50
    assert hits / total >= 0.3, f"IVF recall {hits}/{total} below floor"
    # raising nprobe must not lower recall
    approx8 = ivf_topk(emb, probes, centroids, k=10, nprobe=8).select("probe_id", "vec_id")
    assert exact.intersect(approx8).count() >= hits


def test_brute_force_topk_self_is_rank1(emb):
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    top1 = brute_force_topk(emb, probes, k=1).collect()
    for r in top1:
        assert r["vec_id"] == r["probe_id"] and r["score"] == pytest.approx(1.0)


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat of the house is in the garden"),
            Row(t="der hund ist nicht mit der katze"),
            Row(t="xyzzy plugh qwert"),
        ]
    )
    got = [r[0] for r in df.select(language_id("t")).collect()]
    assert got == ["en", "de", "und"]


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [Row(t=BASE), Row(t=BASE), Row(t="!!! ### $$$")]
    )
    rows = df.select(quality_score("t").alias("q"), doc_fingerprint("t").alias("f")).collect()
    assert rows[0]["q"] == pytest.approx(1.0) and rows[2]["q"] < 0.5
    assert rows[0]["f"] == rows[1]["f"] != rows[2]["f"]
    assert 0 <= rows[0]["f"] < (1 << 31) - 1


# ---------------------------------------------------------------------------
# multimodal plumbing (deterministic fake decode)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x89PNGfake-bytes-1", (64, 64, 1, "png")),
        (2, "image", b"\x89PNGfake-bytes-22", (128, 128, 1, "png")),
        (3, "video", b"RIFFfake-video", (320, 240, 7, "h264")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape(media_df):
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import FEATURE_DIM, extract_features

    rows = extract_features(media_df).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["decoded_bytes"] > 0
    # deterministic: same blob -> same features
    again = extract_features(media_df).collect()
    assert sorted(r["feature"] for r in rows) == sorted(r["feature"] for r in again)


def test_sample_frames_rows(media_df):
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import sample_frames

    out = sample_frames(media_df.filter("kind = 'video'"), every_n=2).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4, 6]
    assert len({r["frame_hash"] for r in out}) == 4  # per-frame distinct


def test_real_decode_is_stubbed():
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"bytes", fake=False)


def test_resize_stub_rewrites_meta(media_df):
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import resize_stub

    out = resize_stub(media_df, 32, 32).select("meta.width", "meta.height", "meta.codec").collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
    assert {r["codec"] for r in out} == {"png", "h264"}


def test_ivf_materialized_index(spark, emb, tmp_path):
    """build_ivf_index + ivf_index_topk: search reads only the nprobe
    clusters' partitions (partition pruning = the index lookup), and
    results equal the in-memory ivf_topk for the same parameters."""
    from clickhouse_23_3_19_32_lts_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )

    path = str(tmp_path / "ivf")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    centroids = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    build_ivf_index(emb, centroids, path)

    got = ivf_index_topk(spark, path, probes, centroids, k=5, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan  # pruned scan

    mem = ivf_topk(emb, probes, centroids, k=5, nprobe=3)
    a = {(r["probe_id"], r["vec_id"], r["rank"]) for r in got.collect()}
    b = {(r["probe_id"], r["vec_id"], r["rank"]) for r in mem.collect()}
    assert a == b


def test_blocked_near_dup_recall(spark, emb):
    """IVF-blocked near-dup (the registered 100 TB path) must find a
    documented majority of the exact all-pairs result — recall is bounded
    by blocking, values are exact for every found pair."""
    from clickhouse_23_3_19_32_lts_spark.pipeline.similarity import (
        embedding_near_dup_pairs,
        nearest_centroid_blocks,
    )

    cents = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    blocks = nearest_centroid_blocks(emb, cents, nprobe=2)
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4, blocks=blocks).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert set(blocked) <= set(exact)
    recall = len(blocked) / max(len(exact), 1)
    assert recall >= 0.6, f"blocking recall degraded: {recall:.2f}"
    for pair, sim in blocked.items():
        assert abs(sim - exact[pair]) < 1e-9  # found pairs score exactly


# --- real codecs: BMP/PPM/WAV roundtrips (pipeline/codecs.py) --------------


def _rgb_fixture(w, h):
    return bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(3))


def test_bmp_roundtrip():
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    for w, h in ((5, 3), (4, 4), (7, 2)):  # odd widths exercise row padding
        rgb = _rgb_fixture(w, h)
        blob = codecs.encode_bmp(w, h, rgb)
        assert codecs.sniff(blob) == "bmp"
        w2, h2, nch, rgb2 = codecs.decode_bmp(blob)
        assert (w2, h2, nch) == (w, h, 3)
        assert rgb2 == rgb


def test_ppm_roundtrip_and_ascii():
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    rgb = _rgb_fixture(6, 4)
    blob = codecs.encode_ppm(6, 4, rgb)
    assert codecs.sniff(blob) == "ppm"
    assert codecs.decode_ppm(blob)[3] == rgb
    # P3 ASCII variant with a comment
    p3 = b"P3\n# comment\n2 2\n255\n" + b" ".join(
        str(v).encode() for v in _rgb_fixture(2, 2)
    )
    w, h, _, pix = codecs.decode_ppm(p3)
    assert (w, h) == (2, 2) and pix == _rgb_fixture(2, 2)


def test_wav_roundtrip():
    import struct

    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    pcm = struct.pack("<8h", 0, 100, -100, 32767, -32768, 5, -5, 1)
    blob = codecs.encode_wav(16000, 1, 16, pcm)
    assert codecs.sniff(blob) == "wav"
    rate, ch, bits, data = codecs.decode_wav(blob)
    assert (rate, ch, bits) == (16000, 1, 16)
    assert data == pcm


def test_decode_image_real_and_stubbed():
    import pytest as _pytest

    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import (
        decode_audio,
        decode_image,
        image_meta,
    )

    rgb = _rgb_fixture(3, 3)
    assert decode_image(codecs.encode_bmp(3, 3, rgb)) == rgb
    assert decode_image(codecs.encode_ppm(3, 3, rgb)) == rgb
    assert image_meta(codecs.encode_bmp(3, 3, rgb)) == (3, 3)
    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")  # png: codec-stubbed
    assert decode_audio(codecs.encode_wav(8000, 1, 8, b"\x01\x02")) == b"\x01\x02"


def test_resize_images_real(spark):
    from pyspark.sql import Row

    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs
    from clickhouse_23_3_19_32_lts_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rgb = _rgb_fixture(8, 8)
    rows = [
        Row(
            media_id=1,
            kind="image",
            blob=codecs.encode_bmp(8, 8, rgb),
            meta=Row(width=8, height=8, n_frames=1, codec="bmp"),
        ),
        Row(
            media_id=2,
            kind="image",
            blob=b"\xff\xd8\xffjpeg-ish",
            meta=Row(width=0, height=0, n_frames=1, codec="jpeg"),
        ),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    r1 = out[1]
    assert r1["meta"]["width"] == 4 and r1["meta"]["codec"] == "ppm"
    w, h, _, scaled = codecs.decode_ppm(bytes(r1["blob"]))
    assert (w, h) == (4, 4)
    # nearest-neighbor: sampled pixels come from the source image
    assert scaled[:3] == rgb[:3]
    # non-decodable blob passes through untouched
    assert bytes(out[2]["blob"]) == b"\xff\xd8\xffjpeg-ish"
