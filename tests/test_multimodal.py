"""Multimodal binary-column plumbing: metadata, stubbed decode,
frame sampling (schemas + Arrow batch shapes are real; codecs stubbed)."""

import pytest
from pyspark.sql import functions as F

from csvplus_spark.operators.multimodal import (
    attach_media_meta,
    decode_images,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"fakejpegdata")),
        (2, bytearray(b"\x89PNG\r\n" + b"fakepngdata")),
        (3, bytearray(b"RIFFxxxxWAVE" + b"fakewav")),
        (4, bytearray(b"\x00\x01\x02\x03unknownblob")),
    ]
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_media_meta(media_df):
    rows = {r["media_id"]: r["media_meta"] for r in attach_media_meta(media_df).collect()}
    assert rows[1]["kind"] == "jpeg"
    assert rows[2]["kind"] == "png"
    assert rows[3]["kind"] == "riff/wav"
    assert rows[4]["kind"] == "unknown"
    assert rows[1]["byte_len"] == 16
    assert len(rows[1]["content_md5"]) == 32


def test_decode_stub_deterministic(media_df):
    a = {r["media_id"]: (r["width"], r["height"]) for r in decode_images(media_df).collect()}
    b = {r["media_id"]: (r["width"], r["height"]) for r in decode_images(media_df).collect()}
    assert a == b and len(a) == 4
    for w, h in a.values():
        assert 16 <= w <= 271 and 16 <= h <= 271


def test_decode_real_codec_raises_without_pillow(media_df):
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed: env-gate does not fire")
    except ImportError:
        pass
    with pytest.raises(Exception, match="no image codec importable"):
        decode_images(media_df, real_codec=True).collect()


def test_real_codec_smoke_with_pillow(spark, tmp_path):
    """VERDICT r5 item 8: when Pillow IS available, real_codec=True
    must push a real PNG through the SAME mapInPandas path — decode
    yields true geometry, resize yields a re-decodable PNG blob."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from csvplus_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("RGB", (37, 21), (250, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "media_id long, data binary")
    got = decode_images(df, real_codec=True).collect()[0]
    assert (got["width"], got["height"], got["n_pixels"]) == (37, 21, 777)

    out = resize_images(df, 8, 6, real_codec=True).collect()[0]
    with Image.open(io.BytesIO(bytes(out["data"]))) as im:
        assert im.size == (8, 6)


def test_feature_extract_feeds_similarity(media_df):
    from csvplus_spark.operators.multimodal import extract_features
    from csvplus_spark.operators.similarity import brute_force_topk

    feats = extract_features(media_df, dim=8)
    rows = feats.collect()
    assert len(rows) == 32  # 4 blobs x 8 dims
    assert all(-0.5 <= r["feature"] <= 0.5 for r in rows)
    # pivot the exploded features into an embedding column and run ANN:
    # the multimodal -> similarity composition end-to-end
    emb = (feats.groupBy("media_id")
           .agg(F.array_sort(F.collect_list(F.struct("feat_idx", "feature"))).alias("s"))
           .select(F.col("media_id").alias("vec_id"),
                   F.expr("transform(s, x -> x.feature)").alias("embedding")))
    out = brute_force_topk(emb, emb, k=2)
    assert out.count() == 8  # 4 queries x top-2
    assert out.filter(F.col("query_id") == F.col("corpus_id")).count() == 0


def test_resize_binary_roundtrip(media_df):
    from csvplus_spark.operators.multimodal import resize_images

    out = resize_images(media_df, 32, 16).collect()
    assert len(out) == 4
    for r in out:
        assert r["width"] == 32 and r["height"] == 16
        assert isinstance(r["data"], (bytes, bytearray))
        assert len(r["data"]) == 32 * 16  # size-proportional stub payload
    # deterministic across runs
    again = {r["media_id"]: bytes(r["data"])
             for r in resize_images(media_df, 32, 16).collect()}
    assert {r["media_id"]: bytes(r["data"]) for r in out} == again
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(Exception, match="no image codec importable"):
            resize_images(media_df, 32, 16, real_codec=True).collect()


def test_frame_sampling_one_to_many(media_df):
    out = sample_frames(media_df, n_frames=3)
    rows = out.collect()
    assert len(rows) == 12  # 4 blobs x 3 frames
    per = out.groupBy("media_id").agg(F.countDistinct("frame_md5").alias("n")).collect()
    assert all(r["n"] == 3 for r in per)
