"""Multimodal plumbing: Arrow-batched feature extraction + frame sampling.

The heavy codecs are stubbed (not installed here); what IS real and
tested: schema, mapInPandas batch shape, checksum/byte accounting, the
deterministic fake features, and the NotImplementedError production seam.
"""

from __future__ import annotations

import hashlib

import pytest

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.multimodal import (
    byte_histogram_features,
    documents_as_assets,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return documents_as_assets(R.load(spark, sf_dir, "documents")).cache()


def test_assets_schema_and_payloads(assets):
    row = assets.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert row["modality"] == "image"


def test_extract_features_checksum_and_shape(assets):
    feats = extract_features(assets, dim=16).collect()
    src = {r["asset_id"]: r["payload"] for r in assets.collect()}
    assert len(feats) == len(src)
    for r in feats[:25]:
        payload = bytes(src[r["asset_id"]])
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        assert r["n_bytes"] == len(payload)
        assert len(r["features"]) == 16
        assert sum(r["features"]) == pytest.approx(1.0, abs=1e-5)
        expected = byte_histogram_features(payload, 16)
        assert [pytest.approx(x, abs=1e-6) for x in expected] == list(r["features"])


def test_real_decode_seam_raises_not_implemented(assets):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as err:
        extract_features(assets, real_decode=True).collect()
    assert "NotImplementedError" in str(err.value) or "image decode requires" in str(err.value)


def test_sample_frames_offsets(spark):
    payload = bytes(range(256)) * 64  # 16 KiB
    df = spark.createDataFrame(
        [(1, "video", payload, "video/fake", len(payload))],
        "asset_id long, modality string, payload binary, mime string, n_bytes long",
    )
    frames = sample_frames(df, every_n_bytes=4096, max_frames=8).collect()
    assert [f["frame_idx"] for f in frames] == [0, 1, 2, 3]
    assert [f["byte_offset"] for f in frames] == [0, 4096, 8192, 12288]
    for f in frames:
        assert bytes(f["frame_bytes"]) == payload[f["byte_offset"] : f["byte_offset"] + 64]


def test_resize_images_fixed_output_size(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.multimodal import (
        documents_as_assets,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 5000), (2, "short"), (3, "")], "doc_id long, text string"
    )
    out = resize_images(documents_as_assets(docs), width=16, height=16).collect()
    assert len(out) == 3
    for r in out:
        assert len(r["payload"]) == 256  # exact target size, pad or sample
        assert (r["width"], r["height"], r["n_bytes"]) == (16, 16, 256)
    # resizing is deterministic
    out2 = resize_images(documents_as_assets(docs), width=16, height=16).collect()
    assert {r["asset_id"]: bytes(r["payload"]) for r in out} == {
        r["asset_id"]: bytes(r["payload"]) for r in out2
    }


def test_multimodal_features_compose_with_similarity_search(spark, sf_dir):
    """The tiers plug together: mapInPandas feature vectors (array<float>)
    drop straight into the similarity operators' embedding contract."""
    from pyspark.sql import functions as F

    from cloudfront_kinesis_log_lambda_spark.operators.multimodal import (
        documents_as_assets,
        extract_features,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import cosine_topk

    docs = load(spark, sf_dir, "documents").limit(100)
    feats = extract_features(documents_as_assets(docs), dim=16)
    emb_like = feats.select(
        F.col("asset_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    qid = emb_like.select(F.min("vec_id")).first()[0]
    top = cosine_topk(emb_like, query_vec_id=qid, k=5).collect()
    assert len(top) == 5
    cs = [r["cos"] for r in top]
    assert cs == sorted(cs, reverse=True)
    assert all(-1.0001 <= c <= 1.0001 for c in cs)


def test_decode_seam_raises_until_decoder_installed():
    """decode_image is an explicit production seam: in an environment
    without a decoder library it must fail loudly (NotImplementedError
    citing the missing dependency), never silently fake."""
    import pytest

    from cloudfront_kinesis_log_lambda_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG fake bytes")
