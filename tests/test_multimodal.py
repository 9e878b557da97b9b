from __future__ import annotations

import hashlib

import pytest

from movie_data_pipeline_spark.multimodal import (
    blob_features,
    decode_image,
    make_blob_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "aaaa")], "doc_id LONG, text STRING"
    )
    return make_blob_table(docs)


def test_blob_table_schema_and_bytes(blobs):
    rows = {r.blob_id: r for r in blobs.collect()}
    assert bytes(rows[1].content) == b"hello world"
    assert rows[1].n_bytes == 11 and rows[2].n_bytes == 0
    assert rows[1].modality == "text"


def test_blob_features_deterministic(blobs):
    feats = {r.blob_id: r for r in blob_features(blobs).collect()}
    assert feats[1].digest == hashlib.md5(b"hello world").hexdigest()
    assert feats[3].byte_mean == float(ord("a"))
    assert feats[3].byte_entropy == 0.0  # single symbol → zero entropy
    assert feats[2].n_bytes == 0 and feats[2].byte_mean == 0.0
    assert feats[1].byte_entropy > 2.0  # varied symbols


def test_stubs_raise_with_integration_pointer(blobs):
    with pytest.raises(NotImplementedError, match="mapInPandas"):
        decode_image(blobs)
    with pytest.raises(NotImplementedError, match="frame sampler"):
        sample_frames(blobs)
