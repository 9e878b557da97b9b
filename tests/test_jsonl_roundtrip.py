"""JSONL sink/source round-trip: schema-stable, content-identical,
corrupt-line tolerant."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from movie_data_pipeline_spark.sources.registry import load_table
from movie_data_pipeline_spark.sources.sinks import read_jsonl, write_jsonl
from tests.conftest import TESTDATA_SF_DIR

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_roundtrip_identical(spark, tmp_path):
    docs = load_table(spark, TESTDATA_SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert back.schema == DOC_SCHEMA
    a = sorted((r.doc_id, r.text, r.lang) for r in docs.collect())
    b = sorted((r.doc_id, r.text, r.lang) for r in back.collect())
    assert a == b


def test_jsonl_permissive_skips_corrupt_lines(spark, tmp_path):
    import gzip, os

    path = str(tmp_path / "dirty")
    os.makedirs(path)
    with gzip.open(f"{path}/part-000.json.gz", "wt") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("{this is not json\n")
        f.write('{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n')
    back = read_jsonl(spark, path, DOC_SCHEMA)
    rows = {r.doc_id: r.text for r in back.collect() if r.doc_id is not None}
    assert rows == {1: "ok", 2: "ok2"}
