"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator.

``spark.read.format("synthetic_documents")`` produces rows shaped like
the testdata ``documents`` table (doc_id, text, lang, source, n_chars)
entirely from a seed — no files, no driver-side materialization. Each
input partition generates its id range independently executor-side, so
corpus size scales linearly with the cluster: the same source that
makes 1k rows for a unit test makes 10^10 rows for a 100 TB soak run by
turning two options. This is the Spark-native answer to "generate test
data at scale" — the generator ships to executors as a plan node, not
as a driver loop writing files.

Determinism: content is a pure function of (seed, doc_id) via md5, so
any (n_docs, n_partitions) split yields byte-identical rows — resharding
cannot change the corpus. A fixed fraction of docs are near-duplicates
of an earlier doc (suffix-perturbed), so dedup operators have planted
signal, mirroring the driver's synthetic tables.

Usage::

    from movie_data_pipeline_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_documents")
          .option("n_docs", 100000).option("n_partitions", 64)
          .option("seed", 7).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"

_VOCAB = (
    "data spark table scan join filter merge sort window batch stream "
    "row column value key hash agg group order part query vector line "
    "customer small big fast slow the a dup"
).split()
_LANGS = ("en", "en", "en", "es", "zh", "fr")
_SOURCES = ("src0", "src1", "src2", "src3")
# every DUP_EVERY-th doc is a near-duplicate of the doc DUP_OFFSET back
_DUP_EVERY = 11
_DUP_OFFSET = 7


def _h(seed: int, doc_id: int, salt: str) -> int:
    d = hashlib.md5(f"{seed}:{doc_id}:{salt}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def _doc_text(seed: int, doc_id: int) -> str:
    base_id = doc_id
    perturb = False
    if doc_id % _DUP_EVERY == 0 and doc_id >= _DUP_OFFSET:
        base_id = doc_id - _DUP_OFFSET
        perturb = True
    n_tokens = 20 + _h(seed, base_id, "len") % 60
    words = [
        _VOCAB[_h(seed, base_id, f"w{i}") % len(_VOCAB)] for i in range(n_tokens)
    ]
    if perturb:  # near-dup: swap the last two tokens and append one
        words[-2:] = words[-1:] + words[-2:-1]
        words.append(_VOCAB[_h(seed, doc_id, "extra") % len(_VOCAB)])
    return " ".join(words)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocumentsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        n, p = self.n_docs, max(1, min(self.n_partitions, self.n_docs or 1))
        step = (n + p - 1) // p if n else 1
        return [
            _RangePartition(lo, min(lo + step, n), self.seed)
            for lo in range(0, n, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        seed = partition.seed
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(seed, doc_id)
            lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
            source = _SOURCES[_h(seed, doc_id, "src") % len(_SOURCES)]
            yield (doc_id, text, lang, source, len(text))


class SyntheticDocumentsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_documents"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocumentsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocumentsDataSource)
