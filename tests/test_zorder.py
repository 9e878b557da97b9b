"""Z-order layout: every z-ordered column's per-file min/max ranges must
tighten versus the source layout, and a selective 2-D box predicate must
be able to skip most files on footer stats alone."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.sources.registry import load_table
from movie_data_pipeline_spark.sources.sinks import write_zordered

SF_DIR = "/root/testdata/sf0.001"
COLS = ["o_totalprice", "o_custkey"]


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        los, his = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            los.append(st.min)
            his.append(st.max)
        ranges.append((float(min(los)), float(max(his))))
    return ranges


@pytest.fixture(scope="module")
def zpath(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "orders_z")
    orders = load_table(spark, SF_DIR, "orders")
    write_zordered(orders, path, COLS, bits=8, target_files=8)
    return path


def test_zorder_roundtrip_lossless(spark, zpath):
    orders = load_table(spark, SF_DIR, "orders")
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert back.select(*orders.columns).exceptAll(orders).count() == 0


def test_zorder_tightens_both_dimensions(spark, zpath):
    """Mean per-file range coverage must shrink on BOTH columns vs the
    single-file source (which necessarily covers ~100% of each domain).
    A 1-D sort would tighten only its own column; the Morton curve
    tightens all interleaved columns simultaneously."""
    n_files = len(glob.glob(f"{zpath}/*.parquet"))
    assert n_files >= 4
    for col in COLS:
        ranges = _file_ranges(zpath, col)
        glo = min(lo for lo, _ in ranges)
        ghi = max(hi for _, hi in ranges)
        span = ghi - glo
        mean_cover = sum((hi - lo) / span for lo, hi in ranges) / len(ranges)
        assert mean_cover < 0.75, f"{col}: mean per-file coverage {mean_cover:.2f}"


def test_zorder_skips_files_for_2d_box(spark, zpath):
    """A small 2-D box predicate must be prunable to a strict subset of
    files using footer stats only (the skip decision parquet readers
    make), and the query over the full path must agree with the source."""
    orders = load_table(spark, SF_DIR, "orders")
    stats = {c: _file_ranges(zpath, c) for c in COLS}
    n_files = len(stats[COLS[0]])
    # box: bottom-left decile of both dimensions
    qp = orders.approxQuantile("o_totalprice", [0.1], 0.001)[0]
    qc = orders.approxQuantile("o_custkey", [0.1], 0.001)[0]
    surviving = sum(
        1
        for i in range(n_files)
        if stats["o_totalprice"][i][0] <= qp and stats["o_custkey"][i][0] <= qc
    )
    assert surviving < n_files, "2-D box should not intersect every file"
    got = (
        spark.read.parquet(zpath)
        .filter((F.col("o_totalprice") <= qp) & (F.col("o_custkey") <= qc))
        .count()
    )
    want = orders.filter(
        (F.col("o_totalprice") <= qp) & (F.col("o_custkey") <= qc)
    ).count()
    assert got == want
