"""Z-order clustering: Morton-key correctness vs a Python reference, and
the DATA-SKIPPING proof — per-file parquet min/max footprints of a
z-ordered write are tight on BOTH columns, where a single-column sort is
tight on one and spans the full range on the other."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tundradb_spark.sources.zorder import with_zorder, write_zordered, zorder_key


def _morton(vals, bits):
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


class TestZorderKey:
    def test_matches_python_reference(self, spark):
        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3)
        ).collect()
        for r in out:
            assert r["zkey"] == _morton([r["x"], r["y"]], 3), (r["x"], r["y"])

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            zorder_key([F.col("x")] * 4)
        with pytest.raises(ValueError):
            zorder_key([F.col("x")], bits=0)

    def test_with_zorder_normalizes(self, spark):
        # constant column -> 0 contribution; non-constant spans the range
        df = spark.createDataFrame(
            [(i, 7) for i in range(100)], "x long, c long"
        )
        out = with_zorder(df, ["x", "c"], bits=4)
        keys = [r["zkey"] for r in out.collect()]
        assert min(keys) == 0
        # c constant -> odd bit positions always 0 -> key < 2^(2*4) with
        # only even bits set
        assert all((k & 0b10101010) == 0 for k in keys)


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = md.schema.names.index(col)
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mns.append(st.min)
            mxs.append(st.max)
        spans.append(max(mxs) - min(mns))
    return spans


class TestZorderSkipping:
    def test_two_column_footprints_tight(self, spark, tmp_path):
        # two independent uniform columns; 64 range cells, 16 files
        rows = [((i * 7919) % 1024, (i * 104729) % 1024) for i in range(4096)]
        df = spark.createDataFrame(rows, "x long, y long")

        zpath = str(tmp_path / "zord")
        write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
        lpath = str(tmp_path / "linear")
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )

        zx, zy = _file_spans(zpath, "x"), _file_spans(zpath, "y")
        lx, ly = _file_spans(lpath, "x"), _file_spans(lpath, "y")
        full = 1023

        # linear layout: tight on x, but every file spans ~the full y range
        assert sum(lx) / len(lx) < full * 0.2
        assert sum(ly) / len(ly) > full * 0.9
        # z-order: BOTH columns' average per-file span well under full —
        # the multi-column skipping property
        assert sum(zx) / len(zx) < full * 0.7
        assert sum(zy) / len(zy) < full * 0.7

    def test_roundtrip_content(self, spark, tmp_path):
        rows = [(i, i * 3 % 50) for i in range(500)]
        df = spark.createDataFrame(rows, "x long, y long")
        p = str(tmp_path / "zr")
        write_zordered(df, p, ["x", "y"], bits=6, n_files=4)
        back = sorted(map(tuple, spark.read.parquet(p).collect()))
        assert back == sorted(rows)
