"""TableIO seam tests: parquet backend + Iceberg guard + runner layout parity."""

import pytest

from webextract.runner import RunPaths
from webextract.tableio import IcebergIO, ParquetIO


def test_parquet_io_roundtrip(spark, tmp_path):
    io = ParquetIO(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    io.overwrite_wave(df, "extracted", "r1", 0)
    io.overwrite_wave(df, "extracted", "r1", 1)
    assert io.exists(spark, "extracted")
    assert io.read(spark, "extracted").count() == 4
    # overwrite of a wave is idempotent, not additive
    io.overwrite_wave(df, "extracted", "r1", 1)
    assert io.read(spark, "extracted").count() == 4
    io.append(df, "lineage")
    io.append(df, "lineage")
    assert io.read(spark, "lineage").count() == 4


def test_parquet_io_layout_matches_runner(tmp_path):
    """runner.RunPaths and ParquetIO agree on the on-disk layout, so a future
    Iceberg swap-in replaces both behind one seam."""
    io = ParquetIO(str(tmp_path))
    rp = RunPaths(str(tmp_path))
    assert io._path("extracted", "r1", 3) == rp.extracted("r1", 3)
    assert io._path("errors", "r1", 0) == rp.errors("r1", 0)
    assert io._path("lineage") == rp.lineage()
    assert io._path("metrics") == rp.metrics()


def test_iceberg_io_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="not configured"):
        IcebergIO(spark, "webextract")
