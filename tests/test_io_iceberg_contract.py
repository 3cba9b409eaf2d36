"""Call-contract test for the Iceberg write/read branch of nous_spark.io.

The sandbox has no iceberg-spark-runtime jar (README documents the
cluster deps), so the branch cannot execute against a real catalog —
this pins the DataFrameWriterV2 call SEQUENCE (writeTo -> partitionedBy
-> append/createOrReplace) and the reader/exists calls instead, so a
regression in the untestable branch still fails CI."""

from __future__ import annotations

import pytest

from nous_spark.io import read_table, table_exists, write_table


class _FakeWriterV2:
    def __init__(self, log):
        self._log = log

    def partitionedBy(self, *cols):
        # write_table passes F.col(...) Columns — record their names
        self._log.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def append(self):
        self._log.append(("append",))

    def createOrReplace(self):
        self._log.append(("createOrReplace",))


class _FakeDF:
    def __init__(self):
        self.log = []

    def writeTo(self, target):
        self.log.append(("writeTo", target))
        return _FakeWriterV2(self.log)


class _FakeReader:
    def __init__(self, log):
        self._log = log

    def format(self, fmt):
        self._log.append(("format", fmt))
        return self

    def load(self, target):
        self._log.append(("load", target))
        return "df-sentinel"


class _FakeCatalog:
    def __init__(self, log):
        self._log = log

    def tableExists(self, target):
        self._log.append(("tableExists", target))
        return True


class _FakeSpark:
    def __init__(self):
        self.log = []
        self.read = _FakeReader(self.log)
        self.catalog = _FakeCatalog(self.log)


def test_iceberg_append_with_partitioning_call_sequence(spark):
    # the spark fixture is needed only because partitionedBy receives
    # real F.col(...) Columns, which require an active SparkContext
    df = _FakeDF()
    write_table(df, "cat.db.edges", mode="append", fmt="iceberg",
                partition_by=["tenant_id"])
    assert df.log[0] == ("writeTo", "cat.db.edges")
    assert df.log[1][0] == "partitionedBy" and len(df.log[1][1]) == 1
    assert "tenant_id" in df.log[1][1][0]
    assert df.log[2] == ("append",)


def test_iceberg_overwrite_maps_to_create_or_replace():
    df = _FakeDF()
    write_table(df, "cat.db.nodes", mode="overwrite", fmt="iceberg")
    assert df.log == [("writeTo", "cat.db.nodes"), ("createOrReplace",)]


def test_iceberg_read_and_exists_go_through_catalog():
    spark = _FakeSpark()
    assert read_table(spark, "cat.db.facts", fmt="iceberg") == "df-sentinel"
    assert spark.log == [("format", "iceberg"), ("load", "cat.db.facts")]
    spark.log.clear()
    assert table_exists(spark, "cat.db.facts", fmt="iceberg") is True
    assert spark.log == [("tableExists", "cat.db.facts")]


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        write_table(_FakeDF(), "x", fmt="orc2")
    with pytest.raises(ValueError):
        read_table(_FakeSpark(), "x", fmt="orc2")
