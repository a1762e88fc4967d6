"""Catalog snapshot semantics: log, scoped reads, time travel."""

import pytest

from frogocr_spark.sources.catalog import Table


def test_snapshots_and_time_travel(spark, tmp_path):
    t = Table(spark, str(tmp_path / "tbl"))
    assert t.snapshots() == [] and not t.exists()
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    df3 = spark.createDataFrame([(3, "c")], "id long, v string")
    t.append(df1, "r1")
    t.append(df2, "r2")
    t.append(df3, "r3")
    assert t.snapshots() == ["r1", "r2", "r3"]
    assert t.read().count() == 3
    assert [r.id for r in t.read_snapshot("r2").collect()] == [2]
    assert sorted(r.id for r in t.read_until("r2").collect()) == [1, 2]
    with pytest.raises(ValueError):
        t.read_until("nope")
    # idempotent re-append of the same run_id replaces, never duplicates
    t.append(df2, "r2")
    assert t.read().count() == 3
