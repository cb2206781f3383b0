#!/usr/bin/env python3
"""Integration smoke test for the Python API (python/graft_index.py).

Runs with the driver-side pyspark against the packaged graft jar:
    python3 scripts/test_python_api.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))

from pyspark.sql import SparkSession  # noqa: E402

JAR = os.path.join(os.path.dirname(__file__), "..",
                   "target", "scala-2.13", "parquetindexspark_2.13-0.1.0.jar")


def main():
    work = tempfile.mkdtemp(prefix="graft-py-")
    spark = (SparkSession.builder
             .master("local[4]")
             .appName("graft-python-api-test")
             .config("spark.driver.extraClassPath", os.path.abspath(JAR))
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.index.metastore", f"{work}/metastore")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from graft_index import QueryContext

    table = f"{work}/lineitem"
    (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
     .repartition(8, "l_orderkey").write.parquet(table))

    ctx = QueryContext(spark)
    ctx.index.create.mode("overwrite").indexBy("l_orderkey", "l_returnflag").parquet(table)
    assert ctx.index.exists.parquet(table), "index should exist"

    key = spark.read.parquet(table).agg({"l_orderkey": "min"}).collect()[0][0]
    indexed = ctx.index.parquet(table).filter(f"l_orderkey = {key}").collect()
    plain = spark.read.parquet(table).filter(f"l_orderkey = {key}").collect()
    assert sorted(map(str, indexed)) == sorted(map(str, plain)), "results differ"
    assert len(indexed) > 0

    # incremental refresh: append files, refresh, re-query
    (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
     .limit(100).repartition(2).write.mode("append").parquet(table))
    stats = ctx.index.refresh.parquet(table)
    assert stats == {"addedFiles": 2, "removedFiles": 0}, f"refresh stats: {stats}"
    indexed2 = ctx.index.parquet(table).filter(f"l_orderkey = {key}").collect()
    plain2 = spark.read.parquet(table).filter(f"l_orderkey = {key}").collect()
    assert sorted(map(str, indexed2)) == sorted(map(str, plain2)), "post-refresh differ"

    # ops surface: compact the small-file tail, refresh, re-query
    before = spark.read.parquet(table).count()
    cstats = ctx.ops.compact(table)
    assert cstats["compactedFiles"] == 10 and cstats["producedFiles"] >= 1, cstats
    rstats = ctx.index.refresh.parquet(table)
    assert rstats["removedFiles"] == 10, rstats
    assert spark.read.parquet(table).count() == before, "compaction lost rows"
    indexed3 = ctx.index.parquet(table).filter(f"l_orderkey = {key}").collect()
    assert sorted(map(str, indexed3)) == sorted(map(str, indexed2)), "post-compact differ"
    assert ctx.ops.vacuum(table) == 0

    ctx.index.delete.parquet(table)
    assert not ctx.index.exists.parquet(table), "index should be gone"

    print(f"PYTHON API OK: {len(indexed)} rows matched, "
          "lifecycle+refresh+compact complete")
    spark.stop()


if __name__ == "__main__":
    main()
