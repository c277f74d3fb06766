"""Bucketed tables: the co-located join must plan without Exchange."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from babylon_data_loader_spark.schemas import load_table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from babylon_data_loader_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    # warehouse.dir is a static conf; tables land in the default
    # spark-warehouse (gitignored). Clear metastore entries AND any
    # orphaned location dirs from interrupted runs.
    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", n_buckets=8)

    # Force the shuffle-join path (tiny test tables would otherwise
    # broadcast): the point is SMJ over aligned buckets needs no
    # Exchange on either side.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "orders_b", "lineitem_b", on="o_orderkey"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan[:800]
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        n = joined.count()
        plain = orders.join(lineitem, on="o_orderkey").count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
