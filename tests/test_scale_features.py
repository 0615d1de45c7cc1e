"""Scale-feature tests: partitioned/bucketed sinks (with a plan-level
shuffle-elimination assertion for the co-located join) and salted
skew handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_duckdb_spark.operators.skew import salted_broadcast_left_join, salted_group_count
from ai_duckdb_spark.plans import executed_plan
from ai_duckdb_spark.sources.sinks import write_bucketed, write_partitioned
from ai_duckdb_spark.tables import load


class TestSinks:
    def test_partitioned_write_prunes(self, spark, sf_dir, tmp_path):
        orders = load(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        out = str(tmp_path / "orders_by_year")
        write_partitioned(orders, out, "order_year")

        back = spark.read.parquet(out).filter(F.col("order_year") == 1996)
        plan = executed_plan(back)
        # partition filter, not a data filter: pruning happened at listing
        assert "PartitionFilters: [isnotnull(order_year" in plan
        assert back.count() == orders.filter(F.year("o_orderdate") == 1996).count()

    def test_bucketed_join_eliminates_shuffle(self, spark, sf_dir, tmp_path):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        try:
            orders = load(spark, sf_dir, "orders")
            lineitem = load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity", "l_extendedprice"
            )
            write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=4)
            write_bucketed(lineitem, "b_lineitem", "l_orderkey", num_buckets=4)

            joined = spark.table("b_orders").join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = executed_plan(joined)
            assert "Exchange hashpartitioning" not in plan, plan[:1500]
            # co-located and correct
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestSkew:
    def test_salted_group_count_exact(self, spark, sf_dir):
        li = load(spark, sf_dir, "lineitem")
        plain = {r.l_returnflag: r[1] for r in li.groupBy("l_returnflag").count().collect()}
        salted = {r.key: r.n for r in salted_group_count(li, "l_returnflag", 16).collect()}
        assert salted == plain

    def test_salted_broadcast_join_matches_plain(self, spark, sf_dir):
        orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        plain = (
            orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
            .groupBy("c_mktsegment")
            .count()
        )
        salted = (
            salted_broadcast_left_join(
                orders.withColumnRenamed("o_custkey", "custkey"),
                customer.withColumnRenamed("c_custkey", "custkey"),
                on="custkey",
                num_salts=8,
            )
            .groupBy("c_mktsegment")
            .count()
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
