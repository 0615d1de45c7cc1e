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


class TestZorderLayout:
    def test_zorder_files_bound_both_dims(self, spark, tmp_path):
        """Z-ordered files cover a narrow box in BOTH keys; a single-key
        sort leaves the second key's per-file span near the full domain.
        Synthetic keys spanning the full 12-bit domain — the sf0.001
        fixture's 10-supplier range is too narrow to exhibit layout."""
        from ai_duckdb_spark.operators.layout import zorder_rewrite

        df = spark.range(0, 1 << 14).select(
            (F.col("id").bitwiseAND(F.lit(4095))).alias("a"),
            # Knuth-hash the id so b is independent of a
            ((F.col("id") * 2654435761).bitwiseAND(F.lit(4095))).alias("b"),
        )
        dom_b = 4095

        zpath = str(tmp_path / "zordered")
        zorder_rewrite(df, "a", "b", bits=12, num_files=16).write.mode(
            "overwrite"
        ).parquet(zpath)

        spath = str(tmp_path / "single_sort")
        df.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
            "overwrite"
        ).parquet(spath)

        def avg_span_b(path: str) -> float:
            per_file = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg((F.max("b") - F.min("b")).alias("span"))
                .agg(F.avg("span").alias("avg_span"))
            )
            return per_file.collect()[0].avg_span

        z_span, s_span = avg_span_b(zpath), avg_span_b(spath)
        # single-key sort: b span per file ~ full domain; z-order with 16
        # files = 4 curve subdivisions per dim → span ~ domain/4
        assert s_span > 0.9 * dom_b
        assert z_span < 0.5 * dom_b, (z_span, s_span, dom_b)

    def test_zvalue_roundtrip_bits(self, spark):
        """De-interleaving the z-value recovers both inputs exactly."""
        from ai_duckdb_spark.operators.layout import zvalue

        df = spark.range(0, 4096, 7).select(
            (F.col("id").bitwiseAND(F.lit(4095))).alias("a"),
            ((F.col("id") * 13).bitwiseAND(F.lit(4095))).alias("b"),
        )
        z = df.select("a", "b", zvalue(F.col("a"), F.col("b"), 12).alias("z"))
        back_a = sum(
            (F.shiftright(F.col("z"), 2 * i).bitwiseAND(F.lit(1)) * F.lit(1 << i))
            for i in range(12)
        )
        back_b = sum(
            (F.shiftright(F.col("z"), 2 * i + 1).bitwiseAND(F.lit(1)) * F.lit(1 << i))
            for i in range(12)
        )
        bad = z.filter((back_a != F.col("a")) | (back_b != F.col("b"))).count()
        assert bad == 0


class TestForeachBatchReplay:
    def test_dynamic_overwrite_makes_batch_replay_idempotent(
        self, spark, tmp_path
    ):
        """The exactly-once recipe foreach_batch_parquet_sink claims:
        a batch redelivered after restart-from-checkpoint overwrites
        ONLY its own partition — the sink holds no duplicates and other
        batches' partitions are untouched."""
        out = str(tmp_path / "fb")

        def sink_batch(batch_df, batch_id: int) -> None:
            (
                batch_df.withColumn("__batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch")
                .parquet(out)
            )

        b0 = spark.range(0, 5).withColumnRenamed("id", "doc_id")
        b1 = spark.range(5, 8).withColumnRenamed("id", "doc_id")
        sink_batch(b0, 0)
        sink_batch(b1, 1)
        sink_batch(b0, 0)  # the replay
        back = spark.read.parquet(out)
        assert back.count() == 8  # no duplicates from the replayed batch
        per_batch = {
            r["__batch"]: r["n"]
            for r in back.groupBy("__batch").agg(F.count("*").alias("n")).collect()
        }
        assert per_batch == {0: 5, 1: 3}  # batch 1 untouched by the replay


class TestWatermarkLateDrop:
    def test_late_rows_are_actually_dropped(self, spark, sf_dir):
        """The four-batch replay must really drop late rows — if the
        watermark failed to propagate (the Spark 3.4 two-watermark lag
        the tick batches exist to absorb), every late row would
        aggregate and totals would equal the full fixture count."""
        from ai_duckdb_spark.queries.events_q import streaming_watermark_latedrop
        from ai_duckdb_spark.tables import load

        got = streaming_watermark_latedrop(spark, sf_dir)
        kept = got.agg(F.sum("n_events")).first()[0]
        total = load(spark, sf_dir, "events").count()
        n_late = (
            load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0).count()
        )
        # all on-time rows kept; strictly fewer than all rows (some of
        # the late 20% fell behind the watermark and were dropped)
        assert total - n_late <= kept < total


class TestRocksDBStateStore:
    def test_rocksdb_provider_matches_default(self, spark, sf_dir):
        """The windowed streaming aggregation must produce identical
        results on the RocksDB state store provider — the provider a
        100 TB deployment actually runs, because HDFSBackedStateStore
        holds every store's state in executor HEAP while RocksDB spills
        to local SSD (state can exceed memory). Ships in-box with Spark
        4; only the conf changes, proving state-store choice is a
        deployment knob, not a semantics change."""
        from ai_duckdb_spark.queries.events_q import streaming_tumbling_10min

        key = "spark.sql.streaming.stateStore.providerClass"
        default = spark.conf.get(key)
        want = sorted(
            map(tuple, streaming_tumbling_10min(spark, sf_dir).collect())
        )
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            got = sorted(
                map(tuple, streaming_tumbling_10min(spark, sf_dir).collect())
            )
        finally:
            spark.conf.set(key, default)
        assert got == want and len(got) > 0


class TestWorkerDaemon:
    """The warm-import daemon (session.py / daemon_warm.py): Spark
    discards Python workers idle >60 s, so respawn cost gates every
    long session's pandas entries — the daemon must stay wired and
    import-safe or respawns silently revert to 8-58 s cold imports."""

    def test_daemon_module_configured(self, spark):
        assert (
            spark.sparkContext.getConf().get("spark.python.daemon.module")
            == "ai_duckdb_spark.daemon_warm"
        )

    def test_daemon_module_importable_and_warm_safe(self):
        # importing must NOT start a daemon (guarded by __main__), and
        # _warm must never raise even if an optional dep is missing
        import ai_duckdb_spark.daemon_warm as dw

        dw._warm()

    def test_package_parent_on_child_pythonpath(self):
        # the daemon child resolves ai_duckdb_spark by name from
        # PYTHONPATH, exported by get_spark before the JVM launched
        import os

        import ai_duckdb_spark

        parent = os.path.dirname(os.path.dirname(ai_duckdb_spark.__file__))
        assert parent in os.environ.get("PYTHONPATH", "").split(os.pathsep)


class TestGramRunLinearity:
    def test_gram_runs_scale_linearly_not_quadratically(self, spark, sf_dir):
        """The r9 gram-run operators (boilerplate, novelty) must scale
        ~linearly in corpus size: runs are per-doc array work + one
        hash-keyed groupBy with map-side partials, so an 8x corpus
        (union of id-shifted copies — every copy's grams collide with
        every other's, the worst case for the doc-frequency shuffle)
        must cost well under the quadratic 64x. Wall-clock gates are
        flaky under load, so the gate is on the measured growth RATIO
        with a generous margin: 8x data may cost at most ~24x time
        (3x linear slack), which a pairwise doc x doc plan (64x+)
        cannot pass. Result sanity: duplicated docs make every gram
        corpus-boilerplate at min_df=4 when 8 >= 4 copies exist."""
        import time

        from pyspark.sql import functions as F

        from ai_duckdb_spark.operators.textstats import boilerplate_ngram_stats
        from ai_duckdb_spark.tables import load

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        copies = [
            docs.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text")
            for i in range(8)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionAll(c)

        def run(df):
            out = boilerplate_ngram_stats(df, "doc_id", "text", n=3, min_df=4)
            t0 = time.perf_counter()
            rows = out.count()
            return time.perf_counter() - t0, rows

        run(docs)  # session warm-up (JIT, codegen)
        t1, r1 = run(docs)
        t8, r8 = run(big)
        assert r1 == n_docs and r8 == 8 * n_docs
        # with >= 4 identical copies of every doc, every gram clears
        # min_df=4, so every doc with >= 1 gram is fully boilerplate
        big_out = boilerplate_ngram_stats(big, "doc_id", "text", n=3, min_df=4)
        not_fully = big_out.filter(
            (F.col("n_grams") > 0) & (F.col("n_boiler") != F.col("n_grams"))
        ).count()
        assert not_fully == 0
        assert t8 <= max(24 * t1, t1 + 8.0), (t1, t8)  # linear-ish, not 64x


class TestCheckpointRecovery:
    def test_restart_resumes_exactly_once(self, spark, sf_dir, tmp_path):
        """A streaming query stopped and RESTARTED from its checkpoint
        must resume at the committed source offset and the parquet file
        sink's commit log must keep the output exactly-once: after the
        restart processes only the newly arrived file, the sink holds
        every fixture row exactly once — no gen0 reprocessing, no loss.
        This is the operational half of X1 the bounded single-query
        replays never exercise (driver crash/upgrade recovery)."""
        import glob
        import os
        import shutil

        from pyspark.sql import functions as F

        from ai_duckdb_spark.streaming.windows import stream_run_confs
        from ai_duckdb_spark.tables import load

        ev = load(spark, sf_dir, "events").select("event_id", "user_id")
        n_total = ev.count()
        replay = str(tmp_path / "src")
        os.makedirs(replay)
        for i, part in enumerate(
            [ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1)]
        ):
            d = str(tmp_path / f"gen{i}")
            part.coalesce(1).write.mode("overwrite").parquet(d)
        # only gen0 visible before the first run
        shutil.copyfile(
            glob.glob(str(tmp_path / "gen0" / "part-*.parquet"))[0],
            os.path.join(replay, "gen0.parquet"),
        )
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        schema = spark.read.parquet(replay).schema

        def run_once():
            src = spark.readStream.schema(schema).parquet(replay)
            with stream_run_confs(spark):
                q = (
                    src.writeStream.outputMode("append")
                    .format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .start()
                )
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()

        run_once()
        n_gen0 = spark.read.parquet(out).count()
        assert 0 < n_gen0 < n_total
        # new data lands while the query is DOWN; restart from checkpoint
        shutil.copyfile(
            glob.glob(str(tmp_path / "gen1" / "part-*.parquet"))[0],
            os.path.join(replay, "gen1.parquet"),
        )
        run_once()
        got = spark.read.parquet(out)
        assert got.count() == n_total  # nothing lost, nothing duplicated
        assert got.select("event_id").distinct().count() == n_total
