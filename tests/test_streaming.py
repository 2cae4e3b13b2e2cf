"""Structured Streaming extension tests: micro-batch constraint
monitoring and watermarked windowed metrics over the events table,
verified against their batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datajudge_spark import WithinRequirement
from datajudge_spark.streaming import (
    StreamingConstraintMonitor,
    stream_parquet_like,
    windowed_counts,
    windowed_null_fraction,
    windowed_value_buckets,
)
from datajudge_spark.sources import normalize_event_time

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # whatever the parquet writer produced -> proper event-time timestamp.
    # Watermarks demand TIMESTAMP (not NTZ), hence the cast.
    return normalize_event_time(df).withColumn(
        "event_ts", F.col("ts").cast("timestamp")
    )


@pytest.fixture
def events_stream(spark, events_batch, tmp_path):
    # file-stream sources require a directory; link the single parquet in
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "part-0.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    raw = stream_parquet_like(spark, str(stream_dir),
                              spark.read.parquet(f"{SF_DIR}/events.parquet"))
    return normalize_event_time(raw).withColumn(
        "event_ts", F.col("ts").cast("timestamp")
    )


class TestMicroBatchConstraints:
    def test_requirement_runs_per_batch(self, spark, events_stream, events_batch):
        def factory(batch_df):
            req = WithinRequirement.from_dataframe(batch_df, "events_batch")
            req.add_n_rows_min_constraint(1)
            req.add_max_null_fraction_constraint("value", 0.5)
            return req

        monitor = StreamingConstraintMonitor(factory)
        monitor.run_available(events_stream)

        assert len(monitor.results) >= 1
        assert monitor.all_passed
        total_constraints = sum(len(r) for _, r in monitor.results)
        assert total_constraints == 2 * len(monitor.results)

    def test_failures_surface(self, spark, events_stream):
        def factory(batch_df):
            req = WithinRequirement.from_dataframe(batch_df, "events_batch")
            req.add_n_rows_min_constraint(10**9)  # impossible
            return req

        monitor = StreamingConstraintMonitor(factory)
        monitor.run_available(events_stream)
        assert not monitor.all_passed
        flat = [r for _, rs in monitor.results for r in rs]
        assert any("10" in (r.failure_message or "") for r in flat)


class TestWindowedMetrics:
    def test_windowed_counts_match_batch(self, spark, events_stream, events_batch):
        out = windowed_counts(
            events_stream, "event_ts", window_duration="1 hour",
            watermark_delay="1 hour", group_cols=["event_type"],
        )
        query = (
            out.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        got = {
            (r.window_start, r.event_type): r.n_rows
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        expected = {
            (r.ws, r.event_type): r.n_rows
            for r in events_batch.groupBy(
                F.window("event_ts", "1 hour").start.alias("ws"), "event_type"
            ).agg(F.count(F.lit(1)).alias("n_rows")).collect()
        }
        # append mode emits only watermark-closed windows: subset match
        assert got, "no windows emitted"
        for key, n_rows in got.items():
            assert expected[key] == n_rows
        # all but the last open window should have been emitted
        assert len(got) >= len(expected) - len(
            events_batch.select("event_type").distinct().collect()
        )

    def test_windowed_null_fraction(self, spark, events_stream, events_batch):
        out = windowed_null_fraction(
            events_stream, "event_ts", "props",
            window_duration="6 hours", watermark_delay="1 hour",
        )
        query = (
            out.writeStream.format("memory")
            .queryName("win_nulls")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        rows = spark.sql("SELECT * FROM win_nulls").collect()
        assert rows, "no windows emitted"
        for r in rows:
            assert 0.0 <= r.null_fraction <= 1.0
            assert r.n_rows > 0


class TestStatefulRunningCounts:
    def test_totals_match_batch(self, spark, events_stream, events_batch):
        from datajudge_spark.streaming import stateful_running_counts

        out = stateful_running_counts(
            events_stream.select("user_id", "props"), "user_id", "props"
        )
        q = (
            out.writeStream.format("memory").queryName("running_counts")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        # latest state per key must equal the batch aggregate
        got = {
            r.key: (r.n_rows, r.n_nulls)
            for r in spark.sql(
                "SELECT key, max_by(n_rows, n_rows) n_rows, "
                "max_by(n_nulls, n_rows) n_nulls "
                "FROM running_counts GROUP BY key"
            ).collect()
        }
        expected = {
            r.user_id: (r.n, r.nn)
            for r in events_batch.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("props").isNull(), 1)).alias("nn"),
            ).collect()
        }
        assert got == expected


class TestStreamingDedup:
    def test_cross_batch_dedup(self, spark, tmp_path):
        from datajudge_spark.streaming import (
            stream_parquet_like,
            streaming_fingerprint_dedup,
        )

        # two files -> two micro-batches (maxFilesPerTrigger=1); doc 2's
        # text reappears in batch 2 under a new id and must be dropped
        # by cross-batch state; doc 4 is fresh and must survive
        rows1 = [(1, "alpha beta", "2024-01-01 10:00:00"),
                 (2, "Gamma  Delta", "2024-01-01 10:01:00")]
        rows2 = [(3, "gamma delta", "2024-01-01 10:02:00"),
                 (4, "epsilon", "2024-01-01 10:03:00")]
        schema = "doc_id long, text string, event_ts timestamp"
        src = tmp_path / "docs_stream"
        for i, rows in enumerate([rows1, rows2]):
            df = spark.createDataFrame(
                [(d, t, __import__("datetime").datetime.fromisoformat(ts))
                 for d, t, ts in rows], schema)
            df.coalesce(1).write.parquet(str(src / f"f{i}"))
        stream_dir = tmp_path / "merged"
        stream_dir.mkdir()
        n = 0
        for part in sorted(src.rglob("*.parquet")):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
            n += 1
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        out = streaming_fingerprint_dedup(
            raw, "text", "event_ts", watermark_delay="1 hour"
        )
        q = (
            out.writeStream.format("memory").queryName("dedup_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = sorted(
            r.doc_id for r in spark.sql(
                "SELECT doc_id FROM dedup_stream").collect()
        )
        assert 4 in got, "fresh doc must survive"
        assert not ({2, 3} <= set(got)), "normalized duplicate not dropped"
        assert 1 in got


class TestDriftMonitoring:
    def test_windowed_buckets_match_batch(self, spark, events_stream, events_batch):
        from datajudge_spark.operators.stats import value_bucket

        out = windowed_value_buckets(
            events_stream, "event_ts", "value",
            lo=0.0, hi=500.0, n_buckets=10,
            window="6 hours", watermark="1 hour",
        )
        query = (
            out.writeStream.format("memory")
            .queryName("win_buckets")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        got = {
            (r.win.start, r.bucket): r.n
            for r in spark.sql("SELECT * FROM win_buckets").collect()
        }
        expected = {
            (r.ws, r.bucket): r.n
            for r in events_batch.where(F.col("value").isNotNull())
            .groupBy(
                F.window("event_ts", "6 hours").start.alias("ws"),
                value_bucket("value", 0.0, 500.0, 10).alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got, "no windows emitted"
        for key, n in got.items():
            assert expected[key] == n

    def test_driver_psi_fold_agrees_with_batch_operator(self, spark, events_batch):
        # the driver-side PSI fold over histograms must equal the
        # distributed batch PSI on the same populations
        from datajudge_spark.operators.stats import (
            psi_drift_conditional,
            value_bucket,
        )
        from datajudge_spark.streaming import psi_between_histograms

        def hist(cond):
            rows = (
                events_batch.where(F.col("value").isNotNull() & cond)
                .groupBy(value_bucket("value", 0.0, 500.0, 10).alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            return {r.b: r.n for r in rows}

        click = F.col("event_type") == "click"
        view = F.col("event_type") == "view"
        folded = psi_between_histograms(hist(click), hist(view), 10)
        dist = psi_drift_conditional(
            events_batch, "value", click, view, 0.0, 500.0, 10
        ).collect()[0].psi
        assert abs(folded - dist) < 1e-6

    def test_psi_two_frame_matches_conditional(self, spark, events_batch):
        from datajudge_spark.operators.stats import (
            psi_drift,
            psi_drift_conditional,
        )

        click = events_batch.where(F.col("event_type") == "click")
        view = events_batch.where(F.col("event_type") == "view")
        two = psi_drift(click, view, "value", 0.0, 500.0, 10).collect()[0].psi
        one = psi_drift_conditional(
            events_batch,
            "value",
            F.col("event_type") == "click",
            F.col("event_type") == "view",
            0.0,
            500.0,
            10,
        ).collect()[0].psi
        assert two == one


class TestStatefulCusum:
    def test_multi_batch_state_matches_batch_cusum(self, spark, tmp_path):
        import datetime as dt

        from datajudge_spark.operators.timeseries import cusum_changepoint
        from datajudge_spark.streaming import stateful_cusum

        # one key, a level shift at day 30, split across TWO micro-
        # batches mid-series: the drained final digest must equal the
        # batch operator on the union — state merging across batches is
        # exactly what this exercises
        def rows(days):
            return [
                ("purchase",
                 (dt.date(2024, 1, 1) + dt.timedelta(days=i)
                  - dt.date(1970, 1, 1)).days,
                 (100 if i < 30 else 200) * 100)
                for i in days
            ]

        schema = "k string, d int, c long"
        src = tmp_path / "cusum_src"
        for i, chunk in enumerate([rows(range(40)), rows(range(40, 60))]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream_dir = tmp_path / "cusum_merged"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        q = (
            stateful_cusum(raw)
            .writeStream.format("memory").queryName("cusum_stream")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        emitted = spark.sql("SELECT * FROM cusum_stream").collect()
        # one emission per batch containing the key
        assert len(emitted) == 2
        final = max(emitted, key=lambda r: r["n_obs"])
        batch_rows = [
            (dt.date(1970, 1, 1) + dt.timedelta(days=d), c)
            for _, d, c in rows(range(60))
        ]
        daily = spark.createDataFrame(batch_rows, "day date, total long")
        want = cusum_changepoint(daily).first()
        assert final["n_obs"] == 60
        assert final["n_days"] == want["n_days"]
        assert final["change_day"] == want["change_day"]
        assert final["cusum_max"] == pytest.approx(
            want["cusum_max"], abs=1e-9
        )
        spark.catalog.dropTempView("cusum_stream")


class TestStatefulZscore:
    def test_multi_batch_state_matches_batch_zscore(self, spark, tmp_path):
        import datetime as dt

        from datajudge_spark.operators.timeseries import zscore_anomalies
        from datajudge_spark.streaming import stateful_zscore

        # one key, flat series with two isolated spikes, split across
        # two micro-batches: the drained digest must equal the batch
        # rolling-window operator on the union
        def rows(days):
            out = []
            for i in days:
                v = 100
                if i in (20, 45):
                    v = 500  # spikes
                out.append((
                    "purchase",
                    (dt.date(2024, 1, 1) + dt.timedelta(days=i)
                     - dt.date(1970, 1, 1)).days,
                    v * 100 + (i * 37) % 11,  # mild deterministic noise
                ))
            return out

        schema = "k string, d int, c long"
        src = tmp_path / "z_src"
        for i, chunk in enumerate([rows(range(30)), rows(range(30, 60))]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream_dir = tmp_path / "z_merged"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        q = (
            stateful_zscore(raw)
            .writeStream.format("memory").queryName("z_stream")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        emitted = spark.sql("SELECT * FROM z_stream").collect()
        assert len(emitted) == 2
        final = max(emitted, key=lambda r: r["n_obs"])
        batch_rows = [
            (dt.date(1970, 1, 1) + dt.timedelta(days=d), c)
            for _, d, c in rows(range(60))
        ]
        daily = spark.createDataFrame(batch_rows, "day date, total long")
        zs = zscore_anomalies(daily, "total").collect()
        want_anom = sum(1 for r in zs if r["is_anomaly"])
        want_max = max(
            (abs(r["z"]) for r in zs if r["z"] is not None), default=None
        )
        assert final["n_obs"] == 60
        assert final["n_days"] == 60
        assert final["n_anomalies"] == want_anom >= 2  # both spikes seen
        assert final["max_abs_z"] == pytest.approx(want_max, abs=1e-9)
        spark.catalog.dropTempView("z_stream")

    def test_no_defined_z_yields_null_max(self, spark, tmp_path):
        from datajudge_spark.streaming import stateful_zscore

        # only 3 days -> every baseline window has < 3 points
        df = spark.createDataFrame(
            [("k", 19720 + i, 100) for i in range(3)],
            "k string, d int, c long",
        )
        src = tmp_path / "z_small"
        df.coalesce(1).write.parquet(str(src))
        raw = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stateful_zscore(raw)
            .writeStream.format("memory").queryName("z_small_stream")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        final = spark.sql("SELECT * FROM z_small_stream").collect()[0]
        assert final["n_anomalies"] == 0
        assert final["max_abs_z"] is None
        spark.catalog.dropTempView("z_small_stream")


class TestStreamingLeftOuterJoin:
    def test_emission_rule_across_batches(self, spark, tmp_path):
        import datetime as dt

        from datajudge_spark.streaming import interval_left_join_streams

        t0 = dt.datetime(2024, 1, 1)

        def ts(hours):
            return t0 + dt.timedelta(hours=hours)

        # final watermark = min(max p_ts, max c_ts) - 1h
        #                 = min(19h, 20h) - 1h = 18h
        # p1@1h matches c1@2h            -> emits matched
        # p2@1h has no click; 1h+2h < 18h -> emits null-padded
        # p3@19h has no click; 19h+2h > 18h -> stays in state, no emit
        batch1 = [
            (1, 1, "purchase", ts(1.0)),
            (2, 2, "purchase", ts(1.0)),
            (10, 1, "click", ts(2.0)),
            (11, 9, "click", ts(0.5)),
        ]
        batch2 = [
            (3, 3, "purchase", ts(19.0)),
            (12, 9, "click", ts(20.0)),
        ]
        schema = "event_id long, user_id long, event_type string, event_ts timestamp"
        src = tmp_path / "loj_src"
        for i, chunk in enumerate([batch1, batch2]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream_dir = tmp_path / "loj_merged"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        purchases = raw.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_ts").alias("p_ts"),
        )
        clicks = raw.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_ts").alias("c_ts"),
        )
        cond = (
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts"))
            & (F.col("c_ts") < F.col("p_ts") + F.expr("INTERVAL 2 HOURS"))
        )
        joined = interval_left_join_streams(
            purchases, clicks, cond, "p_ts", "c_ts",
            watermark_delay="1 hour",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("loj_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.table("loj_test").collect()
        }
        spark.catalog.dropTempView("loj_test")
        assert got == {(1, 10), (2, None)}


class TestStreamingBlockMaxima:
    def test_multi_batch_state_equals_batch_maxima(self, spark, tmp_path):
        import datetime as dt

        from datajudge_spark.operators.timeseries import (
            gumbel_fit_from_maxima,
        )
        from datajudge_spark.streaming import streaming_block_maxima

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (base + dt.timedelta(days=i % 170, minutes=i), 100 + (i * 37) % 900)
            for i in range(400)
        ]
        schema = "ts timestamp, v long"
        src = tmp_path / "gum_src"
        for i, chunk in enumerate([rows[:150], rows[150:300], rows[300:]]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream_dir = tmp_path / "gum_merged"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        maxima = streaming_block_maxima(raw, "ts", "v", block="month")
        q = (
            maxima.writeStream.format("memory")
            .queryName("gum_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = spark.table("gum_test")
        got = {r["block"]: r["m"] for r in state.collect()}
        # MAX is associative: drained per-block state == batch maxima
        batch = spark.createDataFrame(rows, schema)
        exp = {
            r["block"]: r["m"]
            for r in batch.groupBy(
                F.date_trunc("month", "ts").alias("block")
            )
            .agg(F.max("v").alias("m"))
            .collect()
        }
        assert got == exp and len(got) == 6
        # and the Gumbel digest of the drained state == the batch digest
        got_fit = gumbel_fit_from_maxima(state, "m", (12,)).first()
        exp_fit = gumbel_fit_from_maxima(
            batch.groupBy(F.date_trunc("month", "ts").alias("block")).agg(
                F.max("v").alias("m")
            ),
            "m",
            (12,),
        ).first()
        spark.catalog.dropTempView("gum_test")
        assert got_fit == exp_fit
        assert got_fit["n_blocks"] == 6 and got_fit["rl_12"] is not None


class TestStreamingBootstrap:
    def test_multi_batch_sums_equal_batch_bootstrap(self, spark, tmp_path):
        from datajudge_spark.operators.resample import bootstrap_mean_ci
        from datajudge_spark.streaming import streaming_bootstrap_sums

        rows = [(i, 100 + (i * 13) % 77) for i in range(400)]
        schema = "k long, v long"
        src = tmp_path / "boot_src"
        for i, chunk in enumerate([rows[:250], rows[250:]]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream_dir = tmp_path / "boot_merged"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )
        sums = streaming_bootstrap_sums(raw, "k", "v", n_reps=16)
        q = (
            sums.writeStream.format("memory")
            .queryName("boot_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = {
            r["rep"]: r for r in spark.table("boot_test").collect()
        }
        spark.catalog.dropTempView("boot_test")
        # drained per-replicate sums must equal the batch operator's
        # intermediate sums on the union — weights are row-deterministic
        # and the sums associative, so batching cannot matter
        batch = spark.createDataFrame(rows, schema)
        digest = bootstrap_mean_ci(batch, "k", "v", n_reps=16).first()
        assert len(state) == 16
        assert all(r["cnt"] == 400 for r in state.values())
        # reconstruct the batch digest's point mean from drained state
        any_rep = state[0]
        assert float(any_rep["s"]) / any_rep["cnt"] == pytest.approx(
            digest["point_mean"], abs=1e-6
        )
        # replicate means from drained state bracket like the digest
        means = sorted(
            round(float(r["sw"]) / r["n"], 6) for r in state.values()
        )
        assert means[0] <= digest["boot_median"] <= means[-1]


class TestStreamingAbCounts:
    def test_multi_batch_state_equals_batch_counts(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import functions as F

        from datajudge_spark.operators.stats import (
            two_proportion_ztest,
            ztest_from_counts,
        )
        from datajudge_spark.streaming import streaming_ab_counts

        rng = __import__("random").Random(3)
        rows = [
            (i, dt.datetime(2024, 1, 1 + rng.randint(0, 29), 12),
             rng.choice(["purchase", "view", "click"]))
            for i in range(300)
        ]
        schema = "event_id long, ts timestamp, event_type string"
        src = tmp_path / "ab_src"
        for b, chunk in enumerate([rows[:130], rows[130:]]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{b}")
            )
        stream_dir = tmp_path / "ab_in"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)  # forces TWO micro-batches
            .parquet(str(stream_dir))
        )
        day = F.dayofmonth("ts")
        pa_, pb_ = day <= 15, day >= 16
        ok = F.col("event_type") == "purchase"
        q = (
            streaming_ab_counts(raw, pa_, pb_, ok)
            .writeStream.format("memory").queryName("ab_state")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        drained = ztest_from_counts(spark.table("ab_state")).collect()[0]
        batch = two_proportion_ztest(
            spark.createDataFrame(rows, schema), pa_, pb_, ok
        ).collect()[0]
        assert drained == batch  # exact, including the z double


class TestStreamingLookCounts:
    def test_multi_batch_state_equals_batch_grid(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import functions as F

        from datajudge_spark.operators.stats import (
            obf_sequential_ztest,
            sequential_look_counts,
        )
        from datajudge_spark.streaming import streaming_look_counts

        rng = __import__("random").Random(11)
        rows = [
            (i, dt.datetime(2024, 1, 1 + rng.randint(0, 9), 12),
             rng.choice(["purchase", "view", "click"]))
            for i in range(300)
        ]
        schema = "user_id long, ts timestamp, event_type string"
        src = tmp_path / "obf_src"
        for b, chunk in enumerate([rows[:130], rows[130:]]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(src / f"f{b}")
            )
        stream_dir = tmp_path / "obf_in"
        stream_dir.mkdir()
        for n, part in enumerate(sorted(src.rglob("*.parquet"))):
            (stream_dir / f"{n:02d}.parquet").symlink_to(part)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)  # forces TWO micro-batches
            .parquet(str(stream_dir))
        )
        day = F.dayofmonth("ts")
        pa_, pb_ = F.col("user_id") % 2 == 0, F.col("user_id") % 2 == 1
        ok = F.col("event_type") == "purchase"
        q = (
            streaming_look_counts(raw, day, pa_, pb_, ok)
            .writeStream.format("memory").queryName("obf_state")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        drained = (
            obf_sequential_ztest(spark.table("obf_state"))
            .orderBy("look").collect()
        )
        batch_df = spark.createDataFrame(rows, schema)
        batch = (
            obf_sequential_ztest(
                sequential_look_counts(batch_df, day, pa_, pb_, ok)
            ).orderBy("look").collect()
        )
        assert drained == batch  # exact, including the z/boundary doubles
        assert len(batch) == 10


class TestLateDataDrainStructure:
    def test_exactly_three_checkpointed_drains(self, spark, monkeypatch):
        """Structural pin (VERDICT r8 item 8): streaming_late_data is
        the suite's slowest query BECAUSE it runs three checkpointed
        availableNow drains by design (arrive -> late-within-watermark
        -> beyond-watermark re-send). A refactor must not silently
        multiply the checkpoint replays — each drain costs a ~1s
        state-store floor, so drains are the query's cost model."""
        import importlib.util

        from pyspark.sql.streaming import readwriter as stream_rw

        spec = importlib.util.spec_from_file_location(
            "entry_for_drain_pin", "/root/repo/__spark_entry__.py"
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        starts = []
        orig_start = stream_rw.DataStreamWriter.start

        def counting_start(self, *a, **kw):
            starts.append(1)
            return orig_start(self, *a, **kw)

        monkeypatch.setattr(stream_rw.DataStreamWriter, "start", counting_start)
        out = entry.q_streaming_late_data(spark, SF_DIR)

        assert len(starts) == 3, (
            f"late-data contract must run exactly 3 drains, got {len(starts)}"
        )
        # and the folded result still equals the batch GROUP BY
        ev = normalize_event_time(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).withColumn("event_ts", F.col("ts").cast("timestamp"))
        batch = (
            ev.groupBy(
                F.col("event_ts").cast("date").alias("day"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        got = {(r["day"], r["event_type"]): r["n_rows"] for r in out.collect()}
        want = {
            (r["day"], r["event_type"]): r["n_rows"] for r in batch.collect()
        }
        assert got == want
