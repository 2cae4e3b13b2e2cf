"""Sessionization (gaps-and-islands + streaming session_window) and
salted-join semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datajudge_spark.operators.sessions import session_stats, sessionize
from datajudge_spark.operators.skew import salted_join
from datajudge_spark.sources import normalize_event_time


def _ts(minute):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap 45 min between minute 20 and 65)
        Row(user=1, t=_ts(0)), Row(user=1, t=_ts(10)), Row(user=1, t=_ts(20)),
        Row(user=1, t=_ts(65)), Row(user=1, t=_ts(70)),
        # user 2: one session, gap exactly 30 min stays merged
        Row(user=2, t=_ts(0)), Row(user=2, t=_ts(30)),
        # user 3: single event
        Row(user=3, t=_ts(5)),
    ]
    return spark.createDataFrame(rows)


class TestSessionize:
    def test_session_ids(self, spark, events):
        out = sessionize(events, "user", "t", "30 minutes")
        got = {(r.user, r.t.minute + r.t.hour * 60): r.session_id
               for r in out.collect()}
        assert got[(1, 0)] == got[(1, 10)] == got[(1, 20)] == 1
        assert got[(1, 65)] == got[(1, 70)] == 2
        assert got[(2, 0)] == got[(2, 30)] == 1  # gap == timeout: merged
        assert got[(3, 5)] == 1

    def test_session_stats(self, spark, events):
        out = {(r.user, r.session_id): r for r in
               session_stats(events, "user", "t", "30 minutes").collect()}
        assert len(out) == 4
        assert out[(1, 1)].n_events == 3
        assert out[(1, 2)].n_events == 2
        assert out[(1, 2)].session_start == _ts(65)
        assert out[(1, 2)].session_end == _ts(70)

    def test_streaming_session_window_agrees(self, spark, tmp_path):
        # batch gaps-and-islands vs Structured Streaming session_window
        ev_path = "/root/testdata/sf0.001/events.parquet"
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        batch = normalize_event_time(spark.read.parquet(ev_path)).withColumn(
            "event_ts", F.col("ts").cast("timestamp")
        )
        n_batch_sessions = session_stats(
            batch, "user_id", "event_ts", "30 minutes"
        ).count()

        stream_dir = tmp_path / "ev"
        stream_dir.mkdir()
        (stream_dir / "p.parquet").symlink_to(ev_path)
        stream = (
            spark.readStream.schema(spark.read.parquet(ev_path).schema)
            .parquet(str(stream_dir))
            .transform(normalize_event_time)
            .withColumn("event_ts", F.col("ts").cast("timestamp"))
        )
        sess = (
            stream.withWatermark("event_ts", "1 hour")
            .groupBy(F.session_window("event_ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            sess.writeStream.format("memory").queryName("sessions")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        n_stream = spark.sql("SELECT count(*) c FROM sessions").collect()[0].c
        # append mode withholds sessions the watermark hasn't closed
        assert 0 < n_stream <= n_batch_sessions
        assert n_stream >= n_batch_sessions * 0.8


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        large = spark.createDataFrame(
            [Row(k=i % 3, payload=i) for i in range(300)]
        )
        small = spark.createDataFrame(
            [Row(k=0, name="zero"), Row(k=1, name="one"), Row(k=5, name="five")]
        )
        plain = large.join(small, "k").select("k", "payload", "name")
        salted = salted_join(large, small, "k", num_salts=8).select(
            "k", "payload", "name"
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_join_keeps_unmatched(self, spark):
        large = spark.createDataFrame([Row(k=1, v=1), Row(k=9, v=2)])
        small = spark.createDataFrame([Row(k=1, name="one")])
        out = salted_join(large, small, "k", num_salts=4, how="left").collect()
        assert len(out) == 2
        assert {r.k: r.name for r in out} == {1: "one", 9: None}

    def test_rejects_right_join(self, spark):
        df = spark.createDataFrame([Row(k=1)])
        with pytest.raises(ValueError):
            salted_join(df, df, "k", how="right")
