"""Seeded late/out-of-order arrival fuzzing for the streaming layer.

The 13 batch-equivalence streaming tests replay event time in order;
real streams don't.  This harness (VERDICT r7 item 3) generates random
event sets, splits them into random ARRIVAL files — deliberately
decoupling arrival order from event time, so rows arrive late both
within and beyond the watermark — and drains them through
``windowed_counts`` as consecutive checkpointed ``availableNow`` runs
over one shared checkpoint (the production incremental-ingest shape;
within a single availableNow run Spark 4.1 plans every micro-batch
against the run's STARTING watermark, so cross-run recovery is what
actually exercises the late filter).

Assertions per case, against a driver-side model of the documented
watermark semantics (watermark at drain start = max event time seen in
prior drains minus the delay; a row is dropped iff its window end is
<= that watermark; surviving rows aggregate exactly once):

1. the folded update-mode emissions equal the model's per-key counts —
   i.e. the plain batch GROUP BY over the non-dropped rows;
2. every row the model says is within-watermark is counted exactly
   once (no duplicates from re-sends, no losses from reordering);
3. the number of dropped rows equals the model's beyond-watermark
   prediction (drops are accounted for, not silent).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)  # noon: window ends (midnight)
# never collide with watermark values derived from noon timestamps
DELAY_DAYS = 2
N_DRAINS = 3
SEEDS = [11, 23, 47]

KEYS = ["click", "view", "error"]


def _gen_case(seed: int):
    """Random rows (event day 0..9, key) split into N_DRAINS arrival
    files with arrival order decoupled from event time, plus re-sends
    of old days landing in late drains (the beyond-watermark probes)."""
    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(120, 220)):
        day = rng.randint(0, 9)
        rows.append(
            (i, BASE + dt.timedelta(days=day), rng.choice(KEYS))
        )
    # arrival assignment: biased so early drains carry mostly early
    # days (a realistic tail of stragglers), but with random inversions
    files: list[list] = [[] for _ in range(N_DRAINS)]
    for r in rows:
        day = (r[1] - BASE).days
        if rng.random() < 0.25:  # straggler: arrives in a random drain
            files[rng.randint(0, N_DRAINS - 1)].append(r)
        else:  # roughly in order: day 0-3 -> drain 0, 4-6 -> 1, 7-9 -> 2
            files[min(day // 4, N_DRAINS - 1)].append(r)
    # re-sends: duplicate a handful of the OLDEST rows into the LAST
    # drain — by then the watermark has passed their window
    resend_pool = [r for r in rows if (r[1] - BASE).days <= 2]
    next_id = len(rows)
    for r in rng.sample(resend_pool, min(8, len(resend_pool))):
        files[N_DRAINS - 1].append((next_id, r[1], r[2]))
        next_id += 1
    return files


def _model(files):
    """Driver-side replay of the documented watermark semantics.

    Returns (expected per-key counts over surviving rows,
    n_dropped_beyond_watermark)."""
    watermark = None  # event-time watermark at drain START
    counts: dict = {}
    dropped = 0
    for batch in files:
        if batch:
            for _id, ts, key in batch:
                day = ts.date()
                window_end = dt.datetime.combine(
                    day + dt.timedelta(days=1), dt.time()
                )
                if watermark is not None and window_end <= watermark:
                    dropped += 1
                    continue
                counts[(day, key)] = counts.get((day, key), 0) + 1
            # watermark advances at batch END from the max event time of
            # ALL rows that entered the EventTimeWatermark node (late
            # rows included — they're old, so they never raise the max)
            batch_max = max(ts for _id, ts, _k in batch)
            cand = batch_max - dt.timedelta(days=DELAY_DAYS)
            watermark = cand if watermark is None else max(watermark, cand)
    return counts, dropped


@pytest.mark.parametrize("seed", SEEDS)
def test_late_and_out_of_order_arrival(spark, tmp_path, seed):
    from datajudge_spark.streaming import windowed_counts

    files = _gen_case(seed)
    expected, n_dropped = _model(files)
    assert n_dropped > 0, "case must actually exercise the late filter"
    total_sent = sum(len(f) for f in files)

    schema = "event_id long, event_ts timestamp, event_type string"
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    emitted: list = []

    def _sink(batch_df, _bid):
        emitted.extend(
            batch_df.select(
                F.col("window_start").cast("date").alias("day"),
                "event_type",
                "n_rows",
            ).collect()
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for i, batch in enumerate(files):
            df = spark.createDataFrame(batch, schema)
            staged = tmp_path / f"gen{i}"
            df.coalesce(1).write.parquet(str(staged))
            part = next(staged.glob("*.parquet"))
            part.rename(stream_dir / f"arrival-{i}.parquet")
            ev = spark.readStream.schema(df.schema).parquet(str(stream_dir))
            out = windowed_counts(
                ev,
                "event_ts",
                window_duration="1 day",
                watermark_delay=f"{DELAY_DAYS} days",
                group_cols=["event_type"],
            )
            q = (
                out.writeStream.foreachBatch(_sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # fold update-mode emissions: counts are monotone per key, max wins
    folded: dict = {}
    for r in emitted:
        k = (r["day"], r["event_type"])
        folded[k] = max(folded.get(k, 0), r["n_rows"])

    assert folded == expected, (
        f"seed {seed}: drained state diverged from the watermark model"
    )
    # conservation: counted + predicted drops = rows sent
    assert sum(folded.values()) == total_sent - n_dropped
