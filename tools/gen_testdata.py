#!/usr/bin/env python
"""Deterministic synthetic-data generator matching the driver's
TESTDATA.md schema (TPC-H-ish star + events/documents/embeddings), for
OUT-OF-DECADE scale points the driver does not ship (VERDICT r7 item 2:
validate the scaling fits where data cost dominates).

Same seed (42), same schemas / value domains / key-cardinality rules as
the driver's sf0.001-0.1 shards (profiled via DuckDB: per-sf row counts,
category frequencies, per-order line-count mean, exponential event
values, 5%% near-dup documents carrying one 'dup' token, unit-norm
64-dim embeddings).  NOT byte-identical to the driver's generator — this
data is for TIMING (bench.py / tools/scaling_audit.py), never for the
correctness gate, which runs only on the driver's own shards.

Usage:  python tools/gen_testdata.py <sf> <out_dir>
        python tools/gen_testdata.py 1 /tmp/testdata/sf1

Pure numpy + pyarrow (no Spark): sf1 (~6M-row lineitem) generates in
well under a minute single-threaded.
"""
import json
import os
import sys
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "old", "cold", "red", "new", "small"]
NOUNS = ["ring", "bolt", "plate", "box", "cap", "tube", "wheel", "pin"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.412, 0.147, 0.147, 0.147, 0.147]
EPOCH = datetime(1970, 1, 1)


def _ts_us(dt: datetime) -> int:
    return int((dt - EPOCH).total_seconds() * 1_000_000)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_li_avg = 4.07  # driver's measured lines/order (1 + Poisson)
    n_ev = max(1, int(1_000_000 * sf))
    n_users = max(1, int(15_000 * sf))
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.asarray(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    pnames = np.asarray([f"{a} {n}" for a in ADJS for n in NOUNS])
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(pnames[rng.integers(0, len(pnames), n_part)]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.asarray(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # orders: day-granular timestamps over 1995-01-01 .. 2001-08-01
    o_day0 = _ts_us(datetime(1995, 1, 1))
    o_days = rng.integers(0, 2405, n_ord)  # inclusive span in days
    o_date_us = o_day0 + o_days.astype(np.int64) * 86_400_000_000
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.asarray(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.asarray(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1 + Poisson lines per order, shipdate 1..95 d after order
    lines = 1 + rng.poisson(n_li_avg - 1.0, n_ord)
    okey = np.repeat(np.arange(n_ord), lines)
    odate = np.repeat(o_date_us, lines)
    n_li = int(lines.sum())
    ship_us = odate + rng.integers(1, 96, n_li).astype(np.int64) \
        * 86_400_000_000
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(
            np.asarray(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.asarray(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
    }))

    # events: 30 days of Jan 2024, exponential(mean 50) values, json props
    e0 = _ts_us(datetime(2024, 1, 1))
    e1 = _ts_us(datetime(2024, 1, 31))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(rng.integers(e0, e1, n_ev), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.asarray(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [json.dumps({"k": int(k)})
             for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: 10..100 words over the 30-word vocab; 5% are near-dups
    # of an earlier doc with exactly one token replaced by 'dup'
    vocab = np.asarray(VOCAB)
    texts: list = []
    for i in range(n_docs):
        if i >= 20 and rng.random() < 0.05:
            base = texts[int(rng.integers(0, i))].split(" ")
            base[int(rng.integers(0, len(base)))] = "dup"
            texts.append(" ".join(base))
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.asarray(LANGS)[rng.choice(5, n_docs, p=LANG_P)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm 64-dim gaussians, labels uniform 0..9
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    generate(float(sys.argv[1]), sys.argv[2])
