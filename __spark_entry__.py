"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one (spark, sf_dir) -> DataFrame callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extras); ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL for the driver's side-by-side
correctness gate. Column names/aliases match pairwise by construction.

Float-valued results are rounded to 6 decimals on BOTH sides so the
order-insensitive value hash is robust to summation-order differences
between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark rejects it by default.
        # Read nanos as long; convert to a timestamp where needed.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_ts(col: str = "ts"):
    """events.ts (nanos-as-long) as a proper timestamp column."""
    return F.timestamp_micros((F.col(col) / 1000).cast("long"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary rollup over lineitem (groupBy + multi-agg),
    the canonical partial-agg + single-shuffle Spark plan."""
    li = _t(spark, SF_DEFAULT, "lineitem")
    return (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# §2.4 scalar aggregates
# --------------------------------------------------------------------------

def q_row_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


def q_row_count_capped(spark, sf_dir):
    # LIMIT-capped count (reference NRowsMin early-out, db_access.py:740-756)
    return (
        _t(spark, sf_dir, "lineitem").limit(1000).agg(F.count(F.lit(1)).alias("n_rows"))
    )


def q_filtered_count(spark, sf_dir):
    # projection/filter with condition pushed to the parquet scan
    return (
        _t(spark, sf_dir, "lineitem")
        .where(F.expr("(l_quantity > 25) and (l_discount <= 0.05)"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def q_min_max(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_mean(spark, sf_dir):
    # decimal-exact sum, then one double division: deterministic across
    # engines and summation orders (a float avg is not)
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_price")
    )


def q_length_extremes(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.min(F.length("o_orderpriority")).alias("min_len"),
        F.max(F.length("o_orderpriority")).alias("max_len"),
    )


def q_fraction_between(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(
            F.count(F.when((F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40), 1))
            / F.count(F.lit(1)),
            6,
        ).alias("fraction")
    )


def q_null_fraction(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.round(
            F.count(F.when(F.col("props").isNull(), 1)) / F.count(F.lit(1)), 6
        ).alias("null_fraction")
    )


def q_date_span(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.datediff(
            F.max(F.col("o_orderdate")).cast("date"),
            F.min(F.col("o_orderdate")).cast("date"),
        ).cast("bigint").alias("span_days")
    )


def q_percentile(spark, sf_dir):
    # exact percentile (smallest v with >=90% of non-null values <= v),
    # computed over the distinct-value histogram (SURVEY §4.3)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_extendedprice").isNotNull())
    hist = li.groupBy(F.col("l_extendedprice").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "value",
        (F.sum("cnt").over(w_cum) / F.sum("cnt").over(w_all)).alias("cd"),
    )
    return cum.where(F.col("cd") >= 0.9).agg(F.min("value").alias("p90"))


# --------------------------------------------------------------------------
# §2.4 grouped aggregates / uniques
# --------------------------------------------------------------------------

def q_uniques_histogram(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_distinct_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def q_distinct_union_count(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().agg(F.count(F.lit(1)).alias("n_distinct"))


def q_duplicates(spark, sf_dir):
    # all-column duplicates over a projection (reference db_access.py:1097-1115)
    proj = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return (
        proj.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def q_array_agg(spark, sf_dir):
    # per-group collected arrays, stringified deterministically so both
    # engines hash identically (reference db_access.py:1128-1161)
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_nationkey")), ",").alias("nations")
    )


def q_functional_dependency(spark, sf_dir):
    # violating keys of the FD o_custkey -> o_orderstatus
    uniq = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus").distinct()
    return (
        uniq.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .where(F.col("n_variants") > 1)
    )


# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------

def q_except_distinct(spark, sf_dir):
    # EXCEPT (set semantics): customers with orders minus low-balance custs
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c)


def q_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------

def q_row_match_mismatch(spark, sf_dir):
    # match-compare join with null-safe comparison fused into one aggregate
    # (reference db_access.py:1044-1094)
    li = _t(spark, sf_dir, "lineitem").alias("l")
    o = _t(spark, sf_dir, "orders").alias("r")
    joined = li.join(o, F.col("l.l_orderkey") == F.col("r.o_orderkey"))
    cmp = F.col("l.l_shipdate").eqNullSafe(F.col("r.o_orderdate"))
    return joined.agg(
        F.round(F.avg(F.when(cmp, 0.0).otherwise(1.0)), 6).alias("mismatch_fraction"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_anti_join(spark, sf_dir):
    # customers with no orders (NOT EXISTS -> left_anti)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


def q_broadcast_join_agg(spark, sf_dir):
    # classic star join: fact x 2 small dims; dims are broadcast
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def q_interval_overlap(spark, sf_dir):
    # n_violation_keys for per-customer order intervals
    # [o_orderdate, o_orderdate + 7 days] (reference db_access.py:316-472;
    # pair-differs guard per the documented intent, see operators/interval.py)
    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("s"),
        F.expr("o_orderdate + INTERVAL 7 DAYS").alias("e"),
    )
    t1, t2 = iv.alias("l"), iv.alias("r")
    distinct_viol = (
        t1.join(
            t2,
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.s") <= F.col("r.s"))
            & (F.col("l.e") >= F.col("r.s"))
            & ((F.col("l.s") != F.col("r.s")) | (F.col("l.e") != F.col("r.e"))),
        )
        .select(F.col("l.k").alias("k"))
    )
    dup_viol = (
        iv.groupBy("k", "s", "e")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("k")
    )
    return (
        distinct_viol.union(dup_viol)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_violation_keys"))
    )


def q_interval_gap(spark, sf_dir):
    # per-supplier shipment intervals [l_shipdate, l_shipdate+5d]; keys with
    # a gap via the islands pattern (one window pass, SURVEY §4.1)
    iv = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"),
        F.col("l_shipdate").alias("s"),
        F.expr("l_shipdate + INTERVAL 5 DAYS").alias("e"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prev = iv.select("k", "s", F.max("e").over(w).alias("prev_end"))
    viol = with_prev.where(
        F.col("prev_end").isNotNull()
        & (F.datediff(F.col("s").cast("date"), F.col("prev_end").cast("date")) > 0)
    )
    return viol.select("k").distinct().agg(F.count(F.lit(1)).alias("n_violation_keys"))


# --------------------------------------------------------------------------
# §2.5 windows / §2.2 regex / stats
# --------------------------------------------------------------------------

def q_regex_violations(spark, sf_dir):
    # unanchored-search semantics, like the reference's regexp_match
    o = _t(spark, sf_dir, "orders")
    return o.where(~F.col("o_orderpriority").rlike("[0-9]-[A-Z]")).agg(
        F.count(F.lit(1)).alias("n_violations")
    )


def _cdf(df, col, label):
    hist = df.groupBy(F.col(col).alias("val")).agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "val", (F.sum("c").over(w_cum) / F.sum("c").over(w_all)).alias(label)
    )


def q_cross_cdf(spark, sf_dir):
    # cross-CDF with last(ignorenulls) forward fill (SURVEY §4.2)
    li = _t(spark, sf_dir, "lineitem")
    c1 = _cdf(li.where(F.col("l_returnflag") == "A"), "l_quantity", "cdf1")
    c2 = _cdf(li.where(F.col("l_returnflag") == "R"), "l_quantity", "cdf2")
    joined = c1.join(c2, on="val", how="full_outer")
    w_ff = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "val",
        F.round(
            F.coalesce(F.last("cdf1", ignorenulls=True).over(w_ff), F.lit(0.0)), 6
        ).alias("cdf1"),
        F.round(
            F.coalesce(F.last("cdf2", ignorenulls=True).over(w_ff), F.lit(0.0)), 6
        ).alias("cdf2"),
    )


def q_ks_statistic(spark, sf_dir):
    filled = q_cross_cdf(spark, sf_dir)
    return filled.agg(
        F.round(F.max(F.abs(F.col("cdf1") - F.col("cdf2"))), 6).alias("d_statistic")
    )


# --------------------------------------------------------------------------
# Training-data pipeline extras (documents / embeddings)
# --------------------------------------------------------------------------

def q_text_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )


def q_text_quality(spark, sf_dir):
    # length / alpha-ratio / mean token length quality signals
    d = _t(spark, sf_dir, "documents")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.round(n_alpha / F.length("text"), 6).alias("alpha_ratio"),
        F.round(F.length("text") / n_tok, 6).alias("mean_token_len"),
    )


def q_text_stopword_ratio(spark, sf_dir):
    # occurrence counting via the replace trick — identical in both engines
    d = _t(spark, sf_dir, "documents")
    occ_the = (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the")))) / 3
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        occ_the.cast("bigint").alias("n_the"),
        F.round(occ_the / n_tok, 6).alias("stopword_ratio"),
    )


def q_doc_fingerprint(spark, sf_dir):
    # exact-dup fingerprint: md5 of lowercased, whitespace-collapsed text
    d = _t(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


def q_dedup_exact(spark, sf_dir):
    # exact-duplicate groups via fingerprint hash-groupBy
    d = _t(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return (
        d.select(F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


_COS = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "0D, (acc, v) -> acc + v) / "
    "(sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))) * "
    "sqrt(aggregate({b}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))"
)


def q_embedding_similar_pairs(spark, sf_dir):
    # brute-force cosine similarity: pairs (query vec_id < 20 x all) above
    # threshold; JVM-side higher-order functions, no Python UDF
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    pairs = q.crossJoin(c).where(F.col("qid") != F.col("cid"))
    cos = F.expr(_COS.format(a="qvec", b="cvec"))
    return (
        pairs.select("qid", cos.alias("cos"))
        .where(F.col("cos") > 0.8)
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_similar"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_count": q_row_count,
        "row_count_capped": q_row_count_capped,
        "filtered_count": q_filtered_count,
        "min_max": q_min_max,
        "mean": q_mean,
        "length_extremes": q_length_extremes,
        "fraction_between": q_fraction_between,
        "null_fraction": q_null_fraction,
        "date_span": q_date_span,
        "percentile": q_percentile,
        "uniques_histogram": q_uniques_histogram,
        "distinct_count": q_distinct_count,
        "distinct_union_count": q_distinct_union_count,
        "duplicates": q_duplicates,
        "array_agg": q_array_agg,
        "functional_dependency": q_functional_dependency,
        "except_distinct": q_except_distinct,
        "intersect": q_intersect,
        "row_match_mismatch": q_row_match_mismatch,
        "anti_join": q_anti_join,
        "broadcast_join_agg": q_broadcast_join_agg,
        "interval_overlap": q_interval_overlap,
        "interval_gap": q_interval_gap,
        "regex_violations": q_regex_violations,
        "cross_cdf": q_cross_cdf,
        "ks_statistic": q_ks_statistic,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_stopword_ratio": q_text_stopword_ratio,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "embedding_similar_pairs": q_embedding_similar_pairs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "row_count": "SELECT count(*) AS n_rows FROM lineitem",
        "row_count_capped": (
            "SELECT count(*) AS n_rows FROM (SELECT * FROM lineitem LIMIT 1000)"
        ),
        "filtered_count": (
            "SELECT count(*) AS n_rows FROM lineitem "
            "WHERE (l_quantity > 25) AND (l_discount <= 0.05)"
        ),
        "min_max": (
            "SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty "
            "FROM lineitem"
        ),
        "mean": (
            "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
            " / count(*), 6) AS mean_price FROM lineitem"
        ),
        "length_extremes": (
            "SELECT min(length(o_orderpriority)) AS min_len, "
            "max(length(o_orderpriority)) AS max_len FROM orders"
        ),
        "fraction_between": (
            "SELECT round(count(CASE WHEN l_quantity >= 10 AND l_quantity <= 40 "
            "THEN 1 END) * 1.0 / count(*), 6) AS fraction FROM lineitem"
        ),
        "null_fraction": (
            "SELECT round(count(CASE WHEN props IS NULL THEN 1 END) * 1.0 "
            "/ count(*), 6) AS null_fraction FROM events"
        ),
        "date_span": (
            "SELECT CAST(date_diff('day', CAST(min(o_orderdate) AS DATE), "
            "CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS span_days FROM orders"
        ),
        "percentile": (
            "SELECT min(value) AS p90 FROM ("
            "  SELECT l_extendedprice AS value, "
            "         cume_dist() OVER (ORDER BY l_extendedprice) AS cd "
            "  FROM lineitem WHERE l_extendedprice IS NOT NULL"
            ") WHERE cd >= 0.9"
        ),
        "uniques_histogram": (
            "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag"
        ),
        "distinct_count": (
            "SELECT count(*) AS n_distinct FROM "
            "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"
        ),
        "distinct_union_count": (
            "SELECT count(*) AS n_distinct FROM ("
            "  SELECT DISTINCT k FROM ("
            "    SELECT c_nationkey AS k FROM customer "
            "    UNION ALL SELECT s_nationkey AS k FROM supplier))"
        ),
        "duplicates": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n_copies "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus HAVING count(*) > 1"
        ),
        "array_agg": (
            "SELECT n_regionkey, array_to_string("
            "list_sort(array_agg(n_nationkey)), ',') AS nations "
            "FROM nation GROUP BY n_regionkey"
        ),
        "functional_dependency": (
            "SELECT o_custkey, count(*) AS n_variants FROM "
            "(SELECT DISTINCT o_custkey, o_orderstatus FROM orders) "
            "GROUP BY o_custkey HAVING count(*) > 1"
        ),
        "except_distinct": (
            "SELECT o_custkey AS custkey FROM orders "
            "EXCEPT "
            "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0"
        ),
        "intersect": (
            "SELECT c_nationkey AS k FROM customer "
            "INTERSECT "
            "SELECT s_nationkey AS k FROM supplier"
        ),
        "row_match_mismatch": (
            "SELECT round(avg(CASE WHEN l.l_shipdate = r.o_orderdate "
            "OR (l.l_shipdate IS NULL AND r.o_orderdate IS NULL) "
            "THEN 0.0 ELSE 1.0 END), 6) AS mismatch_fraction, "
            "count(*) AS n_rows "
            "FROM lineitem l JOIN orders r ON l.l_orderkey = r.o_orderkey"
        ),
        "anti_join": (
            "SELECT count(*) AS n_customers_without_orders FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "broadcast_join_agg": (
            "SELECT n_name, count(*) AS n_rows, "
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "interval_overlap": (
            "WITH iv AS (SELECT o_custkey AS k, o_orderdate AS s, "
            "o_orderdate + INTERVAL 7 DAY AS e FROM orders) "
            "SELECT count(*) AS n_violation_keys FROM ("
            "  SELECT l.k FROM iv l JOIN iv r ON l.k = r.k "
            "    AND l.s <= r.s AND l.e >= r.s "
            "    AND (l.s <> r.s OR l.e <> r.e) "
            "  UNION "
            "  SELECT k FROM iv GROUP BY k, s, e HAVING count(*) > 1)"
        ),
        "interval_gap": (
            "WITH iv AS (SELECT l_suppkey AS k, l_shipdate AS s, "
            "l_shipdate + INTERVAL 5 DAY AS e FROM lineitem), "
            "w AS (SELECT k, s, max(e) OVER (PARTITION BY k ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM iv) "
            "SELECT count(DISTINCT k) AS n_violation_keys FROM w "
            "WHERE prev_end IS NOT NULL "
            "AND date_diff('day', CAST(prev_end AS DATE), CAST(s AS DATE)) > 0"
        ),
        "regex_violations": (
            "SELECT count(*) AS n_violations FROM orders "
            "WHERE NOT regexp_matches(o_orderpriority, '[0-9]-[A-Z]')"
        ),
        "cross_cdf": (
            "WITH h1 AS (SELECT l_quantity AS val, count(*) AS c FROM lineitem "
            "WHERE l_returnflag = 'A' GROUP BY 1), "
            "c1 AS (SELECT val, sum(c) OVER (ORDER BY val) * 1.0 / "
            "sum(c) OVER () AS cdf1 FROM h1), "
            "h2 AS (SELECT l_quantity AS val, count(*) AS c FROM lineitem "
            "WHERE l_returnflag = 'R' GROUP BY 1), "
            "c2 AS (SELECT val, sum(c) OVER (ORDER BY val) * 1.0 / "
            "sum(c) OVER () AS cdf2 FROM h2), "
            "j AS (SELECT coalesce(c1.val, c2.val) AS val, c1.cdf1 AS cdf1, "
            "c2.cdf2 AS cdf2 FROM c1 FULL OUTER JOIN c2 ON c1.val = c2.val) "
            "SELECT val, "
            "round(coalesce(last_value(cdf1 IGNORE NULLS) OVER "
            "(ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) "
            "AS cdf1, "
            "round(coalesce(last_value(cdf2 IGNORE NULLS) OVER "
            "(ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) "
            "AS cdf2 "
            "FROM j"
        ),
        "ks_statistic": (
            "WITH h1 AS (SELECT l_quantity AS val, count(*) AS c FROM lineitem "
            "WHERE l_returnflag = 'A' GROUP BY 1), "
            "c1 AS (SELECT val, sum(c) OVER (ORDER BY val) * 1.0 / "
            "sum(c) OVER () AS cdf1 FROM h1), "
            "h2 AS (SELECT l_quantity AS val, count(*) AS c FROM lineitem "
            "WHERE l_returnflag = 'R' GROUP BY 1), "
            "c2 AS (SELECT val, sum(c) OVER (ORDER BY val) * 1.0 / "
            "sum(c) OVER () AS cdf2 FROM h2), "
            "j AS (SELECT coalesce(c1.val, c2.val) AS val, c1.cdf1 AS cdf1, "
            "c2.cdf2 AS cdf2 FROM c1 FULL OUTER JOIN c2 ON c1.val = c2.val), "
            "f AS (SELECT val, "
            "round(coalesce(last_value(cdf1 IGNORE NULLS) OVER "
            "(ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) "
            "AS cdf1, "
            "round(coalesce(last_value(cdf2 IGNORE NULLS) OVER "
            "(ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) "
            "AS cdf2 FROM j) "
            "SELECT round(max(abs(cdf1 - cdf2)), 6) AS d_statistic FROM f"
        ),
        "text_token_count": (
            "SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "round(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 "
            "/ length(text), 6) AS alpha_ratio, "
            "round(length(text) * 1.0 / "
            "len(string_split_regex(trim(text), '\\s+')), 6) AS mean_token_len "
            "FROM documents"
        ),
        "text_stopword_ratio": (
            "SELECT doc_id, "
            "CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) "
            "AS n_the, "
            "round(((length(text) - length(replace(text, 'the', ''))) / 3.0) "
            "/ len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio "
            "FROM documents"
        ),
        "doc_fingerprint": (
            "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
            "AS fingerprint FROM documents"
        ),
        "dedup_exact": (
            "SELECT fingerprint, count(*) AS n_copies FROM ("
            "  SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
            "  AS fingerprint FROM documents) "
            "GROUP BY fingerprint HAVING count(*) > 1"
        ),
        "embedding_similar_pairs": (
            "SELECT q.vec_id AS qid, count(*) AS n_similar "
            "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id "
            "WHERE q.vec_id < 20 "
            "AND list_cosine_similarity(q.embedding, c.embedding) > 0.8 "
            "GROUP BY q.vec_id"
        ),
    }
