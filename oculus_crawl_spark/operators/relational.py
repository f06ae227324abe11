"""General relational surface (SURVEY.md §2.B table) — each entry is a
(Spark DataFrame callable, DuckDB oracle SQL) pair over the driver's
TPC-H-ish testdata views.

Determinism rules for the driver's order-insensitive value-hash:
* money-like double sums go through DECIMAL(28,2) casts on BOTH sides
  (FP summation order would otherwise differ between engines), but the
  OUTPUT column is always CAST back to DOUBLE: the driver's value-hash
  distinguishes Spark DECIMAL(28,2) from DuckDB DECIMAL(38,_)/HUGEINT
  even when every value matches (round-1 finding), while the exact
  decimal -> nearest-double conversion is identical in both engines at
  these magnitudes (unscaled value << 2^53);
* integer sums are CAST to BIGINT on the DuckDB side (sum(BIGINT) is
  HUGEINT there, BIGINT in Spark);
* other derived doubles are round()ed identically on both sides;
* timestamps are emitted as formatted strings (Spark session TZ is
  pinned UTC; DuckDB timestamps are naive UTC);
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analysis import TOKENIZE_ORACLE_REGEX as _TOK_RE
from ..sources.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- scans / projection / filter ---------------------------------------------


def q_scan_filter_project(spark, sf_dir):
    """E2a/E2b: projection + filters pushed down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-02-01")
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            # Raw double passthrough — no arithmetic, so bit-identical on
            # both sides (a DECIMAL wire type would hash-mismatch).
            F.col("l_quantity").alias("qty"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
    )


SQL_SCAN_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_day
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1995-02-01'
  AND l_quantity > 45
"""


# --- aggregation (TPC-H Q1 shape) --------------------------------------------


def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(28,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            # Raw double avg is DETERMINISTIC here, no decimal needed:
            # l_quantity is integral-valued (TPC-H 1..50; fixture-
            # verified), so the double sum is exact in any order.
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(28,2))
                * (1 - CAST(l_discount AS DECIMAL(28,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order,
       round(avg(l_quantity), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- joins --------------------------------------------------------------------


def q_join_broadcast(spark, sf_dir):
    """Q2-style broadcast hash join: small dim broadcast, never SMJ."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("p_brand")
    )


SQL_JOIN_BROADCAST = """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def q_join_multiway(spark, sf_dir):
    """5-way join through the star schema (Catalyst picks broadcast for
    the small dims, SMJ/shuffle-hash above threshold)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(28,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(28,2)"))
                ).cast("decimal(28,4)")
            ).cast("double").alias("revenue"),
        )
        .orderBy("r_name")
    )


SQL_JOIN_MULTIWAY = """
SELECT r_name, count(*) AS n_lineitems,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(28,2))
                * (1 - CAST(l_discount AS DECIMAL(28,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_join_semi_anti(spark, sf_dir):
    """left_semi (EXISTS — Q3's segment-pruning primitive) and
    left_anti (NOT EXISTS — E14's merge-resume primitive) in ONE graded
    entry (they are one SURVEY §2 category; merged to keep every
    oracle-graded entry inside the driver's 50-entry window): orders
    with a >49-quantity lineitem counted by priority, plus customers
    without orders counted by market segment."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    c = _t(spark, sf_dir, "customer")
    semi = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(F.lit("semi").alias("mode"), F.col("o_orderpriority").alias("grp"), "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select(F.lit("anti").alias("mode"), F.col("c_mktsegment").alias("grp"), "n")
    )
    return semi.unionByName(anti).orderBy("mode", "grp")


SQL_JOIN_SEMI_ANTI = """
SELECT 'semi' AS mode, o_orderpriority AS grp, count(*) AS n
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
GROUP BY o_orderpriority
UNION ALL
SELECT 'anti' AS mode, c_mktsegment AS grp, count(*) AS n
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY mode, grp
"""


def q_join_outer(spark, sf_dir):
    """Left outer join with null-filled aggregates."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_f_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(28,2)")),
                F.lit(0).cast("decimal(28,2)"),
            ).cast("double").alias("f_total"),
        )
        .orderBy("c_custkey")
    )


SQL_JOIN_OUTER = """
SELECT c_custkey, count(o_orderkey) AS n_f_orders,
       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(28,2))), 0) AS DOUBLE) AS f_total
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
  ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""


def q_join_range_theta(spark, sf_dir):
    """Range/theta join: pairs of events by the same user within 5 min.

    Scale-safe BUCKETED BAND JOIN, not join-on-user-then-filter: each
    event lands in one floor(ts/300s) bucket; since b.ts lies in
    [a.ts, a.ts+300s], b's bucket is a's bucket or the next one, so the
    pair space is covered EXACTLY by two disjoint equi-joins on
    (user_id, bucket) — intermediate size is bounded per (user, 5-min
    window), so a hot user with m events costs O(sum of per-window m_i^2),
    not O(m^2) before the filter. The exact band + a_id < b_id theta is
    applied after. (Self-join on one source: both conditions are
    disjoint because every b row has exactly one bucket, so no dedup.)
    """
    e = _t(spark, sf_dir, "events").withColumn(
        "bkt", F.floor(F.unix_timestamp("ts") / F.lit(300)).cast("long")
    )
    a = e.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("bkt").alias("a_bkt"),
    )
    b = e.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.col("bkt").alias("jk"),
    )
    cand = a.withColumn("jk", F.col("a_bkt")).join(b, ["user_id", "jk"]).unionByName(
        a.withColumn("jk", F.col("a_bkt") + 1).join(b, ["user_id", "jk"])
    )
    pairs = cand.filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("interval 5 minutes"))
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs")).orderBy(
        "user_id"
    )


SQL_JOIN_RANGE_THETA = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id ORDER BY a.user_id
"""


def q_join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest prior click by the same
    user. Spark has no native ASOF; the scalable formulation is a
    SINGLE-PASS running window over the unioned event stream — sort by
    (ts, kind) with clicks before purchases on ties (c_ts <= p_ts is
    inclusive) and carry max(click ts) so far. Unlike the band-join +
    argmax shape, a hot user costs O(events) instead of O(purchases x
    prior_clicks). The DuckDB oracle keeps the join formulation — same
    values, independently derived."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    kind = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_click", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.date_format("last_click", "yyyy-MM-dd HH:mm:ss").alias(
                "last_click_ts"
            ),
        )
        .orderBy("p_id")
    )


SQL_JOIN_ASOF = """
SELECT p.event_id AS p_id, p.user_id,
       strftime(max(c.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
ORDER BY p_id
"""


# --- windows ------------------------------------------------------------------


def q_window_ranking(spark, sf_dir):
    """row_number / rank / dense_rank / ntile per nation on acctbal."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("c_nationkey", "rn")
    )


SQL_WINDOW_RANKING = """
SELECT c_nationkey, c_custkey, rn, rnk, drnk, quartile FROM (
  SELECT c_nationkey, c_custkey,
         row_number() OVER w AS rn,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         ntile(4) OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
) t WHERE rn <= 5 ORDER BY c_nationkey, rn
"""


def q_window_frames(spark, sf_dir):
    """Analytic frames, ROWS + RANGE in one pass over the same partition
    key: per-user running sum and lag delta (ROWS frame) plus a trailing
    1h event count (RANGE frame over the numeric time key). One window
    partition spec => Catalyst evaluates all four in a single Window
    node after one (user_id) sort.

    The RANGE key is integer MICROSECONDS (unix_micros / epoch_us on the
    oracle side): events carry sub-second timestamps, and a
    seconds-truncated key silently shifts the frame boundary for events
    sitting within the truncated fraction of exactly one hour apart
    (observed once in 100k rows at sf0.1 — rows/schema matched, one
    n_last_hour cell off by one)."""
    # ts is TIMESTAMP_NTZ; the cast reads it in the session tz, which
    # ensure_conf pins to UTC — matching DuckDB's epoch_us on naive ts.
    e = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(
                F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
            ).alias("running_value"),
            F.round(F.lag("value", 1, 0.0).over(w), 4).alias("prev_value"),
            F.count("*").over(wr).alias("n_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


SQL_WINDOW_FRAMES = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
       round(coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS prev_value,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events ORDER BY user_id, event_id
"""


def q_dedup_latest_per_key(spark, sf_dir):
    """E2c pattern: latest row per key via ranking window (the same
    operator that dedups crawl snapshots per url)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        .orderBy("user_id")
    )


SQL_DEDUP_LATEST_PER_KEY = """
SELECT user_id, event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1 ORDER BY user_id
"""


def q_topk_per_group(spark, sf_dir):
    """Top-3 orders by totalprice per priority (window top-k)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "rn",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
        )
        .orderBy("o_orderpriority", "rn")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice AS price
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) t
WHERE rn <= 3 ORDER BY o_orderpriority, rn
"""


# --- grouping sets / rollup / cube -------------------------------------------


def q_rollup_cube(spark, sf_dir):
    """rollup and cube — one SURVEY §2 category (grouping sets) — in
    ONE graded entry (merged to free a slot in the driver's 50-entry
    grading window): events by event_type ROLLUP plus lineitem by
    (l_returnflag, l_linestatus) CUBE, unified under a mode tag."""
    e = _t(spark, sf_dir, "events")
    li = _t(spark, sf_dir, "lineitem")
    r = (
        e.rollup("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            # Routed through DECIMAL like the cube branch: the grand-
            # total row sums ~all rows of `value` in partition order vs
            # DuckDB's serial order, and a raw double sum landing within
            # FP error of a 0.005 boundary would round to different 2-dp
            # values nondeterministically. Both engines cast the SAME
            # doubles to DECIMAL(38,9) first, so the sum is exact.
            F.round(
                F.sum(F.col("value").cast("decimal(38,9)")).cast("double"), 2
            ).alias("val"),
        )
        .select(
            F.lit("rollup").alias("mode"),
            F.col("event_type").alias("g1"),
            F.lit(None).cast("string").alias("g2"),
            "n",
            "val",
        )
    )
    c = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,2)"))
            .cast("double")
            .alias("val"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "n",
            "val",
        )
    )
    return r.unionByName(c).orderBy(
        "mode",
        F.col("g1").asc_nulls_first(),
        F.col("g2").asc_nulls_first(),
    )


SQL_ROLLUP_CUBE = """
SELECT 'rollup' AS mode, event_type AS g1, NULL::VARCHAR AS g2,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(38,9))) AS DOUBLE), 2) AS val
FROM events GROUP BY ROLLUP (event_type)
UNION ALL
SELECT 'cube', l_returnflag, l_linestatus,
       count(*), CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY mode, g1 ASC NULLS FIRST, g2 ASC NULLS FIRST
"""


# --- set ops ------------------------------------------------------------------


def q_set_ops(spark, sf_dir):
    """ONE graded entry for the whole set-op family (grading-window
    packing, round-4): intersect / exceptAll over customer key sets,
    PLUS union-distinct of customer+supplier nation keys joined back to
    nation — each sub-result tagged so both are value-graded together."""
    o = _t(spark, sf_dir, "orders")
    with_f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    with_o = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    both = with_f.intersect(with_o).withColumn("label", F.lit("both"))
    f_only = with_f.distinct().exceptAll(with_o.distinct()).withColumn(
        "label", F.lit("f_only")
    )
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nations = (
        c.select(F.col("c_nationkey").alias("key"))
        .union(s.select(F.col("s_nationkey").alias("key")))
        .distinct()
        .join(n, F.col("key") == n.n_nationkey)
        .select("key", F.col("n_name").alias("label"))
    )
    return (
        both.unionByName(f_only)
        .withColumn("op", F.lit("order_status_sets"))
        .unionByName(nations.withColumn("op", F.lit("nation_union")))
        .select("op", "key", "label")
        .orderBy("op", "key", "label")
    )


SQL_SET_OPS = """
SELECT 'order_status_sets' AS op, key, label FROM (
  SELECT custkey AS key, 'both' AS label FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus='O')
  UNION ALL
  SELECT custkey, 'f_only' FROM (
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus='F'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O'))
UNION ALL
SELECT 'nation_union', nationkey, n_name FROM (
  SELECT nationkey, n_name FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier) t
  JOIN nation ON nationkey = n_nationkey)
ORDER BY op, key, label
"""


# --- distinct aggregation -----------------------------------------------------


def q_distinct_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_suppkey")
    )


SQL_DISTINCT_AGG = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""


# --- scalar function surface ---------------------------------------------------


def q_string_math_funcs(spark, sf_dir):
    """String + math scalar surface in ONE entry (folded round 5 to
    free a grading-window slot for bm25_topk_nonlatin — same technique
    as round 3's semi/anti fold): every function from the two previous
    entries, exercised per-row over one table. Aggregate-of-math forms
    remain covered by rel_agg_pricing_summary et al."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("novowels"),
        F.round(F.log1p("p_retailprice"), 6).alias("log_price"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.pow("p_size", F.lit(2)).cast("long").alias("size_sq"),
        F.round(
            F.greatest(F.col("p_size").cast("double"), F.col("p_retailprice")), 2
        ).alias("greatest_v"),
    ).orderBy("p_partkey")


SQL_STRING_MATH_FUNCS = """
SELECT p_partkey, lower(p_name) AS lname, length(p_name) AS name_len,
       substring(p_type, 1, 5) AS type5,
       concat_ws('|', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
       round(ln(1 + p_retailprice), 6) AS log_price,
       round(sqrt(p_retailprice), 6) AS sqrt_price,
       CAST(pow(p_size, 2) AS BIGINT) AS size_sq,
       round(greatest(CAST(p_size AS DOUBLE), p_retailprice), 2) AS greatest_v
FROM part ORDER BY p_partkey
"""


def q_datetime_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.hour("ts").alias("hh"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("day", "hh")
    )


SQL_DATETIME_FUNCS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(extract(hour FROM ts) AS INT) AS hh, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY day, hh
"""


def q_array_funcs(spark, sf_dir):
    """Array surface over tokenized documents — scalar outputs only (the
    engine's E3/E4 path exercised as plain SQL). Tokenization is the
    shared frozen tokenize_expr, never an inline fork (analysis.py
    mandates one analyzer; a spec bump must reach this entry too)."""
    from ..functions.analysis import tokenize_expr

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_expr(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "dup").cast("int").alias("has_dup"),
        # F.get (0-based), NOT element_at(.., 1): under Spark 4's
        # default ANSI mode element_at THROWS on an empty array, while
        # the DuckDB oracle's list[1] yields NULL — a zero-token doc
        # (dl=0 is a supported corpus shape) must be NULL on both sides.
        F.get(F.array_sort(toks), 0).alias("first_token"),
    ).orderBy("doc_id")


# The oracle regex is interpolated from the ONE frozen spec
# (TOKENIZE_ORACLE_REGEX, imported at module top), like every fulltext
# oracle: a tokenizer spec bump must reach this entry too, not silently
# grade against the old pattern (the Spark side above already shares
# tokenize_expr).
SQL_ARRAY_FUNCS = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_TOK_RE}')) AS n_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{_TOK_RE}'))) AS n_unique,
       CAST(list_contains(regexp_extract_all(lower(text), '{_TOK_RE}'), 'dup') AS INT) AS has_dup,
       list_sort(regexp_extract_all(lower(text), '{_TOK_RE}'))[1] AS first_token
FROM documents ORDER BY doc_id
"""


def q_json_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k").isNotNull())
        .orderBy("event_id")
    )


SQL_JSON_FUNCS = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
ORDER BY event_id
"""


def q_conditional_agg_pivot(spark, sf_dir):
    """Pivot expressed as conditional aggregation (identical SQL shape)."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "signup", "purchase", "error"]
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}") for t in types
    ]
    return e.groupBy("user_id").agg(*aggs).orderBy("user_id")


SQL_CONDITIONAL_AGG_PIVOT = """
SELECT user_id,
       count(CASE WHEN event_type='click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type='view' THEN 1 END) AS n_view,
       count(CASE WHEN event_type='signup' THEN 1 END) AS n_signup,
       count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type='error' THEN 1 END) AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity gap) — the batch
    equivalent of a streaming session window: lag -> new-session flag ->
    running sum = session id, then per-session aggregates. One window
    shuffle on user_id; at scale this is the standard sessionize shape.

    The gap is integer MICROSECONDS on both sides (unix_micros vs
    DuckDB epoch_us): unix_timestamp truncates to whole seconds while
    epoch() keeps the fraction, so a true gap of 1800.05 s would break
    the session in the oracle but not here — the same seconds-
    truncation divergence class q_window_frames' RANGE key hit at
    sf0.1 (one boundary event in 100k rows)."""
    # ts is TIMESTAMP_NTZ; the cast reads it in the session tz, which
    # ensure_conf pins to UTC — matching DuckDB's epoch_us on naive ts
    # (same conversion as q_window_frames' RANGE key).
    e = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us", 1).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = (
        e.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            # DECIMAL routing like the rollup val: `value` is a true
            # double, and a raw double sum's partition order vs DuckDB's
            # serial order can land within FP error of a 0.00005
            # boundary and round differently. Both engines cast the
            # SAME doubles to DECIMAL(38,9) first, so the sum is exact.
            F.round(
                F.sum(F.col("value").cast("decimal(38,9)")).cast("double"), 4
            ).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  -- CAST: DuckDB's integer window sum yields HUGEINT; Spark emits BIGINT.
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       round(CAST(sum(CAST(value AS DECIMAL(38,9))) AS DOUBLE), 4) AS session_value
FROM sessions GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def q_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct counts — telemetry only (SURVEY §2:
    exact countDistinct feeds idf; approx is for monitoring). Engines
    implement different sketches, so there is no cross-engine oracle —
    the pytest gate bounds the error vs exact instead (rows-only here)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.approx_count_distinct("l_partkey", 0.02).alias("apx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("apx_orders"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("apx_supps"),
    )


QUERIES = {
    "rel_scan_filter_project": (q_scan_filter_project, SQL_SCAN_FILTER_PROJECT),
    "rel_agg_pricing_summary": (q_agg_pricing_summary, SQL_AGG_PRICING_SUMMARY),
    "rel_join_broadcast": (q_join_broadcast, SQL_JOIN_BROADCAST),
    "rel_join_multiway": (q_join_multiway, SQL_JOIN_MULTIWAY),
    "rel_join_semi_anti": (q_join_semi_anti, SQL_JOIN_SEMI_ANTI),
    "rel_join_outer": (q_join_outer, SQL_JOIN_OUTER),
    "rel_join_range_theta": (q_join_range_theta, SQL_JOIN_RANGE_THETA),
    "rel_join_asof": (q_join_asof, SQL_JOIN_ASOF),
    "rel_window_ranking": (q_window_ranking, SQL_WINDOW_RANKING),
    "rel_window_frames": (q_window_frames, SQL_WINDOW_FRAMES),
    "rel_dedup_latest_per_key": (q_dedup_latest_per_key, SQL_DEDUP_LATEST_PER_KEY),
    "rel_topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "rel_rollup_cube": (q_rollup_cube, SQL_ROLLUP_CUBE),
    "rel_set_ops": (q_set_ops, SQL_SET_OPS),
    "rel_distinct_agg": (q_distinct_agg, SQL_DISTINCT_AGG),
    "rel_string_math_funcs": (q_string_math_funcs, SQL_STRING_MATH_FUNCS),
    "rel_datetime_funcs": (q_datetime_funcs, SQL_DATETIME_FUNCS),
    "rel_array_funcs": (q_array_funcs, SQL_ARRAY_FUNCS),
    "rel_json_funcs": (q_json_funcs, SQL_JSON_FUNCS),
    "rel_conditional_agg_pivot": (q_conditional_agg_pivot, SQL_CONDITIONAL_AGG_PIVOT),
    "rel_sessionize": (q_sessionize, SQL_SESSIONIZE),
    "rel_approx_distinct_telemetry": (q_approx_distinct, None),
}
