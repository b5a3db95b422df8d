"""Event/temporal queries over ``events`` (+ ``orders`` for as-of) with
DuckDB twins. All time arithmetic is integer epoch-seconds (see
operators/events.py portability note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_spark.caching import track_cache
from mapreduce_implementation_spark.operators import events as ev
from mapreduce_implementation_spark.plans.registry import register
from mapreduce_implementation_spark.plans.relational_queries import DEC, dsum
from mapreduce_implementation_spark.sources.catalog import load_table

_E = "epoch_ms(ts) // 1000"  # DuckDB epoch seconds (floored), mirrors ts.cast("long")


@register(
    "events_tumbling_5min",
    headline=True,
    tables=("events",),
    oracle=f"""
        SELECT ({_E} // 300) * 300 AS bucket_start_s,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows × event type: count + exact-decimal
    value sum. The streaming twin is streaming/windowed_counts.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            ev.time_bucket("ts", 300).alias("bucket_start_s"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@register(
    "events_sessionization",
    headline=True,
    tables=("events",),
    oracle=f"""
        WITH t AS (
            SELECT user_id, event_id, {_E} AS ts_s FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, ts_s,
                   CASE WHEN lag(ts_s) OVER w IS NULL
                             OR ts_s - lag(ts_s) OVER w > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, ts_s,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               MIN(ts_s) AS session_start_s,
               MAX(ts_s) - MIN(ts_s) AS duration_s
        FROM sessions
        GROUP BY user_id, session_idx
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): per-session event
    count, start, duration. One shuffle on user_id + ordered window."""
    events = load_table(spark, sf_dir, "events")
    with_sessions = ev.sessionize(events, "user_id", "ts", gap_s=1800)
    return with_sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("session_start_s"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )


@register(
    "events_asof_latest_order",
    headline=True,
    tables=("events", "orders"),
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id, {_E} AS ets FROM events
        ),
        o AS (
            SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS ots
            FROM orders
        ),
        ranked AS (
            SELECT e.event_id, e.user_id, o.o_orderkey, o.ots,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.ots DESC NULLS LAST, o.o_orderkey ASC NULLS LAST
                   ) AS rn
            FROM e LEFT JOIN o ON o.o_custkey = e.user_id AND o.ots <= e.ets
        )
        SELECT event_id, user_id, o_orderkey, ots AS order_ts_s
        FROM ranked WHERE rn = 1
    """,
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the latest order of the
    same customer at-or-before the event time (LEFT: events without a
    matching order keep NULLs)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    out = ev.asof_join_latest(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts_s=ev.epoch_s("ts"),
        right_ts_s=ev.epoch_s("o_orderdate"),
        right_cols=["o_orderkey"],
        asof_ts_col="order_ts_s",
    )
    return out.select("event_id", "user_id", "o_orderkey", "order_ts_s")


@register(
    "events_props_extraction",
    tables=("events",),
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
)
def events_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props (JSON string) → typed column → aggregate.
    get_json_object stays JVM-side; at scale prefer from_json with an
    explicit schema once the prop set is known."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_range_join_click_purchase",
    tables=("events",),
    oracle=f"""
        SELECT l.event_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(CAST(r.value AS DECIMAL(18,4))) AS DOUBLE) AS total_purchase_value
        FROM (SELECT event_id, user_id, {_E} AS ts_s FROM events
              WHERE event_type = 'click') l
        JOIN (SELECT user_id, {_E} AS ts_s, value FROM events
              WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id
         AND r.ts_s >= l.ts_s AND r.ts_s <= l.ts_s + 300
        GROUP BY l.event_id
    """,
)
def events_range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 5 minutes after each click by the
    same user (clicks with >=1 purchase). Runs as a bucketed EQUI-join on
    (user_id, time_bucket) — operators/events.range_join — so Catalyst
    hash-partitions it and hot users spread across time buckets instead
    of degenerating into a per-key NL join."""
    events = load_table(spark, sf_dir, "events")
    base = events.withColumn("ts_s", ev.epoch_s("ts"))
    clicks = base.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_s"
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_s", F.col("value").alias("purchase_value")
    )
    joined = ev.range_join(
        clicks, purchases, key="user_id", lo_s=0, hi_s=300
    )
    return (
        joined.select(F.col("l.event_id").alias("event_id"), "purchase_value")
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("purchase_value").alias("total_purchase_value"),
        )
    )


@register(
    "events_rollup_multires",
    tables=("events",),
    oracle=f"""
        WITH five AS (
            SELECT ({_E} // 300) * 300 AS b5, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT '5min' AS resolution, b5 AS bucket_start_s, event_type,
               CAST(n AS BIGINT) AS n_events
        FROM five
        UNION ALL
        SELECT '1h', (b5 // 3600) * 3600, event_type, CAST(SUM(n) AS BIGINT)
        FROM five GROUP BY 2, 3
        UNION ALL
        SELECT '1d', (b5 // 86400) * 86400, event_type, CAST(SUM(n) AS BIGINT)
        FROM five GROUP BY 2, 3
        UNION ALL
        SELECT '10min_sliding_5min', s, event_type, CAST(SUM(n) AS BIGINT)
        FROM (SELECT UNNEST([b5, b5 - 300]) AS s, event_type, n FROM five)
        GROUP BY 2, 3
    """,
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the 5-minute aggregate
    is computed ONCE from the scan; the hourly and daily tiers — and
    the 10-min/5-min SLIDING windows — re-aggregate those partials
    (each sliding window is the sum of its two member 5-min buckets; a
    coarser tumbling bucket nests exactly). At 100 TB this is the
    continuous-aggregate pattern: the raw table is read once and every
    tier, including overlapping windows, derives from |buckets×types|
    partials instead of a re-scan."""
    events = load_table(spark, sf_dir, "events")
    five = track_cache(
        events.groupBy(
            ev.time_bucket("ts", 300).alias("b5"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )

    def tier(label: str, width_s: int) -> DataFrame:
        return (
            five.groupBy(
                (F.floor(F.col("b5") / width_s) * width_s)
                .cast("long")
                .alias("bucket_start_s"),
                "event_type",
            )
            .agg(F.sum("n").alias("n_events"))
            .select(
                F.lit(label).alias("resolution"),
                "bucket_start_s",
                "event_type",
                F.col("n_events").cast("long").alias("n_events"),
            )
        )

    base = five.select(
        F.lit("5min").alias("resolution"),
        F.col("b5").alias("bucket_start_s"),
        "event_type",
        F.col("n").cast("long").alias("n_events"),
    )
    # sliding 10-min windows stepping 5: explode each 5-min partial into
    # the two windows that contain it, then sum partials per window —
    # overlapping windows WITHOUT re-reading events
    sliding = (
        five.select(
            F.explode(F.array(F.col("b5"), F.col("b5") - 300)).alias(
                "bucket_start_s"
            ),
            "event_type",
            "n",
        )
        .groupBy("bucket_start_s", "event_type")
        .agg(F.sum("n").cast("long").alias("n_events"))
        .select(
            F.lit("10min_sliding_5min").alias("resolution"),
            "bucket_start_s",
            "event_type",
            "n_events",
        )
    )
    return (
        base.unionAll(tier("1h", 3600))
        .unionAll(tier("1d", 86400))
        .unionAll(sliding)
    )


@register(
    "events_user_value_trend",
    tables=("events",),
    oracle=f"""
        WITH t AS (
            SELECT user_id,
                   {_E} - MIN({_E}) OVER (PARTITION BY user_id) AS xc,
                   CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y
            FROM events
        ),
        s AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   SUM(CAST(xc AS HUGEINT)) AS sx,
                   SUM(CAST(y AS HUGEINT)) AS sy,
                   SUM(CAST(xc AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                   SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) AS sxx
            FROM t
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n_events,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE) / 10000.0
               END AS slope_per_s
        FROM s
    """,
)
def events_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Python UDAF (applyInPandas): per-user least-squares value
    trend, integer-exact so it hash-matches the HUGEINT SQL oracle."""
    events = load_table(spark, sf_dir, "events")
    return ev.user_value_trend(events)


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN_S = 86400


@register(
    "events_funnel_view_click_purchase",
    tables=("events",),
    oracle=f"""
        WITH ev AS (
            SELECT user_id, {_E} AS t,
                   CASE event_type WHEN 'view' THEN 0
                                   WHEN 'click' THEN 1
                                   WHEN 'purchase' THEN 2 END AS si
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
        ),
        s0 AS (SELECT user_id, MIN(t) AS t0 FROM ev WHERE si = 0 GROUP BY user_id),
        s1 AS (SELECT e.user_id, MIN(e.t) AS t1
               FROM ev e JOIN s0 USING (user_id)
               WHERE e.si = 1 AND e.t >= s0.t0
                 AND e.t - s0.t0 <= {_FUNNEL_WITHIN_S}
               GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, MIN(e.t) AS t2
               FROM ev e JOIN s0 USING (user_id) JOIN s1 USING (user_id)
               WHERE e.si = 2 AND e.t >= s1.t1
                 AND e.t - s0.t0 <= {_FUNNEL_WITHIN_S}
               GROUP BY e.user_id)
        SELECT step, CAST(step_idx AS BIGINT) AS step_idx,
               CAST(n_users AS BIGINT) AS n_users
        FROM (VALUES
            ('view', 0, (SELECT COUNT(*) FROM s0)),
            ('click', 1, (SELECT COUNT(*) FROM s1)),
            ('purchase', 2, (SELECT COUNT(*) FROM s2))
        ) t(step, step_idx, n_users)
    """,
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase within 1 day
    of the first view (greedy-earliest chain, operators/events.funnel):
    users reaching each step, monotone decreasing. One shuffle (groupBy
    user) + a sorted Column-expression fold — no K-way join chain. The
    oracle unrolls the same greedy recurrence as chained min CTEs
    (t_i = first step_i event at/after t_{i-1} with t_i - t_0 inside
    the window), which is equivalent to the fold because each t_i is
    the minimum qualifying timestamp given t_{i-1}."""
    events = load_table(spark, sf_dir, "events")
    return ev.funnel(
        events, _FUNNEL_STEPS, within_s=_FUNNEL_WITHIN_S
    )
