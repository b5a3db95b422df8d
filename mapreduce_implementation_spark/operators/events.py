"""Event-stream-shaped operators (batch form): time bucketing,
sessionization, as-of joins, JSON prop extraction.

The reference is strictly batch with no time dimension (SURVEY.md §2c:
streaming "Absent"); these define the rebuilt engine's temporal surface.
Structured Streaming variants live in streaming/ — the expressions here
are deliberately the same shapes (windowed aggs translate 1:1).

Timestamp portability: all bucketing is integer arithmetic on epoch
seconds (``ts.cast("long")`` — timezone-independent for both TIMESTAMP
and TIMESTAMP_NTZ since the session pins UTC), mirrored in DuckDB as
``epoch_ms(ts) // 1000``. No tz-dependent date functions in any
oracle-checked path.

Scale notes (100 TB):
* Tumbling/sliding aggs: partial aggregation bounds shuffle rows by
  |buckets × groups| per partition; sliding windows explode each row
  into width/step bucket copies BEFORE the partial agg (stays columnar).
* Sessionization: one hash shuffle on user_id, then two window passes
  over time-sorted partitions — skew-bounded by max events/user; salt
  hot users if that invariant breaks.
* As-of join: union-sort-merge — tag both sides, union, one shuffle on
  the key, one ordered window pass (no join operator, no per-left-row
  expansion over the key's history). At scale prefer bucketed tables
  sorted by (key, time) so even the shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_s(ts: Column | str) -> Column:
    """Epoch seconds (long, floored) — the portable time axis.

    TIMESTAMP_NTZ cannot cast to BIGINT directly; route through
    TIMESTAMP first (no-op for LTZ; NTZ→LTZ uses the session timezone,
    which sources.catalog pins to UTC for determinism)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return col.cast("timestamp").cast("long")


def time_bucket(ts: Column | str, width_s: int, offset_s: int = 0) -> Column:
    """Tumbling-window start (epoch seconds): floor-aligned, optionally
    offset (offsets express sliding windows as a union of tumblings)."""
    e = epoch_s(ts)
    return (F.floor((e - F.lit(offset_s)) / F.lit(width_s)) * width_s + offset_s).cast(
        "long"
    )


def sliding_buckets(ts: Column | str, width_s: int, step_s: int) -> Column:
    """Array of window starts containing ``ts`` for a sliding window of
    ``width_s`` sliding by ``step_s`` (width must be a multiple of step).
    Explode BEFORE aggregating — each event lands in width/step buckets."""
    if width_s % step_s != 0:
        raise ValueError(
            f"width must be a multiple of step, got {width_s}/{step_s}"
        )
    e = epoch_s(ts)
    first = (F.floor((e - F.lit(width_s - step_s)) / F.lit(step_s)) * step_s).cast("long")
    n = width_s // step_s
    return F.filter(
        F.transform(F.sequence(F.lit(0), F.lit(n - 1)), lambda i: first + i * step_s),
        lambda start: (e >= start) & (e < start + width_s),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tie_break_col: str = "event_id",
) -> DataFrame:
    """Assign 1-based session indexes per user: a new session starts when
    the gap to the previous event exceeds ``gap_s`` seconds.

    ``tie_break_col`` must exist in ``df`` — it makes the per-user event
    order total when timestamps collide (deterministic session indexes).

    Returns the input plus ``ts_s`` and ``session_idx`` columns."""
    order = Window.partitionBy(user_col).orderBy("ts_s", tie_break_col)
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ts = df.withColumn("ts_s", epoch_s(ts_col))
    prev = F.lag("ts_s").over(order)
    is_new = F.when(prev.isNull() | (F.col("ts_s") - prev > gap_s), 1).otherwise(0)
    return with_ts.withColumn("session_idx", F.sum(is_new).over(cum))


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts_s: str = "ts_s",
    right_ts_s: str = "ts_s",
    lo_s: int,
    hi_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Interval (range) join: all pairs on the same ``key`` with
    ``right_ts ∈ [left_ts + lo_s, left_ts + hi_s]``.

    Scalable shape: both sides are bucketed on time (bucket width
    defaults to the window span) and the join is an EQUI-join on
    (key, bucket) — the left side explodes into the ≤2 buckets its
    window overlaps; the exact range predicate filters inside the hash
    join. Catalyst can hash-partition this, so a hot key spreads over
    its time buckets instead of landing on one reducer, and there is no
    per-key cross product beyond the window span. (The naive key-only
    theta join degrades to per-key NL join at scale.)

    Right columns survive with their names; the left's are prefixed
    ``l_`` where they collide.
    """
    span = hi_s - lo_s
    if span < 0:
        raise ValueError(f"hi_s must be >= lo_s, got [{lo_s}, {hi_s}]")
    b = bucket_s or max(span, 1)
    lts, rts = F.col(f"l.{left_ts_s}"), F.col(f"r.{right_ts_s}")
    lo_bucket = F.floor((F.col(left_ts_s) + lo_s) / b).cast("long")
    hi_bucket = F.floor((F.col(left_ts_s) + hi_s) / b).cast("long")
    l = left.withColumn(
        "_bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    ).alias("l")
    r = right.withColumn(
        "_bucket", F.floor(F.col(right_ts_s) / b).cast("long")
    ).alias("r")
    return l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._bucket") == F.col("r._bucket"))
        & (rts >= lts + lo_s)
        & (rts <= lts + hi_s),
    ).drop("_bucket")


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts_s: Column,
    right_ts_s: Column,
    right_cols: list[str],
    asof_ts_col: str = "asof_ts_s",
) -> DataFrame:
    """Backward as-of join: for each left row, the single latest right
    row with ``right_ts_s <= left_ts_s`` on the same key (LEFT
    semantics — unmatched left rows keep NULLs).

    Tie-break: latest right_ts_s, then smallest first right_col.

    Returns the left columns + ``right_cols`` (+ the matched right
    timestamp as ``asof_ts_col``).

    Plan (the scale-safe union-sort-merge shape): tag both inputs, UNION
    them, ONE hash shuffle on the key, then a single in-partition
    (ts, side, tie-break)-ordered pass where each left row picks the
    last right payload seen (``F.last(ignorenulls=True)`` over a
    running frame). Work is O(|left| + |right|) per key — no join at
    all, so there is no per-left-row expansion over that key's right
    history (the previous theta-join + row_number form was per-key
    quadratic, the one shape AQE cannot rescue). Rights sort BEFORE
    lefts at equal ts (ties are inclusive: rts <= lts), and equal-ts
    rights sort by right_cols[0] DESC so the smallest lands last and
    wins the pick."""
    lcols = list(left.columns)
    l_struct = F.struct(*[F.col(c) for c in lcols])
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], right_ts_s.alias("_rts")
    )
    # typed NULL twins so the union schemas line up
    l_type = left.select(l_struct.alias("x")).schema["x"].dataType
    r_type = right.select(r_struct.alias("x")).schema["x"].dataType
    tagged_l = left.select(
        F.col(left_key).alias("_k"),
        left_ts_s.alias("_ts"),
        F.lit(1).alias("_side"),  # lefts AFTER rights at equal ts
        l_struct.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    # NULL semantics match a LEFT theta join: a NULL key or NULL right
    # timestamp never matches, so such right rows are dropped before the
    # union (otherwise Window.partitionBy groups NULL keys together and a
    # NULL-key left could pick up a NULL-key right payload, and a NULL
    # right ts sorts nulls-first and could be picked). NULL-key / NULL-ts
    # LEFT rows stay: their partition then holds no rights, so the pick
    # is NULL — exactly the unmatched-left outcome.
    tagged_r = right.select(
        F.col(right_key).alias("_k"),
        right_ts_s.alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
    ).where(F.col("_k").isNotNull() & F.col("_ts").isNotNull())
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_ts").asc(),
            F.col("_side").asc(),
            F.col(f"_r.{right_cols[0]}").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = F.last("_r", ignorenulls=True).over(w)
    return (
        tagged_l.unionByName(tagged_r)
        .withColumn("_p", picked)
        .where(F.col("_side") == 1)
        .select(
            *[F.col(f"_l.{c}").alias(c) for c in lcols],
            *[F.col(f"_p.{c}").alias(c) for c in right_cols],
            F.col("_p._rts").alias(asof_ts_col),
        )
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user least-squares slope of ``value`` over time — a grouped
    Python UDAF via Arrow-batched ``applyInPandas`` (the custom-
    aggregate API surface; one hash shuffle on user_id, group state in
    the Python worker).

    Exactness design (so a DuckDB oracle can hash-match a Python UDF):
    all sums run in arbitrary-precision INTEGER arithmetic — x is
    centered epoch seconds, y is value scaled by 1e4 (exact: value fits
    DECIMAL(18,4)) — and only the final num/den/1e4 happens in doubles,
    the identical IEEE ops on both engines. Naive float sums would
    differ in summation order and break the value-hash.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("slope_per_s", DoubleType()),
        ]
    )

    def fit(pdf):
        import pandas as pd

        user_id = int(pdf["user_id"].iloc[0])
        xs = [int(v) for v in pdf["ts_s"]]
        ys = [int(round(float(v) * 10000)) for v in pdf["value"]]
        n = len(xs)
        x0 = min(xs)
        xc = [x - x0 for x in xs]
        sx = sum(xc)
        sy = sum(ys)
        sxy = sum(a * b for a, b in zip(xc, ys))
        sxx = sum(a * a for a in xc)
        den = n * sxx - sx * sx
        slope = (
            float(n * sxy - sx * sy) / float(den) / 10000.0
            if den != 0
            else None
        )
        return pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "slope_per_s": [slope]}
        )

    keyed = events.select(
        "user_id", epoch_s("ts").alias("ts_s"), "value"
    )
    return keyed.groupBy("user_id").applyInPandas(fit, schema)


def funnel_events(
    events: DataFrame,
    steps: tuple[str, ...] | list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel's shared input contract — validation + the
    (user_id, t, si) projection — factored out so the batch fold and
    the streaming state operator (streaming/funnel.py) cannot drift.
    NULL-timestamp events are dropped here: the batch fold ignores them
    anyway (NULL comparisons never take a slot) and the streaming fold
    would crash converting NaN to int."""
    k = len(steps)
    if k < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {list(steps)}")
    if len(set(steps)) != k:
        raise ValueError(f"steps must be distinct, got {list(steps)}")
    if within_s <= 0:
        raise ValueError(f"within_s must be positive, got {within_s}")
    step_idx = F.when(F.col(type_col) == steps[0], F.lit(0))
    for i, s in enumerate(steps[1:], 1):
        step_idx = step_idx.when(F.col(type_col) == s, F.lit(i))
    return (
        events.where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("user_id"),
            epoch_s(ts_col).alias("t"),
            step_idx.alias("si"),
        )
        .where(F.col("t").isNotNull())
    )


def funnel_user_slots(
    events: DataFrame,
    steps: tuple[str, ...] | list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user greedy-earliest slot fill — the funnel's core fold,
    shared by :func:`funnel` (step counts) and
    :func:`funnel_converted_users` (the conversion set). Returns
    DataFrame[user_id, r struct<s0..s{k-1}>] with s_i = the time the
    user reached step i on the FIRST-TOUCH chain (NULL = never).

    Spark-first shape: filter to funnel event types (scan-stage,
    pushed down), ONE shuffle (groupBy user), then a sorted fold as a
    pure Column expression — ``array_sort`` + ``aggregate`` over a
    K-slot struct accumulator, no Python, no per-step join chain."""
    k = len(steps)
    ev = funnel_events(events, steps, within_s, user_col, ts_col, type_col)
    # sort key (t, si): at equal timestamps the EARLIER funnel step
    # folds first, so a same-instant later step still chains off it —
    # matching the t_i >= t_{i-1} oracle formulation exactly
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "si"))).alias("evs")
    )
    null_l = F.lit(None).cast("long")
    acc0 = F.struct(*[null_l.alias(f"s{i}") for i in range(k)])

    def fold(acc, e):
        outs = []
        for i in range(k):
            if i == 0:
                take = (e["si"] == 0) & acc["s0"].isNull()
            else:
                take = (
                    (e["si"] == i)
                    & acc[f"s{i}"].isNull()
                    & acc[f"s{i - 1}"].isNotNull()
                    & (e["t"] >= acc[f"s{i - 1}"])
                    & ((e["t"] - acc["s0"]) <= within_s)
                )
            outs.append(
                F.when(take, e["t"]).otherwise(acc[f"s{i}"]).alias(f"s{i}")
            )
        return F.struct(*outs)

    return per_user.select(
        "user_id", F.aggregate("evs", acc0, fold).alias("r")
    )


def funnel_converted_users(
    events: DataFrame,
    steps: tuple[str, ...] | list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The batch funnel's CONVERSION SET: DataFrame[user_id, t0,
    t_final] for every user whose first-touch chain completed — the
    row-level face of :func:`funnel`'s last step count, and the batch
    comparator for the streaming funnel's output (round-16 verdict
    item 6: the batch fold fixes t0 at the user's first step-0 event
    EVER — fixed first-touch — where the streaming watermark fold
    retries after a provably-failed attempt, so stream ⊇ batch on
    conversion sets and the divergence is exactly the retry class;
    measured on the 2M rehearsal corpus in BASELINE.md r16 and pinned
    in tests/test_streaming_funnel.py)."""
    k = len(steps)
    slots = funnel_user_slots(
        events, steps, within_s, user_col, ts_col, type_col
    )
    return slots.where(F.col(f"r.s{k - 1}").isNotNull()).select(
        "user_id",
        F.col("r.s0").alias("t0"),
        F.col(f"r.s{k - 1}").alias("t_final"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] | list[str],
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per user, the earliest chain step1 <= step2 <=
    ... <= stepK with the whole chain inside ``within_s`` seconds of the
    chain's FIRST step; returns DataFrame[step, step_idx, n_users] with
    n_users = users reaching at least that step (monotone decreasing).

    Greedy-earliest semantics (the standard funnel definition): t1 =
    the user's first step1 event; t_i = the first step_i event at or
    after t_{i-1} with t_i - t1 <= within_s. Equal timestamps resolve
    in step order (a step2 event at exactly t1 counts).

    Spark-first shape: filter to funnel event types (scan-stage, pushed
    down), ONE shuffle (groupBy user), then a sorted fold as a pure
    Column expression — ``array_sort`` + ``aggregate`` over a
    K-slot struct accumulator, no Python, no per-step join chain (the
    naive formulation is K shuffles). Per-user state is only this
    user's funnel-type events inside the analysis window — the same
    bound as sessionization; at 100 TB slice the input by day/week
    before calling, as any funnel analysis does."""
    k = len(steps)
    reached = funnel_user_slots(
        events, steps, within_s, user_col, ts_col, type_col
    ).select("r")
    counts = reached.agg(
        *[F.count(F.col(f"r.s{i}")).alias(f"c{i}") for i in range(k)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(steps[i]).alias("step"),
                F.lit(i).cast("long").alias("step_idx"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(rows).alias("x")).select(
        "x.step", "x.step_idx", "x.n_users"
    )
