"""Property-based check of the funnel fold: on random event sets the
Column-expression fold must equal the literal greedy-earliest
specification (t_0 = first step-0 event; t_i = first step-i event at or
after t_{i-1} with t_i - t_0 <= within; same-instant events resolve in
step order) computed naively in Python."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.events import funnel

STEPS = ("a", "b", "c")


def naive_funnel(rows, within):
    step_of = {s: i for i, s in enumerate(STEPS)}
    by_user = defaultdict(list)
    for u, t, ty in rows:
        if ty in step_of:
            by_user[u].append((t, step_of[ty]))
    counts = [0] * len(STEPS)
    for evs in by_user.values():
        evs.sort()  # (t, si): ties resolve in step order, like the fold
        slots = [None] * len(STEPS)
        for t, si in evs:
            if si == 0:
                if slots[0] is None:
                    slots[0] = t
            elif (
                slots[si] is None
                and slots[si - 1] is not None
                and t >= slots[si - 1]
                and t - slots[0] <= within
            ):
                slots[si] = t
        for i, v in enumerate(slots):
            if v is not None:
                counts[i] += 1
    return counts


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),  # user
        st.integers(0, 30),  # ts (seconds)
        st.sampled_from(["a", "b", "c", "noise"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy, within=st.integers(1, 15))
def test_funnel_matches_naive_spec(spark, rows, within):
    df = spark.createDataFrame(
        rows, "user_id long, t long, event_type string"
    ).select(
        "user_id", F.timestamp_seconds("t").alias("ts"), "event_type"
    )
    got = {
        r.step_idx: r.n_users
        for r in funnel(df, STEPS, within_s=within).collect()
    }
    want = naive_funnel(rows, within)
    assert [got[i] for i in range(len(STEPS))] == want
