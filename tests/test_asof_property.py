"""Property-based check of the union-sort-merge as-of join: on random
keyed event/order sets, the operator's output must equal the literal
specification (for each left row, the latest right row with
rts <= lts on the key; ties → latest rts then smallest right id; NULLs
when no right qualifies) computed naively in Python."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.events import asof_join_latest


def naive_asof(lefts, rights):
    out = {}
    for lid, lkey, lts in lefts:
        cand = [(rts, rid) for rid, rkey, rts in rights if rkey == lkey and rts <= lts]
        if cand:
            # latest ts, then smallest right id
            best = max(cand, key=lambda t: (t[0], -t[1]))
            out[lid] = (best[1], best[0])
        else:
            out[lid] = (None, None)
    return out


left_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 50)),  # (key, ts)
    min_size=1,
    max_size=12,
)
right_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 50)),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lefts=left_rows, rights=right_rows)
def test_asof_matches_naive_spec(spark, lefts, rights):
    l_rows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    r_rows = [(100 + i, k, t) for i, (k, t) in enumerate(rights)]
    ldf = spark.createDataFrame(l_rows, "event_id long, user_id long, ts_s long")
    rdf = spark.createDataFrame(
        r_rows or [(None, None, None)], "o_id long, o_user long, o_ts long"
    ).where(F.col("o_id").isNotNull())
    out = asof_join_latest(
        ldf,
        rdf,
        left_key="user_id",
        right_key="o_user",
        left_ts_s=F.col("ts_s"),
        right_ts_s=F.col("o_ts"),
        right_cols=["o_id"],
    )
    got = {r.event_id: (r.o_id, r.asof_ts_s) for r in out.collect()}
    assert got == naive_asof(l_rows, r_rows)


def test_asof_null_key_and_ts_semantics(spark):
    """LEFT theta-join NULL semantics survive the union-sort-merge
    rewrite: NULL keys never match (a NULL-key left gets NULL payloads,
    a NULL-key right is never picked), and a NULL right timestamp never
    matches (NULL rts sorts nulls-first and must not be picked)."""
    ldf = spark.createDataFrame(
        [(0, None, 10), (1, 5, 10), (2, 5, None)],
        "event_id long, user_id long, ts_s long",
    )
    rdf = spark.createDataFrame(
        [(100, None, 5), (101, 5, None), (102, 5, 7)],
        "o_id long, o_user long, o_ts long",
    )
    out = asof_join_latest(
        ldf,
        rdf,
        left_key="user_id",
        right_key="o_user",
        left_ts_s=F.col("ts_s"),
        right_ts_s=F.col("o_ts"),
        right_cols=["o_id"],
    )
    got = {r.event_id: (r.o_id, r.asof_ts_s) for r in out.collect()}
    assert got == {
        0: (None, None),  # NULL-key left: unmatched
        1: (102, 7),  # matches the real right row, not 100/101
        2: (None, None),  # NULL-ts left: rts <= NULL is never true
    }


def naive_range_join(lefts, rights, lo, hi):
    out = set()
    for lid, lkey, lts in lefts:
        for rid, rkey, rts in rights:
            if rkey == lkey and lts + lo <= rts <= lts + hi:
                out.add((lid, rid))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lefts=left_rows, rights=right_rows, lo=st.integers(-5, 5), span=st.integers(0, 20))
def test_range_join_matches_naive_spec(spark, lefts, rights, lo, span):
    """The bucketed interval join must emit exactly the naive
    all-pairs-filter result for arbitrary windows (including negative
    lower bounds and zero-width spans)."""
    from mapreduce_implementation_spark.operators.events import range_join

    l_rows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    r_rows = [(100 + i, k, t) for i, (k, t) in enumerate(rights)]
    ldf = spark.createDataFrame(
        l_rows or [(None, None, None)], "l_id long, user_id long, ts_s long"
    ).where("l_id IS NOT NULL")
    rdf = spark.createDataFrame(
        r_rows or [(None, None, None)], "r_id long, user_id long, ts_s long"
    ).where("r_id IS NOT NULL")
    out = range_join(
        ldf, rdf, key="user_id", lo_s=lo, hi_s=lo + span
    )
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert got == naive_range_join(l_rows, r_rows, lo, lo + span)
