"""Behavioral tests for the temporal operators (range join, funnel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.sources.catalog import load_table


def test_range_join_boundaries(spark):
    from mapreduce_implementation_spark.operators.events import range_join

    left = spark.createDataFrame(
        [(1, 100, 1000)], "event_id long, user_id long, ts_s long"
    )
    right = spark.createDataFrame(
        [(100, 1000, 1.0),   # t == lts      -> in  (lo=0)
         (100, 1300, 2.0),   # t == lts+300  -> in  (hi inclusive)
         (100, 1301, 3.0),   # just past hi  -> out
         (100, 999, 4.0),    # before lo     -> out
         (101, 1100, 5.0)],  # other user    -> out
        "user_id long, ts_s long, value double",
    )
    got = range_join(left, right, key="user_id", lo_s=0, hi_s=300)
    vals = sorted(r.value for r in got.collect())
    assert vals == [1.0, 2.0]


def test_range_join_crosses_bucket_boundary(spark):
    from mapreduce_implementation_spark.operators.events import range_join

    # window [590, 890] spans buckets 1 and 2 (width 300); the match at
    # 899 is out, the one at 601 is in despite a different bucket than lts
    left = spark.createDataFrame([(1, 7, 590)], "event_id long, user_id long, ts_s long")
    right = spark.createDataFrame(
        [(7, 601, 1.0), (7, 890, 2.0), (7, 891, 3.0)],
        "user_id long, ts_s long, value double",
    )
    got = range_join(left, right, key="user_id", lo_s=0, hi_s=300)
    assert sorted(r.value for r in got.collect()) == [1.0, 2.0]


def test_partitioned_sink_prunes_scan(spark, tmp_path):
    """The partitioned layout must show up as PartitionFilters in the
    scan (planning-time directory pruning) — the mechanism that keeps
    100 TB queries from reading 100 TB."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.sources.catalog import load_table
    from mapreduce_implementation_spark.sources.sinks import (
        write_partitioned_dataset,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned_dataset(events, path, ["event_type"])

    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan
    assert back.count() == events.where(F.col("event_type") == "click").count()


def test_sessionize_custom_tie_break_column(spark):
    """sessionize() must work on inputs without an event_id column when
    a tie-break column is named (advisor finding)."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [(1, 100, "a"), (1, 100, "b"), (1, 5000, "c")],
        ["user_id", "ts", "row_key"],
    )
    out = sessionize(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "user_id",
        "ts",
        gap_s=1800,
        tie_break_col="row_key",
    ).collect()
    by_key = {r.row_key: r.session_idx for r in out}
    assert by_key == {"a": 1, "b": 1, "c": 2}


class TestFunnel:
    """Ordered funnel matching (operators/events.funnel)."""

    def test_known_chains(self, spark):
        """Hand-built users: complete chain, out-of-order, window
        breach, same-instant step chaining."""
        import datetime as dt

        from mapreduce_implementation_spark.operators.events import funnel

        def t(s):
            return dt.datetime(2026, 1, 1, 0, 0, s)

        rows = [
            # u1: clean a->b->c inside window
            (1, t(0), "a"), (1, t(10), "b"), (1, t(20), "c"),
            # u2: b before a only -> reaches a (later b missing)
            (2, t(5), "b"), (2, t(9), "a"),
            # u3: reaches a and b; the c at +50s breaches the 30s window
            (3, t(0), "a"), (3, t(10), "b"), (3, t(50), "c"),
            # u4: same-instant a and b chain, then c
            (4, t(0), "a"), (4, t(0), "b"), (4, t(3), "c"),
            # u5: no funnel events at all (filtered out pre-shuffle)
            (5, t(0), "x"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            r.step: r.n_users
            for r in funnel(df, ["a", "b", "c"], within_s=30).collect()
        }
        assert got == {"a": 4, "b": 3, "c": 2}

    def test_matches_duckdb_join_chain(self, spark):
        """The one-shuffle fold must equal the K-join SQL formulation
        (greedy-earliest chain) on the real events table."""
        import duckdb

        from mapreduce_implementation_spark.operators.events import funnel

        sf = "/root/testdata/sf0.01"
        steps, within = ["view", "click", "purchase"], 3600
        got = {
            r.step: r.n_users
            for r in funnel(
                load_table(spark, sf, "events"), steps, within
            ).collect()
        }
        want = {
            s: n
            for s, n in duckdb.sql(f"""
                WITH ev AS (
                    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                           event_type
                    FROM read_parquet('{sf}/events.parquet')
                ),
                s0 AS (SELECT user_id, min(t) AS t1 FROM ev
                       WHERE event_type = 'view' GROUP BY user_id),
                s1 AS (SELECT e.user_id, min(e.t) AS t2
                       FROM ev e JOIN s0 USING (user_id)
                       WHERE e.event_type = 'click' AND e.t >= s0.t1
                         AND e.t - s0.t1 <= {within}
                       GROUP BY e.user_id),
                s2 AS (SELECT e.user_id, min(e.t) AS t3
                       FROM ev e JOIN s1 USING (user_id)
                                 JOIN s0 USING (user_id)
                       WHERE e.event_type = 'purchase' AND e.t >= s1.t2
                         AND e.t - s0.t1 <= {within}
                       GROUP BY e.user_id)
                SELECT 'view' AS step, count(*) AS n FROM s0
                UNION ALL SELECT 'click', count(*) FROM s1
                UNION ALL SELECT 'purchase', count(*) FROM s2
            """).fetchall()
        }
        assert got == want and got["view"] > 0
        assert got["view"] >= got["click"] >= got["purchase"]

    def test_invalid_params(self, spark):
        from mapreduce_implementation_spark.operators.events import funnel

        df = spark.createDataFrame(
            [(1, "2026-01-01 00:00:00", "a")],
            "user_id long, ts string, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(ValueError):
            funnel(df, ["a"], 10)
        with pytest.raises(ValueError):
            funnel(df, ["a", "a"], 10)
        with pytest.raises(ValueError):
            funnel(df, ["a", "b"], 0)


def test_window_param_validation_raises_not_asserts(spark):
    """ValueError (not assert, which -O strips) on invalid window
    params — same hardening as the miner band checks (advisor r7)."""
    import pytest as _pytest

    from mapreduce_implementation_spark.operators.events import (
        range_join,
        sliding_buckets,
    )

    with _pytest.raises(ValueError, match="multiple of step"):
        sliding_buckets("ts", width_s=10, step_s=3)
    df = spark.createDataFrame([(1, 1)], "user_id long, t long")
    with _pytest.raises(ValueError, match="hi_s must be >="):
        range_join(df, df, key="user_id", left_ts_s="t", right_ts_s="t",
                   lo_s=5, hi_s=1)
