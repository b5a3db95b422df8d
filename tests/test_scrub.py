"""PII scrubbing (functions/scrub.py): behavior on adversarial
literals plus cross-engine regex parity — Spark's Java regex and
DuckDB's RE2 must produce byte-identical scrubbed text for the shipped
patterns (the portability claim the module docstring makes)."""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_implementation_spark.functions.scrub import (
    PII_PATTERNS,
    pii_span_count,
    scrub_pii,
)

CASES = [
    "contact me at jane.doe+spam@example.co.uk for details",
    "server at 192.168.0.1 and 10.0.0.255 responded",
    "call +1 (555) 123-4567 or 555 867 5309 now",
    "mixed: bob@host.io from 8.8.8.8 dialed 555-0100-223",
    "no pii here, just words and the number 7",
    "almost an ip 999.1.2 and almost a mail a@b",
    "",
]


def _spark_scrub(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.s, r.n)
        for r in df.select(
            scrub_pii("text").alias("s"), pii_span_count("text").alias("n")
        ).collect()
    ]


def _duck_scrub(texts):
    con = duckdb.connect()
    out = []
    for t in texts:
        s = t
        n = 0
        for _, pattern, tag in PII_PATTERNS:
            n += con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [s, pattern]
            ).fetchone()[0]
            s = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [s, pattern, tag]
            ).fetchone()[0]
        out.append((s, n))
    return out


def test_scrub_behavior(spark):
    got = dict(zip(CASES, (s for s, _ in _spark_scrub(spark, CASES))))
    assert got[CASES[0]] == "contact me at <EMAIL> for details"
    assert got[CASES[1]] == "server at <IP> and <IP> responded"
    assert got[CASES[2]] == "call +<NUMBER> or <NUMBER> now"
    assert got[CASES[3]] == "mixed: <EMAIL> from <IP> dialed <NUMBER>"
    assert got[CASES[4]] == CASES[4]  # untouched
    assert got[CASES[6]] == ""


def test_scrub_matches_duckdb_re2(spark):
    """Byte-identical scrubbed text AND span counts across engines."""
    assert _spark_scrub(spark, CASES) == _duck_scrub(CASES)


def test_span_count_does_not_double_count(spark):
    # the email's digits must not also fire the digit-run rule
    [(s, n)] = _spark_scrub(spark, ["reach 12345678@example.com ok"])
    assert s == "reach <EMAIL> ok"
    assert n == 1


def test_scrub_parity_on_seeded_fuzz_corpus(spark):
    """500 seeded pseudo-random strings (dense digit/dot/@ adversarial
    mix included): the Java-regex and RE2 scrubs must stay
    byte-identical — the strongest form of the portability claim."""
    import random
    import string

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " .@+-()%_"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ] + [
        "".join(
            rng.choice("0123456789.@ -+()ab")
            for _ in range(rng.randrange(1, 40))
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    spark_out = [r.s for r in df.select(scrub_pii("text").alias("s")).collect()]
    con = duckdb.connect()
    for c, got in zip(cases, spark_out):
        s = c
        for _, pattern, tag in PII_PATTERNS:
            s = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [s, pattern, tag]
            ).fetchone()[0]
        assert s == got, repr(c)
