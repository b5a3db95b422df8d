"""Text scrubbing — regex redaction of obvious PII-shaped spans
(emails, IPv4 addresses, long digit runs), the standard pre-training
hygiene pass.

Pure ``regexp_replace`` chains: scan-stage Column work, zero shuffle,
streams as-is (same argument as functions/textstats.quality_gate). The
patterns use only the regex subset with identical semantics in Java
regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
``\\b`` — so the scrub is engine-portable and oracle-checkable; parity
is pinned in tests/test_scrub.py against DuckDB on adversarial
literals. NOT a compliance tool: recall-oriented pattern scrubbing
(the published pipelines' shape), not NER.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (an address contains digit runs a later pattern
# would shred), then IPs (dotted digit runs), then generic long digit
# runs (phone/account/SSN-shaped). Each tag is a single token so token
# counts stay sane downstream.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("digits", r"\b[0-9][0-9 ().+-]{6,}[0-9]\b", "<NUMBER>"),
)


def scrub_pii(text: Column | str) -> Column:
    """Redact PII-shaped spans, replacing each with its tag."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, tag in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, tag)
    return col


def pii_span_count(text: Column | str) -> Column:
    """How many PII-shaped spans the scrub would redact (long) — the
    monitoring number: a corpus slice whose count jumps needs a human
    before it ships."""
    col = F.col(text) if isinstance(text, str) else text
    total = F.lit(0).cast("long")
    for _, pattern, _ in PII_PATTERNS:
        total = total + F.regexp_count(scrubbed_upstream(col, pattern), F.lit(pattern))
    return total


def scrubbed_upstream(col: Column, pattern: str) -> Column:
    """The column as the given pattern sees it: with every EARLIER
    pattern already redacted (counting must mirror the replace chain,
    or an email's digits get double-counted by the digit-run rule)."""
    for _, p, tag in PII_PATTERNS:
        if p == pattern:
            return col
        col = F.regexp_replace(col, p, tag)
    return col
