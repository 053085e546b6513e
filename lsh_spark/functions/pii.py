"""PII detection and redaction — the standard scrub pass a training-data
pipeline runs before anything else ships (emails, IPv4 addresses,
phone-shaped numbers → typed placeholder tokens).

Everything is JVM-side ``regexp_count`` / ``regexp_replace`` over a
Java-regex/RE2-common pattern subset (no alternation-order or laziness
divergence between Spark and the DuckDB oracle), so the scrub runs at
whole-stage-codegen speed with zero Python in the hot path and scales as
a pure per-row map — no shuffle, no state, embarrassingly parallel at
any corpus size.

Patterns deliberately stay in the common subset: character classes,
bounded repetition, ``\\b`` word boundaries — all identical semantics in
Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# redaction order matters for determinism (documented contract, mirrored
# by the oracle): emails first, then IPs, then phones.  The patterns are
# mutually non-overlapping on any single span (an email never parses as
# an IP or phone and vice versa), so the order never changes WHAT is
# redacted — only the contract needs to be fixed.
_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def email_count(col) -> Column:
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(EMAIL_RE))


def ipv4_count(col) -> Column:
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(IPV4_RE))


def phone_count(col) -> Column:
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(PHONE_RE))


def redact_pii(col) -> Column:
    """Replace every email / IPv4 / phone span with its placeholder
    token (``<EMAIL>`` / ``<IP>`` / ``<PHONE>``), global per pattern."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
