"""PII redaction for training-data pipelines: emails, IPv4 addresses and
international phone numbers replaced with typed placeholder tags, with
per-document match counts.

Standard pre-training hygiene (C4/RefinedWeb-style pipelines redact or
drop contact information before release; the reference has no equivalent
— this is part of the training-data surface the engine adds, README
scale-design notes).

Pattern discipline: every pattern is written in the common subset of
Java regex (Spark's engine) and RE2 (DuckDB's engine) — no lookarounds,
no backreferences, no alternation whose leftmost-first vs POSIX
semantics could diverge — so the DuckDB oracle replicates the redaction
byte-for-byte. Counts are taken on the PROGRESSIVELY redacted text
(emails first, then IPv4, then phones) so one span is never counted
twice across categories.

Scale shape: pure per-row map (three regexp_count + three
regexp_replace), zero shuffle at any corpus size; at 100 TB this runs
inside the same scan-projection as the rest of the cleaning stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["redact_pii", "EMAIL_PATTERN", "IPV4_PATTERN", "PHONE_PATTERN"]

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# +country-code then 7-15 digits with optional single space/dash
# separators; anchored to digits at both ends
PHONE_PATTERN = r"\+\d[\d -]{6,14}\d"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Replace emails, IPv4 addresses and phone numbers with placeholder
    tags. Output: (id, clean_text, n_emails, n_ipv4, n_phones).

    Order matters and is fixed: emails first (their local parts contain
    digits and dots that the other patterns could claim), then IPv4,
    then phones; each count is measured immediately before its replace
    on the text as redacted so far. NULL text behaves as ''."""
    t0 = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.regexp_count(t0, F.lit(EMAIL_PATTERN))
    t1 = F.regexp_replace(t0, EMAIL_PATTERN, EMAIL_TAG)
    n_ipv4 = F.regexp_count(t1, F.lit(IPV4_PATTERN))
    t2 = F.regexp_replace(t1, IPV4_PATTERN, IPV4_TAG)
    n_phones = F.regexp_count(t2, F.lit(PHONE_PATTERN))
    t3 = F.regexp_replace(t2, PHONE_PATTERN, PHONE_TAG)
    return df.select(
        F.col(id_col).alias("id"),
        t3.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_ipv4.cast("int").alias("n_ipv4"),
        n_phones.cast("int").alias("n_phones"),
    )
