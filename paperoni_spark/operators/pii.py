"""PII detection / redaction over the documents table.

The production training-data stage between quality filtering and the sink:
find personally-identifying strings (emails, phone numbers, IPv4
addresses), count them per document, and emit a redacted text column with
each occurrence replaced by a typed placeholder.

Scale shape: pure map-side whole-stage-codegen expressions — JVM regex,
no UDF, no shuffle, nothing moves but the projected columns.  At 100 TB
this runs at scan speed and the filter/projection pushes down to parquet.

Engine portability: the patterns restrict themselves to the syntax subset
Java regex (Spark) and RE2 (DuckDB) interpret identically — character
classes, ``\\d``, ``\\b``, bounded repetition; no backrefs, no lookaround.
Counts are measured on the ORIGINAL text per pattern independently (an
IPv4 inside an email host counts for both); redaction applies
sequentially email → phone → IP, so the single-pass counts and the
sequentially-redacted output stay deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TAG = "<EMAIL>"
PHONE_TAG = "<PHONE>"
IP_TAG = "<IP>"


def _count(col, pattern: str):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_redact(documents: DataFrame) -> DataFrame:
    """Per-document PII counts + redacted text.  One projection, zero
    shuffles; every expression is built-in (codegen'd JVM regex)."""
    text = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, EMAIL_TAG), PHONE_RE, PHONE_TAG
        ),
        IP_RE,
        IP_TAG,
    )
    n_emails = _count(text, EMAIL_RE)
    n_phones = _count(text, PHONE_RE)
    n_ips = _count(text, IP_RE)
    return documents.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
        redacted.alias("text_redacted"),
    )
