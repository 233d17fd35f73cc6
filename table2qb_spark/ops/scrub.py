"""PII scrubbing — regex redaction of emails / IPv4 addresses / phone-like
numbers, the standard pre-training hygiene pass.

One Catalyst projection per document (regexp_replace + regexp_extract_all
counts), zero shuffle, zero Python — the scrub rides the same corpus scan
as every other per-row gate. Patterns are RE2-compatible (no lookaround or
backreferences) so the DuckDB oracle applies the IDENTICAL expressions;
a real deployment swaps in its compliance-approved pattern set (or an NER
model behind mapInPandas) without changing the plumbing.

Redaction replaces each match with a typed placeholder token
(``<EMAIL>``/``<IP>``/``<PHONE>``) — the convention that keeps the text
trainable while making leakage grep-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails before phones (an email's digits must not be
# phone-matched after the @-part is gone), IPs before phones likewise
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]?\d{3,4}[- ]?\d{3,6}", "<PHONE>"),
]


def scrub_exprs(c: Column) -> tuple[Column, list[Column]]:
    """(redacted text, [per-kind match counts]) for one text column."""
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    red = c
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return red, counts


def scrub_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted text, n_email, n_ip, n_phone) — counts are of matches
    in the ORIGINAL text (audit trail for the redaction)."""
    red, counts = scrub_exprs(F.col(text_col))
    return df.select(F.col(id_col), red.alias(text_col), *counts)
