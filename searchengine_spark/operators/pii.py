"""PII detection + redaction for training-data curation.

The standard pre-training hygiene pass (C4 / Dolma style): detect
emails, phone numbers, and IPv4 addresses with anchored regexes and
replace them with typed placeholder tokens, keeping per-doc match
counts for audit dashboards. The reference corpus pipeline has no
analog (closest: the POS stop-filter, services/LemmaService.java) —
this belongs to the "operations a large-scale training-data pipeline
needs" family alongside dedup/decontaminate/repetition.

Cross-engine determinism: the three patterns use only syntax with
identical semantics in Java regex (Spark) and RE2 (DuckDB oracle) —
character classes, bounded repetition, and ASCII ``\\b`` word
boundaries (both engines define ``\\w`` as ``[A-Za-z0-9_]`` here, so
digits adjacent to Cyrillic letters boundary identically). No
lookaround, no backreferences. Redaction applies EMAIL → IPV4 → PHONE
in that order on both sides, so a pattern can never match inside an
earlier placeholder (e.g. an IPv4-shaped email domain is consumed by
the email pass first).

Scale notes: one narrow map-only projection — no shuffle, no UDF; at
100 TB this runs at scan speed inside whole-stage codegen and column
pruning keeps untouched columns out of I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters (see module docstring); each entry: (name, pattern,
# placeholder). Patterns are Java/RE2-common — see determinism note.
# IPv4 octets are range-checked (0–255, leading zeros tolerated as in
# C4-style scrubbers) so 999.999.999.999 is NOT redacted; phone
# separators must be consistent (explicit two-form alternation —
# backreferences would break RE2) so "555-123 4567" is NOT redacted.
_OCT = r"(?:25[0-5]|2[0-4]\d|1?\d?\d)"
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = rf"\b{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}\b"
PII_PHONE = r"\b(?:\d{3}-\d{3}-\d{4}|\d{3} \d{3} \d{4})\b"

PII_RULES = [
    ("email", PII_EMAIL, "<EMAIL>"),
    ("ipv4", PII_IPV4, "<IP>"),
    ("phone", PII_PHONE, "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4s, n_phones, clean_text): per-doc match
    counts for each PII class plus the redacted text with typed
    placeholders. Counts are taken on the SAME intermediate string the
    corresponding replace pass sees (post prior-rule redaction), so
    counts and redactions always agree."""
    cur = F.col(text)
    counts = []
    for name, pattern, token in PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}s")
        )
        cur = F.regexp_replace(cur, pattern, token)
    return docs.select("doc_id", *counts, cur.alias("clean_text"))
