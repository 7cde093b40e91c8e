"""PII detection and redaction (LLM-pipeline tier): the scrubbing pass
a training corpus runs before anything else ships — emails, phone
numbers, IP addresses, SSN-shaped ids masked to a placeholder token,
with per-kind hit counts for corpus accounting.

Everything is JVM-side ``regexp_replace`` / ``regexp_count`` chains —
one projection over the scan, no Python boundary, composable with the
rest of :mod:`dataworks_spark.llm.pipeline` (run it before
``prepare_corpus`` so dedup hashes see the REDACTED text — two
documents differing only in a masked email are exact duplicates after
scrubbing, which is the behavior a dedup tier wants).

Patterns stay in the conservative regex subset (character classes,
bounded repetition, non-capturing groups, word boundaries) that Java's
regex and RE2-family engines interpret identically, so redaction is
SQL-oracle-checkable. They are heuristic by design — high-precision
shapes, not a validation grammar; a production deployment swaps in its
compliance team's pattern set via the ``patterns`` argument.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ordered — redaction applies in this order, and order matters where
#: shapes overlap (SSN before phone: 123-45-6789 would otherwise be
#: half-eaten by the phone pattern; IP before phone for dotted runs).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    # leading \b sits INSIDE the alternation: a boundary before "(" can
    # never match (neither side is a word char), so the parenthesized
    # branch anchors on the digits instead
    "phone": r"(?:\([0-9]{3}\)[ .-]?|\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\b",
}


def pii_counts(
    text: Column, patterns: dict[str, str] | None = None
) -> dict[str, Column]:
    """Per-kind PII hit counts — corpus-accounting columns (how much
    scrubbing happened per source is a standard dataset-card line)."""
    pats = patterns or PII_PATTERNS
    return {kind: F.regexp_count(text, F.lit(pat)) for kind, pat in pats.items()}


def redact_pii(
    text: Column,
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> Column:
    """Mask every PII match with ``token``. Chained ``regexp_replace``
    in dict order (see PII_PATTERNS note on overlap ordering); each
    link is a JVM builtin, so the whole chain fuses into the scan
    projection under whole-stage codegen."""
    pats = patterns or PII_PATTERNS
    out = text
    for pat in pats.values():
        out = F.regexp_replace(out, pat, token)
    return out
