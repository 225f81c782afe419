"""PII detection / redaction Column functions (engine extension; charter:
"operations a large-scale training-data pipeline would need").

The standard pretraining-curation stage the reference has nothing like
(its pandas layer never handles free text at corpus scale): count and
scrub emails, NANP-style phone numbers, and IPv4 addresses before text
ships to a training mix. Everything here is a pure ``Column`` expression
(`regexp_count` / `regexp_replace` — JVM regex, whole-stage codegen, no
Python in the hot path), so detection rides the same scan as the
profile/quality gates: zero extra passes over a 100 TB corpus.

Pattern philosophy: CONSERVATIVE. These are java.util.regex patterns
tuned for low false-positive rates on prose (version strings, decimals,
and citation spans must not be eaten) — recall on exotic formats
(obfuscated emails, international phone layouts) is explicitly out of
scope and documented per-pattern. At 100 TB a false positive deletes
real training signal; a rare false negative is caught by the next
pipeline (this mirrors the public Dolma/FineWeb posture).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-5322-lite: user@host.tld with a 2+ alpha TLD. Won't match bare
# hosts, `user@localhost`, or spaced-out obfuscations ("a at b dot com").
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"

# NANP-shaped phones: optional +1 / 1 prefix, (555) 123-4567 or
# 555-123-4567 / 555.123.4567; separators required so 7-10 digit runs in
# IDs, years, or prices don't match. International formats out of scope.
PHONE_PATTERN = (
    r"(?<![\d\-])(?:\+?1[ .\-])?(?:\(\d{3}\)[ .\-]?|\d{3}[.\-])"
    r"\d{3}[.\-]\d{4}(?![\d\-])"
)

# Dotted-quad with per-octet range check and digit/dot guards so
# "1.2.3.4.5" and version strings like "10.1.2.3000" don't match.
IPV4_PATTERN = (
    r"(?<![\d.])(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?![\d.])"
)

_KINDS = {
    "email": EMAIL_PATTERN,
    "phone": PHONE_PATTERN,
    "ipv4": IPV4_PATTERN,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind ('email' | 'phone' | 'ipv4') — one
    JVM `regexp_count`, scan-side."""
    return F.regexp_count(_c(col), F.lit(_KINDS[kind]))


def pii_counts(col: Column | str) -> Column:
    """Struct of per-kind counts plus the total — attach once next to the
    other profile columns and every downstream gate reads it for free."""
    c = _c(col)
    counts = [
        F.regexp_count(c, F.lit(p)).alias(f"n_{k}") for k, p in _KINDS.items()
    ]
    total = sum(
        (F.regexp_count(c, F.lit(p)) for p in _KINDS.values()), F.lit(0)
    )
    return F.struct(*counts, total.alias("n_total"))


def redact_pii(
    col: Column | str,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    token: str = "<PII_{kind}>",
) -> Column:
    """Replace every match with ``token`` (``{kind}`` interpolates to the
    pattern name, so downstream token accounting can distinguish them).
    Chained `regexp_replace` — still one projection, and idempotent: the
    replacement tokens themselves match none of the patterns."""
    out = _c(col)
    for k in kinds:
        out = F.regexp_replace(
            out, _KINDS[k], token.replace("{kind}", k.upper())
        )
    return out
