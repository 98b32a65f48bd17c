"""PII detection + redaction over the documents/pages table.

Training-data pipelines (C4, FineWeb, RefinedWeb) strip personally
identifiable information before release. Here the stage is zero-UDF JVM
regexp work — `regexp_extract_all` for counts, chained `regexp_replace`
for redaction — so it rides whole-stage codegen and never leaves the JVM.

Pattern dialect: every pattern is written in the COMMON SUBSET of Java
regex (Spark) and RE2 (DuckDB, the oracle engine) — character classes,
bounded repetition, alternation, `\b` word boundaries; NO lookaround or
backreferences (RE2 has neither). Patterns are deliberately conservative
(precision over recall): a false positive deletes real text from the
corpus forever, while a false negative is caught by the next pipeline
stage or a later audit.

Redaction order is fixed (email → ip → phone) and sequential, so output
text is deterministic; emails run first because an address can embed
digit runs a phone pattern could claim.

100 TB shape: embarrassingly parallel map — no shuffle, no state; the
scan should prune to (id, text) only. Counts aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC-5322-lite local part; TLD >= 2 alpha. \b keeps 'x@y.zz' out of
# 'ax@y.zzq' mid-token matches on the left; right edge bounded by class.
EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}\b"

# Dotted-quad with per-octet range check (0-255) — plain \d{1,3} would
# redact version strings like 999.999.999.999.
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCT}(\.{_OCT}){{3}}\b"

# International numbers only (+CC ...): E.164 allows 15 digits, and
# formatting chars (spaces, parens, dashes) inflate the span, so the
# middle run is capped at 20. Domestic formats are too ambiguous
# (dates, ids) for an irreversible rewrite.
PHONE_RE = r"\+[1-9][0-9 ()-]{6,20}[0-9]"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}

REDACTIONS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_count_cols(text_c: Column) -> dict[str, Column]:
    """{kind: count column} — number of matches per document, JVM-side."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text_c, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii_col(text_c: Column) -> Column:
    """Text with every PII span replaced by its typed placeholder.

    Fixed order email → ipv4 → phone (see module docstring)."""
    out = text_c
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTIONS[kind])
    return out


def with_pii(df: DataFrame, text_col: str = "text",
             redacted_col: str = "text_redacted") -> DataFrame:
    """Adds n_email / n_ipv4 / n_phone, has_pii, and the redacted text."""
    t = F.col(text_col)
    counts = pii_count_cols(t)
    out = df
    for name, c in counts.items():
        out = out.withColumn(name, c.cast("long"))
    total = sum((F.col(n) for n in counts), F.lit(0))
    return (
        out.withColumn("has_pii", total > 0)
        .withColumn(redacted_col, redact_pii_col(t))
    )


def filter_pii_heavy(df: DataFrame, max_hits: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Drop documents with more than `max_hits` PII matches — pages that
    are effectively contact directories; redaction would gut them anyway."""
    t = F.col(text_col)
    total = sum(pii_count_cols(t).values(), F.lit(0))
    return df.where(total <= max_hits)
