"""Text kernels: hashtags (reference parity), entity extraction, language ID,
quality scoring, token counting, fingerprints.

Hot paths have two implementations:
- a Spark Column expression builder (JVM-side, whole-stage-codegen friendly),
  used by the operators — zero Python;
- a plain-Python/NumPy twin used by pytest goldens and by oracle validation.

Hashtag semantics are parity with the reference
(`/root/reference/osm-changesets/src/main/java/org/heigit/ohsome/osm/
changesets/ChangesetHashtags.java:19-34`): concat of tags
`hashtags`+`comment`, strip `http\\S*`, match `#[^ ...separators]+`, drop
the leading '#', keep length ≥ 2 and non-pure-numeric, distinct, sorted.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java: #[^ -⁯⸀-⹿\v\h\\'!"#$%()*,./:;<=>?@\[\]^`{|}~]+
# \h (horizontal ws) ≈ [ \t  ᠎ -   　]
# \v (vertical ws)  ≈ [\n\x0B\f\r\x85  ]
_HASHTAG_EXCL = (
    "\\u2000-\\u206F\\u2E00-\\u2E7F"
    "\\n\\x0B\\f\\r\\x85\\u2028\\u2029"
    " \\t\\u00A0\\u1680\\u180E\\u202F\\u205F\\u3000"
    "\\\\'!\"#$%()*,./:;<=>?@\\[\\]^`{|}~"
)
HASHTAG_RE = re.compile(f"#[^{_HASHTAG_EXCL}]+")
_URL_RE = re.compile(r"http\S*")
_DIGITS_RE = re.compile(r"^\d+$")


def hashtags_py(hashtags_field: str | None, comment_field: str | None) -> list[str]:
    """Reference-parity hashtag extraction (ChangesetHashtags.hashTags)."""
    out = []
    for field in (hashtags_field, comment_field):
        if field is None:
            continue
        cleaned = _URL_RE.sub("", field)
        for m in HASHTAG_RE.finditer(cleaned):
            tag = m.group(0)[1:]
            if len(tag) >= 2 and not _DIGITS_RE.match(tag):
                out.append(tag)
    # distinct preserving nothing — reference sorts after distinct
    return sorted(set(out))


def hashtags_col(hashtags_c: Column, comment_c: Column) -> Column:
    """JVM-side equivalent of hashtags_py over two string columns.

    The len≥2 and not-all-digits rules are folded INTO the extraction
    regex (quantifier + a negative lookahead for a digit run ending at an
    excluded char or end-of-string), so no interpreted higher-order
    transform/filter runs per tag — the whole extraction stays in
    whole-stage codegen; only the native array_distinct/array_sort
    expressions follow. Property-tested equal to hashtags_py."""
    pat = f"#(?!\\d+(?:[{_HASHTAG_EXCL}]|$))([^{_HASHTAG_EXCL}]{{2,}})"

    def extract(c: Column) -> Column:
        cleaned = F.regexp_replace(F.coalesce(c, F.lit("")), r"http\S*", "")
        return F.regexp_extract_all(cleaned, F.lit(pat), 1)

    tags = F.concat(extract(hashtags_c), extract(comment_c))
    return F.array_sort(F.array_distinct(tags))


# ---------------------------------------------------------------------------
# Entity mentions: the pages generator embeds "@@Entity_Name@@" markers; the
# extractor is a plain regexp — JVM-side in the pipeline.
# ---------------------------------------------------------------------------

ENTITY_MARK_RE = r"@@([A-Za-z0-9_]+)@@"


def extract_entities_col(text_c: Column) -> Column:
    """array<string> of entity names mentioned in a page's text (JVM regexp)."""
    return F.regexp_extract_all(text_c, F.lit(ENTITY_MARK_RE), 1)


def extract_entities_py(text: str) -> list[str]:
    return re.findall(ENTITY_MARK_RE, text)


# ---------------------------------------------------------------------------
# Language ID: character-class n-gram heuristic (deterministic, SQL-mappable)
# ---------------------------------------------------------------------------

_LANG_MARKERS: list[tuple[str, str]] = [
    # (lang, distinctive marker); first match wins, default 'en'
    ("zh", "[一-鿿]"),
    ("ru", "[Ѐ-ӿ]"),
    ("de", "[äöüß]"),
    ("fr", "[àâçèéêëîïôùûœ]"),
    ("es", "[áéíñóúü¿¡]"),
]


def lang_id_col(text_c: Column) -> Column:
    """Marker-class language guess as a Column expression (JVM-side)."""
    expr = F.lit("en")
    for lang, pattern in reversed(_LANG_MARKERS):
        expr = F.when(text_c.rlike(pattern), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_py(text: str) -> str:
    for lang, pattern in _LANG_MARKERS:
        if re.search(pattern, text):
            return lang
    return "en"


# ---------------------------------------------------------------------------
# Quality scoring / token counting — JVM-side columns
# ---------------------------------------------------------------------------


def token_count_col(text_c: Column) -> Column:
    """Whitespace token count (0 for empty strings) — pure JVM."""
    trimmed = F.trim(text_c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-ish pre-tokenizer classes: letter runs, single digits, punctuation
# singles. Deliberately restricted to a regex subset with identical
# semantics in Java regex (Spark) and RE2 (DuckDB), so the count is
# cross-engine oracle-able.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_bpe_col(text_c: Column) -> Column:
    """BPE-style token-count estimate (pre-tokenizer classes) — pure JVM.

    A whitespace count underestimates LLM token usage badly on punctuated
    or numeric text; counting pre-tokenizer matches tracks real BPE token
    counts within a constant factor, which is what corpus budgeting needs.
    """
    return F.size(F.regexp_extract_all(text_c, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def quality_cols(text_c: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio quality features."""
    length = F.length(text_c)
    non_punct = F.length(F.regexp_replace(text_c, r"[^\w\s]", ""))
    punct_ratio = F.when(length > 0, (length - non_punct) / length).otherwise(F.lit(0.0))
    tokens = token_count_col(text_c)
    stop = F.size(
        F.filter(
            F.split(F.lower(text_c), r"\s+"),
            lambda t: t.isin("the", "a", "an", "and", "or", "of", "to", "in", "is"),
        )
    )
    stop_ratio = F.when(tokens > 0, stop.cast("double") / tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": length,
        "n_tokens": tokens,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
    }


def line_quality_cols(text_c: Column) -> dict[str, Column]:
    """Line-level repetition/format signals (the Gopher/MassiveText rule
    family): fraction of duplicate lines, of bullet-point lines, and of
    lines ending in an ellipsis — all over non-empty trimmed lines, all
    pure JVM array expressions."""
    lines = F.filter(
        F.transform(F.split(text_c, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    dup = F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0))
    bullet = F.when(
        n > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]"))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    ellipsis = F.when(
        n > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    return {
        "n_lines": n,
        "dup_line_fraction": dup,
        "bullet_line_fraction": bullet,
        "ellipsis_line_fraction": ellipsis,
    }


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


def doc_fingerprint_py(text: str, window: int = 64) -> int:
    """Winnowing-style fingerprint: min FNV hash over rolling byte windows."""
    data = text.encode("utf-8")
    if len(data) <= window:
        return fnv1a_64(data)
    best = None
    step = max(1, window // 4)
    for i in range(0, len(data) - window + 1, step):
        h = fnv1a_64(data[i : i + window])
        if best is None or h < best:
            best = h
    return best


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
