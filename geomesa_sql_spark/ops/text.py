"""Text-analysis operators — all JVM-side Column expressions except
language ID (vectorized pandas UDF).

Quality scoring / token counting stay inside whole-stage codegen (no
Python in the hot path); expressions are chosen to be expressible in
ANSI SQL so the DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# word-count / char-count SQL fragments shared with the oracle: a
# single-space-separated corpus (the driver's documents table) makes
# split-on-space exact in both engines.
TOKEN_COUNT_SQL = "length(text) - length(replace(text, ' ', '')) + 1"

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def token_count(text: Column) -> Column:
    """Whitespace token count (JVM, matches TOKEN_COUNT_SQL)."""
    return F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens, avg_token_len, stopword_ratio, quality columns.

    Pure Column arithmetic; the composite ``quality`` in [0, 1] rewards
    mid-length docs with a healthy stopword rate (the usual cheap
    pretraining-quality heuristics).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    out = df.withColumn("n_tokens", n_tok)
    out = out.withColumn(
        "avg_token_len",
        (F.length(t) - (F.col("n_tokens") - 1)) / F.col("n_tokens"),
    )
    # token-membership count (review r3: the old ' w '-replacement
    # trick consumed the shared delimiter space, undercounting
    # consecutive stopwords like 'of the')
    stop_hits = F.size(
        F.filter(
            F.split(t, " "),
            lambda w: w.isin(*[F.lit(x) for x in _STOPWORDS]),
        )
    )
    out = out.withColumn("stopword_ratio", stop_hits / F.col("n_tokens"))
    out = out.withColumn(
        "quality",
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.5,
    )
    return out


_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "fr": ("le", "la", "et", "est"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "y", "es"),
    "zh": ("de", "shi", "zai", "he"),
}


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language ID (n-gram heuristic), vectorized.

    A demonstration operator: real corpora would use char n-gram
    profiles; the mechanism (batch tokenize → vote) is the same.
    Deterministic; ties resolve alphabetically.
    """
    langs = sorted(_LANG_MARKERS)

    @F.pandas_udf(T.StringType())
    def _lid(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = set((text or "").split())
            scores = [
                (sum(1 for w in _LANG_MARKERS[lg] if w in toks), lg) for lg in langs
            ]
            best = max(scores, key=lambda s: (s[0], [-ord(c) for c in s[1]]))
            out.append(best[1])
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _lid(text_col))


# BPE-ish token pattern: letter runs | digit runs | single punctuation.
# ASCII form so Spark (Java regex) and DuckDB (RE2) count identically
# on the synthetic corpus; swap for \p{L}/\p{N} classes on unicode data.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


# PII patterns (Java regex, evaluated JVM-side; lookaround and
# backreferences are used where needed -- these patterns are never
# replayed in an RE2 oracle): ordering matters -- card before phone
# so a 16-digit run is not half-eaten by the phone pattern.
_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    # card-LIKE groupings only (no Luhn -- a redactor prefers false
    # positives to leaks): 13-19 contiguous digits, 4-4-4-4(+1-4)
    # with a CONSISTENT separator (backref), or Amex 4-6-5. The known
    # false positive: four uniformly spaced 4-digit groups -- e.g. the
    # year list "2024 2025 2026 2027" -- is indistinguishable from a
    # spaced card by shape; pass kinds= without 'card' for corpora
    # where that matters. Mixed groupings ("10-20 30-40 50-60 70-80")
    # do NOT match.
    ("card", r"\b(?:\d{13,19}"
             r"|\d{4}([ \-])\d{4}\1\d{4}\1\d{4}(?:\1\d{1,4})?"
             r"|\d{4}([ \-])\d{6}\2\d{5})\b(?![ \-]?\d)", "[CARD]"),
    # octets 0-255 with optional leading zeros ("192.168.001.1");
    # value-constrained so version strings like 1.2.3.400 survive,
    # and guarded both sides so 5-component sequences (1.2.3.4.5 --
    # build/version quads) are not half-eaten
    ("ipv4", r"(?<![.\d])(?:(?:25[0-5]|2[0-4]\d|[01]\d\d|\d\d?)\.){3}"
             r"(?:25[0-5]|2[0-4]\d|[01]\d\d|\d\d?)(?![.\d])", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # phone shapes unambiguous enough to redact: +CC intl, (area)
    # local, or the full xxx-xxx-xxxx triple -- each anchored on BOTH
    # sides so a longer digit run is left whole rather than half-eaten
    # with trailing digits glued to the marker; a bare "123 4567" is
    # NOT matched (ordinary numeric text)
    ("phone",
     r"(?<!\d)\+\d{1,3}[ \-]?\d{1,4}(?:[ \-]\d{2,4}){1,4}(?![ \-]?\d)"
     r"|\(\d{2,4}\)[ \-]?\d{3,4}[ \-]?\d{2,4}(?![ \-]?\d)"
     r"|\b\d{3}[ \-]\d{3}[ \-]\d{4}(?![ \-]?\d)", "[PHONE]"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Redact common PII shapes from a text column — the text twin of
    the image side's ``scrub_exif_images`` and the other standard
    pre-publication step for a crawled corpus. Emails, card-shaped
    digit runs, IPv4 addresses, SSN-shaped triples, and phone-shaped
    numbers are replaced by ``[EMAIL]``/``[CARD]``/``[IP]``/``[SSN]``/
    ``[PHONE]`` markers via chained JVM ``regexp_replace`` — pure
    whole-stage-codegen Columns, no Python in the hot path, NULL text
    passes through NULL. Also adds ``pii_redacted`` (BOOLEAN: did
    anything change). ``kinds`` restricts to a subset of pattern
    names, in the canonical order (card before phone, so a 16-digit
    run is not half-eaten by the phone pattern).

    Shape-based by design: no Luhn/validity checks (a redactor
    prefers false positives over leaks) and no names/addresses (those
    need NER, which would be a model dependency, not an expression).
    """
    out_col = out_col or text_col
    if kinds is not None:
        # a bare string would pass the `in` test per-character and
        # kinds=() would silently disable a PRIVACY function — both
        # fail loudly (r5 review)
        if isinstance(kinds, str):
            raise TypeError(
                "kinds must be a sequence of pattern names, not a "
                f"string — did you mean kinds=({kinds!r},)?"
            )
        unknown = set(kinds) - {name for name, _, _ in _PII_PATTERNS}
        if unknown:
            raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
        if not kinds:
            raise ValueError("kinds must name at least one pattern")
    want = [
        p for p in _PII_PATTERNS if kinds is None or p[0] in kinds
    ]
    col = F.col(text_col)
    for _name, pat, repl in want:
        col = F.regexp_replace(col, pat, repl)
    # the change flag is per-pattern RLIKE over the RAW text, not a
    # second reference to the 5-deep replace chain: Catalyst re-inlines
    # shared Column subtrees (CLAUDE.md), so a downstream filter on
    # pii_redacted would otherwise evaluate every replace twice
    hit = None
    for _name, pat, _repl in want:
        h = F.col(text_col).rlike(pat)
        hit = h if hit is None else (hit | h)
    return df.withColumn(
        "pii_redacted", F.coalesce(hit, F.lit(False))
    ).withColumn(out_col, col)


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-style token count (JVM regexp, no Python): letter runs,
    digit runs and punctuation as separate tokens — the cheap stand-in
    for a real BPE vocab when sizing pretraining corpora."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))
