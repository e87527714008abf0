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


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-style token count (JVM regexp, no Python): letter runs,
    digit runs and punctuation as separate tokens — the cheap stand-in
    for a real BPE vocab when sizing pretraining corpora."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))
