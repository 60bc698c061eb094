"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All four are pure JVM-side column expressions — no Python UDFs — so they
run inside whole-stage codegen and scale linearly with the scan. Each has
an exact DuckDB-SQL twin in queries.py (the oracle), so every formula here
is written against the portable subset: md5 (identical hex output in
Spark/DuckDB), regexp_extract_all, standard string ops.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas-UDF type hints)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import round6

# Word-ish tokens: runs of alphanumerics, or single non-space punctuation —
# the "BPE-ish regex" split (whitespace alone misses punctuation-glued
# tokens). Portable between Java regex and DuckDB's RE2.
TOKEN_REGEX = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deterministic, SQL-expressible: score(lang) = count of profile words
# present; pick argmax (ties -> lexicographic smallest language code).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish) tokens +
    distinct-token ratio. One projection, no shuffle."""
    text = F.col(text_col)
    toks = F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)
    ws = F.split(F.trim(text), r"\s+")
    return df.select(
        F.col(id_col),
        F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(ws)).alias("n_ws_tokens"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean
    token length, and a composite score — the standard cheap pre-filters a
    corpus pipeline runs before expensive dedup/training steps."""
    text = F.col(text_col)
    toks = F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9_\\s]"), 0))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    mean_tok_len = F.when(n_tokens > 0, F.length(F.concat_ws("", toks)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_tokens > 0, n_punct / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    # composite: long enough, not punctuation soup, has some stopwords
    score = (
        F.least(F.length(text) / F.lit(500.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        round6(punct_ratio).alias("punct_ratio"),
        round6(stop_ratio).alias("stopword_ratio"),
        round6(mean_tok_len).alias("mean_token_len"),
        round6(score).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language ID by stopword-profile voting: per language, count how many
    of its profile words occur as tokens; argmax wins, ties break to the
    lexicographically smallest code, all-zero -> 'und'. Pure expressions —
    the per-language scores become a map + array_max."""
    text = F.col(text_col)
    toks = F.array_distinct(F.transform(
        F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0), lambda t: F.lower(t)
    ))
    scores = []
    for code in sorted(LANG_PROFILES):
        profile = F.array(*[F.lit(w) for w in LANG_PROFILES[code]])
        hits = F.size(F.array_intersect(toks, profile))
        scores.append((code, hits))
    best = F.greatest(*[s for _, s in scores])
    lang = F.lit("und")
    # first (lexicographic) language achieving the max
    for code, s in reversed(scores):
        lang = F.when((best > 0) & (s == best), F.lit(code)).otherwise(lang)
    sel = [F.col(id_col), lang.alias("lang_pred"), best.alias("lang_score")]
    sel += [s.alias(f"score_{c}") for c, s in scores]
    return df.select(*sel)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 16
) -> DataFrame:
    """Document fingerprinting (winnowing-style): the minimum md5 over all
    k-character shingles — a robust content fingerprint that survives
    reordering-free edits; equal fingerprints => near-certain duplicates.
    Expressed as transform(sequence) + array_min, all codegen'd."""
    from ..plans.layout import repartition_for_compute

    text = F.col(text_col)
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(text.substr(i, F.lit(k))))
    df = repartition_for_compute(df)
    return df.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
        F.length(text).alias("n_chars"),
    )


def _normalize_unicode_batch(s: "pd.Series") -> "pd.Series":
    """NFC + lower + RE2-whitespace-collapse, one Arrow batch at a time.

    Two classes are pinned to the DuckDB oracle's EXACT semantics
    (measured, not assumed — tests/test_functions.py):

    * collapse class = RE2's ``\\s`` = ``[ \\t\\n\\f\\r ]``. Python's
      ``\\s`` — even under re.ASCII — additionally matches ``\\x0b``
      (vertical tab), which RE2's does not, so the class is spelled out.
    * strip class = DuckDB ``trim()``'s set = Unicode category Zs
      (space separators: space, NBSP, ogham mark, en/em/thin/… spaces,
      narrow NBSP, math space, ideographic space) — NOT ``\\t``/``\\x0b``
      and NOT every ``str.isspace()`` char, so bare ``str.strip()`` is
      wrong on both sides.

    Either divergence breaks cross-engine hash parity on data-dependent
    input. lower() (not casefold()) for the same reason — it is the
    exact cross-engine-portable case mapping."""
    import re
    import unicodedata

    ws = re.compile(r"[ \t\n\f\r]+")
    zs = (
        " \xa0\u1680"
        + "".join(chr(c) for c in range(0x2000, 0x200B))
        + "\u202f\u205f\u3000"
    )
    return s.map(
        lambda t: None
        if t is None
        else ws.sub(" ", unicodedata.normalize("NFC", t).lower()).strip(zs)
    )


def normalize_unicode(col: Column) -> Column:
    """NFC + lowercase + whitespace-collapse canonicalization as an
    Arrow-batched pandas UDF.

    Unicode normalization is the one text canonicalization step with no
    JVM expression (Spark has no NFC builtin), so this is a justified
    Python hop — same disposition as the PG array parser
    (functions/arrays.py): Arrow batches, never row-at-a-time. At 100 TB
    it is a narrow map riding the scan; everything downstream (hash,
    dedup) stays JVM-side. DuckDB's independent ``nfc_normalize`` +
    ``lower`` is the oracle (ASCII fixture text is a fixed point; the
    non-ASCII behavior is pinned by tests/test_functions.py with
    composed-vs-decomposed fixtures).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    fn = pandas_udf(_normalize_unicode_batch, T.StringType())
    return fn(col)
