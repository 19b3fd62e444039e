"""Text analysis operators: language ID, quality scoring, token
counting, fingerprinting. Pure column expressions (codegen'd, no UDFs) —
each has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textdedup import md5hash56, word_shingles, word_tokens

# tiny per-language stopword sets — a deterministic n-gram/stopword
# heuristic classifier (the spec is the classifier itself, used for
# corpus filtering, not a model)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "y", "los", "que"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break priority

BPE_ISH_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_RE = "[.,;:!?]"


def lang_scores(text: Column) -> dict[str, Column]:
    tokens = word_tokens(text)

    def contains_fn(words: list[str]):
        # closure factory: default-arg lambdas read as (element, index) to PySpark
        return lambda t: F.array_contains(F.array(*[F.lit(w) for w in words]), t)

    return {
        lang: F.size(F.filter(tokens, contains_fn(words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def detect_language(text: Column) -> Column:
    """argmax over stopword-hit counts; 'und' (undetermined) when no
    stopword matches; ties resolved by _LANG_ORDER priority."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(word_tokens(text))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish regex token count: letter runs, digit runs, single
    punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), F.lit(0)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite quality in [0,1]: length saturation, low punctuation
    density, stopword presence (reference-style derived measure — cf. the
    regex-count weight heuristic, course_structures_datasource.py:320-356)."""
    toks = token_count_ws(text).cast("double")
    punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), F.lit(0))).cast("double")
    stop_hits = sum(lang_scores(text).values()).cast("double")
    return F.round(
        0.4 * F.least(F.lit(1.0), toks / 100.0)
        + 0.3 * (1.0 - F.least(F.lit(1.0), punct / F.greatest(n_chars.cast("double"), F.lit(1.0))))
        + 0.3 * F.least(F.lit(1.0), stop_hits / F.greatest(toks, F.lit(1.0)) * 5.0),
        6,
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 64-bit-ish content id = min shingle hash
    (robust to reordering of a few words) — the winnowing-lite variant."""
    sh = word_shingles(text, 3)
    return F.when(F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: md5hash56(s)))).otherwise(
        md5hash56(text)
    )


def text_profile(df: DataFrame, id_col: str, text_col: str, n_chars_col: str) -> DataFrame:
    """One-pass profile: language, token counts, quality, fingerprint."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        detect_language(t).alias("lang_pred"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe_ish(t).alias("n_tokens_bpe"),
        quality_score(t, F.col(n_chars_col)).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
