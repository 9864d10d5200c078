"""Text analysis: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All pure column expressions so they
run inside whole-stage codegen at scan time — the cheapest possible
place for per-document features at 100 TB.

Every function is deliberately expressible in ANSI-ish SQL so the
DuckDB oracle can pin it (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword lists for the n-gram language heuristic
_LANGS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
}

EN_STOPWORDS = _LANGS["en"]


def _words(text: Column) -> Column:
    return F.split(F.trim(text), " ")


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (ceil(chars/4),
    the standard rough tokens-per-char heuristic) + char count."""
    words = _words(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.ceil(n_chars / F.lit(4)).cast("long").alias("n_subwords_est"),
    )


def _stopword_count(words: Column, stopwords=EN_STOPWORDS) -> Column:
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Composite quality in [0,1]:
    0.4*min(chars/500,1) + 0.3*(1 - stopword_ratio) +
    0.3*min(mean_word_len/8,1) — rounded to 6 dp for cross-engine
    comparability.
    """
    words = _words(F.col(text_col))
    n_tokens = F.size(words)
    n_chars = F.length(F.col(text_col))
    stop_ratio = _stopword_count(words) / n_tokens
    mean_wlen = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus spaces
    score = (
        F.lit(0.4) * F.least(n_chars / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * F.least(mean_wlen / F.lit(8.0), F.lit(1.0))
    )
    # floor-based 6-dp rounding: bit-identical across engines (see
    # __spark_entry__.round6 — Spark/DuckDB round() disagree on exact
    # .5e-6 boundaries, which ratio-of-small-ints scores hit).
    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return df.select(
        F.col(id_col),
        _r6(score).alias("quality"),
        _r6(stop_ratio).alias("stopword_ratio"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-vote language heuristic; 'und' (undetermined) when no
    list scores >= 2 hits."""
    words = _words(F.lower(F.col(text_col)))
    scores = {lang: _stopword_count(words, sw) for lang, sw in _LANGS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(1)  # need >= 2 hits to claim a language
    # Strict `s > best_score` over iteration order (fr, de, en) means an
    # EARLIER language keeps the crown on ties: fr beats de beats en.
    # This matches the oracle SQL's CASE ordering (en requires
    # > greatest(de, fr), etc.) — do not "fix" to en-first without
    # changing both sides.
    for lang in ("fr", "de", "en"):
        s = scores[lang]
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return df.select(F.col(id_col), best_lang.alias("lang_pred"))


def document_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic 64-bit-hex content fingerprint of the normalized
    text (md5 prefix — stable across engines), plus a shift-resistant
    shingle fingerprint (min xxhash64 over 5-gram shingles: equal for
    docs sharing their minimal shingle, a winnowing-lite rolling
    fingerprint)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 5, F.lit(0)))
    shingle_min = F.array_min(
        F.transform(
            idx, lambda i: F.xxhash64(F.array_join(F.slice(words, i + 1, 5), " "))
        )
    )
    return df.select(
        F.col(id_col),
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
        shingle_min.alias("min_shingle_hash"),
    )
