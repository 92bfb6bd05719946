"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure column expressions (JVM-side, codegen'd);
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, BPE-ish subword estimate (4 chars/token rule of
    thumb via a word-character count), char length."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    word_chars = F.length(F.regexp_replace(F.col(text_col), r"[^0-9A-Za-z]", ""))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.ceil(word_chars / 4).cast("long").alias("est_bpe_tokens"),
        F.round(
            F.length(text_col) / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document-quality features + composite score:
    length band, punctuation ratio, stopword ratio.

    Ratios and the score are emitted as half-up-scaled INTEGERS (×10⁴) so the
    result is bit-identical across engines: each is a single correctly-rounded
    float op over exact integers followed by FLOOR(x+0.5). A natural [0,1]
    double view is trivially ``score_e4 / 1e4``."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    toks = F.split(F.trim(txt), r"\s+")
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))

    def half_up(x):
        return F.floor(x + F.lit(0.5)).cast("long")

    punct_e4 = half_up(n_punct * 10000.0 / F.greatest(n_chars, F.lit(1)))
    stop_e4 = half_up(stop_hits * 10000.0 / n_tokens)
    len_component = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score_e4 = half_up(
        (
            0.5 * len_component
            + 0.3 * F.least(stop_e4 / F.lit(2000.0), F.lit(1.0))
            + 0.2 * (1.0 - F.least(punct_e4 / F.lit(1000.0), F.lit(1.0)))
        )
        * 10000
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        punct_e4.alias("punct_ratio_e4"),
        stop_e4.alias("stopword_ratio_e4"),
        score_e4.alias("quality_score_e4"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: count hits per language's marker list over the
    token set; predict the argmax (ties broken by language code order, 'en'
    default when all zero). Deterministic, expressible in ANSI SQL."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")

    def _in_markers(markers):
        # single-arg lambda: a two-arg lambda would receive the element index
        return lambda t: t.isin(*markers)

    hit_cols = {
        lang: F.size(F.filter(toks, _in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.select(F.col(id_col), *[c.alias(f"hits_{k}") for k, c in hit_cols.items()])
    # argmax via chained comparisons in fixed language order (deterministic)
    langs = sorted(LANG_MARKERS)
    best = F.lit("en")
    best_hits = F.lit(0)
    for lang in langs:
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    return out.withColumn("predicted_lang", best).select(id_col, "predicted_lang")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-lite document fingerprint: minimum 60-bit hash over the
    document's word 4-gram shingles (a 1-hash MinHash). Equal fingerprints ⇒
    high shingle overlap candidates. Returns (id, fingerprint)."""
    words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("w"))
    shingles = words.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(w) - 3, 1)), "
                "i -> concat_ws(' ', slice(w, i, 4)))"
            )
        ).alias("sh"),
    )
    hashed = shingles.withColumn(
        "h", F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    )
    return hashed.groupBy(id_col).agg(F.min("h").alias("fingerprint"))
