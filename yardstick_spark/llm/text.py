"""Text-analysis operators: token counting, quality scoring, language
identification, and document fingerprinting.

All scan-only SQL expressions (whole-stage codegen, no Python UDFs, no
shuffle except final aggregations) — the shapes that stay cheap at
100 TB.  Heuristics are deliberately engine-portable so the DuckDB
oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NORM = "regexp_replace(lower(trim({c})), '\\\\s+', ' ')"


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens, a BPE-style pretoken count, and a chars/4
    subword estimate.

    n_bpe_tokens counts GPT-2-style pretokens — maximal runs of
    letters, digits, or other-symbols, each optionally merged with one
    leading space (` ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+`) over the
    normalized text.  That is the pretokenization step every byte-pair
    encoder splits on, so it tracks real tokenizer output far closer
    than a chars/4 estimate (kept as n_subwords for the rule-of-thumb
    comparison).  Scan-only regexp, whole-stage codegen; the pattern is
    RE2-compatible so the DuckDB oracle runs it verbatim."""
    norm = _NORM.format(c=text_col)
    tokens = f"size(filter(split({norm}, ' '), t -> t <> ''))"
    bpe = f"size(regexp_extract_all({norm}, ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+', 0))"
    return docs.select(
        F.col(id_col),
        F.expr(tokens).alias("n_tokens"),
        F.expr(bpe).alias("n_bpe_tokens"),
        F.expr(f"CAST(ceil(length({norm}) / 4.0) AS BIGINT)").alias("n_subwords"),
        F.expr(f"length({norm})").alias("n_chars_norm"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, alpha ratio, punctuation
    ratio, mean word length, all-caps-word share.  A composite score in
    [0,1] combines them with fixed weights."""
    norm = _NORM.format(c=text_col)
    n = f"greatest(length({norm}), 1)"
    alpha = f"length(regexp_replace({norm}, '[^a-z]', ''))"
    punct = f"length(regexp_replace({norm}, '[^.,;:!?]', ''))"
    words = f"filter(split({norm}, ' '), t -> t <> '')"
    n_words = f"greatest(size({words}), 1)"
    mean_wl = f"(aggregate({words}, 0, (a, w) -> a + length(w)) / CAST({n_words} AS DOUBLE))"
    score = (
        f"round(least(1.0D, 0.4 * least(length({norm}) / 500.0, 1.0) "
        f"+ 0.4 * ({alpha} / CAST({n} AS DOUBLE)) "
        f"+ 0.2 * least({punct} / CAST({n_words} AS DOUBLE), 1.0)), 6)"
    )
    return docs.select(
        F.col(id_col),
        F.expr(f"length({norm})").alias("len_norm"),
        F.expr(f"round({alpha} / CAST({n} AS DOUBLE), 6)").alias("alpha_ratio"),
        F.expr(f"round({punct} / CAST({n} AS DOUBLE), 6)").alias("punct_ratio"),
        F.expr(f"round({mean_wl}, 6)").alias("mean_word_len"),
        F.expr(score).alias("quality"),
    )


# tiny per-language stopword inventories for the n-gram/stopword vote
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "und", "ist", "nicht", "das"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "de", "que", "es", "una"],
}


def _marker_hits(norm: str, words: list[str]) -> str:
    padded = f"concat(' ', {norm}, ' ')"
    terms = " + ".join(
        f"(length({padded}) - length(replace({padded}, ' {w} ', ' ')))"
        f" / {len(w) + 1}"
        for w in words
    )
    return f"CAST({terms} AS BIGINT)"


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es}; 'und' (undetermined)
    when no marker hits.  Ties break by language code order via the
    struct-max trick (hits desc, lang asc) — deterministic and portable.
    """
    norm = _NORM.format(c=text_col)
    hit_cols = [
        F.expr(_marker_hits(norm, ws)).alias(f"hits_{lang}")
        for lang, ws in _LANG_MARKERS.items()
    ]
    scored = docs.select(F.col(id_col), F.col(text_col), *hit_cols)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first max in fixed order = deterministic tie-break
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 16) -> DataFrame:
    """Winnowing-style fingerprint: the minimum portable hash over each
    sliding window of word 4-grams, collected as a sorted distinct set.
    Compact representative of the document for containment checks."""
    norm = _NORM.format(c=text_col)
    words = f"filter(split({norm}, ' '), t -> t <> '')"
    grams = (
        f"transform(sequence(1, greatest(1, size({words}) - 3)), "
        f"i -> concat_ws(' ', slice({words}, i, 4)))"
    )
    ghash = (
        f"transform({grams}, g -> "
        f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )
    mins = (
        f"transform(sequence(1, greatest(1, size({ghash}) - {window - 1})), "
        f"i -> array_min(slice({ghash}, i, {window})))"
    )
    return docs.select(
        F.col(id_col),
        F.expr(f"array_sort(array_distinct({mins}))").alias("fingerprint"),
        F.expr(f"md5({norm})").alias("content_hash"),
    )
