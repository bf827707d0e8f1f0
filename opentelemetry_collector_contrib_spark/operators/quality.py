"""Document quality signals for training-data curation.

Implements the published Gopher / MassiveText rule family (Rae et al. 2021,
table A1) and the RefinedWeb-style repetition measures (Penedo et al. 2023
§3; themselves from Rae et al. appendix) over the ``documents`` table —
pure Column expressions where a per-doc pass suffices, an explode+hash-agg
where per-gram counting is needed (shuffle keyed by 8-byte gram hashes, the
same slim-key discipline as the dedup family; scales like a word count).

These are the filters a 100 TB curation run applies BEFORE dedup — cheap,
embarrassingly parallel, no joins except the per-gram count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Gopher uses "must contain ≥2 of a small English stopword set"
STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Gopher rule inputs + the combined ``gopher_pass`` verdict.

    Columns added (thresholds from Rae et al. 2021 table A1):
    n_words (50..100_000), mean_word_len (3..10), symbol_word_ratio (<0.1,
    symbols = ``# …``), frac_alpha_words (≥0.8 words contain ≥1 alphabetic
    char), n_stop_words (≥2 distinct hits from the stopword set).
    """
    # materialize the word array and padded-lowercase text once per row —
    # inlined, the split runs once per consumer (3×) and the concat+lower
    # once per stopword probe (8×); interpreted expressions get no CSE
    df = df.withColumn("_gq_words", F.split(F.trim(F.col(text_col)), r"\s+"))
    df = df.withColumn(
        "_gq_lw", F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    )
    words = F.col("_gq_words")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    symbols = F.size(F.regexp_extract_all(text_col, F.lit(r"#|\.\.\.|…"), 0))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    lw = F.col("_gq_lw")
    n_stop = sum(
        F.when(lw.contains(f" {s} "), 1).otherwise(0) for s in STOP_WORDS
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.round(total_chars / F.greatest(n_words, F.lit(1)), 4),
        )
        .withColumn(
            "symbol_word_ratio",
            F.round(symbols / F.greatest(n_words, F.lit(1)), 4),
        )
        .withColumn(
            "frac_alpha_words",
            F.round(alpha_words / F.greatest(n_words, F.lit(1)), 4),
        )
        .withColumn("n_stop_words", n_stop.cast("int"))
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stop_words") >= 2),
    ).drop("_gq_words", "_gq_lw")


def top_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """(id_col, n_words, top_ngram_count, top_ngram_frac): fraction of words
    covered by the single most frequent word n-gram — the Gopher/RefinedWeb
    "top n-gram character fraction" repetition measure in word form.

    Shape: per-doc word-hash n-gram windows (WITH duplicates — counting is
    the point, unlike the dedup family's distinct sets) → explode_outer (see
    dedup.py: plain explode re-inlines the HOF tree into an inferred scan
    filter) → count per (id, gram) → max per id. Two hash-aggs on slim
    keys; no text in any shuffle.
    """
    k = n
    df = df.filter(F.col(text_col).isNotNull())
    wh = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.xxhash64(w)
    )
    d = df.select(F.col(id_col).alias("id"), wh.alias("_wh"))
    nw = F.size("_wh")
    idx = F.sequence(F.lit(0), F.greatest(nw - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.xxhash64(*[F.get(F.col("_wh"), i + j) for j in range(k)])
    )
    ex = d.select(
        "id", F.size("_wh").alias("n_words"), grams.alias("_g")
    ).select("id", "n_words", F.explode_outer("_g").alias("gram"))
    per_gram = ex.groupBy("id", "n_words", "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_gram.groupBy("id", "n_words")
        .agg(F.max("_c").alias("top_ngram_count"))
        .withColumn(
            "top_ngram_frac",
            F.round(
                F.least(
                    F.col("top_ngram_count") * k / F.greatest(F.col("n_words"), F.lit(1)),
                    F.lit(1.0),
                ),
                4,
            ),
        )
        .withColumnRenamed("id", id_col)
    )


def duplicate_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id_col, n_words, dup_ngram_frac): fraction of n-gram windows that
    are duplicates of an earlier identical window in the SAME doc — the
    Gopher "fraction of words in duplicated n-grams" family (word form).

    Window count minus distinct count, over the window total. Same
    explode + hash-agg shape as ``top_ngram_fraction``.
    """
    k = n
    df = df.filter(F.col(text_col).isNotNull())
    wh = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.xxhash64(w)
    )
    d = df.select(F.col(id_col).alias("id"), wh.alias("_wh"))
    nw = F.size("_wh")
    idx = F.sequence(F.lit(0), F.greatest(nw - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.xxhash64(*[F.get(F.col("_wh"), i + j) for j in range(k)])
    )
    ex = d.select(
        "id", F.size("_wh").alias("n_words"), grams.alias("_g")
    ).select("id", "n_words", F.explode_outer("_g").alias("gram"))
    return (
        ex.groupBy("id", "n_words")
        .agg(
            F.count(F.lit(1)).alias("_total"),
            F.count_distinct("gram").alias("_distinct"),
        )
        .withColumn(
            "dup_ngram_frac",
            F.round((F.col("_total") - F.col("_distinct")) / F.col("_total"), 4),
        )
        .drop("_total", "_distinct")
        .withColumnRenamed("id", id_col)
    )


# ------------------------------------------------------------ language ID

#: Stopword profiles for the classifier — the highest-frequency function
#: words of each language (public knowledge; any frequency list gives the
#: same top words). Kept deliberately small: 15 words/language suffices for
#: document-level ID because function words dominate running text.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "you", "that", "it", "was",
           "for", "on", "are", "with", "as"],
    "fr": ["le", "la", "les", "de", "des", "du", "et", "en", "un", "une",
           "est", "que", "pour", "dans", "qui"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "dem",
           "ein", "eine", "nicht", "auf", "sich", "auch"],
    "es": ["el", "los", "las", "de", "y", "en", "un", "una", "es", "que",
           "por", "con", "para", "del", "se"],
    "it": ["il", "lo", "gli", "di", "che", "per", "con", "del", "sono",
           "non", "si", "come", "nella", "sul", "alla"],
}

#: tie-break priority (first wins) — matched exactly by the DuckDB oracle's
#: CASE chain in plans/catalog.py
LANG_ORDER = ["en", "fr", "de", "es", "it"]


def lang_scores(text_col, langs: list[str] | None = None):
    """Per-language stopword hit counts as a dict of Column (token-level:
    a word counts once per occurrence). Pure Column HOFs — JVM-side,
    embarrassingly parallel, no shuffle; the 100 TB cost is one pass."""
    langs = langs or LANG_ORDER
    words = F.split(F.lower(text_col), r"\s+")
    out = {}
    for lang in langs:
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out[lang] = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return out


def _lang_argmax_chain(scores: dict, langs: list[str]):
    """argmax when-chain over per-language score COLUMNS (ties resolve by
    ``langs`` position; ``und`` when nothing hits) — shared by the inline
    and frame forms."""
    pred = F.lit("und")
    chain = F.when(sum(scores[l] for l in langs) == 0, F.lit("und"))
    for lang in langs:
        others = [scores[o] for o in langs if o != lang]
        cond = scores[lang] > F.lit(0)
        for o in others:
            cond = cond & (scores[lang] >= o)
        chain = chain.when(cond, F.lit(lang))
    return chain.otherwise(pred)


def lang_id(text_col, langs: list[str] | None = None):
    """Predicted language: argmax of stopword-profile scores, ``und`` when
    no profile hits. Ties resolve by LANG_ORDER position (deterministic,
    mirrored by the oracle SQL). A char-trigram model would be the next
    fidelity step; stopword profiles already separate en/fr/de/es/it
    reliably at document length (each profile is near-disjoint in its
    distinctive function words: the/und/les/los/gli...).

    NB: as a single inline Column, each score subtree is referenced ~7×
    by the argmax chain and interpreted HOFs do no CSE — fine for tests
    and small frames; the hot path is ``lang_id_frame`` (scores
    materialized once per row)."""
    langs = langs or LANG_ORDER
    return _lang_argmax_chain(lang_scores(text_col, langs), langs)


def lang_id_frame(
    df: DataFrame,
    text_col: str = "text",
    out: str = "lang_pred",
    langs: list[str] | None = None,
) -> DataFrame:
    """``lang_id`` as a frame stage with each building block materialized
    exactly once per row: the word array is one real column (one
    split/lower pass instead of one per language), each per-language score
    is one real column (one filter pass instead of ~7 under the argmax
    chain — interpreted HOF lambdas get no CSE, and CollapseProject keeps
    non-cheap multi-referenced projections separate). Same output as
    ``lang_id``; measured ~10× less expression work per row (31
    size(filter(split(…))) evaluations → 5 + 1 split)."""
    langs = langs or LANG_ORDER
    words_col = f"_langid_words_{text_col}"
    df = df.withColumn(words_col, F.split(F.lower(F.col(text_col)), r"\s+"))
    score_cols = {}
    for lang in langs:
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        score_cols[lang] = f"_langid_s_{lang}"
        df = df.withColumn(
            score_cols[lang],
            F.size(F.filter(F.col(words_col), lambda w: F.array_contains(sw, w))),
        )
    scores = {lang: F.col(score_cols[lang]) for lang in langs}
    df = df.withColumn(out, _lang_argmax_chain(scores, langs))
    return df.drop(words_col, *score_cols.values())
