"""Corpus-level text statistics for the training-data pipeline
(BASELINE.json north_star): repetition quality, TF-IDF weighting, and
benchmark-contamination measurement.

All three are explode → groupBy compositions over the builtin tokenizer in
:mod:`..functions.text` — the scalable shape for corpus statistics: words
land on the shuffle as (doc, word) pairs with map-side combine, never as
per-document Python objects. No UDFs anywhere.

At 100 TB: each operator is 1-2 shuffles keyed on (doc_id[, word]) or the
n-gram; word keys follow a Zipf distribution, so the document-frequency
aggregations rely on partial aggregation to tame the head (Spark does this
automatically for groupBy count); nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams


def _doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) pairs — one row per token occurrence."""
    return df.select(id_col, F.explode(tokens(text_col)).alias("word"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition signals, per document:

    - ``n_words``: total tokens
    - ``n_distinct``: distinct tokens
    - ``dup_word_frac``: fraction of token occurrences that are repeats
      (1 - distinct/total) — high for boilerplate / keyword-stuffed docs
    - ``top_word_frac``: share of the single most frequent token — high for
      degenerate repetition

    Both ratios are rounded to 6 dp: they are float-path values whose
    double→text rendering is representation-sensitive across engines
    (driver hash proved it round 2 — q86 was the one red row), so they
    follow the repo's round6 convention for float-path aggregates.
    """
    per_word = (
        _doc_words(df, id_col, text_col)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_word.groupBy(id_col).agg(
        F.sum("n").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("n"), 6).alias(
            "dup_word_frac"
        ),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_word_frac"),
    )


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tf: int = 1,
) -> DataFrame:
    """Smoothed TF-IDF weights, one row per (document, distinct word):
    ``tf`` = in-document count, ``df`` = number of documents containing the
    word, ``tfidf`` = tf · (ln((1+N)/(1+df)) + 1) — the sklearn
    ``TfidfTransformer(smooth_idf=True, sublinear_tf=False)`` convention.

    Two shuffles: (doc, word) counts, then a word-keyed document-frequency
    join. The DF side aggregates to |vocabulary| rows, so Spark broadcasts
    it in any realistic corpus; ``tfidf`` is rounded to 6 places (float
    path: ``ln``).
    """
    tf = (
        _doc_words(df, id_col, text_col)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return (
        tf.join(dfreq, "word")
        .select(
            id_col,
            "word",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def ngram_contamination(
    probe: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: for every probe document, the fraction
    of its DISTINCT word ``n``-grams that appear anywhere in ``corpus``
    (the standard n-gram-overlap decontamination measure for training-data
    vs eval-set leakage).

    Shape: probe grams exploded+distinct (one shuffle), corpus grams
    distinct to a gram set (one shuffle), left-semi-style join on the gram
    string, ratio per probe doc. The corpus side reduces to |distinct
    grams| before the join — at 100 TB hash the gram to a 64-bit key
    (xxhash64) instead of joining on the raw string to cut shuffle bytes;
    kept as the string here so the oracle can reproduce it.

    Returns (id, n_grams, n_matched, contamination_frac); probe docs shorter
    than ``n`` tokens have n_grams=0 and a null fraction.
    """
    pg = probe.select(
        id_col, F.explode_outer(word_ngrams(text_col, n)).alias("gram")
    ).distinct()
    cg = corpus.select(F.explode(word_ngrams(text_col, n)).alias("gram")).distinct()
    marked = pg.join(
        cg.withColumn("__hit", F.lit(1)), "gram", "left"
    )
    return marked.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count("__hit").alias("n_matched"),
        # try_divide: zero-gram docs (shorter than n tokens) get null, not an
        # ANSI divide-by-zero error
        F.try_divide(F.count("__hit"), F.count("gram")).alias("contamination_frac"),
    )


def gopher_quality_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_word_frac: float = 0.6,
) -> DataFrame:
    """Gopher-style document-quality rule report (Rae et al. 2021 §A1.1,
    thresholds scaled to the synthetic corpus): per document, the raw
    signals each rule reads plus the combined verdict —

    - ``n_words``: token count (rule: within [min_words, max_words])
    - ``mean_word_len``: average token length over occurrences, round6
      (rule: within [min_mean_word_len, max_mean_word_len])
    - ``dup_word_frac``: repeated-token share, round6
      (rule: ≤ max_dup_word_frac)
    - ``passes``: conjunction of the three rules

    One explode → one groupBy(id) with count / count-distinct / sum(len)
    aggregates, left-joined back onto the document ids — a single shuffle
    keyed by doc id, everything builtin. Zero-token documents (empty or
    whitespace-only) are REPORTED, not silently dropped: n_words 0,
    null length/repetition signals, ``passes`` false (they fail the
    min-words rule — exactly the documents the rule exists to reject, so
    omitting them would corrupt any pass-rate computed from the report).
    At 100 TB this is the cheap first-pass filter a curation funnel runs
    before any pairwise dedup.
    """
    words = _doc_words(df, id_col, text_col)
    agg = words.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__nw"),
        F.countDistinct("word").alias("n_distinct"),
        F.sum(F.length("word")).alias("sum_len"),
    )
    joined = df.select(id_col).join(agg, id_col, "left")
    n_words = F.coalesce(F.col("__nw"), F.lit(0))
    mean_len = F.round(F.col("sum_len") / n_words, 6)
    dup_frac = F.round(
        F.lit(1.0) - F.col("n_distinct") / n_words.cast("double"), 6
    )
    return joined.select(
        id_col,
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        dup_frac.alias("dup_word_frac"),
        # three-valued logic makes the conjunction FALSE (not null) for
        # zero-token docs: the min-words conjunct is false, which absorbs
        # the null length/repetition conjuncts
        (
            n_words.between(min_words, max_words)
            & mean_len.between(min_mean_word_len, max_mean_word_len)
            & (dup_frac <= max_dup_word_frac)
        ).alias("passes"),
    )
