"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprints (SURVEY.md §2.6).

Everything is built from JVM-side string/array expressions (regexp,
higher-order functions) — no Python in the row path, so these run at
scan speed over a 100 TB documents table.  Each operator's arithmetic
is integer-exact or order-independent, so the DuckDB oracles compare
bit-for-bit.

The stopword lists are small n-gram-frequency heuristics (public
common-word lists), defined once here and interpolated into the oracle
SQL so both engines share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.common import spread
from flink_kmeans_clustering_spark.functions.text import tokenize

# language -> distinctive high-frequency stopwords (alphabetical language
# order is the deterministic tie-break: earliest wins ties)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "por"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "dans"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish pre-tokenization: letter runs, digit runs, single non-space symbols
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counting: whitespace tokens and BPE-ish tokens.

    * ``n_ws_tokens`` — runs of non-whitespace (the classic wc -w).
    * ``n_bpe_tokens`` — letter runs / digit runs / single symbols on the
      lowercased text: a proxy for BPE pre-tokenization segment count.
    """
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    bpe = F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_TOKEN_RE))
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars_actual"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits.

    Deterministic tie-break: alphabetically first language (array_min
    over (-score, lang) structs).  Documents with zero hits in every
    list get 'und' (undetermined) — the honest answer for content the
    heuristic can't see.
    """
    # tokens materialized once: each language's stopword filter is a
    # separate HOF whose input would otherwise re-run the regex split
    # (once per language per row)
    toks = F.col("_toks")
    cands = F.array(
        *[
            F.struct(
                (-_stopword_hits(toks, words)).alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_min(cands)
    score = -best["neg"]
    return df.withColumn("_toks", tokenize(F.col(text_col))).select(
        F.col(id_col),
        F.when(score > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        score.alias("score"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document quality in [0, 1] from cheap surface features.

    Components (each an exact integer count; ratios are int/int):
    stopword density (fluent prose has some), length in words
    (saturating at 100), and punctuation-noise penalty.  The blend is
    fixed-order double arithmetic — reproducible across engines.
    """
    # tokens materialized once (size + stopword HOF both reference them)
    toks = F.col("_toks")
    n_words = F.size(toks)
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"))
    n_chars = F.length(F.col(text_col))
    stop_hits = _stopword_hits(toks, ENGLISH_STOPWORDS)

    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.withColumn("_toks", tokenize(F.col(text_col))).select(
        F.col(id_col),
        n_words.alias("n_words"),
        stop_hits.alias("stop_hits"),
        n_punct.alias("n_punct"),
        F.round(score, 6).alias("quality"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Position-weighted rolling fingerprint of the token stream (bigint).

    fp = Σᵢ i · (31·ascii(first char of tokenᵢ) + len(tokenᵢ)) — a
    polynomial-style digest that is order-sensitive (shuffled tokens
    change it) yet integer-exact in any engine.  For content-defined
    chunk dedup at scale, pair with the MinHash path; this fingerprint
    is the cheap first-pass bucket key.
    """
    # posexplode + grouped SUM instead of a higher-order transform/
    # aggregate pair: HOF lambdas evaluate interpreted per element,
    # while this shape stays in whole-stage codegen end to end (same
    # integer arithmetic, same values).  posexplode_outer keeps
    # token-less documents as a single null row so they still emit
    # fingerprint 0 — no join-back needed.
    base = spread(df.select(F.col(id_col), F.col(text_col)), id_col)
    ex = base.select(
        F.col(id_col),
        F.posexplode_outer(tokenize(F.col(text_col))).alias("pos", "t"),
    )
    contrib = (F.col("pos") + 1).cast("long") * (
        F.ascii(F.substring(F.col("t"), 1, 1)).cast("long") * 31
        + F.length(F.col("t")).cast("long")
    )
    return ex.groupBy(id_col).agg(
        F.coalesce(F.sum(contrib), F.lit(0)).cast("long").alias("fingerprint")
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Corpus-wide token frequency: (token, freq).

    explode → groupBy(token) with map-side partial counts; ``top_n``
    adds deterministic (freq DESC, token ASC) ranking via
    TakeOrderedAndProject.
    """
    ex = df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    if top_n is not None:
        freq = freq.orderBy(F.desc("freq"), F.col("token")).limit(top_n)
    return freq


def token_frequencies_salted(
    df: DataFrame,
    text_col: str = "text",
    salts: int = 16,
) -> DataFrame:
    """Token frequencies via explicit two-stage salted aggregation.

    For hot keys that overwhelm even map-side partial aggregation
    (a stopword holding >single-reducer volume at corpus scale), salt
    the key with a random-ish shard, aggregate (token, salt), then
    aggregate token — two small shuffles instead of one skewed one.
    Counts are associative so the result is identical to the direct
    groupBy (the oracle).  The salt hashes the row's *position*
    (``monotonically_increasing_id``), so the shard assignment is
    partition-layout-dependent — only the aggregated result is
    deterministic, which is all the equivalence requires.  Positional
    salting spreads a hot key evenly regardless of which documents
    contain it; a content-derived salt would re-concentrate identical
    rows onto identical shards.
    """
    ex = df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    salted = ex.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    partial = salted.groupBy("token", "_salt").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy("token").agg(F.sum("_c").alias("freq"))


def clean_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalization pass a training corpus runs before anything else:
    lowercase, strip non-printable/control chars, collapse whitespace
    runs to single spaces, trim.  Pure regexp expressions — scan-speed,
    shuffle-free, identical in any regex-compatible engine."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[\p{Cntrl}]", " "),
            r"\s+",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_len"),
        F.md5(cleaned).alias("clean_digest"),
    )
