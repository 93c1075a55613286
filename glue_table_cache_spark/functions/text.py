"""Text-analysis column functions for large-scale training-data pipelines.

Beyond-reference extension (SURVEY.md §7 P4; the reference at
/root/reference has no text operators — its surface ends at SQL
pass-through).  Everything here is built from `pyspark.sql.functions`
column expressions so the work stays inside WholeStageCodegen on the
JVM — no Python UDFs in the hot path, which is what survives a 100 TB
scan.  Each function returns a Column (composable) or a DataFrame
transformer.

Design notes for scale:

* tokenization / shingling are per-row array ops — embarrassingly
  parallel, no shuffle;
* stopword / marker lists are tiny `array(lit(...))` literals folded
  into the plan (no broadcast join needed);
* fingerprints use md5 (JVM intrinsic) so downstream dedup can
  hash-partition on them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: word-token pattern: runs of letters, runs of digits, or a single
#: non-space symbol ("BPE-ish": splits punctuation off words).  Kept to
#: syntax valid in both Java regex (Spark) and RE2 (DuckDB oracle).
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

#: small per-language stopword/marker lists for the n-gram-free
#: heuristic language id.  Deliberately tiny and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "que", "no"),
    "zh": ("的", "是", "了", "不", "我", "在", "有", "人"),
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + (
    "it", "for", "on", "with", "as", "are", "was", "be", "this", "an",
)


def tokens(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Lowercased token array (group-0 regex extraction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_ngrams(
    toks: Column, n: int, keep_short: bool = False
) -> Column:
    """Space-joined word ``n``-grams over a token-array column.

    Built from ``arrays_zip`` over ``n`` shifted slices instead of an
    index-``transform`` with ``slice(toks, i, n)`` in the lambda: a
    higher-order-function lambda re-evaluates every expression it
    closes over PER ELEMENT, so anything expensive inside ``toks``
    (the tokenizer regex) would re-run over the whole document for
    each gram position (measured ~7× slower end-to-end at sf0.1).
    Here the token array is referenced only at row level, where
    whole-stage codegen's subexpression elimination evaluates it once.

    ``keep_short=True`` keeps one catch-all entry joining all tokens
    for documents with 1..n-1 tokens (dedup wants short docs to still
    participate); ``False`` yields no grams for them.  Zero-token
    inputs always yield an empty array."""
    shifted = [
        F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1))
        )
        for j in range(n)
    ]
    zipped = F.arrays_zip(*shifted)
    short = (
        F.least(F.size(toks), F.lit(1)) if keep_short else F.lit(0)
    )
    # full n-grams only (+ the optional catch-all for short docs —
    # concat_ws skips the zip padding nulls there)
    kept = F.slice(
        zipped, 1, F.greatest(F.size(toks) - (n - 1), short)
    )
    return F.transform(
        kept,
        lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word ``k``-grams (space-joined) — the unit for
    MinHash / Jaccard dedup.  Documents with fewer than ``k`` (but at
    least one) tokens get their full token sequence as a single
    shingle so they still participate in dedup; zero-token documents
    yield an empty array.  See :func:`word_ngrams` for why this is an
    ``arrays_zip``, not an index ``transform``."""
    toks = F.regexp_extract_all(
        F.lower(F.col(col) if isinstance(col, str) else col),
        F.lit("[a-z0-9]+"),
        0,
    )
    return F.array_distinct(word_ngrams(toks, k, keep_short=True))


#: PII span patterns — deliberately simple, deterministic regexes that
#: parse identically under Java regex (Spark) and RE2 (DuckDB), so the
#: counts are oracle-checkable.  Real scrubbing pipelines layer ML
#: detectors on top; these are the cheap always-on screen.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

#: redaction order matters: emails first (their local parts can look
#: number-ish), phones before ipv4 (both are dotted digit runs)
_REDACTION_ORDER = ("email", "phone", "ipv4")


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of ``kind`` PII spans (a :data:`PII_PATTERNS` key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(col: Column | str) -> Column:
    """Replace every PII span with its ``[KIND]`` placeholder — the
    map-only scrub pass (pure column expressions, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in _REDACTION_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty strings)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?'\"()-]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(c)
    )


def stopword_ratio(
    col: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS
) -> Column:
    """Fraction of tokens that are stopwords (0.0 when no tokens)."""
    toks = tokens(col, "[a-z0-9]+")
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic heuristic quality score in [0, 1]: rewards
    mid-length documents and prose-like punctuation/stopword rates.
    Weights are arbitrary but fixed; the point is a reproducible,
    oracle-checkable scalar per document."""
    c = F.col(col) if isinstance(col, str) else col
    length_part = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_part = F.lit(1.0) - F.least(
        punct_ratio(c) * F.lit(5.0), F.lit(1.0)
    )
    sw_part = F.least(stopword_ratio(c) * F.lit(4.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_part + F.lit(0.3) * punct_part + F.lit(0.3) * sw_part,
        6,
    )


def language_id(col: Column | str) -> Column:
    """Heuristic language id: count marker-word hits per language and
    take the argmax; ties resolve in the fixed LANG_MARKERS order (en
    first).  Documents with zero hits in every language → 'und'."""
    toks = tokens(col, "[a-z0-9]+|[\\u4e00-\\u9fff]")

    def hits(lang: str) -> Column:
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    langs = list(LANG_MARKERS)
    scores = {lang: hits(lang) for lang in langs}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reverse order so earlier languages win ties (last when() wins in
    # a chained otherwise — build from the end)
    for lang in reversed(langs):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the
    lowercase/whitespace-collapsed text.  Stable across engines — the
    DuckDB oracle computes the identical value."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    return F.md5(normalized)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 —
    "Scaling Language Models", the standard quality-filter family for
    web-scale training corpora): documents dominated by repeated lines
    or n-grams are boilerplate/spam and get filtered before training.

    Per document:

    * ``n_lines``, ``dup_line_frac`` — fraction of lines that are
      duplicates of an earlier line (pure per-row array expressions);
    * ``dup_trigram_frac`` — fraction of word-trigram occurrences that
      are repeats (per-row);
    * ``top_bigram_frac`` — fraction of all bigram occurrences taken by
      the single most frequent bigram (explode → per-doc count → max,
      one shuffle keyed on the doc id).

    All thresholds are the caller's; this just computes the signals."""
    t = F.col(text_col)
    # bind the token array before building grams from it: word_ngrams
    # references it only at row level, and the projection split keeps
    # the tokenizer regex evaluated once per document
    bound = df.select(
        F.col(id_col).alias("id"),
        t.alias("__t"),
        tokens(t, "[a-z0-9]+").alias("__toks"),
    )
    toks = F.col("__toks")

    def grams(n: int) -> Column:
        # documents shorter than n tokens have no n-grams (unlike
        # dedup's shingles(), which deliberately keeps a whole-doc
        # shingle so short docs still participate in dedup)
        return word_ngrams(toks, n, keep_short=False)

    tri = grams(3)
    lines = F.filter(
        F.split(F.col("__t"), "\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    base = bound.select(
        F.col("id"),
        F.size(lines).alias("n_lines"),
        F.when(F.size(lines) == 0, 0.0)
        .otherwise(
            1.0
            - F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
        )
        .alias("dup_line_frac"),
        F.when(F.size(tri) == 0, 0.0)
        .otherwise(
            1.0 - F.size(F.array_distinct(tri)).cast("double") / F.size(tri)
        )
        .alias("dup_trigram_frac"),
        grams(2).alias("__bigrams"),
    )
    big = base.select("id", F.explode("__bigrams").alias("g"))
    top = (
        big.groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("total_c"),
        )
        .select(
            "id",
            F.round(F.col("top_c") / F.col("total_c"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )
    return (
        base.drop("__bigrams")
        .join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_lines",
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
            F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


def winnow_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm) as a posting frame
    ``(id, fingerprint)``: hash every character ``k``-gram of the
    normalized text, then keep the minimum hash of each sliding window
    of ``window`` consecutive k-gram hashes.  Guarantees any shared
    substring of length ≥ ``k + window - 1`` contributes at least one
    shared fingerprint, so locally-edited near-duplicates keep most
    fingerprints in common.

    Shape: one ``posexplode`` over gram positions (the normalized text
    is computed once per document and carried through the Generate, so
    per-gram work is an O(k) substring + one xxhash64 — NOT a nested
    array expression, which would re-evaluate the whole hash array per
    window and go O(n³)), then the per-window minimum as a frame-bounded
    window function — one shuffle keyed on the document id.

    ``portable=True`` swaps the gram hash to the md5-derived
    :func:`~glue_table_cache_spark.operators.dedup.portable_hash60`
    (seed ``"w"``) so a DuckDB oracle reproduces the fingerprints
    bit-for-bit; xxhash64 stays the at-scale default."""
    from pyspark.sql.window import Window as W

    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    gram = F.col("__norm").substr(F.col("pos"), F.lit(k))
    if portable:
        from glue_table_cache_spark.operators.dedup import portable_hash60

        gram_hash = portable_hash60(gram, seed="w")
    else:
        gram_hash = F.xxhash64(gram)
    grams = df.select(
        F.col(id_col).alias("id"),
        norm.alias("__norm"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
    ).select(
        "id",
        "pos",
        gram_hash.alias("h"),
        (F.greatest(
            F.length("__norm") - (k - 1), F.lit(1)
        ) - (window - 1)).alias("__max_start"),
    )
    frame = (
        W.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        grams.withColumn("fingerprint", F.min("h").over(frame))
        .where(F.col("pos") <= F.greatest(F.col("__max_start"), F.lit(1)))
        .select("id", "fingerprint")
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprints array) per document — collected form of
    :func:`winnow_postings` for callers that want the sketch as a
    column."""
    return (
        winnow_postings(df, text_col, id_col, k, window)
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("fingerprint")).alias("fingerprints"))
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: chars, tokens, avg token length,
    punctuation + stopword ratios, quality score, fingerprint."""
    t = F.col(text_col)
    toks = tokens(t, "[a-z0-9]+")
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.length(t).alias("n_chars_actual"),
        token_count(t).alias("n_tokens"),
        F.round(
            F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
                F.aggregate(
                    F.transform(toks, lambda x: F.length(x).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size(toks)
            ),
            6,
        ).alias("avg_token_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
        pii_count(t, "email").alias("n_emails"),
        pii_count(t, "phone").alias("n_phones"),
        pii_count(t, "ipv4").alias("n_ipv4"),
        (
            pii_count(t, "email") + pii_count(t, "phone")
            + pii_count(t, "ipv4") > 0
        ).alias("has_pii"),
    )
