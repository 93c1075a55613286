"""N-gram language-model scoring — CCNet-style perplexity filtering.

A public, standard corpus-quality signal (Wenzek et al. 2020, CCNet,
arXiv:1911.00359): score each document by its cross-entropy under a
language model trained on a trusted reference corpus (CCNet uses
KenLM over Wikipedia); low perplexity ≈ natural text, high ≈ gibberish,
boilerplate, or the wrong language.  KenLM is not in this environment
— and a 100 TB pipeline wants the model training itself distributed —
so this module implements the classic add-α-smoothed bigram LM as pure
DataFrame algebra:

* **Training** is two token explodes + two groupBys over the reference
  corpus (map-side-combinable counts), producing a ``(prev, w, c)``
  model table and a ``(prev, c)`` context table.  Unigram probabilities
  use the empty-string context ``""`` (impossible as a real token —
  the tokenizer only emits non-empty matches).
* **Scoring** explodes each document into (context, token) transitions
  and joins them against the model: for token :math:`t_i`,

  .. math:: p(t_i \\mid t_{i-1}) =
     \\frac{c(t_{i-1} t_i) + α}{c(t_{i-1}) + α (V + 1)}

  with :math:`V` the reference vocabulary size; the first token is
  scored against the unigram distribution the same way.  A document's
  ``cross_entropy`` is the mean of :math:`-\\log_2 p` over its tokens
  and ``perplexity`` is ``2^cross_entropy``, both rounded to 6
  decimals so the DuckDB oracle replays them exactly.

Scale shape: the model is broadcast when small (the common case — a
bigram table over a curated reference), else the transition join
shuffles on ``(prev, w)``.  Popular contexts ("the", "of") make that
join key skewed; AQE's skew-join split handles it, and the token
explode itself never shuffles.  No Python runs per row — everything is
column algebra and joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from glue_table_cache_spark.functions.text import TOKEN_PATTERN, tokens

#: context key used for unigram (document-initial) transitions —
#: impossible as a real token (the tokenizer only emits non-empty
#: matches)
UNIGRAM_CONTEXT = ""


def _transitions(toks: Column) -> Column:
    """Array of ``(prev, w)`` transition structs for one document:
    ``("", t1), (t1, t2), …`` — the unit both training and scoring
    explode.

    ``toks`` MUST be a bound column holding the already-materialized
    token array (see :func:`_with_transitions`), NOT the tokenizer
    expression itself: the lambda references it ``2×`` per element,
    and an inlined ``regexp_extract_all`` would re-run over the whole
    document for every element — measured ~100× slower at sf0.1."""
    trans = F.transform(
        # sequence(1, 0) DESCENDS in Spark — the when() below keeps
        # zero-token documents off this branch entirely
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.struct(
            F.when(i == 1, F.lit(UNIGRAM_CONTEXT))
            .otherwise(F.element_at(toks, i - 1))
            .alias("prev"),
            F.element_at(toks, i).alias("w"),
        ),
    )
    empty = F.array().cast("array<struct<prev:string,w:string>>")
    return F.when(F.size(toks) >= 1, trans).otherwise(empty)


def _exploded_transitions(
    df: DataFrame, text_col: str, extra: list[str]
) -> DataFrame:
    """``extra + (prev, w)`` rows, one per token transition.  The
    token array is materialized in its own projection so the regex
    runs once per document; Catalyst keeps the split because the alias
    is referenced more than once (CollapseProject only inlines
    single-use or cheap expressions).  ``_widen`` first: the tokenizer
    regex + explode inherit the scan's partitioning, and a single
    small parquet file would run them on one core (guide §2.5) — no-op
    when the scan is already wide."""
    from glue_table_cache_spark.operators.dedup import _widen

    return (
        _widen(df).select(*extra, tokens(F.col(text_col)).alias("__toks"))
        .select(
            *extra,
            F.explode(_transitions(F.col("__toks"))).alias("t"),
        )
        .select(*extra, "t.prev", "t.w")
    )


def train_ngram_lm(
    reference: DataFrame,
    text_col: str = "text",
    materialize: str = "localCheckpoint",
) -> tuple[DataFrame, DataFrame, int]:
    """Train the bigram LM on a reference corpus: returns
    ``(model, contexts, vocab_size)`` where ``model`` has rows
    ``(prev, w, c)`` (bigram counts, plus unigram counts under the
    ``""`` context) and ``contexts`` has ``(prev, cc)`` (context
    totals; ``""`` row carries the corpus token count).
    ``vocab_size`` is the reference's distinct token count.

    One tokenize→explode→aggregate pass over the reference builds the
    model, which is then MATERIALIZED (``localCheckpoint``); contexts
    and vocabulary are pure algebra over the aggregated counts —
    ``cc(prev) = Σ_w c(prev, w)`` and ``V = |distinct w|`` — so
    neither re-tokenizes the corpus (guide §2.3 aggregate-before-
    shuffle / §1.2 fewest passes: the r13 shape ran the tokenizer
    explode 4× per train+score — contexts, vocab, and the score plan's
    model each re-derived it; this shape runs it twice, once to train
    and once to score).  Training was already eager (the vocab count);
    the checkpoint makes the same action persist the model instead of
    throwing it away.  The model table is bigram-count-sized (≪
    corpus); at 100 TB train on a curated reference, not the corpus.
    ``materialize`` picks the mechanism (localCheckpoint | persist |
    off — see :mod:`..operators.materialize` for the executor-loss /
    local-disk trade at cluster scale)."""
    from glue_table_cache_spark.operators.materialize import (
        materialize_frame,
    )

    trans = _exploded_transitions(reference, text_col, [])
    model = materialize_frame(
        trans.groupBy("prev", "w").agg(F.count("*").alias("c")),
        materialize,
    )
    contexts = model.groupBy("prev").agg(F.sum("c").alias("cc"))
    vocab = model.select("w").distinct().count()
    return model, contexts, vocab


def ngram_lm_score(
    corpus: DataFrame,
    model: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document LM score: ``(id, n_tokens, cross_entropy,
    perplexity)``.  Empty documents (zero tokens) get NULL entropy /
    perplexity rather than a fake score.

    ``broadcast_model=False`` (default) plans shuffle joins on
    ``(prev, w)`` / ``prev`` and lets AQE's runtime statistics convert
    them to broadcast joins when the model turns out small — the
    right default because a bigram model over a real reference corpus
    easily reaches tens of millions of rows, and a FORCED broadcast of
    that (measured: 33 s vs 3 s at sf0.1) dwarfs the scoring itself.
    Pass ``True`` only when the reference is known-tiny and you want
    to skip the exchange even in non-AQE sessions; results are
    identical either way."""
    maybe_b = F.broadcast if broadcast_model else (lambda df: df)
    trans = _exploded_transitions(
        corpus.select(F.col(id_col).alias("__id"), text_col),
        text_col,
        ["__id"],
    )
    joined = (
        trans.join(maybe_b(model), ["prev", "w"], "left")
        .join(maybe_b(contexts), ["prev"], "left")
        .select(
            "__id",
            (
                -F.log2(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                    / (
                        F.coalesce(F.col("cc"), F.lit(0))
                        + F.lit(alpha) * F.lit(float(vocab_size + 1))
                    )
                )
            ).alias("nll"),
        )
    )
    scored = joined.groupBy("__id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("cross_entropy"),
    )
    return (
        corpus.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "cross_entropy",
            F.round(
                F.pow(F.lit(2.0), F.col("cross_entropy")), 6
            ).alias("perplexity"),
        )
    )


def perplexity_filter(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    max_perplexity: float | None = None,
    quantile: float | None = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """End-to-end CCNet-style filter: train on ``reference`` (default:
    the corpus itself — self-perplexity, which still flags outlier
    gibberish), score, and keep documents under the cutoff —
    ``max_perplexity`` if given, else the ``quantile`` of the corpus's
    perplexity distribution (one ``approx_percentile`` pass, broadcast
    back as a literal).  Returns the corpus columns plus
    ``perplexity``."""
    model, contexts, vocab = train_ngram_lm(
        reference if reference is not None else corpus, text_col
    )
    scored = ngram_lm_score(
        corpus, model, contexts, vocab,
        text_col=text_col, id_col=id_col, alpha=alpha,
    ).select(id_col, "perplexity")
    out = corpus.join(scored, id_col)
    if max_perplexity is None:
        if quantile is None:
            raise ValueError(
                "pass max_perplexity or quantile (got neither)"
            )
        cutoff = out.select(
            F.percentile_approx("perplexity", quantile).alias("q")
        ).collect()[0].q
        if cutoff is None:
            return out  # all-empty corpus: nothing to cut
        max_perplexity = float(cutoff)
    return out.where(
        F.col("perplexity").isNull()
        | (F.col("perplexity") <= F.lit(max_perplexity))
    )
