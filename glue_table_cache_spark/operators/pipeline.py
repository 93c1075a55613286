"""End-to-end corpus curation: the canonical training-data pipeline.

Beyond-reference extension.  Composes the operator families into the
standard curation flow — every stage optional, every stage a
declarative DataFrame transform (one logical plan end-to-end, so
Catalyst sees through stage boundaries: column pruning and filter
pushdown cross stages for free):

    quality/language filter      functions/text
    → benchmark decontamination  operators/decontamination
    → near-dup removal           operators/dedup (MinHash-LSH + CC)
    → deterministic sampling     operators/sampling
    → sequence packing           operators/packing

The terminal write (``sinks/shards.py``) stays separate: it is an
action, not a transform.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glue_table_cache_spark.functions import text as T
from glue_table_cache_spark.operators import dedup as D
from glue_table_cache_spark.operators.materialize import materialize_frame
from glue_table_cache_spark.operators import decontamination as DC
from glue_table_cache_spark.operators import packing as P
from glue_table_cache_spark.operators import sampling as SM


@dataclass
class CurationConfig:
    """Knobs for :func:`curate`.  ``None`` disables a stage."""

    # C4-style line-level first-occurrence dedup, run BEFORE quality
    # scoring (boilerplate removal changes the quality signal)
    line_dedup_min_len: int | None = None
    line_dedup_sep: str = "\n"
    min_quality: float | None = 0.3
    languages: tuple[str, ...] | None = None  # e.g. ("en",)
    drop_pii: bool = False  # drop docs with any PII span
    benchmark: DataFrame | None = None  # decontamination reference set
    decontamination_threshold: float = 0.8
    decontamination_k: int = 8
    dedup_threshold: float | None = 0.8  # None → skip near-dup removal
    dedup_transitive: bool = True
    sample_fraction: float | None = None
    sample_salt: str = ""
    # token-budget mixing (alternative to stratify/sample_fraction):
    # relative domain weights + a total token budget
    mixture_weights: dict[str, float] = field(default_factory=dict)
    mixture_total_tokens: int | None = None
    pack_budget: int | None = None  # tokens per pack
    stratify: dict[str, float] = field(default_factory=dict)
    text_col: str = "text"
    id_col: str = "doc_id"
    strata_col: str = "source"
    # portable md5 hash family for the dedup + sampling stages: bit-
    # identical in DuckDB (dedup.portable_hash60), so an external SQL
    # oracle can reproduce the EXACT kept set.  xxhash64 stays the
    # at-scale default (faster, JVM-codegen).
    portable: bool = False
    # how the quality/language-annotated frame is materialized before
    # the dedup stage (it feeds ≥2 plan subtrees): "localCheckpoint"
    # (default — cheapest, but executor-local and NOT recoverable on
    # executor loss at cluster scale), "persist" (DISK_ONLY, lineage
    # kept — survives executor loss), "off" (recompute per reference).
    # See operators/materialize.py for the 100 TB implications.
    materialize: str = "localCheckpoint"


def curate(docs: DataFrame, config: CurationConfig | None = None) -> DataFrame:
    """Run the curation flow; returns the kept documents, augmented
    with ``quality`` / ``lang_pred`` (always) and ``n_tokens`` /
    ``pack_id`` / ``pack_offset`` when packing is on."""
    cfg = config or CurationConfig()
    t = F.col(cfg.text_col)

    # Widen a narrow small-file scan up to the session parallelism
    # BEFORE the per-document expression stack (guide §2.5 input skew:
    # one small file = one input split = every downstream map runs on
    # one core).  The lazy localCheckpoint is a plan barrier, not a
    # cache: Catalyst pushes deterministic filters through both Project
    # and Repartition, so without it the quality filter's regex stack
    # sinks below the exchange and scores the whole corpus on the
    # narrow scan side (measured at the synthetic sf1: the entire
    # scoring + minhash map side ran serially — 70 s vs 16 s).  At
    # real scale the scan has more files than cores, ``_widen`` is a
    # no-op, and no barrier or extra materialization is introduced.
    wide = D._widen(docs)
    if wide is not docs:
        docs = wide.localCheckpoint(eager=False)

    if cfg.line_dedup_min_len is not None:
        docs = D.line_dedup(
            docs,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
            sep=cfg.line_dedup_sep,
            min_len=cfg.line_dedup_min_len,
        ).drop("n_lines", "n_kept")
    out = docs.withColumn("quality", T.quality_score(t)).withColumn(
        "lang_pred", T.language_id(t)
    )
    if cfg.min_quality is not None:
        out = out.where(F.col("quality") >= cfg.min_quality)
    if cfg.languages is not None:
        out = out.where(F.col("lang_pred").isin(*cfg.languages))
    if cfg.drop_pii:
        out = out.where(
            T.pii_count(t, "email") + T.pii_count(t, "phone")
            + T.pii_count(t, "ipv4") == 0
        )
    if cfg.benchmark is not None:
        out = DC.decontaminate(
            out,
            cfg.benchmark,
            id_col=cfg.id_col,
            text_col=cfg.text_col,
            shingle_k=cfg.decontamination_k,
            threshold=cfg.decontamination_threshold,
        )
    if cfg.dedup_threshold is not None:
        # materialize the filtered+annotated frame ONCE before dedup:
        # the near-dup stage reads it from two independent subtrees
        # (the signature pipeline and the keep-side of the anti-join),
        # and Catalyst cannot share a repeated subtree across a join —
        # without this, the quality/language expression stack (regex
        # passes over every document) runs twice per action (guide
        # §1.2 fewest passes; same eager-localCheckpoint posture as
        # connected_components and semantic_dedup).  At cluster scale
        # this trades one executor-local write of the filtered corpus
        # for a full re-read + re-scoring of the raw input — the right
        # trade whenever ≥2 passes follow, which dedup guarantees.
        # cfg.materialize picks the mechanism (localCheckpoint |
        # persist | off — see operators/materialize.py for the
        # executor-loss / local-disk trade at cluster scale).
        out = materialize_frame(out, cfg.materialize)
        out = D.minhash_dedup(
            out,
            text_col=cfg.text_col,
            id_col=cfg.id_col,
            threshold=cfg.dedup_threshold,
            transitive=cfg.dedup_transitive,
            portable=cfg.portable,
            materialize=cfg.materialize,
        )
    # one tokenizer for every token-denominated stage: mixture budgets
    # and pack sizes must be measured in the same units
    def _with_tokens(df: DataFrame) -> DataFrame:
        if "n_tokens" in df.columns:
            return df
        return df.withColumn("n_tokens", T.token_count(t).cast("long"))

    if cfg.mixture_weights and cfg.mixture_total_tokens is not None:
        out = SM.mixture_sample(
            _with_tokens(out),
            cfg.mixture_weights,
            cfg.mixture_total_tokens,
            strata_col=cfg.strata_col,
            key_col=cfg.id_col,
            salt=cfg.sample_salt,
            portable=cfg.portable,
        )
    elif cfg.stratify:
        out = SM.stratified_sample(
            out,
            cfg.stratify,
            strata_col=cfg.strata_col,
            key_col=cfg.id_col,
            default_fraction=cfg.sample_fraction or 0.0,
            salt=cfg.sample_salt,
            portable=cfg.portable,
        )
    elif cfg.sample_fraction is not None:
        out = SM.deterministic_sample(
            out, cfg.sample_fraction, key_col=cfg.id_col,
            salt=cfg.sample_salt, portable=cfg.portable,
        )
    if cfg.pack_budget is not None:
        out = P.pack_sequences(
            _with_tokens(out),
            budget=cfg.pack_budget,
            # frames without the strata column pack as one global
            # stream rather than crashing on an unresolved column
            part_col=cfg.strata_col if cfg.strata_col in out.columns else None,
            order_col=cfg.id_col,
        )
    return out
