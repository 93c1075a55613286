"""The materialize= knob (localCheckpoint | persist | off) must not
change any operator's results — it only picks the mechanism by which
multiply-referenced intermediates are evaluated once (see
operators/materialize.py for the executor-loss / local-disk trade)."""

from __future__ import annotations

import pytest

from glue_table_cache_spark.operators.dedup import connected_components
from glue_table_cache_spark.operators.materialize import materialize_frame
from glue_table_cache_spark.operators.pipeline import CurationConfig, curate
from glue_table_cache_spark.operators.similarity import semantic_dedup


def _pairs(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "id_a long, id_b long"
    )


def test_materialize_frame_rejects_unknown_mode(spark):
    with pytest.raises(ValueError, match="materialize"):
        materialize_frame(_pairs(spark), "cache-forever")


@pytest.mark.parametrize("mode", ["persist", "off"])
def test_connected_components_modes_match_default(spark, mode):
    want = sorted(
        map(tuple, connected_components(_pairs(spark)).collect())
    )
    got = sorted(
        map(
            tuple,
            connected_components(_pairs(spark), materialize=mode).collect(),
        )
    )
    assert got == want
    assert want == [(1, 1), (2, 1), (3, 1), (5, 5), (10, 10), (11, 10)]


@pytest.mark.parametrize("mode", ["persist", "off"])
def test_curate_modes_match_default(spark, docs_corpus, mode):
    cfg = CurationConfig(min_quality=0.0, dedup_threshold=0.5)
    want = sorted(r.doc_id for r in curate(docs_corpus, cfg).collect())
    cfg2 = CurationConfig(
        min_quality=0.0, dedup_threshold=0.5, materialize=mode
    )
    got = sorted(r.doc_id for r in curate(docs_corpus, cfg2).collect())
    assert got == want and len(want) > 0


@pytest.fixture()
def docs_corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document about spark optimization"),
        (4, "yet another unrelated piece of text with its own words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dot_unrolled_bit_equals_fold(spark):
    """Equivalence witness for the measured-negative unrolled dot
    (see similarity._dot_unrolled): identical IEEE fold order, NULL
    past a short array, bit-equal results."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators.similarity import (
        _dot_unrolled,
        dot,
    )

    rows = [
        ([1.5, -2.25, 3.0, 0.125], [4.0, 0.5, -1.0, 8.0]),
        ([0.1, 0.2, 0.3, 0.4], [0.7, 0.8, 0.9, 1.0]),
        ([0.0, 0.0, 0.0, 0.0], [-0.0, 1.0, 2.0, 3.0]),
        ([1e300, -1e300, 1.0, 2.0], [1e8, 1e8, 3.0, 4.0]),
    ]
    df = spark.createDataFrame(
        rows, "a array<double>, b array<double>"
    )
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("fold"),
        _dot_unrolled("a", "b", 4).alias("flat"),
    ).collect()
    for r in out:
        assert r.fold == r.flat
    # short array: NULL either way (zip_with pads vs try_element_at)
    short = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0, 5.0])], "a array<double>, b array<double>"
    ).select(
        dot(F.col("a"), F.col("b")).alias("fold"),
        _dot_unrolled("a", "b", 3).alias("flat"),
    ).collect()[0]
    assert short.fold is None and short.flat is None


@pytest.mark.parametrize("mode", ["persist", "off"])
def test_semantic_dedup_modes_match_default(spark, mode):
    vecs = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(8)])
        for i in range(20)
    ] + [(100, [7.0, 10.0, 2.0, 5.0, 8.0, 0.0, 3.0, 6.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    want = sorted(
        map(tuple, semantic_dedup(df, nlist=4, threshold=0.99).collect())
    )
    got = sorted(
        map(
            tuple,
            semantic_dedup(
                df, nlist=4, threshold=0.99, materialize=mode
            ).collect(),
        )
    )
    assert got == want
