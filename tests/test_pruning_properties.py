"""Property-based equivalence of the two pruning paths.

The engine prunes small listings with a driver-side Python loop
(`prune_files`) and large ones with a distributed DataFrame filter
(`predicate_to_column` + ``coalesce(pred, TRUE)``).  Both must keep
exactly the same files for ANY predicate tree and ANY partition
values — including missing keys, uncoercible strings, mixed-type IN
lists, and deep Kleene-logic nesting.  Hypothesis drives the search
for divergences.

To keep the JVM out of the hot loop, the Column path is evaluated in
batch: examples accumulate predicates and all evaluate against one
listing DataFrame per test run would still be one Spark job per
example — instead we evaluate each example's Column against the same
cached listing DataFrame (tiny, 12 rows) and compare kept paths.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from glue_table_cache_spark.listing import FileInfo
from glue_table_cache_spark.pruning import (
    And,
    Comparison,
    InList,
    Not,
    Or,
    TruePredicate,
    predicate_to_column,
    prune_files,
)

_OPS = (
    "COMPARE_EQUAL",
    "COMPARE_NOTEQUAL",
    "COMPARE_GREATERTHAN",
    "COMPARE_LESSTHAN",
    "COMPARE_GREATERTHANOREQUALTO",
    "COMPARE_LESSTHANOREQUALTO",
)

#: partition values exercising every coercion branch: numerics,
#: non-numerics, floats-as-strings, empty, missing key (None → absent)
_VALUES = ["2023", "2024", "01", "7", "weird", "", "1e2", "-3"]

FILES = [
    FileInfo(
        f"s3://b/t/{i}.parquet",
        {
            k: v
            for k, v in (("year", y), ("month", m))
            if v is not None
        },
    )
    for i, (y, m) in enumerate(
        [(y, m) for y in _VALUES + [None] for m in ["01", "bad", None]][:12]
    )
]

_consts = st.one_of(
    st.integers(min_value=-5, max_value=2030),
    st.sampled_from([2023.0, 0.5, -1.5]),
    st.sampled_from(_VALUES),
    st.booleans(),
)

_columns = st.sampled_from(["year", "month"])

_leaves = st.one_of(
    st.just(TruePredicate()),
    st.builds(
        Comparison, column=_columns, op=st.sampled_from(_OPS), const=_consts
    ),
    st.builds(
        InList,
        column=_columns,
        consts=st.lists(_consts, min_size=1, max_size=4).map(tuple),
        negated=st.booleans(),
    ),
)


def _combine(children):
    return st.one_of(
        st.lists(children, min_size=1, max_size=3).map(
            lambda cs: And(tuple(cs))
        ),
        st.lists(children, min_size=1, max_size=3).map(
            lambda cs: Or(tuple(cs))
        ),
        children.map(Not),
    )


_trees = st.recursive(_leaves, _combine, max_leaves=8)


@pytest.fixture(scope="module")
def listing_df(spark):
    df = spark.createDataFrame(
        [
            (
                f.path,
                f.partition_values.get("year"),
                f.partition_values.get("month"),
            )
            for f in FILES
        ],
        "path string, year string, month string",
    )
    df = df.cache()
    df.count()
    return df


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,  # stable example set — no fresh-failure flakes in CI
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=_trees)
def test_python_and_column_pruning_agree(pred, listing_df):
    py_kept = [f.path for f in prune_files(FILES, pred)]
    col_kept = [
        r.path
        for r in listing_df.filter(
            F.coalesce(predicate_to_column(pred), F.lit(True))
        )
        .select("path")
        .collect()
    ]
    assert sorted(col_kept) == sorted(py_kept), pred


# ---------------------------------------------------------------------------
# Hidden-partitioning rewrite soundness: for ANY predicate tree over a
# timestamp source column and ANY row timestamps, a file whose rows
# contain a match must survive pruning by the TRANSFORMED predicate
# over the file's day/hour/bucket partition values.
# ---------------------------------------------------------------------------

import datetime as _dt

from glue_table_cache_spark.sources.iceberg_partitioning import (
    temporal_value,
    transform_partition_predicate,
)

_TS_POOL = [
    _dt.datetime(1969, 12, 31, 23, 30),
    _dt.datetime(1970, 1, 1, 0, 0),
    _dt.datetime(2017, 11, 16, 0, 0),
    _dt.datetime(2017, 11, 16, 22, 31, 8),
    _dt.datetime(2017, 11, 16, 23, 59, 59),
    _dt.datetime(2017, 11, 17, 0, 0),
    _dt.datetime(2017, 12, 1, 9, 0),
    _dt.datetime(2018, 1, 1, 0, 0),
]

_CMP_OPS = (
    "COMPARE_EQUAL",
    "COMPARE_NOTEQUAL",
    "COMPARE_GREATERTHAN",
    "COMPARE_LESSTHAN",
    "COMPARE_GREATERTHANOREQUALTO",
    "COMPARE_LESSTHANOREQUALTO",
)


def _ts_leaves(draw_const):
    return st.builds(
        Comparison,
        st.just("ts"),
        st.sampled_from(_CMP_OPS),
        draw_const,
    )


_ts_const = st.sampled_from(
    [t.strftime("%Y-%m-%d %H:%M:%S") for t in _TS_POOL]
    + ["2017-11-16", "2017-12-01"]
)

_ts_pred = st.recursive(
    _ts_leaves(_ts_const)
    | st.builds(
        InList,
        st.just("ts"),
        st.lists(_ts_const, min_size=1, max_size=3).map(tuple),
        st.booleans(),
    ),
    lambda inner: st.builds(
        And, st.lists(inner, min_size=2, max_size=3).map(tuple)
    )
    | st.builds(
        Or, st.lists(inner, min_size=2, max_size=3).map(tuple)
    )
    | st.builds(Not, inner),
    max_leaves=6,
)


def _row_matches(pred, ts: _dt.datetime):
    """Ground truth: evaluate the ORIGINAL predicate against one row's
    actual timestamp (string compare on ISO forms = timestamp order)."""
    s = ts.strftime("%Y-%m-%d %H:%M:%S")
    return pred.evaluate({"ts": s})


@settings(
    max_examples=300, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    pred=_ts_pred,
    rows=st.lists(
        st.sampled_from(_TS_POOL), min_size=1, max_size=5
    ),
)
def test_transform_pruning_never_drops_a_matching_file(pred, rows):
    fields = [
        {"name": "ts_day", "transform": "day", "source": "ts"},
        {"name": "ts_hour", "transform": "hour", "source": "ts"},
    ]
    pv_pred = transform_partition_predicate(pred, fields)
    # one file per distinct (day, hour) partition tuple, as a real
    # writer would split them
    by_part = {}
    for ts in rows:
        iso = ts.strftime("%Y-%m-%d %H:%M:%S")
        key = (
            temporal_value("day", iso),
            temporal_value("hour", iso),
        )
        by_part.setdefault(key, []).append(ts)
    for (day, hour), members in by_part.items():
        pv = {"ts_day": str(day), "ts_hour": str(hour)}
        kept = pv_pred.evaluate(pv) is not False
        has_match = any(
            _row_matches(pred, t) is True for t in members
        )
        if has_match:
            assert kept, (
                f"file {pv} contains a matching row but was pruned "
                f"by {pv_pred!r} (original {pred!r})"
            )
