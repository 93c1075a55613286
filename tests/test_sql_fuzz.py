"""Differential SQL fuzz: seeded random queries vs the DuckDB oracle.

The 50 driver rows cover operators one by one and tests/test_tpch.py
covers 22 hand-written combinations; what remains is RANDOMIZED
composition — join chains × predicate trees × aggregate/window/set-op
shapes the hand-written suites never happened to combine.  A seeded
generator builds N queries in the SHARED Spark/DuckDB dialect over the
TPC-H-ish schema, runs each through ``GlueSparkEngine.sql`` and DuckDB
on the same parquet, and compares sorted multisets with float
tolerance (the test_tpch comparison contract).

Generator posture:

* templates compose randomly (join path walk over the FK graph with
  INNER/LEFT/RIGHT join types — null-extension is where engines
  disagree most (r12), random predicate conjunctions, aggregate vs
  window vs DISTINCT vs UNION ALL shells with optional ROLLUP/CUBE,
  optional HAVING / scalar-subquery / correlated-scalar / EXISTS),
  so one seed exercises several constructs at once;
* literals are SAMPLED FROM THE DATA at module setup (deterministic
  DuckDB quantile/distinct pulls), so predicates hit real selectivity
  instead of returning empty everywhere;
* only shared-dialect constructs are emitted — no intervals, no
  division (engine-specific int semantics), no LIMIT without total
  order (non-deterministic), no round() (half-even vs half-up);
* seeds are PINNED: a failure names its seed and the generated SQL,
  so a red run reproduces exactly.

sf0.001 keeps the whole sweep in CI-scale time.
"""

from __future__ import annotations

import math
import random
import re
from pathlib import Path

import pytest

from glue_table_cache_spark.catalog import LocalMetadataStore
from glue_table_cache_spark.engine import GlueSparkEngine

SF_DIR = Path("/root/testdata/sf0.001")
N_QUERIES = 200
BATCH = 25  # seeds per parametrized case (failure granularity)

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")

#: column → kind ("num" | "str" | "ts") per table
SCHEMA: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "num", "r_name": "str"},
    "nation": {"n_nationkey": "num", "n_name": "str",
               "n_regionkey": "num"},
    "customer": {"c_custkey": "num", "c_name": "str",
                 "c_nationkey": "num", "c_acctbal": "num",
                 "c_mktsegment": "str"},
    "supplier": {"s_suppkey": "num", "s_name": "str",
                 "s_nationkey": "num", "s_acctbal": "num"},
    "part": {"p_partkey": "num", "p_name": "str", "p_brand": "str",
             "p_type": "str", "p_size": "num",
             "p_retailprice": "num"},
    "orders": {"o_orderkey": "num", "o_custkey": "num",
               "o_orderstatus": "str", "o_totalprice": "num",
               "o_orderdate": "ts", "o_orderpriority": "str"},
    "lineitem": {"l_orderkey": "num", "l_partkey": "num",
                 "l_suppkey": "num", "l_linenumber": "num",
                 "l_quantity": "num", "l_extendedprice": "num",
                 "l_discount": "num", "l_tax": "num",
                 "l_returnflag": "str", "l_linestatus": "str",
                 "l_shipdate": "ts"},
}

#: FK edges: (left_table, left_col, right_table, right_col)
JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

#: group-by candidates (bounded cardinality keeps results small)
GROUP_COLS = {
    "region": ["r_name"],
    "nation": ["n_name", "n_regionkey"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "supplier": ["s_nationkey"],
    "part": ["p_brand", "p_type", "p_size"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
}

_AGGS = ("sum", "avg", "min", "max")


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    store = LocalMetadataStore()
    for t in TABLES:
        store.register_parquet_dir(
            "tpch", t, str(SF_DIR / f"{t}.parquet")
        )
    return GlueSparkEngine(spark, store)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR / f'{t}.parquet'}'"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def pools(duck):
    """Deterministic literal pools per (table, column): quantiles for
    numeric/timestamp columns, the first 40 distinct values for
    strings (ORDER BY — stable across runs)."""
    out: dict[tuple[str, str], list] = {}
    fracs = [i / 10 for i in range(11)]
    for t, cols in SCHEMA.items():
        for c, kind in cols.items():
            if kind == "str":
                vals = [
                    r[0]
                    for r in duck.execute(
                        f"SELECT DISTINCT {c} FROM {t} "
                        f"WHERE {c} IS NOT NULL ORDER BY {c} LIMIT 40"
                    ).fetchall()
                ]
            else:
                vals = [
                    r[0]
                    for r in duck.execute(
                        f"SELECT quantile_disc({c}, {f}) FROM {t}"
                    ).fetchall()
                    for f in [None]
                    for _ in [0]
                ] if False else [
                    duck.execute(
                        f"SELECT quantile_disc({c}, {f}) FROM {t}"
                    ).fetchone()[0]
                    for f in fracs
                ]
            out[(t, c)] = [v for v in vals if v is not None]
    return out


def _lit(kind: str, v) -> str:
    if kind == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if kind == "ts":
        return f"TIMESTAMP '{v}'"
    return repr(float(v)) if isinstance(v, float) else str(int(v))


class Gen:
    """One seeded query generator over the shared dialect."""

    def __init__(self, seed: int, pools):
        self.rnd = random.Random(seed)
        self.pools = pools

    # -- helpers -----------------------------------------------------
    def _chain(self) -> list[tuple[str, str, str | None, str | None]]:
        """A join chain as ``(alias, table, join_cond, join_type)``
        (cond/type None for the first table): a random walk over the
        FK graph, length 1-3, each step INNER (60%), LEFT (25%) or
        RIGHT (15%) — null-extension is where engines disagree."""
        rnd = self.rnd
        t0 = rnd.choice(
            ("lineitem", "orders", "customer", "part", "supplier")
        )
        chain = [("t0", t0, None, None)]
        used = {t0}
        for _ in range(rnd.randint(0, 2)):
            edges = [
                e for e in JOINS
                if (e[0] in used) != (e[2] in used)
            ]
            if not edges:
                break
            e = rnd.choice(edges)
            lt, lc, rt, rc = e
            if lt in used:
                new_t, new_c = rt, rc
                old_t, old_c = lt, lc
            else:
                new_t, new_c = lt, lc
                old_t, old_c = rt, rc
            old_alias = next(
                a for a, t, _c, _j in chain if t == old_t
            )
            alias = f"t{len(chain)}"
            r = rnd.random()
            jt = (
                "JOIN" if r < 0.6
                else "LEFT JOIN" if r < 0.85
                else "RIGHT JOIN"
            )
            chain.append(
                (alias, new_t,
                 f"{alias}.{new_c} = {old_alias}.{old_c}", jt)
            )
            used.add(new_t)
        return chain

    def _cols(self, chain, kind=None):
        out = []
        for alias, t, _c, _j in chain:
            for c, k in SCHEMA[t].items():
                if kind is None or k == kind:
                    out.append((alias, t, c, k))
        return out

    def _pred(self, chain) -> str | None:
        rnd = self.rnd
        n = rnd.randint(0, 3)
        if not n:
            return None
        parts = []
        for _ in range(n):
            alias, t, c, k = rnd.choice(self._cols(chain))
            pool = self.pools[(t, c)]
            if not pool:
                continue
            if k == "str":
                choice = rnd.random()
                if choice < 0.4:
                    parts.append(
                        f"{alias}.{c} = {_lit(k, rnd.choice(pool))}"
                    )
                elif choice < 0.7:
                    vals = rnd.sample(pool, min(3, len(pool)))
                    ins = ", ".join(_lit(k, v) for v in vals)
                    parts.append(f"{alias}.{c} IN ({ins})")
                else:
                    sub = re.sub(
                        r"[^A-Za-z0-9 ]", "",
                        str(rnd.choice(pool)),
                    )[:4]
                    if sub:
                        parts.append(f"{alias}.{c} LIKE '%{sub}%'")
            else:
                op = rnd.choice(("<", "<=", ">", ">=", "=", "<>"))
                if rnd.random() < 0.2 and len(pool) >= 2:
                    lo, hi = sorted(rnd.sample(pool, 2))
                    parts.append(
                        f"{alias}.{c} BETWEEN {_lit(k, lo)} "
                        f"AND {_lit(k, hi)}"
                    )
                else:
                    parts.append(
                        f"{alias}.{c} {op} "
                        f"{_lit(k, rnd.choice(pool))}"
                    )
        if not parts:
            return None
        if len(parts) >= 2 and rnd.random() < 0.3:
            parts[0] = f"({parts[0]} OR {parts[1]})"
            del parts[1]
        return " AND ".join(parts)

    def _extra_pred(self, chain) -> str | None:
        """Optional scalar-subquery, CORRELATED scalar subquery, or
        (NOT) EXISTS predicate."""
        rnd = self.rnd
        r = rnd.random()
        if r < 0.15:
            nums = self._cols(chain, "num")
            alias, t, c, _ = rnd.choice(nums)
            t2 = rnd.choice(TABLES)
            nums2 = [
                c2 for c2, k2 in SCHEMA[t2].items() if k2 == "num"
            ]
            c2 = rnd.choice(nums2)
            op = rnd.choice(("<", ">"))
            return (
                f"{alias}.{c} {op} "
                f"(SELECT avg({c2}) FROM glue.tpch.{t2})"
            )
        if r < 0.3:
            by_t = {t: a for a, t, _c, _j in chain}
            neg = "NOT " if rnd.random() < 0.5 else ""
            if "orders" in by_t:
                q = self.pools[("lineitem", "l_quantity")]
                return (
                    f"{neg}EXISTS (SELECT 1 FROM glue.tpch.lineitem "
                    f"lx WHERE lx.l_orderkey = "
                    f"{by_t['orders']}.o_orderkey AND "
                    f"lx.l_quantity > {_lit('num', rnd.choice(q))})"
                )
            if "customer" in by_t:
                p = self.pools[("orders", "o_totalprice")]
                return (
                    f"{neg}EXISTS (SELECT 1 FROM glue.tpch.orders "
                    f"ox WHERE ox.o_custkey = "
                    f"{by_t['customer']}.c_custkey AND "
                    f"ox.o_totalprice > "
                    f"{_lit('num', rnd.choice(p))})"
                )
        if r < 0.42:
            # correlated SCALAR subquery (r12): an aggregate over the
            # child table tied to the outer row's key — an empty
            # child group yields NULL, predicate false in both
            # engines
            by_t = {t: a for a, t, _c, _j in chain}
            op = rnd.choice(("<", ">"))
            if "orders" in by_t:
                a = by_t["orders"]
                fn = rnd.choice(("sum", "avg", "max"))
                return (
                    f"{a}.o_totalprice {op} (SELECT "
                    f"{fn}(lx.l_extendedprice) FROM "
                    f"glue.tpch.lineitem lx WHERE "
                    f"lx.l_orderkey = {a}.o_orderkey)"
                )
            if "customer" in by_t:
                a = by_t["customer"]
                return (
                    f"{a}.c_acctbal {op} (SELECT "
                    f"avg(ox.o_totalprice) FROM glue.tpch.orders "
                    f"ox WHERE ox.o_custkey = {a}.c_custkey)"
                )
        return None

    # -- shapes ------------------------------------------------------
    def query(self) -> str:
        rnd = self.rnd
        shape = rnd.random()
        if shape < 0.45:
            return self._agg()
        if shape < 0.65:
            return self._plain()
        if shape < 0.8:
            return self._window()
        if shape < 0.9:
            return self._union()
        return self._distinct()

    def _from_where(self, chain, extra_ok=True):
        # explicit JOIN ... ON syntax so LEFT/RIGHT joins compose;
        # WHERE carries only the generated predicates
        frm = f"glue.tpch.{chain[0][1]} {chain[0][0]}"
        for a, t, cond, jt in chain[1:]:
            frm += f" {jt} glue.tpch.{t} {a} ON {cond}"
        conds = []
        p = self._pred(chain)
        if p:
            conds.append(p)
        if extra_ok:
            e = self._extra_pred(chain)
            if e:
                conds.append(e)
        where = f" WHERE {' AND '.join(conds)}" if conds else ""
        return f"FROM {frm}{where}"

    def _group_keys(self, chain, n):
        cands = [
            (a, c)
            for a, t, _c, _j in chain
            for c in GROUP_COLS[t]
        ]
        return self.rnd.sample(cands, min(n, len(cands)))

    def _agg(self) -> str:
        rnd = self.rnd
        chain = self._chain()
        keys = self._group_keys(chain, rnd.randint(1, 2))
        nums = self._cols(chain, "num")
        items = [
            f"{a}.{c} AS g{i}" for i, (a, c) in enumerate(keys)
        ]
        aggs = []
        for i in range(rnd.randint(1, 3)):
            r = rnd.random()
            if r < 0.15:
                aggs.append(f"count(*) AS a{i}")
            elif r < 0.3:
                alias, _t, c, _ = rnd.choice(nums)
                aggs.append(f"count(DISTINCT {alias}.{c}) AS a{i}")
            else:
                fn = rnd.choice(_AGGS)
                alias, _t, c, _ = rnd.choice(nums)
                if rnd.random() < 0.3:
                    alias2, _t2, c2, _ = rnd.choice(nums)
                    expr = f"{alias}.{c} * (1 - {alias2}.{c2})" \
                        if rnd.random() < 0.5 \
                        else f"{alias}.{c} + {alias2}.{c2}"
                else:
                    expr = f"{alias}.{c}"
                aggs.append(f"{fn}({expr}) AS a{i}")
        gb = ", ".join(f"{a}.{c}" for a, c in keys)
        shell = None
        if rnd.random() < 0.25:
            # grouping-set shells (r12): super-aggregate rows carry
            # NULL keys — a composition hand-written suites rarely
            # mix with joins and HAVING
            shell = rnd.choice(("ROLLUP", "CUBE"))
            gb = f"{shell}({gb})"
        having = ""
        if rnd.random() < 0.3:
            having = f" HAVING count(*) > {rnd.randint(1, 5)}"
        elif shell is not None:
            # NOT shared dialect: over EMPTY input the standard (and
            # DuckDB) emits the () grouping set's grand-total row,
            # Spark emits nothing — HAVING count(*) > 0 is a no-op on
            # every non-empty group and neutralizes exactly that row
            having = " HAVING count(*) > 0"
        return (
            f"SELECT {', '.join(items + aggs)} "
            f"{self._from_where(chain)} GROUP BY {gb}{having}"
        )

    def _plain(self) -> str:
        rnd = self.rnd
        chain = self._chain()
        cols = self._cols(chain)
        picks = rnd.sample(cols, min(rnd.randint(2, 4), len(cols)))
        items = []
        for i, (a, _t, c, k) in enumerate(picks):
            if k == "num" and rnd.random() < 0.3:
                items.append(
                    f"CASE WHEN {a}.{c} > 0 THEN {a}.{c} "
                    f"ELSE 0 END AS c{i}"
                )
            else:
                items.append(f"{a}.{c} AS c{i}")
        return (
            f"SELECT {', '.join(items)} {self._from_where(chain)}"
        )

    def _window(self) -> str:
        rnd = self.rnd
        t = rnd.choice(("lineitem", "orders", "customer"))
        chain = [("t0", t, None, None)]
        g = rnd.choice(GROUP_COLS[t])
        nums = [c for c, k in SCHEMA[t].items() if k == "num"]
        c = rnd.choice(nums)
        fn = rnd.choice(("sum", "avg", "min", "max", "count"))
        return (
            f"SELECT t0.{g} AS c0, t0.{c} AS c1, "
            f"{fn}(t0.{c}) OVER (PARTITION BY t0.{g}) AS c2 "
            f"{self._from_where(chain, extra_ok=False)}"
        )

    def _union(self) -> str:
        rnd = self.rnd
        t = rnd.choice(TABLES)
        cols = list(SCHEMA[t])
        picks = rnd.sample(cols, min(2, len(cols)))
        sel = ", ".join(
            f"t0.{c} AS c{i}" for i, c in enumerate(picks)
        )
        chain = [("t0", t, None, None)]
        a = f"SELECT {sel} {self._from_where(chain, extra_ok=False)}"
        b = f"SELECT {sel} {self._from_where(chain, extra_ok=False)}"
        op = rnd.choice(("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
        return f"({a}) {op} ({b})"

    def _distinct(self) -> str:
        rnd = self.rnd
        chain = self._chain()
        keys = self._group_keys(chain, rnd.randint(1, 2))
        sel = ", ".join(
            f"{a}.{c} AS c{i}" for i, (a, c) in enumerate(keys)
        )
        return (
            f"SELECT DISTINCT {sel} {self._from_where(chain)}"
        )


# -- comparison (the test_tpch contract) ------------------------------

def _sig(v, digits: int = 6):
    if isinstance(v, bool) or not isinstance(v, float):
        return v
    if v == 0 or math.isnan(v) or math.isinf(v):
        return v
    return round(v, digits - 1 - int(math.floor(math.log10(abs(v)))))


def _sorted_rows(rows):
    return sorted(
        rows, key=lambda r: repr(tuple(_sig(v) for v in r))
    )


def _values_match(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


_BATCHES = [
    range(s, min(s + BATCH, N_QUERIES))
    for s in range(0, N_QUERIES, BATCH)
]


@pytest.mark.parametrize(
    "seeds", _BATCHES, ids=[f"seeds_{r.start}_{r.stop}" for r in _BATCHES]
)
def test_fuzz_matches_duckdb(seeds, fuzz_engine, duck, pools):
    failures = []
    for seed in seeds:
        sql = Gen(7_000 + seed, pools).query()
        try:
            srows = [
                tuple(r) for r in fuzz_engine.sql(sql).collect()
            ]
            orows = duck.execute(
                re.sub(r"\bglue\.tpch\.", "", sql)
            ).fetchall()
        except Exception as exc:  # noqa: BLE001 - report with seed
            failures.append((seed, sql, f"raised: {exc}"))
            continue
        if len(srows) != len(orows):
            failures.append(
                (seed, sql,
                 f"rowcount spark={len(srows)} duck={len(orows)}")
            )
            continue
        bad = [
            (sr, orow)
            for sr, orow in zip(
                _sorted_rows(srows), _sorted_rows(orows)
            )
            if len(sr) != len(orow)
            or not all(
                _values_match(a, b) for a, b in zip(sr, orow)
            )
        ]
        if bad:
            failures.append((seed, sql, f"values differ: {bad[:2]}"))
    assert not failures, "\n\n".join(
        f"seed {s}:\n{q}\n→ {msg}" for s, q, msg in failures
    )
