"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the oracle on DuckDB over the same
parquet tables — then compares BOTH ways the driver might see them:

* multiset mode — ``collect()`` vs ``fetchall()``, order-insensitive
  row-value comparison (stricter than a hash: reports first diffs);
* pandas mode — ``toPandas()`` vs ``fetchdf()``, repr-compared.  This
  is the path the driver's value hash takes, and it surfaces type-
  rendering mismatches the multiset mode is blind to (r3 shipped two
  red rows because DECIMAL came back as ``Decimal('0.260')`` from
  Spark but float64 ``0.26`` from DuckDB — both gates must agree).

Usage:
    python tools/check_correctness.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from glue_table_cache_spark.io import TABLES  # noqa: E402
from glue_table_cache_spark.session import build_session  # noqa: E402


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (repr(tuple(_norm(r[i]) for i in order)) for r in rows)
    )


def _pd_norm(v):
    """Normalize a pandas cell ONLY where both engines agree by
    construction (NaN identity, numpy scalar unboxing, timestamp
    rendering) — deliberately NOT across types: Decimal vs float or
    None-in-object-column vs NaN must stay unequal, because they hash
    differently in the driver."""
    import numpy as np
    import pandas as pd

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # Spark DATE → datetime.date; DuckDB fetchdf → midnight
        # Timestamp.  The driver hash accepts this pairing (r3's
        # expr_cast_arith, DATE-typed, passed) — align to midnight.
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_pd_norm(x) for x in v)
    if v is pd.NaT:
        return "NaT"
    return v


def _pdf_key(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        repr(tuple(_pd_norm(v) for v in row))
        for row in pdf.itertuples(index=False, name=None)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    spark = build_session(app_name="gtc-correctness", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(rows)} rows, cols={cols}"
                f" ({time.time()-t0:.1f}s) [no oracle: rows-only]"
            )
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} oracle={sorted(ocols)}")
        if not problems:
            sk, ok = _rows_key(rows, cols), _rows_key(orows, ocols)
            if sk != ok:
                diff_s = [r for r in sk if r not in set(ok)][:3]
                diff_o = [r for r in ok if r not in set(sk)][:3]
                problems.append(
                    f"values differ; spark-only={diff_s} oracle-only={diff_o}"
                )
        if not problems:
            # pandas mode — the driver's actual hash path
            try:
                pk_s = _pdf_key(df.toPandas())
                pk_o = _pdf_key(con.execute(oracles[name]).fetchdf())
            except Exception as exc:  # noqa: BLE001
                problems.append(f"pandas-mode error: {exc}")
            else:
                if pk_s != pk_o:
                    diff_s = [r for r in pk_s if r not in set(pk_o)][:3]
                    diff_o = [r for r in pk_o if r not in set(pk_s)][:3]
                    problems.append(
                        "pandas-mode values differ (driver hash would"
                        f" mismatch); spark-only={diff_s}"
                        f" oracle-only={diff_o}"
                    )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
        f" (of {len(qs)} queries)"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
