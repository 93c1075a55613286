"""Writer-side Change Data Feed: ``cdc`` actions for the DML writers.

The public CDF protocol (PROTOCOL.md "Change Data Files"): a writer on
a table with ``delta.enableChangeDataFeed=true`` records each DML
commit's CHANGED ROWS in parquet files under ``_change_data/``, named
by ``cdc`` actions in the same commit, each row tagged with
``_change_type`` (``insert`` / ``delete`` / ``update_preimage`` /
``update_postimage``).  CDF readers (:func:`..sources.delta.delta_cdf`
and the ``delta_lite`` streaming source's ``readChangeFeed`` mode)
treat a commit's cdc files as its EXACT change set; commits without
them fall back to add/remove synthesis — which is why a DV-attach
delete without cdc must refuse there: the changed-row subset is not
recoverable from the file-level actions.  Emitting cdc from the DELETE
/ UPDATE / MERGE writers is what makes row-level DML compose with a
running CDF stream.

Failure posture mirrors the DV sidecars: cdc files are written BEFORE
the commit attempt and referenced only by the commit — a failed commit
leaves unreferenced ``_change_data/`` garbage that ``vacuum_delta``
retires, never a commit naming missing files.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the CDF column; reserved in user schemas by the protocol
CHANGE_TYPE_COL = "_change_type"


def cdf_enabled(location: str) -> bool:
    """``delta.enableChangeDataFeed`` from the CURRENT ``metaData``
    configuration — the writer-side gate: DML on a non-CDF table
    writes no cdc files (readers synthesize from add/remove where
    possible, exactly as before)."""
    from glue_table_cache_spark.sources.delta import _replay

    _active, state = _replay(location)
    conf = (state.get("metaData") or {}).get("configuration") or {}
    if isinstance(conf, list):  # pyarrow map → list of pairs
        conf = dict(conf)
    return str(
        conf.get("delta.enableChangeDataFeed", "")
    ).lower() == "true"


def write_cdc_files(
    changes: DataFrame, location: str
) -> list[dict]:
    """Write ``changes`` (which must carry ``_change_type``) under
    ``_change_data/`` and return the ``cdc`` actions naming the
    files.  ``dataChange`` is false per the protocol — cdc files
    describe a change, they are not table data."""
    if CHANGE_TYPE_COL not in changes.columns:
        raise ValueError(
            f"cdc rows must carry {CHANGE_TYPE_COL!r}"
        )
    base = Path(location)
    batch = uuid.uuid4().hex[:12]
    stage = base / f"_staging_cdc_{batch}"
    changes.write.mode("overwrite").parquet(str(stage))
    out_dir = base / "_change_data"
    out_dir.mkdir(exist_ok=True)
    actions: list[dict] = []
    import shutil

    for p in sorted(stage.rglob("part-*.parquet")):
        name = f"cdc-{batch}-{len(actions):05d}.parquet"
        dest = out_dir / name
        p.rename(dest)
        actions.append(
            {
                "cdc": {
                    "path": f"_change_data/{name}",
                    "partitionValues": {},
                    "size": dest.stat().st_size,
                    "dataChange": False,
                }
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    return actions


def typed(df: DataFrame, change_type: str) -> DataFrame:
    """``df`` with every row tagged ``change_type``."""
    return df.withColumn(CHANGE_TYPE_COL, F.lit(change_type))


def to_physical(
    changes: DataFrame,
    renames: dict[str, str] | None,
    physical_schema=None,
) -> DataFrame:
    """Project a logical-named cdc frame to PHYSICAL column names —
    the spelling the table's data files share (real Delta writes cdc
    files physically too, PROTOCOL.md "Column Mapping": change files
    follow the data files' naming).  Readers map back through the
    CURRENT metadata, so historical changes always surface under the
    latest logical schema.  ``_change_type`` is protocol metadata,
    never mapped.  ``renames`` is the reader-direction
    ``{physical: logical}`` map (``None`` = unmapped, pass-through).
    ``physical_schema`` (the fully-physical ``StructType`` from
    :func:`~glue_table_cache_spark.sources.delta.physical_schema`)
    additionally renames NESTED fields: each complex column casts to
    its physical type — Spark's struct cast matches positionally, and
    mapping preserves field order, so the cast is a pure rename at
    every level (r12, the write-direction twin of the scan path's
    apply_column_mapping)."""
    if not renames:
        return changes
    from glue_table_cache_spark.sources.delta import (
        has_complex_type as complex_,
    )

    ptypes = (
        {f.name: f.dataType for f in physical_schema.fields}
        if physical_schema is not None
        else {}
    )
    phys_of = {v: k for k, v in renames.items()}
    cols = []
    for c in changes.columns:
        tgt = phys_of.get(c, c)
        col = F.col(c)
        pt = ptypes.get(tgt)
        if pt is not None and complex_(pt):
            col = col.cast(pt)
        cols.append(col.alias(tgt))
    return changes.select(*cols)
