"""cProfile the Iceberg driver-leg walk over the bench's 512x400
manifest fixture (pure Python — no Spark session needed)."""
import cProfile
import io
import json
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glue_table_cache_spark.sources.avro_lite import write_avro
from glue_table_cache_spark.sources.iceberg_fixture import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_LIST_SCHEMA,
)

ROOT = Path("/tmp/gtc_ice_profile_v1")
N_MANIFESTS = 512
N_ENTRIES = 400
PARTS = 16


def build():
    if (ROOT / "_BUILT").exists():
        return str(ROOT / "iceberg")
    ice_tbl = ROOT / "iceberg"
    meta_dir = ice_tbl / "metadata"
    meta_dir.mkdir(parents=True, exist_ok=True)
    list_rows = []
    for m in range(N_MANIFESTS):
        path = meta_dir / f"manifest-{m}.avro"
        write_avro(
            path,
            MANIFEST_ENTRY_SCHEMA,
            [
                {
                    "status": 1,
                    "snapshot_id": 1001,
                    "sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": f"data/part-{m}-{e}.parquet",
                        "file_format": "PARQUET",
                        "partition": {"p": str(m % PARTS)},
                        "record_count": 100,
                        "file_size_in_bytes": 1000,
                        "equality_ids": None,
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "null_value_counts": None,
                    },
                }
                for e in range(N_ENTRIES)
            ],
        )
        list_rows.append(
            {
                "manifest_path": str(path),
                "manifest_length": path.stat().st_size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "added_snapshot_id": 1001,
            }
        )
    mlist = meta_dir / "snap-1.avro"
    write_avro(mlist, MANIFEST_LIST_SCHEMA, list_rows)
    (meta_dir / "v1.metadata.json").write_text(
        json.dumps(
            {
                "format-version": 2,
                "location": str(ice_tbl),
                "last-sequence-number": 1,
                "current-snapshot-id": 1001,
                "current-schema-id": 0,
                "schemas": [
                    {
                        "schema-id": 0,
                        "type": "struct",
                        "fields": [
                            {"id": 1, "name": "id",
                             "required": False, "type": "long"},
                            {"id": 2, "name": "p",
                             "required": False, "type": "string"},
                        ],
                    }
                ],
                "partition-specs": [
                    {
                        "spec-id": 0,
                        "fields": [
                            {"name": "p", "transform": "identity",
                             "source-id": 2, "field-id": 1000}
                        ],
                    }
                ],
                "default-spec-id": 0,
                "snapshots": [
                    {
                        "snapshot-id": 1001,
                        "sequence-number": 1,
                        "timestamp-ms": 1700000000000,
                        "manifest-list": str(mlist),
                    }
                ],
            }
        )
    )
    (ROOT / "_BUILT").touch()
    return str(ice_tbl)


def main():
    import glue_table_cache_spark.sources.iceberg as ice

    ice.DISTRIBUTED_MANIFEST_MIN_COUNT = 10**9
    loc = build()
    # warm (page cache, json)
    t0 = time.time()
    entries, _p, _e = ice.iceberg_scan_details(loc)
    print(f"walk 1: {time.time()-t0:.3f}s entries={len(entries)}")
    t0 = time.time()
    entries, _p, _e = ice.iceberg_scan_details(loc)
    print(f"walk 2: {time.time()-t0:.3f}s")
    pr = cProfile.Profile()
    pr.enable()
    ice.iceberg_scan_details(loc)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
