"""Iceberg current-snapshot data-file resolution (manifest walk).

Placeholder for the P3 milestone; parity target is the 4-step pipeline
at /root/reference/src/util/iceberg.ts:11-36 (newest metadata JSON by
last-sequence-number -> last snapshot's manifest-list Avro ->
manifest_path list -> data_file.file_path list).
"""

from __future__ import annotations


def iceberg_data_files(location: str, version_offset: int = 0) -> list[str]:
    raise NotImplementedError("Iceberg manifest walk lands in P3")
