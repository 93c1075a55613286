"""glue_table_cache_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``dforsber/glue-table-cache``.

The reference (see SURVEY.md) is a catalog/metadata layer + SQL rewriter
that lets DuckDB query AWS-Glue-cataloged Parquet efficiently.  This
package re-expresses that Spark-first:

* a thin Python catalog / file-listing / partition-pruning layer
  (``catalog``, ``listing``, ``pruning``, ``cache``) does what Catalyst
  cannot — ``glue.db.tbl`` name resolution, Glue-style partition
  *projection*, explicit pre-pruned file-list scans, metadata LRU+TTL
  caching with single-flight refresh;
* all relational execution (joins, aggregation, CTEs, windows, sorting)
  is declared through the DataFrame / Spark SQL API so Catalyst +
  Tungsten pick the physical strategy (the reference delegates the same
  surface to DuckDB);
* beyond-reference, large-scale training-data-pipeline operators live in
  ``operators`` (dedup, similarity search, text analysis, multimodal
  plumbing) and ``streaming`` (Structured Streaming over the events
  table).
"""

from glue_table_cache_spark.catalog import (
    CatalogTable,
    ETableType,
    LocalMetadataStore,
    PartitionEntry,
    PartitionKey,
    PartitionListing,
)
from glue_table_cache_spark.config import Credentials, EngineConfig
from glue_table_cache_spark.engine import GlueSparkEngine
from glue_table_cache_spark.io import read_table
from glue_table_cache_spark.operators.pipeline import CurationConfig, curate
from glue_table_cache_spark.session import build_session

__all__ = [
    "CatalogTable",
    "Credentials",
    "CurationConfig",
    "ETableType",
    "EngineConfig",
    "GlueSparkEngine",
    "LocalMetadataStore",
    "PartitionEntry",
    "PartitionKey",
    "PartitionListing",
    "build_session",
    "curate",
    "read_table",
]

__version__ = "0.3.0"
