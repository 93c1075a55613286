"""Catalog classification + projection parsing, mirroring
/root/reference/test/util.glue.test.ts."""

from __future__ import annotations

import pytest

from glue_table_cache_spark.catalog import (
    CatalogTable,
    ETableType,
    LocalMetadataStore,
    PartitionKey,
    classify_table_type,
    parse_projection_patterns,
)
from glue_table_cache_spark.errors import TableNotFoundError, UnsupportedProjectionError
from glue_table_cache_spark.projection import (
    date_format_to_regex,
    hive_extractor,
    projection_extractor,
)


def test_classifier_order():
    # decision order from src/util/glue.ts:13-19
    keys = [PartitionKey("year")]
    assert classify_table_type({"table_type": "ICEBERG"}, keys) == ETableType.ICEBERG
    assert (
        classify_table_type({"projection.enabled": "true"}, keys)
        == ETableType.GLUE_PROJECTED
    )
    assert classify_table_type({}, keys) == ETableType.HIVE
    assert classify_table_type({}, []) == ETableType.UNPARTITIONED


def test_projection_parsing_enum_and_integer():
    params = {
        "projection.enabled": "true",
        "projection.region.type": "enum",
        "projection.region.values": "us-east-1, eu-west-1",
        "projection.day.type": "integer",
        "projection.day.range": "[1, 31]",
    }
    pats = parse_projection_patterns(params)
    assert pats["region"].values == ("us-east-1", "eu-west-1")
    assert pats["day"].range == (1, 31)


def test_projection_range_comma_split():
    # range accepts JSON array or comma-split (src/util/glue.ts:52-70)
    params = {
        "projection.enabled": "true",
        "projection.year.type": "integer",
        "projection.year.range": "2020,2024",
    }
    assert parse_projection_patterns(params)["year"].range == ("2020", "2024")


def test_projection_disabled_returns_empty():
    assert parse_projection_patterns({"projection.x.type": "enum"}) == {}


def test_hive_extractor():
    ex = hive_extractor("year")
    assert ex.extract("s3://b/t/year=2024/month=01/x.parquet") == "2024"
    assert ex.extract("s3://b/t/other=1/x.parquet") is None


def test_date_format_regex():
    # conversion table from src/util/glue.ts:177-193
    assert date_format_to_regex("yyyy-MM-dd") == r"\d{4}\-\d{2}\-\d{2}"


def test_projection_extractors():
    from glue_table_cache_spark.catalog import ProjectionPattern

    date_ex = projection_extractor(
        ProjectionPattern("dt", "date", format="yyyy/MM/dd")
    )
    assert date_ex.extract("s3://b/p/2024/05/17/f.parquet") == "2024/05/17"

    int_ex = projection_extractor(ProjectionPattern("day", "integer"))
    assert int_ex.extract("s3://b/p/17/f.parquet") == "17"
    assert int_ex.cast == "int"

    enum_ex = projection_extractor(ProjectionPattern("region", "enum"))
    assert enum_ex.extract("s3://b/p/us-east-1/f.parquet") == "us-east-1"

    with pytest.raises(UnsupportedProjectionError):
        # injected unsupported, as src/util/glue.ts:163-166
        projection_extractor(ProjectionPattern("req", "injected"))


def test_store_missing_table():
    store = LocalMetadataStore()
    with pytest.raises(TableNotFoundError, match="Table db.missing not found"):
        store.get_table("db", "missing")


def test_catalog_table_projection_property():
    t = CatalogTable(
        database="d",
        name="t",
        location="/tmp/x",
        partition_keys=[PartitionKey("day")],
        parameters={
            "projection.enabled": "true",
            "projection.day.type": "integer",
        },
    )
    assert t.table_type == ETableType.GLUE_PROJECTED
    assert t.projection["day"].type == "integer"


def test_hive_extractor_anchored_to_path_component():
    """ADVICE r1: 'year=' must not match inside '.../fiscalyear=5/...'."""
    from glue_table_cache_spark.projection import hive_extractor

    ex = hive_extractor("year")
    assert ex.extract("s3://b/t/fiscalyear=5/year=2024/f.parquet") == "2024"
    assert ex.extract("s3://b/t/fiscalyear=5/f.parquet") is None
    assert ex.extract("year=1999/f.parquet") == "1999"


def test_projection_values_json_array_format():
    """The reference JSON-parses projection values
    (src/util/glue.ts:65-66); the AWS-documented comma format must
    also keep working."""
    patterns = parse_projection_patterns(
        {
            "projection.enabled": "true",
            "projection.env.type": "enum",
            "projection.env.values": '["dev", "staging", "prod"]',
        }
    )
    assert patterns["env"].values == ("dev", "staging", "prod")


def test_projection_values_malformed_json_raises():
    """Parity with the reference's JSON.parse throw on malformed JSON
    (test/util.glue.test.ts:331-339)."""
    import json

    import pytest

    with pytest.raises((json.JSONDecodeError, ValueError)):
        parse_projection_patterns(
            {
                "projection.enabled": "true",
                "projection.dt.type": "date",
                "projection.dt.values": "{malformed json}",
            }
        )


def test_delta_and_hudi_classified_not_silently_scanned():
    from glue_table_cache_spark.catalog import (
        ETableType,
        classify_table_type,
    )

    assert classify_table_type(
        {"spark.sql.sources.provider": "delta"}, []
    ) == ETableType.DELTA
    assert classify_table_type({"classification": "delta"}, []) == (
        ETableType.DELTA
    )
    assert classify_table_type(
        {"hoodie.table.name": "t"}, []
    ) == ETableType.HUDI
    # iceberg wins the decision order, as in the reference classifier
    assert classify_table_type(
        {"table_type": "ICEBERG", "classification": "delta"}, []
    ) == ETableType.ICEBERG


def test_engine_delta_without_log_raises(spark, tmp_path):
    """DELTA tables are handled via the log walk (r4, sources/delta.py
    — tests/test_delta.py); a delta-classified location WITHOUT a
    transaction log must still fail loudly, never fall back to a raw
    directory scan."""
    import pytest as _pytest

    from glue_table_cache_spark.catalog import LocalMetadataStore
    from glue_table_cache_spark.engine import GlueSparkEngine
    from glue_table_cache_spark.errors import GlueSparkError

    store = LocalMetadataStore()
    store.register_parquet_dir(
        "db", "dtable", str(tmp_path),
        parameters={"spark.sql.sources.provider": "delta"},
    )
    with _pytest.raises(GlueSparkError, match="No Delta log"):
        GlueSparkEngine(spark, store).sql(
            "SELECT * FROM glue.db.dtable"
        ).collect()
