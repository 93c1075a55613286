"""Resolution + rewrite unit tests, mirroring the reference's
sql-transformer suite (/root/reference/test/sql-transformer.test.ts)."""

from __future__ import annotations

import pytest

from glue_table_cache_spark.errors import InvalidQueryError
from glue_table_cache_spark.transformer import (
    TableReference,
    get_query_glue_table_refs,
    mangle_view_name,
    rewrite_query,
)


def test_simple_ref():
    refs = get_query_glue_table_refs("SELECT * FROM glue.db1.tbl1")
    assert refs == [TableReference("db1", "tbl1")]


def test_two_part_ref_defaults_database():
    # schema defaults to "default" (src/sql-transformer.ts:69-78)
    refs = get_query_glue_table_refs("SELECT * FROM glue.tbl1 WHERE x=1")
    assert refs == [TableReference("default", "tbl1")]


def test_quoted_case_sensitive_ref():
    # test/sql-transformer.test.ts:222-232
    refs = get_query_glue_table_refs('SELECT * FROM "GLUE"."MYDB"."MYTABLE"')
    assert refs == [TableReference("mydb", "mytable")]


def test_multiple_refs_dedup_and_join():
    sql = (
        "SELECT * FROM glue.db.t1 a JOIN glue.db.t2 b ON a.id=b.id "
        "JOIN glue.db.t1 c ON c.id=a.id JOIN plain p ON p.id=a.id"
    )
    refs = get_query_glue_table_refs(sql)
    assert refs == [TableReference("db", "t1"), TableReference("db", "t2")]


def test_cte_and_subquery_refs():
    sql = """WITH x AS (SELECT * FROM glue.d.a WHERE y=1)
             SELECT * FROM x, (SELECT * FROM glue.d.b) s"""
    assert get_query_glue_table_refs(sql) == [
        TableReference("d", "a"),
        TableReference("d", "b"),
    ]


def test_empty_query_raises():
    # test/sql-transformer.test.ts:156-165
    with pytest.raises(InvalidQueryError):
        get_query_glue_table_refs("")
    with pytest.raises(InvalidQueryError):
        get_query_glue_table_refs("   ")


def test_invalid_sql_raises():
    # test/sql-transformer.test.ts:151-154
    with pytest.raises(InvalidQueryError):
        get_query_glue_table_refs("SELECT FROM WHERE")


def test_mangling_strips_dashes():
    # test/sql-transformer.test.ts:780-787
    assert mangle_view_name("my-db", "my-table") == "glue__mydb_mytable"


def test_rewrite_bare_ref_gets_alias():
    sql = "SELECT tbl1.a FROM glue.db1.tbl1 WHERE tbl1.b = 2"
    refs = get_query_glue_table_refs(sql)
    out = rewrite_query(sql, refs)
    assert "glue__db1_tbl1 AS `tbl1`" in out
    assert "glue." not in out


def test_rewrite_preserves_alias_and_comments():
    sql = "-- keep me\nSELECT t.a FROM glue.db1.tbl1 t WHERE t.b=2"
    out = rewrite_query(sql, get_query_glue_table_refs(sql))
    assert out.startswith("-- keep me")
    assert "glue__db1_tbl1 t" in out


def test_rewrite_ref_followed_by_keyword():
    sql = "SELECT * FROM glue.db1.tbl1 WHERE x=1"
    out = rewrite_query(sql, get_query_glue_table_refs(sql))
    assert "glue__db1_tbl1 AS `tbl1` WHERE x=1" in out


def test_string_literal_not_rewritten():
    """ADVICE r1: a literal 'glue.db.tbl' must pass through untouched."""
    sql = "SELECT 'glue.db1.tbl1' AS s FROM glue.db1.tbl1"
    refs = get_query_glue_table_refs(sql)
    assert refs == [TableReference("db1", "tbl1")]
    out = rewrite_query(sql, refs)
    assert out.startswith("SELECT 'glue.db1.tbl1' AS s FROM ")
    assert "glue__db1_tbl1" in out


def test_comment_with_glue_ref_not_rewritten():
    sql = "-- glue.db1.tbl1 is scanned here\nSELECT * FROM glue.db1.tbl1"
    out = rewrite_query(sql, get_query_glue_table_refs(sql))
    assert out.startswith("-- glue.db1.tbl1 is scanned here\n")
    assert out.count("glue__db1_tbl1") == 1


def test_other_catalog_suffix_not_corrupted():
    """ADVICE r1: someglue.db.tbl is a different catalog and must not
    match on its glue.db.tbl suffix."""
    sql = (
        "SELECT * FROM someglue.db1.tbl1 a JOIN glue.db1.tbl1 b "
        "ON a.id = b.id"
    )
    refs = get_query_glue_table_refs(sql)
    assert refs == [TableReference("db1", "tbl1")]
    out = rewrite_query(sql, refs)
    assert "someglue.db1.tbl1" in out
    assert "someglue__db1_tbl1" not in out


def test_nonstrict_falls_back_on_spark_only_syntax():
    # Spark-valid, DuckDB-unparseable: must not raise in engine mode
    sql = "SELECT x FROM VALUES (1), (2) AS t(x) JOIN glue.db1.tbl1 ON true"
    refs = get_query_glue_table_refs(sql, strict=False)
    assert TableReference("db1", "tbl1") in refs


def test_per_query_view_name_override():
    sql = "SELECT * FROM glue.db1.tbl1 WHERE x = 1"
    refs = get_query_glue_table_refs(sql)
    out = rewrite_query(sql, refs, {refs[0]: "glue__db1_tbl1__q7_0"})
    assert "glue__db1_tbl1__q7_0 AS `tbl1`" in out


def test_missing_database_raises():
    # glue..table → throw (test/sql-transformer.test.ts:178-181)
    with pytest.raises(InvalidQueryError):
        get_query_glue_table_refs("SELECT * FROM glue..tbl")


def test_four_part_name_not_treated_as_glue_ref():
    """cat.glue.db.tbl is not a glue reference (4-part names are
    rejected by the reference, test/sql-transformer.test.ts:217-220);
    the left boundary keeps the glue.db.tbl suffix from matching."""
    refs = get_query_glue_table_refs(
        "SELECT * FROM other.db1.tbl1 x JOIN glue.db2.tbl2 y ON x.a=y.b",
        strict=False,
    )
    assert refs == [TableReference("db2", "tbl2")]


def test_dot_qualified_catalog_not_rewritten():
    """ADVICE r2: othercat.glue.tbl names a table in another catalog
    whose schema is literally 'glue' — its glue.tbl suffix must not be
    rewritten."""
    sql = (
        "SELECT * FROM othercat.glue.tbl1 a JOIN glue.db1.tbl1 b "
        "ON a.id = b.id"
    )
    refs = get_query_glue_table_refs(sql)
    assert refs == [TableReference("db1", "tbl1")]
    out = rewrite_query(sql, refs)
    assert "othercat.glue.tbl1" in out


def test_generated_alias_is_backquoted():
    """ADVICE r2: a bare quoted reference like glue.db."order-items"
    aliases back to its table name, which must be backtick-quoted or
    Spark's parser rejects the hyphen."""
    sql = 'SELECT * FROM glue.db1."order-items" WHERE x = 1'
    refs = get_query_glue_table_refs(sql, strict=False)
    assert refs == [TableReference("db1", "order-items")]
    out = rewrite_query(sql, refs)
    assert "AS `order-items`" in out


def test_deeply_nested_recursive_cte_ref_found():
    """Reference: a glue ref nested in derived tables inside a
    recursive CTE is still discovered and rewritten
    (test/sql-transformer.test.ts:202-215)."""
    sql = """
        WITH RECURSIVE cte AS (
          SELECT * FROM (
            SELECT * FROM (
              SELECT * FROM glue.mydb.mytable
            ) t1
          ) t2
        )
        SELECT * FROM cte
    """
    refs = get_query_glue_table_refs(sql, strict=False)
    assert refs == [TableReference("mydb", "mytable")]
    out = rewrite_query(sql, refs)
    assert "glue__mydb_mytable" in out
    assert "glue.mydb.mytable" not in out


def test_hyphenated_catalog_name_not_split():
    """``my-glue.db.tbl`` is one bare identifier (our _IDENT allows
    '-'); its 'glue' suffix must not be rewritten as a glue ref."""
    from glue_table_cache_spark.transformer import get_query_glue_table_refs

    assert get_query_glue_table_refs(
        "SELECT * FROM my-glue.sales.orders", strict=False
    ) == []
    assert get_query_glue_table_refs(
        "SELECT * FROM my$glue.sales.orders", strict=False
    ) == []
    # a real ref still matches
    refs = get_query_glue_table_refs("SELECT * FROM glue.sales.orders")
    assert len(refs) == 1
