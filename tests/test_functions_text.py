"""Tests for functions/text.py PII detection and redaction."""

from __future__ import annotations

from glue_table_cache_spark.functions import text as T

# -- PII ---------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice@test.org today"),
            (2, "call 555-123-4567 or 555.987.6543 now"),
            (3, "server at 10.0.0.1 and 192.168.1.254"),
            (4, "clean text with no identifiers at all"),
            (5, "mixed: a@b.co, 111-222-3333, 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ipv4, r.has_pii)
        for r in T.text_stats(df).collect()
    }
    assert out[1] == (2, 0, 0, True)
    assert out[2] == (0, 2, 0, True)
    assert out[3] == (0, 0, 2, True)
    assert out[4] == (0, 0, 0, False)
    assert out[5] == (1, 1, 1, True)
    red = {
        r.doc_id: r.red
        for r in df.select(
            "doc_id", T.redact_pii("text").alias("red")
        ).collect()
    }
    assert red[1] == "contact [EMAIL] or [EMAIL] today"
    assert red[2] == "call [PHONE] or [PHONE] now"
    assert red[3] == "server at [IPV4] and [IPV4]"
    assert red[4] == "clean text with no identifiers at all"
    assert red[5] == "mixed: [EMAIL], [PHONE], [IPV4]"


def test_pii_counts_match_duckdb(spark):
    """The PII regexes parse identically under Java regex and RE2 —
    the property the text_stats oracle relies on."""
    import duckdb

    rows = [
        (1, "x bob@example.com 555-123-4567 10.0.0.1 y"),
        (2, "no pii here"),
        (3, "a@b.co next to 1.2.3.4 and 999.888.7777"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ipv4)
        for r in T.text_stats(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(r"""
            SELECT doc_id,
                len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')),
                len(regexp_extract_all(text,
                    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')),
                len(regexp_extract_all(text,
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
            FROM t
        """).fetchall()
    }
    assert got == want
