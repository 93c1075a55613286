"""Tests for the LLM-pipeline operator modules (dedup / similarity /
text / multimodal / streaming) over the driver testdata at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA

from glue_table_cache_spark.functions import text as T
from glue_table_cache_spark.operators import dedup as D
from glue_table_cache_spark.operators import multimodal as M
from glue_table_cache_spark.operators import similarity as S
from glue_table_cache_spark.streaming import windows as W


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(str(TESTDATA / "documents.parquet"))


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(str(TESTDATA / "embeddings.parquet"))


@pytest.fixture(scope="module")
def events(spark):
    from glue_table_cache_spark.io import read_table

    return read_table(spark, str(TESTDATA), "events")


@pytest.fixture(scope="module")
def docs_with_dups(spark, documents):
    """documents ∪ near-copies: doc_id+10000 duplicates doc_id exactly,
    doc_id+20000 with one appended word (near-dup)."""
    base = documents.limit(20)
    exact = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
        "lang", "source", "n_chars",
    )
    return documents.unionByName(exact).unionByName(near)


# -- text -------------------------------------------------------------------


def test_text_stats_shape(documents):
    stats = T.text_stats(documents)
    row = stats.where(F.col("doc_id") == 0).collect()[0]
    assert row.n_tokens > 0
    assert 0.0 <= row.stopword_ratio <= 1.0
    assert 0.0 <= row.quality <= 1.0
    assert len(row.fingerprint) == 32


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [("a  b\tc",), ("A b C",)], "text string"
    ).select(T.fingerprint("text").alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1]


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund ist nicht ein katze und",),
            ("xyzzy qwerty",),
        ],
        "text string",
    ).select(T.language_id("text").alias("lang"))
    assert [r.lang for r in df.collect()] == ["en", "de", "und"]


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], "text string").select(
        T.shingles("text", 3).alias("sh")
    )
    assert df.collect()[0].sh == ["one two"]


# -- dedup ------------------------------------------------------------------


def test_exact_dedup_removes_exact_copies(docs_with_dups):
    deduped = D.exact_dedup(docs_with_dups)
    assert deduped.count() == docs_with_dups.count() - 20
    # lowest id kept
    kept = {r.doc_id for r in deduped.select("doc_id").collect()}
    assert all(i in kept for i in range(20))
    assert all(i + 10000 not in kept for i in range(20))


def test_minhash_finds_exact_and_near_dups(docs_with_dups):
    pairs = D.minhash_dedup_pairs(docs_with_dups, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every exact copy must surface (jaccard 1.0)
    assert all((i, i + 10000) in got for i in range(20))
    # near-dups (1 appended word on ≥5-token docs) share most shingles
    near_hits = sum((i, i + 20000) in got for i in range(20))
    assert near_hits >= 15


def test_minhash_dedup_drops_higher_ids(docs_with_dups):
    deduped = D.minhash_dedup(docs_with_dups, threshold=0.9)
    kept = {r.doc_id for r in deduped.select("doc_id").collect()}
    # docs 8 and 12 are *natural* near-dups in the testdata (3-gram
    # shingle jaccard 0.973684), so 12 is legitimately dropped too
    assert all(i in kept for i in range(20) if i != 12)
    assert 12 not in kept
    assert all(i + 10000 not in kept for i in range(20))


def test_ngram_jaccard_matches_bruteforce(spark, docs_with_dups):
    """Inverted-index join must equal the definitional all-pairs
    Jaccard on a small sample."""
    sample = docs_with_dups.where(
        (F.col("doc_id") < 10) | (F.col("doc_id") >= 10000)
    )
    pairs = D.ngram_jaccard_pairs(sample, threshold=0.4)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    docs = sample.select(
        "doc_id", T.shingles("text", 3).alias("sh")
    ).collect()
    expect = {}
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            lo, hi = sorted((a.doc_id, b.doc_id))
            sa, sb = set(a.sh), set(b.sh)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.4:
                expect[(lo, hi)] = round(j, 6)
    assert got == expect


def test_simhash_near_pairs_find_near_dups(docs_with_dups):
    pairs = D.simhash_near_pairs(docs_with_dups, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 10000) in got for i in range(20))  # exact: dist 0


@pytest.fixture(scope="module")
def clique_corpus(spark, documents):
    """documents ∪ a 12-member boilerplate clique (near-identical
    copies of one doc, one distinct trailing word each) — the shape
    that lands in a single LSH/simhash bucket and, uncapped, costs
    m² candidate rows."""
    base = documents.limit(20)
    seed = documents.where(F.col("doc_id") == 0)
    out = base
    for j in range(12):
        out = out.unionByName(
            seed.select(
                F.lit(50000 + j).cast("long").alias("doc_id"),
                F.concat("text", F.lit(f" tail{j}")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    return out


def test_lsh_bucket_cap_pairs_subset_groups_identical(clique_corpus):
    """r14 hot-bucket guard property (VERDICT r13 #2): capped
    candidate pairs are a strict subset of the uncapped ones, and the
    transitive (connected-components) dedup keeps exactly the same
    groups — link-to-hub reconnects the clique at linear cost."""
    uncapped = D.minhash_dedup_pairs(
        clique_corpus, threshold=0.5, max_bucket_size=None
    )
    capped = D.minhash_dedup_pairs(
        clique_corpus, threshold=0.5, max_bucket_size=4
    )
    pu = {(r.id_a, r.id_b) for r in uncapped.collect()}
    pc = {(r.id_a, r.id_b) for r in capped.collect()}
    assert pc <= pu
    assert len(pc) < len(pu)  # the cap actually engaged on the clique
    # the clique still links through its hub (doc 0 — the seed the
    # clique copies — is the bucket minimum): every member survives
    # in at least one capped pair
    linked = {i for p in pc for i in p}
    assert all(50000 + j in linked for j in range(12))
    comps_u = {
        (r.id, r.component)
        for r in D.connected_components(uncapped).collect()
    }
    comps_c = {
        (r.id, r.component)
        for r in D.connected_components(capped).collect()
    }
    assert comps_c == comps_u


def test_simhash_bucket_cap_subset_groups_identical(clique_corpus):
    uncapped = D.simhash_near_pairs(
        clique_corpus, max_hamming=3, max_bucket_size=None
    )
    capped = D.simhash_near_pairs(
        clique_corpus, max_hamming=3, max_bucket_size=4
    )
    pu = {(r.id_a, r.id_b, r.hamming) for r in uncapped.collect()}
    pc = {(r.id_a, r.id_b, r.hamming) for r in capped.collect()}
    assert pc <= pu
    assert len(pc) < len(pu)
    comps_u = {
        (r.id, r.component)
        for r in D.connected_components(uncapped).collect()
    }
    comps_c = {
        (r.id, r.component)
        for r in D.connected_components(capped).collect()
    }
    assert comps_c == comps_u


# -- similarity -------------------------------------------------------------


def test_cosine_topk_matches_bruteforce_python(embeddings):
    queries = embeddings.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.cosine_topk(embeddings, queries, k=5)
    rows = topk.collect()
    assert len(rows) == 15
    # python oracle for query 0
    import math

    data = {r.vec_id: r.embedding for r in embeddings.collect()}
    q = data[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    expect = sorted(
        ((round(cos(q, v), 6), vid) for vid, v in data.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    got = sorted(
        [(r.cosine, r.vec_id) for r in rows if r.query_id == 0],
        key=lambda t: (-t[0], t[1]),
    )
    assert got == expect


def test_ann_lsh_recall_against_exact(embeddings):
    queries = embeddings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.cosine_topk(embeddings, queries, k=5)
    approx = S.ann_topk_lsh(embeddings, queries, k=5, planes=4)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3  # 4-plane multiprobe on random vectors


def test_embedding_stats(embeddings):
    stats = S.embedding_stats(embeddings)
    row = stats.where(F.col("vec_id") == 0).collect()[0]
    assert row.dim == 64
    assert row.l2_norm > 0


def test_embedding_near_pairs_self_duplicates(spark, embeddings):
    dup = embeddings.limit(5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    both = embeddings.unionByName(dup)
    pairs = S.embedding_near_pairs(both, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 1000) in got for i in range(5))


def test_embedding_near_pairs_hot_bucket_guard(spark, embeddings):
    """1.2k identical vectors collapse into ONE SRP bucket — the guard
    must raise (not run a 1.4M-pair quadratic join); 'skip' silently
    excludes the bucket; the guard leaves honest corpora untouched."""
    import pytest

    ident = spark.range(1200).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i % 7 + 1)) for i in range(8)]).alias(
            "embedding"
        ),
    )
    with pytest.raises(Exception, match="embedding_near_pairs"):
        S.embedding_near_pairs(ident, threshold=0.5).count()
    # skip posture: the hot bucket is excluded, so no pairs at all
    assert (
        S.embedding_near_pairs(
            ident, threshold=0.5, on_hot_bucket="skip"
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="on_hot_bucket"):
        S.embedding_near_pairs(ident, on_hot_bucket="warn")
    # guard on vs off parity on a non-degenerate corpus
    guarded = S.embedding_near_pairs(embeddings, threshold=0.9)
    unguarded = S.embedding_near_pairs(
        embeddings, threshold=0.9, max_bucket_size=None
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )


# -- multimodal -------------------------------------------------------------


def test_multimodal_decode_plumbing(documents):
    media = M.binary_media_df(
        documents.limit(50), "doc_id", "text", source_col="source"
    )
    # names+types must match the canonical schema (nullability flags vary
    # with how columns are derived — lit() is non-nullable, casts aren't)
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA
    ]
    meta = M.decode_media_meta(media)
    assert meta.schema == M.DECODED_META_SCHEMA
    rows = meta.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and r.width >= 16 and r.sha_prefix for r in rows)
    # deterministic: same payload → same fake decode
    again = {r.media_id: (r.width, r.height, r.sha_prefix)
             for r in M.decode_media_meta(media).collect()}
    assert all(again[r.media_id] == (r.width, r.height, r.sha_prefix)
               for r in rows)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_frame_sample_plan(documents):
    media = M.binary_media_df(documents.limit(3), "doc_id", "text")
    plan = M.frame_sample_plan(media, every_n=1)
    assert plan.columns == ["media_id", "frame_index"]
    assert plan.count() >= 3


# -- streaming --------------------------------------------------------------


def test_tumbling_stream_equals_batch(spark, events):
    batch = W.tumbling_counts_batch(events)
    stream_df = W.tumbling_counts_stream(
        spark, str(TESTDATA / "events.parquet")
    )
    W.run_stream_to_memory(stream_df, "tumbling_test")
    streamed = spark.sql("select * from tumbling_test")
    b = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in batch.collect()
    }
    s = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in streamed.collect()
    }
    assert b == s and len(b) > 0


def test_sessionize_batch(events):
    sessions = W.sessionize_batch(events, gap_minutes=30)
    agg = sessions.agg(
        F.sum("n_events").alias("total"), F.count("*").alias("n_sessions")
    ).collect()[0]
    assert agg.total == events.count()
    assert 0 < agg.n_sessions <= events.count()
    assert sessions.where(
        F.col("session_end") < F.col("session_start")
    ).count() == 0


def test_sessionize_native_matches_batch(events):
    """Spark's built-in session_window must produce the same sessions
    as the lag/cumsum chain."""
    native = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in W.sessionize_native(events, gap_minutes=30).collect()
    }
    batch = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in W.sessionize_batch(events, gap_minutes=30).collect()
    }
    assert native == batch and len(native) > 0


def test_sessionize_gap_boundary_semantics(spark):
    """An event exactly `gap` after the previous one still EXTENDS the
    session in both forms (session_window merges a window starting at
    the previous window's end; the lag/cumsum twin uses `> gap`) —
    pinned so neither silently drifts to half-open semantics."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),  # exactly the 30-min gap
            (1, "2024-01-01 01:00:01"),  # 1s past the gap -> new session
        ],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert W.sessionize_native(ev, gap_minutes=30).count() == 2
    assert W.sessionize_batch(ev, gap_minutes=30, id_col=None).count() == 2


def test_sliding_window_each_event_in_two_windows(events):
    sliding = W.sliding_counts_batch(events, "1 hour", "30 minutes")
    total = sliding.agg(F.sum("n_events").alias("s")).collect()[0].s
    assert total == 2 * events.count()


def test_watermark_drops_late_events(spark, events, tmp_path):
    """Three micro-batches: day-1 events, then day-3 events (advancing
    the watermark), then day-1 events again (late, beyond the 2h
    watermark → dropped).  Finalized day-1 windows must count only the
    first batch."""
    import os
    import time as _time

    from glue_table_cache_spark.io import read_table

    d = tmp_path / "stream_src"
    d.mkdir()
    # read_table normalizes ts to TimestampType whichever generation of
    # the testdata (nanos-long or timestamp[us]) is on disk
    raw = read_table(spark, str(TESTDATA), "events")
    lo = raw.selectExpr("min(ts) AS lo").collect()[0].lo
    early = raw.where(
        F.col("ts") < F.lit(lo) + F.expr("INTERVAL 1 DAY")
    )
    late_day = raw.where(
        F.col("ts") >= F.lit(lo) + F.expr("INTERVAL 2 DAY")
    ).where(F.col("ts") < F.lit(lo) + F.expr("INTERVAL 3 DAY"))
    early.coalesce(1).write.parquet(str(d / "b1"))
    late_day.coalesce(1).write.parquet(str(d / "b2"))
    early.coalesce(1).write.parquet(str(d / "b3"))
    files = []
    for sub in ["b1", "b2", "b3"]:
        f = next((d / sub).glob("part-*.parquet"))
        target = d / f"{sub}.parquet"
        f.rename(target)
        files.append(target)
        import shutil

        shutil.rmtree(d / sub)
    now = _time.time()
    for i, f in enumerate(files):  # file source orders by mtime
        os.utime(f, (now + i * 10, now + i * 10))

    sdf = W.tumbling_counts_stream(
        spark, str(d), watermark="2 hours", max_files_per_trigger=1
    )
    W.run_stream_to_memory(sdf, "wm_test", output_mode="append")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM wm_test").collect()
    }
    # Batch 3 re-sent day-1 events.  Events within the allowed lateness
    # of the *operative* watermark may legitimately be re-aggregated
    # (the watermark used in batch N is computed from an earlier batch),
    # so the guarantee to assert is: every window that closed before the
    # most conservative possible watermark (day-1 max - 2h, from batch 1
    # alone) counts batch-1 events exactly once.
    import datetime

    expected_early = {
        (r.window_start, r.event_type): r.n_events
        for r in W.tumbling_counts_batch(early).collect()
    }
    day1_max = early.selectExpr("max(ts) AS m").collect()[0].m
    cutoff = day1_max - datetime.timedelta(hours=2)
    safe = [
        k for k in got
        if k[0].day == 1
        and k[0] + datetime.timedelta(hours=1) <= cutoff
    ]
    assert len(safe) >= 10  # plenty of finalized day-1 windows
    assert all(got[k] == expected_early[k] for k in safe)
    # and the late duplicates beyond allowed lateness never re-emitted a
    # closed window with inflated counts
    dup = [k for k in safe if got[k] != expected_early[k]]
    assert dup == []


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    """applyInPandasWithState twin: emitted (closed) sessions must equal
    the batch twin's non-final sessions per user."""
    from pyspark.sql.window import Window as SqlWindow

    from glue_table_cache_spark.io import read_table

    d = tmp_path / "sess_src"
    d.mkdir()
    raw = read_table(spark, str(TESTDATA), "events")
    mid = raw.selectExpr(
        "approx_percentile(unix_micros(ts), 0.5) AS m"
    ).collect()[0].m
    for name, df in [
        ("b1", raw.where(F.unix_micros("ts") <= mid)),
        ("b2", raw.where(F.unix_micros("ts") > mid)),
    ]:
        df.coalesce(1).write.parquet(str(d / name))
        f = next((d / name).glob("part-*.parquet"))
        f.rename(d / f"{name}.parquet")
        import shutil

        shutil.rmtree(d / name)
    import os
    import time as _time

    now = _time.time()
    os.utime(d / "b1.parquet", (now, now))
    os.utime(d / "b2.parquet", (now + 10, now + 10))

    sdf = W.sessionize_stream(
        spark, str(d), gap_minutes=30, max_files_per_trigger=1
    )
    W.run_stream_to_memory(sdf, "sess_stream", output_mode="append")
    streamed = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch = W.sessionize_batch(raw, gap_minutes=30)
    w = SqlWindow.partitionBy("user_id")
    closed = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
    )
    expected = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in closed.collect()
    }
    assert streamed == expected and len(expected) > 0


# -- connected components / portable hash family ----------------------------


def test_connected_components_chain(spark):
    """A≈B≈C where A,C are not directly similar must still collapse to
    one component (transitive closure the greedy pairwise policy
    misses)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    comp = {
        (r.id, r.component)
        for r in D.connected_components(pairs).collect()
    }
    assert comp == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_dedup_groups_keeps_one_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        (r.doc_id, r.group_id, r.is_representative)
        for r in D.dedup_groups(docs, pairs).collect()
    }
    assert rows == {
        (1, 1, True), (2, 1, False), (3, 1, False), (4, 4, True)
    }


def test_portable_minhash_finds_planted_dups(docs_with_dups):
    """The md5-derived portable family (oracle-checkable in DuckDB)
    must find the same planted dups as the xxhash64 default."""
    pairs = D.minhash_dedup_pairs(docs_with_dups, threshold=0.5,
                                  portable=True)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 10000) in got for i in range(20))
    assert sum((i, i + 20000) in got for i in range(20)) >= 15


def test_portable_simhash_finds_planted_dups(docs_with_dups):
    pairs = D.simhash_near_pairs(docs_with_dups, max_hamming=3,
                                 portable=True)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 10000) in got for i in range(20))


def test_portable_simhash_rejects_wide_signature(documents):
    with pytest.raises(ValueError, match="60 bits"):
        D.simhash(documents, bits=64, portable=True)


# -- IVF ---------------------------------------------------------------------


def test_ivf_full_probe_equals_exact(embeddings):
    """nprobe == nlist scans every cell → must equal the exact top-k."""
    q = embeddings.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id, r.cosine)
        for r in S.cosine_topk(embeddings, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.vec_id, r.cosine)
        for r in S.ivf_topk(
            embeddings, q, k=5, nlist=8, nprobe=8, iters=1
        ).collect()
    }
    assert ivf == exact


def test_ivf_broadcast_opt_out_identical(embeddings):
    """broadcast_queries=False swaps the broadcast probe join for a
    cell-copartitioned shuffle equi-join (the corpus-scale-queries
    shape) — results must be identical, and the plan must actually
    drop the broadcast."""
    q = embeddings.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = S.ivf_train(embeddings, nlist=8, iters=1)
    bc = S.ivf_topk(
        embeddings, q, k=5, nlist=8, nprobe=3, centroids=cents
    )
    sh = S.ivf_topk(
        embeddings, q, k=5, nlist=8, nprobe=3, centroids=cents,
        broadcast_queries=False,
    )
    assert sorted(map(tuple, bc.collect())) == sorted(
        map(tuple, sh.collect())
    )
    # the probe join must be requested as a cluster-copartitioned
    # shuffle (the query×CENTROID scoring join stays broadcast — that
    # one is bounded by |Q|×nlist and is not the opt-out's subject;
    # AQE may still locally re-broadcast a tiny side at runtime)
    plan = sh._jdf.queryExecution().optimizedPlan().toString()
    assert "hashpartitioning(cluster" in plan.replace(
        "RepartitionByExpression [cluster", "hashpartitioning(cluster"
    )


def test_ivf_partial_probe_recall(embeddings):
    """Probing half the cells must still recover a good share of the
    exact neighbors (cell-local search)."""
    q = embeddings.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(embeddings, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.ivf_topk(
            embeddings, q, k=10, nlist=8, nprobe=4, iters=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4
    # every returned neighbor's cosine must be exact (verified scoring)
    assert len(approx) == len(exact)


def test_ivf_exclude_self_flag(embeddings):
    """With exclude_self=False an external query whose id collides with
    a corpus id still sees that corpus vector (id equality is not
    identity across id spaces)."""
    q = embeddings.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with_self = S.ivf_topk(
        embeddings, q, k=3, nlist=4, nprobe=4, iters=1, exclude_self=False
    ).collect()
    # the identical vector is its own nearest neighbor at cosine 1.0
    assert any(r.vec_id == 0 and r.rank == 1 for r in with_self)
    without = S.ivf_topk(
        embeddings, q, k=3, nlist=4, nprobe=4, iters=1
    ).collect()
    assert all(r.vec_id != 0 for r in without)


def test_ivf_trained_centroids_reusable(embeddings):
    cents = S.ivf_train(embeddings, nlist=4, iters=1)
    assert len(cents) == 4
    q = embeddings.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.ivf_topk(
        embeddings, q, k=3, nlist=4, nprobe=4, centroids=cents
    )
    assert out.count() == 6


# -- winnowing ---------------------------------------------------------------


def test_winnow_fingerprints_deterministic_and_shared(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox JUMPED over the lazy dog!"),
            (4, "completely different text about spark engines"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.id: set(r.fingerprints)
        for r in T.winnow_fingerprints(df).collect()
    }
    assert fps[1] == fps[2]  # identical docs → identical sketch
    # one local edit keeps most fingerprints (winnowing guarantee)
    shared = len(fps[1] & fps[3]) / len(fps[1])
    assert shared >= 0.5
    assert len(fps[1] & fps[4]) <= 2  # unrelated docs share ~nothing


def test_winnow_pairs_finds_near_dups(docs_with_dups):
    pairs = D.winnow_pairs(docs_with_dups, min_overlap=0.8)
    got = {(r.id_a, r.id_b): r.overlap for r in pairs.collect()}
    # exact copies share every fingerprint (overlap 1.0)
    assert all(got.get((i, i + 10000)) == 1.0 for i in range(20))
    # near-copies (1 appended word) keep most of the sketch
    assert sum((i, i + 20000) in got for i in range(20)) >= 15


def test_winnow_pairs_separates_unrelated_docs(documents):
    """On the natural corpus the containment score must separate: only
    genuine near-dups survive min_overlap=0.8 (docs 8/12 et al.), not
    the same-vocabulary background pairs."""
    n_docs = documents.count()
    pairs = D.winnow_pairs(documents, min_overlap=0.8)
    n_pairs = pairs.count()
    assert 0 < n_pairs < n_docs  # far below the ~n²/2 all-pairs blowup
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (8, 12) in got  # the known natural near-dup pair


def test_repetition_stats_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nbuy now"),
            (2, "a varied document with several distinct lines\n"
                "another unique line here\nand a third one"),
            (3, "spam spam spam spam spam spam spam spam"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.repetition_stats(df).collect()}
    assert rows[1].dup_line_frac == 0.75       # 4 lines, 1 distinct
    # "buy now"×4 out of 7 sliding bigrams ("now buy" interleaves)
    assert rows[1].top_bigram_frac == round(4 / 7, 6)
    assert rows[2].dup_line_frac == 0.0
    assert rows[2].dup_trigram_frac == 0.0
    assert rows[3].dup_trigram_frac > 0.8      # one token repeated
    assert rows[3].top_bigram_frac == 1.0
    assert rows[4].n_lines == 0                # empty doc → all zeros
    assert rows[4].dup_line_frac == 0.0
    assert rows[4].top_bigram_frac == 0.0


def test_repetition_stats_on_corpus(documents):
    """Synthetic corpus docs are generated prose — none should look
    like pure boilerplate, and every signal must be in [0, 1]."""
    rows = T.repetition_stats(documents).collect()
    assert len(rows) == documents.count()
    for r in rows:
        assert 0.0 <= r.dup_line_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0


def test_sessionize_stream_event_time_timeout_flushes_open_sessions(
    spark, tmp_path
):
    """With a watermark, an open session whose (end + gap) falls behind
    the watermark must be emitted via event-time timeout and its state
    dropped — sessions flush with bounded latency instead of living in
    state forever.  Three micro-batches: user 1's burst, then user 2
    far in the future (advances the watermark past user 1's gap), then
    more user 2 (the batch in which user 1's timeout fires)."""
    import datetime
    import os
    import shutil
    import time as _time

    d = tmp_path / "sess_to_src"
    d.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def mk(name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        )
        df.coalesce(1).write.parquet(str(d / name))
        f = next((d / name).glob("part-*.parquet"))
        target = d / f"{name}.parquet"
        f.rename(target)
        shutil.rmtree(d / name)
        return target

    mins = datetime.timedelta(minutes=1)
    files = [
        mk("b1", [(1, i, t0 + i * mins) for i in range(5)]),
        mk("b2", [(2, 100, t0 + 120 * mins)]),
        mk("b3", [(2, 101, t0 + 180 * mins)]),
    ]
    now = _time.time()
    for i, f in enumerate(files):  # file source orders by mtime
        os.utime(f, (now + i * 10, now + i * 10))

    sdf = W.sessionize_stream(
        spark, str(d), gap_minutes=30, max_files_per_trigger=1,
        watermark="10 minutes",
    )
    W.run_stream_to_memory(sdf, "sess_timeout_test", output_mode="append")
    rows = spark.sql("SELECT * FROM sess_timeout_test").collect()
    by_user = {(r.user_id): r for r in rows}
    # user 1's only session closed via timeout: 5 events, 4-minute span
    assert 1 in by_user
    r1 = by_user[1]
    assert r1.n_events == 5
    assert r1.session_start == t0
    assert r1.session_end == t0 + 4 * mins
    # user 2's first session closed by the ordinary gap rule when its
    # second event arrived; the session opened at t0+180min is still in
    # state (the watermark never passed its gap) and must NOT be emitted
    r2 = by_user[2]
    assert r2.n_events == 1
    assert r2.session_start == t0 + 120 * mins
    assert not any(
        r.user_id == 2 and r.session_start == t0 + 180 * mins for r in rows
    )


def test_resize_media_aspect_fit(documents):
    media = M.binary_media_df(documents.limit(20), "doc_id", "text")
    out = M.resize_media(media, target_w=100, target_h=50).collect()
    assert len(out) == 20
    for r in out:
        w, h, _ = M.fake_decode_meta(bytes(r.payload))
        assert 1 <= r.width <= 100 and 1 <= r.height <= 50
        # exact aspect-fit formula
        scale = min(100 / w, 50 / h)
        assert r.width == max(1, int(w * scale))
        assert r.height == max(1, int(h * scale))


def test_extract_features_deterministic(documents):
    media = M.binary_media_df(documents.limit(10), "doc_id", "text")
    a = {r.media_id: r.features for r in M.extract_features(media, dim=16).collect()}
    b = {r.media_id: r.features for r in M.extract_features(media, dim=16).collect()}
    assert a == b  # stable across runs
    assert all(len(v) == 16 for v in a.values())
    assert all(-1.0 <= x < 1.0 for v in a.values() for x in v)
    # different payloads → different features
    assert len({tuple(v) for v in a.values()}) == len(a)


def test_minhash_dedup_transitive_collapses_chains(spark):
    """A≈B≈C chain where A,C are not directly similar: greedy keeps A
    and C; transitive keeps only A."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    # B = A with 2 words changed; C = B with 2 MORE changed → A vs C
    # differ by 4 words (below threshold), A≈B and B≈C above it
    a = " ".join(toks)
    b = " ".join(["x1", "x2"] + toks[2:])
    c = " ".join(["x1", "x2", "y3", "y4"] + toks[4:])
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(
            df, threshold=0.5, shingle_k=2
        ).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs
    greedy = {
        r.doc_id
        for r in D.minhash_dedup(df, threshold=0.5, shingle_k=2).collect()
    }
    transitive = {
        r.doc_id
        for r in D.minhash_dedup(
            df, threshold=0.5, transitive=True, shingle_k=2
        ).collect()
    }
    assert greedy in ({1}, {1, 3})  # greedy may keep C
    assert transitive == {1}


# -- sampling ----------------------------------------------------------------


def test_deterministic_sample_reproducible(documents):
    from glue_table_cache_spark.operators import sampling as SM

    a = {r.doc_id for r in SM.deterministic_sample(documents, 0.3).collect()}
    b = {r.doc_id for r in SM.deterministic_sample(documents, 0.3).collect()}
    assert a == b  # same rows every run
    n = documents.count()
    assert 0.2 * n < len(a) < 0.4 * n  # ≈30%
    # a larger fraction strictly extends the sample (nested samples)
    bigger = {
        r.doc_id for r in SM.deterministic_sample(documents, 0.6).collect()
    }
    assert a < bigger
    # different salt decorrelates
    other = {
        r.doc_id
        for r in SM.deterministic_sample(documents, 0.3, salt="val").collect()
    }
    assert other != a


def test_stratified_sample_per_stratum_fractions(documents):
    from glue_table_cache_spark.operators import sampling as SM

    base = {
        r.source: r.n
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    s0, s1 = sorted(base)[:2]
    out = SM.stratified_sample(
        documents, {s0: 1.0, s1: 0.5}, default_fraction=0.0
    )
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got[s0] == base[s0]          # fraction 1.0 keeps everything
    assert 0 < got.get(s1, 0) < base[s1]  # ≈half
    assert set(got) == {s0, s1}         # others defaulted to 0


def test_stratified_head_exact_counts(documents):
    from glue_table_cache_spark.operators import sampling as SM

    out = SM.stratified_head(documents, 3, strata_col="source")
    counts = [
        r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    ]
    assert all(c == 3 for c in counts)
    # deterministic
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in SM.stratified_head(documents, 3, strata_col="source").collect()
    }
    assert a == b


def test_line_dedup_keeps_first_occurrence(spark):
    from glue_table_cache_spark.operators import dedup as D

    boiler = "subscribe to our newsletter for the latest updates"
    docs = spark.createDataFrame(
        [
            (1, f"unique opening line of the first document\n{boiler}\nok"),
            (2, f"{boiler}\nsecond doc keeps its own original content here"),
            (3, f"third doc body stays fully intact as written\n{boiler}"),
            (4, boiler),  # nothing survives → empty text, row kept
            (5, "short\nok"),  # short lines never deduped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.line_dedup(docs, min_len=30).collect()}
    assert out[1].text == (
        f"unique opening line of the first document\n{boiler}\nok"
    )  # first occurrence survives in place
    assert out[2].text == "second doc keeps its own original content here"
    assert out[3].text == "third doc body stays fully intact as written"
    assert out[4].text == "" and out[4].n_lines == 1 and out[4].n_kept == 0
    assert out[5].text == "short\nok" and out[5].n_kept == 2
    assert out[1].n_lines == 3 and out[1].n_kept == 3
    # deterministic + plan has no cartesian product
    again = {r.doc_id: r.text for r in D.line_dedup(docs, min_len=30).collect()}
    assert again == {k: v.text for k, v in out.items()}
    plan = D.line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_mixture_sample_hits_token_targets(spark):
    from glue_table_cache_spark.operators import sampling as SM

    # 3 domains, 100-token docs: web 60k, books 20k, code 10k tokens
    rows = [
        (i, src, 100)
        for src, n in (("web", 600), ("books", 200), ("code", 100))
        for i in range(n)
    ]
    # deterministic ids (NOT Python's salted hash()) so every run
    # samples the identical id set; crc32 still spreads them so the
    # sampler's own hashing sees realistic, non-sequential keys
    import zlib

    df = spark.createDataFrame(
        [
            (zlib.crc32(f"{s}:{i}".encode()) * 10 + j, s, t)
            for j, (i, s, t) in enumerate(rows)
        ],
        "doc_id long, source string, n_tokens int",
    )
    # budget 30k tokens at web:books:code = 1:1:1 → 10k each; code has
    # exactly 10k → keeps all; web keeps ≈1/6; books ≈1/2.  Bounds are
    # inclusive and ±3.5σ-wide (σ≈0.9k tokens for web) — the sample is
    # hash-Bernoulli, not exact-count
    out = SM.mixture_sample(
        df, {"web": 1, "books": 1, "code": 1}, total_tokens=30_000
    )
    got = {
        r.source: r.toks
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    assert got["code"] == 10_000  # underweight stratum keeps everything
    assert 6_500 <= got["web"] <= 13_500
    assert 6_500 <= got["books"] <= 13_500
    # reproducible
    again = {r.doc_id for r in SM.mixture_sample(
        df, {"web": 1, "books": 1, "code": 1}, total_tokens=30_000
    ).collect()}
    assert again == {r.doc_id for r in out.collect()}
    # unnormalised weights work; unlisted strata are dropped
    out2 = SM.mixture_sample(df, {"web": 6}, total_tokens=6_000)
    assert {r.source for r in out2.collect()} == {"web"}


def test_quantile_filter_global_and_stratified(spark):
    from glue_table_cache_spark.operators import sampling as SM

    df = spark.createDataFrame(
        [(i, "a" if i < 800 else "b", float(i)) for i in range(1000)],
        "doc_id long, source string, score double",
    )
    # exact global top 10% = scores 900..999
    top = SM.quantile_filter(df, 0.1, score_col="score", exact=True)
    got = sorted(r.score for r in top.collect())
    assert got[0] >= 899.0 and len(got) in (100, 101)
    # approx global path lands within sketch error of the same cutoff
    approx = SM.quantile_filter(df, 0.1, score_col="score")
    n = approx.count()
    assert 95 <= n <= 105
    assert set(approx.columns) == set(df.columns)
    # per-stratum: top 50% of each stratum, not of the global pool
    per = SM.quantile_filter(
        df, 0.5, score_col="score", strata_col="source", exact=True
    )
    counts = {
        r.source: r.n
        for r in per.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] in (400, 401)
    assert counts["b"] in (100, 101)  # stratum b would vanish globally


def test_portable_sample_matches_duckdb(documents):
    """The portable sampling predicate is bit-identical in DuckDB —
    the property the driver oracle (_SAMPLE_ORACLE) relies on."""
    import duckdb

    from glue_table_cache_spark.operators import sampling as SM

    got = sorted(
        r.doc_id
        for r in SM.deterministic_sample(
            documents, 0.3, salt="train", portable=True
        ).collect()
    )
    path = f"{TESTDATA}/documents.parquet"
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM read_parquet($p) WHERE "
            "('0x' || substr(md5('train:' || CAST(doc_id AS VARCHAR)), 1, 15))"
            "::BIGINT % 1000000 < 300000 ORDER BY doc_id",
            params={"p": path},
        ).fetchall()
    ]
    assert got == want


# -- decontamination ---------------------------------------------------------


def test_contamination_finds_verbatim_and_quoting_docs(spark, documents):
    from glue_table_cache_spark.operators import decontamination as DC

    # benchmark = 3 doc texts; corpus = all docs plus one synthetic page
    # quoting benchmark item 0 inside unrelated filler
    bench = (
        documents.where(F.col("doc_id").isin(1, 2, 3))
        .select(F.col("doc_id").alias("bench_id"), "text")
    )
    b0 = bench.where(F.col("bench_id") == 1).first().text
    quoting = spark.createDataFrame(
        [(90001, "totally unrelated preamble words here " + b0 + " trailing commentary")],
        "doc_id long, text string",
    )
    corpus = documents.select("doc_id", "text").unionByName(quoting)
    pairs = DC.contamination_pairs(
        corpus, bench, shingle_k=3, threshold=0.9
    )
    got = {(r.doc_id, r.bench_id) for r in pairs.collect()}
    # each benchmark item is contained in its own source doc...
    assert {(1, 1), (2, 2), (3, 3)} <= got
    # ...and the quoting page covers item 1 despite low Jaccard
    assert (90001, 1) in got
    # containment for the verbatim self-match is exactly 1.0
    self_row = pairs.where(
        (F.col("doc_id") == 1) & (F.col("bench_id") == 1)
    ).first()
    assert self_row.containment == 1.0


def test_decontaminate_drops_only_contaminated(spark, documents):
    from glue_table_cache_spark.operators import decontamination as DC

    bench = (
        documents.where(F.col("doc_id").isin(5,))
        .select(F.col("doc_id").alias("bench_id"), "text")
    )
    clean = DC.decontaminate(
        documents, bench, shingle_k=3, threshold=0.9
    )
    ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 5 not in ids
    assert len(ids) >= documents.count() - 3  # only near-copies of 5 also drop


def test_contamination_plan_broadcasts_benchmark(documents):
    from glue_table_cache_spark.operators import decontamination as DC

    bench = documents.limit(3).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    plan = DC.contamination_pairs(documents, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# -- sequence packing --------------------------------------------------------


def test_pack_sequences_concat_and_chunk(spark):
    from glue_table_cache_spark.operators import packing as P

    rows = [(i, "s", t) for i, t in enumerate([100, 100, 100, 50, 300, 10])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in P.pack_sequences(df, budget=256).collect()
    }
    # stream: 0@0, 100@p0, 200@p0, 300→p1 off 44, 350→p1, 650→p2
    assert out == {
        0: (0, 0), 1: (0, 100), 2: (0, 200),
        3: (1, 44), 4: (1, 94), 5: (2, 138),
    }


def test_pack_sequences_streams_independent(spark):
    from glue_table_cache_spark.operators import packing as P

    rows = [(1, "a", 200), (2, "b", 200), (3, "a", 200), (4, "b", 200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {
        r.doc_id: r.pack_id
        for r in P.pack_sequences(df, budget=256).collect()
    }
    # each stream restarts at pack 0
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}


def test_pack_stats_fill_ratio(spark):
    from glue_table_cache_spark.operators import packing as P

    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 100)], "doc_id long, source string, n_tokens long"
    )
    packed = P.pack_sequences(df, budget=256)
    st = P.pack_stats(packed, budget=256).first()
    assert st.n_packs == 2 and st.total_tokens == 400
    assert abs(st.fill_ratio - 400 / 512) < 1e-9


def test_dedup_events_stream_exactly_once(spark, events, tmp_path):
    """Duplicated input events come out exactly once; clean events are
    untouched (streaming twin of exact dedup, state bounded by the
    watermark)."""
    dup_dir = tmp_path / "dup_events"
    doubled = events.unionByName(events)  # every event twice
    doubled.write.parquet(str(dup_dir))
    sdf = W.dedup_events_stream(spark, str(dup_dir))
    W.run_stream_to_memory(sdf, "dedup_stream_test", output_mode="append")
    out = spark.sql("SELECT * FROM dedup_stream_test")
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


# -- curation pipeline -------------------------------------------------------


def test_curate_default_flow(documents):
    from glue_table_cache_spark.operators import pipeline as PL

    out = PL.curate(documents)
    n_in, n_out = documents.count(), out.count()
    assert 0 < n_out <= n_in
    # every survivor meets the quality bar; annotations present
    assert out.where(F.col("quality") < 0.3).count() == 0
    assert {"quality", "lang_pred"} <= set(out.columns)
    # near-dups removed: docs 8 and 12 are natural near-dups in the
    # fixture — at most one survives
    assert out.where(F.col("doc_id").isin(8, 12)).count() <= 1


def test_curate_full_flow_stages_compose(spark, documents):
    from glue_table_cache_spark.operators import pipeline as PL

    bench = documents.where(F.col("doc_id").isin(3,)).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    cfg = PL.CurationConfig(
        min_quality=0.0,
        benchmark=bench,
        decontamination_k=3,
        decontamination_threshold=0.9,
        dedup_threshold=0.8,
        sample_fraction=0.5,
        pack_budget=128,
    )
    out = PL.curate(documents, cfg)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 3 not in ids  # decontaminated
    assert {"pack_id", "pack_offset", "n_tokens"} <= set(out.columns)
    # deterministic end-to-end
    ids2 = {r.doc_id for r in PL.curate(documents, cfg).select("doc_id").collect()}
    assert ids == ids2


def test_curate_language_and_pii_filters(spark):
    from glue_table_cache_spark.operators import pipeline as PL

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in the house is that", "s"),
            (2, "der hund und die katze ist nicht ein zu", "s"),
            (3, "the mail is bob@example.com and that is the end of it", "s"),
        ],
        "doc_id long, text string, source string",
    )
    cfg = PL.CurationConfig(
        min_quality=None, languages=("en",), drop_pii=True,
        dedup_threshold=None,
    )
    ids = {r.doc_id for r in PL.curate(df, cfg).collect()}
    assert ids == {1}  # 2 is German, 3 has PII


def test_curate_mixture_stage(spark, documents):
    from glue_table_cache_spark.operators import pipeline as PL

    sources = [r.source for r in documents.select("source").distinct().collect()]
    s0 = sorted(sources)[0]
    cfg = PL.CurationConfig(
        min_quality=None, dedup_threshold=None,
        mixture_weights={s0: 1.0}, mixture_total_tokens=10**9,
    )
    out = PL.curate(documents, cfg)
    got = {r.source for r in out.collect()}
    assert got == {s0}  # unlisted strata dropped
    # budget far above the stratum's mass → the whole stratum survives
    assert out.count() == documents.where(F.col("source") == s0).count()
    assert "n_tokens" in out.columns


def test_curate_single_tokenizer_for_mixture_and_packing(spark, documents):
    """When both token-denominated stages run, n_tokens is computed
    once with token_count — the mixture budget and the pack sizes must
    be measured in the same units."""
    from glue_table_cache_spark.functions.text import token_count
    from glue_table_cache_spark.operators import pipeline as PL

    sources = sorted(
        r.source for r in documents.select("source").distinct().collect()
    )
    cfg = PL.CurationConfig(
        min_quality=None, dedup_threshold=None,
        mixture_weights={s: 1.0 for s in sources},
        mixture_total_tokens=10**9,
        pack_budget=128,
    )
    out = PL.curate(documents, cfg)
    expected = {
        r.doc_id: r.n
        for r in documents.select(
            "doc_id", token_count("text").cast("long").alias("n")
        ).collect()
    }
    for r in out.select("doc_id", "n_tokens").collect():
        assert r.n_tokens == expected[r.doc_id], r.doc_id


def test_portable_hash60_parity_diverse_inputs(spark):
    """portable_hash60 must be bit-identical in DuckDB over the full
    input space the oracles feed it: ascii, unicode, quotes, empties."""
    import duckdb

    vals = [
        "", " ", "plain", "with 'quotes'", 'double "q"', "tab\tsep",
        "newline\nin text", "unicode: 的是了 ñé ü", "123456", "a,b,c",
        "trailing space ", r"back\slash", "percent%sign", "@#$%^&*",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    from glue_table_cache_spark.operators.dedup import portable_hash60

    got = {
        r.s: (r.h0, r.h7)
        for r in df.select(
            "s",
            portable_hash60(F.col("s")).alias("h0"),
            portable_hash60(F.col("s"), seed=7).alias("h7"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT s, ('0x' || substr(md5(s), 1, 15))::BIGINT, "
            "('0x' || substr(md5('7:' || s), 1, 15))::BIGINT FROM t"
        ).fetchall()
    }
    assert got == want


# -- as-of / range joins -----------------------------------------------------


def test_asof_join_backward_matches_duckdb(spark):
    """Parity with DuckDB's native ASOF LEFT JOIN (inclusive >=)."""
    import duckdb

    from glue_table_cache_spark.operators import joins as J

    trades = [
        (1, "2024-01-01 10:00:05", 100),
        (1, "2024-01-01 10:00:00", 101),  # equal-ts to a quote
        (1, "2024-01-01 09:00:00", 102),  # before any quote
        (2, "2024-01-01 11:30:00", 200),
    ]
    quotes = [
        (1, "2024-01-01 10:00:00", 9.5),
        (1, "2024-01-01 10:00:04", 9.7),
        (1, "2024-01-01 11:00:00", 9.9),
        (2, "2024-01-01 11:00:00", 20.0),
    ]
    lt = spark.createDataFrame(
        trades, "user_id long, ts string, trade_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    rt = spark.createDataFrame(
        quotes, "user_id long, ts string, px double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.trade_id: r.px
        for r in J.asof_join(lt, rt, on="ts", by="user_id").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id BIGINT, ts TIMESTAMP, trade_id BIGINT)")
    con.execute("CREATE TABLE q (user_id BIGINT, ts TIMESTAMP, px DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", trades)
    con.executemany("INSERT INTO q VALUES (?, ?, ?)", quotes)
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT t.trade_id, q.px FROM t ASOF LEFT JOIN q "
            "ON t.user_id = q.user_id AND t.ts >= q.ts"
        ).fetchall()
    }
    assert got == want
    assert got[100] == 9.7 and got[101] == 9.5 and got[102] is None


def test_asof_join_forward(spark):
    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame(
        [(1, 5, 10), (1, 20, 11)], "k long, t long, lid long"
    )
    rt = spark.createDataFrame(
        [(1, 7, 1.0), (1, 25, 2.0)], "k long, t long, v double"
    )
    got = {
        r.lid: r.v
        for r in J.asof_join(
            lt, rt, on="t", by="k", direction="forward"
        ).collect()
    }
    assert got == {10: 1.0, 11: 2.0}


def test_asof_join_single_shuffle_no_nested_loop(spark):
    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame([(1, 5, 10)], "k long, t long, lid long")
    rt = spark.createDataFrame([(1, 7, 1.0)], "k long, t long, v double")
    plan = J.asof_join(lt, rt, on="t", by="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_naive(spark, events):
    """Bucketed interval join equals the naive theta-join filter."""
    from glue_table_cache_spark.operators import joins as J

    ev = events.select("event_id", "user_id", "ts").limit(300)
    # intervals: one hour starting at each distinct session-ish point
    iv = (
        events.select("user_id", F.col("ts").alias("start"))
        .limit(40)
        .withColumn("end", F.col("start") + F.expr("INTERVAL 45 MINUTES"))
        .withColumn("iv_id", F.monotonically_increasing_id())
    )
    got = J.range_join(
        ev, iv, left_ts="ts", right_start="start", right_end="end",
        by="user_id", bucket="30 minutes",
    ).select("event_id", "iv_id")
    naive = (
        ev.join(iv, "user_id")
        .where((F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end")))
        .select("event_id", "iv_id")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert naive.count() > 0  # the comparison is non-vacuous


def test_range_join_bucket_explosion_guard(spark):
    """An interval overlapping more buckets than the cap raises at
    execution time instead of silently fanning out 10⁴ rows."""
    import pytest
    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    # a year-long interval at 1-hour buckets: ~8760 buckets
    rt = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2025-01-01 00:00:00")],
        "k long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    out = J.range_join(
        lt, rt, left_ts="ts", right_start="start", right_end="end",
        by="k", bucket="1 hour", max_buckets_per_interval=100,
    )
    with pytest.raises(Exception, match="range_join"):
        out.collect()
    # within the cap the same join runs fine
    ok = J.range_join(
        lt, rt, left_ts="ts", right_start="start", right_end="end",
        by="k", bucket="1 hour", max_buckets_per_interval=10_000,
    )
    assert ok.count() == 1


def test_range_join_null_bounds(spark):
    """NULL-bounded intervals can contain no ts: default posture drops
    the row; on_null_bounds='error' raises with a naming message
    (not the confusing bucket-cap message a NULL used to hit)."""
    import pytest
    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    rt = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            (1, "2024-01-01 00:00:00", None),
            (1, None, "2024-01-01 01:00:00"),
        ],
        "k long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    out = J.range_join(
        lt, rt, left_ts="ts", right_start="start", right_end="end",
        by="k", bucket="1 hour",
    )
    assert out.count() == 1  # null-bounded intervals silently dropped
    err = J.range_join(
        lt, rt, left_ts="ts", right_start="start", right_end="end",
        by="k", bucket="1 hour", on_null_bounds="error",
    )
    with pytest.raises(Exception, match="NULL interval bound"):
        err.collect()
    with pytest.raises(ValueError, match="on_null_bounds"):
        J.range_join(
            lt, rt, left_ts="ts", right_start="start",
            right_end="end", by="k", on_null_bounds="ignore",
        )


def test_asof_join_randomized_parity_with_duckdb(spark):
    """200 random trades × 80 random quotes across 8 keys, fixed seed —
    one-shot cross-engine check of the window-based as-of shape."""
    import random

    import duckdb

    rng = random.Random(42)
    trades = [
        (rng.randrange(8), rng.randrange(10_000), i)
        for i in range(200)
    ]
    quotes = [
        (rng.randrange(8), rng.randrange(10_000), round(rng.random(), 6))
        for _ in range(80)
    ]
    # unique (key, t) on the right: collapse to max like the entry does
    from collections import defaultdict

    qmap: dict = defaultdict(float)
    for k, t, v in quotes:
        qmap[(k, t)] = max(qmap[(k, t)], v)
    quotes = [(k, t, v) for (k, t), v in qmap.items()]

    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame(trades, "k long, t long, tid long")
    rt = spark.createDataFrame(quotes, "k long, t long, v double")
    got = {r.tid: r.v for r in J.asof_join(lt, rt, on="t", by="k").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT, tid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", trades)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", quotes)
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT l.tid, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, events):
    """Watermarked stream-stream join emits exactly the batch join's
    pairs on bounded input (availableNow)."""
    sdf = W.stream_stream_join(
        spark, str(TESTDATA / "events.parquet"), within="1 hour"
    )
    W.run_stream_to_memory(sdf, "ss_join_test", output_mode="append")
    got = {
        (r.l_id, r.r_id)
        for r in spark.sql("SELECT l_id, r_id FROM ss_join_test").collect()
    }
    l = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
    )
    r = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    )
    want = {
        (x.l_id, x.r_id)
        for x in l.join(
            r,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # non-vacuous


def test_approx_count_distinct_accuracy(spark, events):
    """Spark's HLL++ sketch stays within its rsd bound on the events
    stream — the cardinality primitive for 100 TB profiling where exact
    COUNT(DISTINCT) would shuffle every value."""
    exact = events.select("user_id").distinct().count()
    approx = events.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).first().a
    assert abs(approx - exact) / exact < 0.06  # 3x the 2% rsd


def test_json_extraction_matches_duckdb(spark, events):
    """get_json_object over the events props column agrees with
    DuckDB's JSON path extraction — semi-structured column support."""
    import duckdb

    got = {
        r.event_id: r.k
        for r in events.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) "
            f"FROM read_parquet('{TESTDATA}/events.parquet')"
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_asof_join_suffixes_colliding_value_columns(spark):
    from glue_table_cache_spark.operators import joins as J

    lt = spark.createDataFrame(
        [(1, 5, 10.0)], "k long, t long, value double"
    )
    rt = spark.createDataFrame(
        [(1, 4, 99.0)], "k long, t long, value double"
    )
    out = J.asof_join(lt, rt, on="t", by="k")
    assert out.columns == ["k", "t", "value", "value_right"]
    row = out.first()
    assert row.value == 10.0 and row.value_right == 99.0


def test_zero_token_docs_are_not_near_duplicates(spark):
    """Docs with no [a-z0-9] tokens share the catch-all '' shingle but
    must NOT be reported as jaccard-1.0 duplicates of each other."""
    df = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "real words here"),
         (4, "real words here")],
        "doc_id long, text string",
    )
    pairs = D.ngram_jaccard_pairs(df, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(3, 4)}
    mh = {(r.id_a, r.id_b)
          for r in D.minhash_dedup_pairs(df, threshold=0.5).collect()}
    assert mh == {(3, 4)}


def test_connected_components_raises_on_nonconvergence(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iterations=2).collect()
    # ...and converges fine with enough rounds
    comp = D.connected_components(chain, max_iterations=10)
    assert {r.component for r in comp.collect()} == {0}


def test_pack_sequences_global_stream(spark):
    from glue_table_cache_spark.operators import packing as P
    from glue_table_cache_spark.operators import pipeline as PL

    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five")], "doc_id long, text string"
    )
    out = PL.curate(
        df,
        PL.CurationConfig(min_quality=None, dedup_threshold=None,
                          pack_budget=4),
    )
    got = {r.doc_id: (r.pack_id, r.pack_offset) for r in out.collect()}
    assert got == {1: (0, 0), 2: (0, 3)}
    df2 = df.withColumn("n_tokens", F.lit(3))
    packed = P.pack_sequences(df2, budget=4, part_col=None)
    assert {r.doc_id: r.pack_id for r in packed.collect()} == {1: 0, 2: 0}


def test_sessionize_batch_custom_columns(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00"), ("u", "2024-01-01 11:00:00")],
        "who string, at string",
    ).withColumn("at", F.to_timestamp("at"))
    out = W.sessionize_batch(
        df, gap_minutes=30, user_col="who", ts_col="at"
    ).collect()
    assert len(out) == 2  # two sessions, no event_id column needed


# -- corpus stats -------------------------------------------------------------


def test_corpus_stats_per_stratum(spark):
    from glue_table_cache_spark.operators import stats as ST

    df = spark.createDataFrame(
        [
            (1, "one two three", "a"),
            (2, "one two", "a"),
            (3, "four", "b"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in ST.corpus_stats(df).collect()}
    assert got["a"].n_docs == 2 and got["b"].n_docs == 1
    assert got["a"].total_tokens == 5 and got["b"].total_tokens == 1
    assert got["a"].total_chars == len("one two three") + len("one two")
    # 3 distinct tokens in stratum a; HLL is exact at this cardinality
    assert got["a"].approx_distinct_tokens == 3
    assert 0.0 <= got["a"].avg_quality <= 1.0


def test_corpus_stats_global(spark):
    from glue_table_cache_spark.operators import stats as ST

    df = spark.createDataFrame(
        [(1, "x y", "a"), (2, "y z", "b")],
        "doc_id long, text string, source string",
    )
    rows = ST.corpus_stats(df, strata_col=None).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 2 and rows[0].total_tokens == 4
    assert rows[0].approx_distinct_tokens == 3


def test_vocab_top_tokens(spark):
    from glue_table_cache_spark.operators import stats as ST

    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b")], "doc_id long, text string"
    )
    got = [(r.tok, r.n) for r in ST.vocab_top_tokens(df, k=2).collect()]
    assert got == [("b", 4), ("a", 3)]
    # min_count filters the tail; ties break on the token string
    got_all = [
        (r.tok, r.n)
        for r in ST.vocab_top_tokens(df, k=10, min_count=2).collect()
    ]
    assert got_all == [("b", 4), ("a", 3)]


def test_length_histogram(spark):
    from glue_table_cache_spark.operators import stats as ST

    df = spark.createDataFrame(
        [
            (1, ""),            # 0 tokens -> bucket -1
            (2, "a"),           # 1 token  -> bucket 0
            (3, "a b c"),       # 3 tokens -> bucket 1 (2 <= n < 4)
            (4, "a b c d e"),   # 5 tokens -> bucket 2 (4 <= n < 8)
        ],
        "doc_id long, text string",
    )
    got = {r.bucket: r.n_docs for r in ST.length_histogram(df).collect()}
    assert got == {-1: 1, 0: 1, 1: 1, 2: 1}


# -- embedding storage utilities ---------------------------------------------


def test_normalize_embeddings(embeddings):
    out = S.normalize_embeddings(embeddings.limit(50))
    norms = out.select(
        F.round(S.l2_norm(F.col("embedding")), 6).alias("n")
    ).collect()
    assert all(abs(r.n - 1.0) < 1e-6 for r in norms)


def test_normalize_zero_vector_stays_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = S.normalize_embeddings(df).collect()[0].embedding
    assert out == [0.0, 0.0, 0.0]


def test_quantize_roundtrip_error_bound(embeddings):
    """Round-trip error per element must be <= scale/2; cosine of the
    reconstructed vector vs the original must stay ~1."""
    base = embeddings.limit(100)
    q = S.quantize_embeddings(base)
    # tinyint storage: codes are within [-127, 127]
    rng = q.select(
        F.array_max(F.col("embedding_q").cast("array<int>")).alias("hi"),
        F.array_min(F.col("embedding_q").cast("array<int>")).alias("lo"),
    ).agg(F.max("hi").alias("hi"), F.min("lo").alias("lo")).collect()[0]
    assert rng.hi <= 127 and rng.lo >= -127
    back = S.dequantize_embeddings(q, out_col="emb_back")
    chk = back.select(
        S.cosine(F.col("embedding"), F.col("emb_back")).alias("cos"),
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("emb_back"),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("embedding_scale") / 2 + 1e-12).alias("bound"),
    ).collect()
    assert all(r.cos > 0.999 for r in chk)
    assert all(r.max_err <= r.bound for r in chk)


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = S.quantize_embeddings(df).collect()[0]
    assert row.embedding_scale == 0.0 and list(row.embedding_q) == [0, 0]


# ---------------------------------------------------------------------------
# incremental ingestion (operators/incremental.py)
# ---------------------------------------------------------------------------


def test_incremental_dedup_across_batches(spark, tmp_path):
    from glue_table_cache_spark.operators.incremental import (
        append_fingerprints,
        incremental_dedup,
    )

    store = str(tmp_path / "fps")
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha  text")],
        "doc_id long, text string",
    )
    # in-batch: doc 3 is a whitespace-variant dup of doc 1 → dropped
    fresh1 = incremental_dedup(b1, store)
    assert sorted(r.doc_id for r in fresh1.collect()) == [1, 2]
    append_fingerprints(fresh1, store)
    # next batch: doc 4 repeats doc 2's text → dropped vs the STORE;
    # doc 5 is new
    b2 = spark.createDataFrame(
        [(4, "beta text"), (5, "gamma text")],
        "doc_id long, text string",
    )
    fresh2 = incremental_dedup(b2, store)
    assert sorted(r.doc_id for r in fresh2.collect()) == [5]
    append_fingerprints(fresh2, store)
    # re-presenting an already-accepted batch is idempotent
    assert incremental_dedup(b1, store).count() == 0


def test_incremental_ingest_loop(spark, tmp_path):
    """Two turns of the Delta-backed loop: only newly added files are
    read, cross-batch dups drop, state advances, third turn no-ops."""
    from glue_table_cache_spark.operators.incremental import (
        incremental_ingest,
    )
    from glue_table_cache_spark.sources.delta_fixture import (
        build_delta_table,
    )

    docs_v0 = spark.createDataFrame(
        [(1, "s0", "first document text here"),
         (2, "s0", "second document text here")],
        "doc_id long, source string, text string",
    )
    lake = build_delta_table(tmp_path / "lake", [{"add": [docs_v0]}])
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    r1 = incremental_ingest(spark, str(lake), state, output_dir=out)
    assert (r1.docs_in, r1.docs_fresh, r1.docs_kept) == (2, 2, 2)
    assert r1.last_version == 0

    # second commit: one dup of doc 1's text + one new doc
    docs_v1 = spark.createDataFrame(
        [(3, "s1", "first document text here"),
         (4, "s1", "third document text here")],
        "doc_id long, source string, text string",
    )
    build_delta_table(tmp_path / "lake", [{"add": [docs_v0]},
                                          {"add": [docs_v1]}])
    r2 = incremental_ingest(spark, str(lake), state, output_dir=out)
    assert (r2.docs_in, r2.docs_fresh, r2.docs_kept) == (2, 1, 1)
    assert [p.rsplit("/", 1)[1] for p in r2.new_files] == [
        "part-1-0.parquet"
    ]
    assert r2.last_version == 1
    # accumulated output = 3 unique docs
    assert spark.read.parquet(out).count() == 3
    # nothing new → no-op turn
    r3 = incremental_ingest(spark, str(lake), state, output_dir=out)
    assert r3.new_files == [] and r3.last_version == 1


# ---------------------------------------------------------------------------
# product quantization (similarity.pq_*)
# ---------------------------------------------------------------------------


def _pq_cluster_fixture(spark):
    """4 well-separated axis clusters in 8 dims, 10 vectors each,
    L2-normalized; id // 10 is the cluster."""
    import math

    rows = []
    for cluster in range(4):
        for j in range(10):
            vec = [0.0] * 8
            vec[cluster * 2] = 1.0
            vec[cluster * 2 + 1] = 0.1 + 0.01 * j  # small in-cluster spread
            n = math.sqrt(sum(x * x for x in vec))
            rows.append((cluster * 10 + j, [x / n for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_roundtrip_and_topk_recall(spark):
    from glue_table_cache_spark.operators import similarity as S

    corpus = _pq_cluster_fixture(spark)
    books = S.pq_train(corpus, m=4, nbits=2, iters=3)
    # m subspaces × 2^nbits codes, every centroid d/m-dimensional
    assert {s for s, _c, _v in books} == {0, 1, 2, 3}
    assert all(len(v) == 2 for _s, _c, v in books)
    codes = S.pq_encode(corpus, books)
    assert codes.count() == 40
    row = codes.where("vec_id = 0").first()
    assert len(row.codes) == 4
    # same-cluster vectors agree on their CONSTANT subspaces (subs
    # 1..3 are identically zero for cluster 0) — the varying sub may
    # legitimately split codes
    c0 = {
        tuple(r.codes[1:]) for r in codes.where("vec_id < 10").collect()
    }
    assert len(c0) == 1
    # top-k: every query's neighbors come from its own cluster
    from pyspark.sql import functions as F

    queries = corpus.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = S.pq_topk(
        corpus, queries, k=5, codebooks=books, codes=codes
    ).collect()
    assert len(top) == 20
    for r in top:
        assert r.vec_id // 10 == r.query_id // 10, (
            f"query {r.query_id} retrieved {r.vec_id}"
        )


def test_pq_topk_deterministic_and_amortizable(spark):
    """Re-running with the same pre-trained codebooks/codes gives the
    identical ranking (no driver random state anywhere)."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators import similarity as S

    corpus = _pq_cluster_fixture(spark)
    books = S.pq_train(corpus, m=2, nbits=3, iters=2)
    codes = S.pq_encode(corpus, books)
    queries = corpus.where(F.col("vec_id").isin(3, 17)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = S.pq_topk(corpus, queries, k=4, codebooks=books, codes=codes)
    b = S.pq_topk(corpus, queries, k=4, codebooks=books, codes=codes)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    books2 = S.pq_train(corpus, m=2, nbits=3, iters=2)
    assert books == books2


def test_pq_topk_rerank_recovers_exact(spark):
    """With rerank covering the whole corpus, PQ top-k equals the
    exact cosine top-k (the ADC stage only selects, the re-rank
    scores exactly)."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators import similarity as S

    corpus = _pq_cluster_fixture(spark)
    books = S.pq_train(corpus, m=4, nbits=2, iters=3)
    codes = S.pq_encode(corpus, books)
    queries = corpus.where(F.col("vec_id").isin(0, 25)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = S.pq_topk(
        corpus, queries, k=5, codebooks=books, codes=codes, rerank=40
    )
    exact = S.cosine_topk(corpus, queries, k=5)
    assert sorted(
        (r.query_id, r.vec_id, r.rank) for r in pq.collect()
    ) == sorted(
        (r.query_id, r.vec_id, r.rank) for r in exact.collect()
    )


def test_pq_topk_broadcast_symmetry(spark):
    """broadcast_queries=False (the corpus-scale-query-side shape,
    partitioned cartesian instead of a broadcast) returns the
    identical ranking."""
    from pyspark.sql import functions as F

    from glue_table_cache_spark.operators import similarity as S

    corpus = _pq_cluster_fixture(spark)
    books = S.pq_train(corpus, m=4, nbits=2, iters=3)
    codes = S.pq_encode(corpus, books)
    queries = corpus.where(F.col("vec_id").isin(0, 25)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(codebooks=books, codes=codes, k=4, rerank=8)
    a = S.pq_topk(corpus, queries, **kw)
    b = S.pq_topk(corpus, queries, broadcast_queries=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


# -- semantic dedup ---------------------------------------------------------


def test_semantic_dedup_marks_within_cluster_copies(spark, embeddings):
    """Exact copies of corpus vectors are marked duplicate-of their
    original; the most central member of each cluster is never a
    duplicate."""
    base = embeddings.limit(60).select("vec_id", "embedding")
    copies = base.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    out = S.semantic_dedup(
        base.unionByName(copies), nlist=4, threshold=0.999
    ).cache()
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 70
    for i in range(10):
        a, b = rows[i], rows[i + 10000]
        assert a.cluster == b.cluster
        # exact copies: identical centroid_sim, smaller id precedes
        assert b.is_duplicate and b.dup_of == i
        assert not a.is_duplicate or a.dup_of != i + 10000
    # per cluster, the top-(sim, id) member is never a duplicate
    import itertools

    for _, grp in itertools.groupby(
        sorted(
            rows.values(),
            key=lambda r: (r.cluster, -r.centroid_sim, r.vec_id),
        ),
        key=lambda r: r.cluster,
    ):
        head = next(grp)
        assert not head.is_duplicate
    # dup_of always references a same-cluster member with precedence
    for r in rows.values():
        if r.is_duplicate:
            o = rows[r.dup_of]
            assert o.cluster == r.cluster
            assert (o.centroid_sim, o.vec_id) != (
                r.centroid_sim,
                r.vec_id,
            )
            assert o.centroid_sim > r.centroid_sim or (
                o.centroid_sim == r.centroid_sim
                and o.vec_id < r.vec_id
            )
    out.unpersist()


def test_semantic_dedup_hot_cluster_guard(spark):
    ident = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="semantic_dedup"):
        # .collect(), not .count(): a count references no dup-side
        # columns, so Catalyst rightly eliminates the (unique-keyed)
        # left join — and with it the guarded pair join
        S.semantic_dedup(
            ident, nlist=2, max_cluster_size=10
        ).collect()
    # skip mode: hot clusters produce no pairs; everything is kept
    kept = S.semantic_dedup(
        ident, nlist=2, max_cluster_size=10, on_hot_cluster="skip"
    )
    assert kept.where("is_duplicate").count() == 0
    assert kept.count() == 50
    with pytest.raises(ValueError, match="on_hot_cluster"):
        S.semantic_dedup(ident, on_hot_cluster="warn")


def test_semantic_dedup_reuses_centroids_deterministically(
    spark, embeddings
):
    base = embeddings.limit(40)
    cents = S.ivf_train(base, nlist=3)
    a = sorted(
        map(tuple, S.semantic_dedup(base, centroids=cents).collect())
    )
    b = sorted(
        map(tuple, S.semantic_dedup(base, centroids=cents).collect())
    )
    assert a == b


# -- n-gram LM perplexity ---------------------------------------------------


def test_ngram_lm_hand_computed(spark):
    import math

    from glue_table_cache_spark.operators import lm as L

    ref = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    model, contexts, vocab = L.train_ngram_lm(ref)
    assert vocab == 2
    got = {(r.prev, r.w): r.c for r in model.collect()}
    assert got == {("", "a"): 1, ("a", "b"): 1, ("b", "a"): 1}
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "z z")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in L.ngram_lm_score(
            corpus, model, contexts, vocab
        ).collect()
    }
    # p("",a) = p(a,b) = (1+.1)/(1+.1*3); H = log2(1.3/1.1)
    h = round(math.log2(1.3 / 1.1), 6)
    assert out[1].n_tokens == 2
    assert out[1].cross_entropy == h
    assert out[1].perplexity == round(2**h, 6)
    # empty doc: zero tokens, NULL scores
    assert out[2].n_tokens == 0 and out[2].perplexity is None
    # unseen tokens: unigram "z" against the "" context (cc=1) then
    # (z,z) against the unseen z context (cc=0)
    h3 = round(
        (-math.log2(0.1 / 1.3) - math.log2(0.1 / 0.3)) / 2, 6
    )
    assert out[3].cross_entropy == h3
    assert out[3].perplexity > out[1].perplexity


def test_ngram_lm_gibberish_scores_worse(documents):
    from glue_table_cache_spark.operators import lm as L

    base = documents.select("doc_id", "text").limit(200)
    model, contexts, vocab = L.train_ngram_lm(base)
    natural = base.limit(5)
    gib = natural.sparkSession.createDataFrame(
        [
            (90001, "xq zvw qqj kxr vvz wqx jzx qkv"),
            (90002, "zz yy xx ww vv uu tt ss rr qq"),
        ],
        "doc_id long, text string",
    )
    out = L.ngram_lm_score(
        natural.unionByName(gib), model, contexts, vocab
    ).collect()
    nat_ppl = [r.perplexity for r in out if r.doc_id < 90000]
    gib_ppl = [r.perplexity for r in out if r.doc_id >= 90000]
    assert max(nat_ppl) < min(gib_ppl)
    # shuffle-join path gives identical scores
    out2 = L.ngram_lm_score(
        natural.unionByName(gib), model, contexts, vocab,
        broadcast_model=False,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_perplexity_filter_quantile_and_cutoff(documents):
    from glue_table_cache_spark.operators import lm as L

    base = documents.select("doc_id", "text").limit(100)
    kept = L.perplexity_filter(base, quantile=0.8)
    n = kept.count()
    assert 60 <= n <= 95  # ~80% kept, approx_percentile slack
    assert set(kept.columns) == {"doc_id", "text", "perplexity"}
    # explicit cutoff keeps exactly the under-cutoff docs
    allrows = L.perplexity_filter(base, max_perplexity=float("inf"))
    assert allrows.count() == 100


def test_semantic_dedup_precomputed_assignment_path(spark, embeddings):
    base = embeddings.limit(40).select("vec_id", "embedding")
    cents = S.ivf_train(base, nlist=3)
    direct = sorted(
        map(tuple, S.semantic_dedup(base, centroids=cents).collect())
    )
    assigned = S.assign_embedding_clusters(base, cents).localCheckpoint()
    via = sorted(
        map(tuple, S.semantic_dedup(base, assigned=assigned).collect())
    )
    assert direct == via


# -- IVF-PQ -----------------------------------------------------------------


def test_ivfpq_full_probe_rerank_recovers_exact_topk(spark, embeddings):
    base = S.normalize_embeddings(
        embeddings.limit(120).select("vec_id", "embedding")
    )
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in S.cosine_topk(base, q, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in S.ivfpq_topk(
            base, q, k=5, nlist=4, nprobe=4, m=4, nbits=4,
            rerank=120,
        ).collect()
    }
    assert got == exact  # all cells probed + full exact re-rank


def test_ivfpq_partial_probe_recall_and_determinism(spark, embeddings):
    base = S.normalize_embeddings(
        embeddings.limit(200).select("vec_id", "embedding")
    )
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        r.query_id: set()
        for r in q.collect()
    }
    for r in S.cosine_topk(base, q, k=10).collect():
        exact[r.query_id].add(r.vec_id)
    cents = S.ivf_train(base, nlist=8, iters=2)
    codes, books = S.ivfpq_encode(base, cents, m=4, nbits=4)
    codes = codes.localCheckpoint()
    run = lambda: S.ivfpq_topk(
        base, q, k=10, nprobe=4, centroids=cents,
        codebooks=books, codes=codes, rerank=30,
    ).collect()
    a = sorted(map(tuple, run()))
    assert a == sorted(map(tuple, run()))  # deterministic
    hits = sum(
        1 for r in run() if r.vec_id in exact[r.query_id]
    )
    assert hits / (len(exact) * 10) >= 0.5  # partial-probe recall bound


def test_ivfpq_shuffle_join_path_matches_broadcast(spark, embeddings):
    """broadcast_queries=False (cell-co-partitioned shuffle join, the
    corpus-scale-query-side shape) returns exactly the broadcast
    path's results, with probe selection and ADC tables built as
    DataFrames — no driver-side loop over the query set."""
    base = S.normalize_embeddings(
        embeddings.limit(150).select("vec_id", "embedding")
    )
    q = base.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = S.ivf_train(base, nlist=8, iters=2)
    codes, books = S.ivfpq_encode(base, cents, m=4, nbits=4)
    codes = codes.localCheckpoint()
    kw = dict(
        k=8, nprobe=3, centroids=cents, codebooks=books, codes=codes
    )
    bcast = sorted(
        map(tuple, S.ivfpq_topk(base, q, **kw).collect())
    )
    shuffled = S.ivfpq_topk(
        base, q, broadcast_queries=False, **kw
    )
    assert sorted(map(tuple, shuffled.collect())) == bcast
    # same equivalence through the exact re-rank tail
    bcast_rr = sorted(map(tuple, S.ivfpq_topk(
        base, q, rerank=40, **kw
    ).collect()))
    shuf_rr = sorted(map(tuple, S.ivfpq_topk(
        base, q, rerank=40, broadcast_queries=False, **kw
    ).collect()))
    assert shuf_rr == bcast_rr


def test_duplicate_substring_spans_first_occurrence_wins(spark):
    from glue_table_cache_spark.operators.dedup import (
        duplicate_substring_spans,
        remove_duplicate_substrings,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four five"),
            (3, "completely unrelated text with no repeats at all"),
            # within-doc repetition: second copy is also a duplicate
            (4, f"{shared} filler words here {shared}"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_substring_spans(docs, k=5)
    by_doc = {}
    for r in spans.collect():
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end)
        )
    # doc 1 holds the FIRST occurrence (lowest doc_id, pos) — kept
    # except where doc 4's earlier-position copy wins some seeds;
    # the unrelated doc is never flagged
    assert 3 not in by_doc
    assert 2 in by_doc  # a later copy is marked
    # spans are maximal: doc 2's duplicated region is ONE interval
    # spanning the whole 10-token shared passage
    (s, e), = by_doc[2]
    assert e - s == 10

    cleaned = remove_duplicate_substrings(docs, k=5)
    got = {r.doc_id: (r.text, r.n_removed_tokens)
           for r in cleaned.collect()}
    # untouched doc passes through verbatim
    assert got[3] == (
        "completely unrelated text with no repeats at all", 0
    )
    # doc 2 lost exactly its duplicated region
    assert got[2][0] == "one two three four five"
    assert got[2][1] == 10
    # every doc keeps at least its unique tokens
    assert "alpha beta" in got[1][0] and "gamma delta" in got[1][0]
    # exactly ONE copy of the shared passage survives corpus-wide
    total_copies = sum(
        txt.count("quick brown fox") for txt, _n in got.values()
    )
    assert total_copies == 1


def test_duplicate_substring_spans_portable_family(spark):
    from glue_table_cache_spark.operators.dedup import (
        duplicate_substring_spans,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y a b c d e f")],
        "doc_id long, text string",
    )
    for portable in (False, True):
        spans = duplicate_substring_spans(docs, k=6, portable=portable)
        got = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in spans.collect()
        )
        assert got == [(2, 2, 8)]  # "a b c d e f" in doc 2 only
