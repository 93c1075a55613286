"""Deduplication operators for training-data pipelines.

Beyond-reference extension (SURVEY.md §7 P4).  Four families:

* **exact** — hash-groupBy on a canonical fingerprint; one shuffle on
  the fingerprint, the plan that scales linearly to 100 TB.
* **MinHash + LSH** — shingle → 64 minhashes → banded bucket keys →
  candidate pairs via *bucket join* (never an all-pairs cross join),
  then exact Jaccard verification on the candidates only.
* **SimHash** — 64-bit signature from token hashes; near-dup candidates
  via 16-bit band buckets + popcount(xor) Hamming verification.
* **exact n-gram Jaccard** — inverted-index self-join on shingles;
  cost ∝ Σ posting-list², bounded by dropping ultra-frequent shingles.

Everything is DataFrame-native (`explode`/`groupBy`/`join`); hashes are
`xxhash64` (JVM intrinsic) by default.  No Python UDFs anywhere.

Each probabilistic family also has a **portable** hash mode
(``portable=True``): the hash is derived from md5 — identical in Spark
(``conv(substring(md5(x), 1, 15), 16, 10)``) and DuckDB
(``('0x' || substr(md5(x), 1, 15))::BIGINT``) — so the *full* pipeline
(signatures → banding → candidate join → verification) is
oracle-checkable end-to-end against another engine.  ``xxhash64`` stays
the default at scale (cheaper: one 64-bit mix vs an md5 per family).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from glue_table_cache_spark.functions.text import fingerprint, shingles, tokens

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row per canonical text (lowest id wins).

    Implemented as a window ``row_number`` over the md5 fingerprint —
    a single hash-partitioned shuffle; deterministic keep-lowest-id
    semantics so results are oracle-checkable."""
    fp = fingerprint(text_col)
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def _widen(df: DataFrame) -> DataFrame:
    """Repartition up to the session's shuffle parallelism when the
    source is a small file scan (e.g. one parquet file → one input
    split): the tokenize/shingle/hash map work is CPU-bound and would
    otherwise run on a single core.  The probe is ``df.inputFiles()``
    (reads the already-built file index) rather than
    ``df.rdd.getNumPartitions()``, which would force a full plan→RDD
    conversion.  At real scale the scan has more files than cores, the
    probe short-circuits, and no extra shuffle of the corpus happens —
    repartitioning 100 TB of raw text just to widen the map side would
    cost more than it saves."""
    sc = df.sparkSession.sparkContext
    target = int(
        df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", str(sc.defaultParallelism)
        )
    )
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (e.g. createDataFrame in tests)
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def _family_hash(i: int):
    """Hash family ``i`` over a base shingle hash: re-hash the 64-bit
    base with the family index as seed material.  ``xxhash64`` over a
    long is a JVM intrinsic and cannot overflow (affine ``h*a+b``
    families would trip Spark 4's default ANSI overflow checks)."""
    return lambda h: F.xxhash64(F.lit(i), h)


def portable_hash60(col: Column | str, seed: int | str | None = None) -> Column:
    """60-bit hash computable bit-identically in Spark and DuckDB.

    Spark:  ``CAST(conv(substring(md5(concat(seed, ':', x)), 1, 15),
    16, 10) AS BIGINT)``; DuckDB: ``('0x' || substr(md5(seed || ':' ||
    x), 1, 15))::BIGINT``.  15 hex chars = 60 bits, always inside a
    signed 64-bit int, so neither engine overflows.  Distinct ``seed``
    values give independent families (md5 avalanche)."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = c if seed is None else F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """Array of ``num_hashes`` minhashes over a shingle array column.

    Expression form (used when the shingles are already materialized as
    a column); the DataFrame-level :func:`minhash_signatures` uses the
    faster explode→aggregate shape."""
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(base, _family_hash(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, shingles, sig) per document.

    Scale shape: explode shingles → hash each shingle ONCE with
    ``xxhash64`` → ``num_hashes`` plain ``min()`` aggregates over
    re-seeded long hashes in a single hash-partitioned shuffle keyed on
    the document id.  This keeps the expensive tokenize/shingle
    expression evaluated once per row (the nested
    ``array_min(transform(...))×64`` form re-evaluates it per family
    after Catalyst's project collapsing) and turns signature computation
    into vectorized aggregate machinery.

    ``portable=True`` swaps the family to :func:`portable_hash60`
    (``md5(i + ':' + shingle)``) so a DuckDB oracle reproduces the
    signatures bit-for-bit — one md5 per (shingle, family) instead of
    one long mix, so keep the default off in the hot path."""
    # explode_outer, NOT explode: a plain explode makes Catalyst infer a
    # `size(shingles(...)) > 0` filter and push it below the widening
    # exchange — re-evaluating the whole shingle expression per row on
    # the narrow pre-shuffle side.  shingles() is never empty (short
    # docs get one catch-all shingle), so outer is semantically
    # identical; the cheap isNotNull guard (pushed to the scan) covers
    # the one case where the array itself is null.
    postings = _widen(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("id"),
        F.explode_outer(shingles(text_col, shingle_k)).alias("shingle"),
    )
    # a zero-token document's catch-all shingle is '' — identical for
    # every such doc, which would make all token-less docs mutual
    # jaccard-1.0 "duplicates"; they carry no comparable content, so
    # they take no part in near-dup detection (exact_dedup still
    # catches byte-identical text)
    postings = postings.where(F.col("shingle") != "")
    # the num_hashes min-aggregates are rendered as SQL text and
    # parsed JVM-side in one F.expr call each: building them as
    # Column trees costs a py4j round trip per node (~0.5 s of driver
    # CPU per plan construction at 64 families — guide §5, the driver
    # should do almost no work).  The SQL spells the IDENTICAL
    # expressions (same functions, same int literals), so the parsed
    # trees — and the signatures — are unchanged.
    if portable:
        def fam_sql(i: int) -> str:
            return (
                f"cast(conv(substring(md5(concat('{i}:', shingle)), "
                f"1, 15), 16, 10) as bigint)"
            )
    else:
        postings = postings.withColumn("h", F.xxhash64("shingle"))

        def fam_sql(i: int) -> str:
            return f"xxhash64({i}, h)"

    aggs = [F.collect_list("shingle").alias("shingles")]
    for i in range(num_hashes):
        aggs.append(F.expr(f"min({fam_sql(i)}) AS _m{i}"))
    agged = postings.groupBy("id").agg(*aggs)
    return agged.select(
        "id",
        "shingles",
        F.expr(
            "array(" + ",".join(f"_m{i}" for i in range(num_hashes)) + ") AS sig"
        ),
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    portable: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) that share ≥1 LSH band bucket.

    Scale shape: explode to one row per (doc, band), bucket key =
    hash(band, sig-slice); self-join on the bucket key is a
    hash-partitioned equi-join over buckets — cost ∝ Σ bucket², never
    n².  With 16 bands × 4 rows the S-curve threshold is ≈ 0.5 Jaccard.

    ``max_bucket_size`` (r14) is the hot-bucket guard the inverted
    -index families already carry (``max_shingle_df``): a bucket with
    more members than the cap — by construction a near-dup clique
    (its members agree on a whole minhash band) — switches from
    all-pairs to LINK-TO-FIRST: every member pairs with the bucket's
    minimum id only, m−1 candidate rows instead of m(m−1)/2.  Capped
    candidates are a strict SUBSET of the uncapped ones, and the
    connected-components grouping downstream reconnects the clique
    through its hub, so transitive dedup keeps the same groups.
    Recall semantics: only DIRECT pair output between two non-hub
    members of an oversized bucket can be lost (when they fail
    verification against the hub but pass against each other —
    boilerplate cliques, where oversized buckets come from, verify
    uniformly).  ``None`` disables the guard.

    ``portable=True`` uses a ``concat_ws`` string bucket key (equality
    of the key ⟺ equality of the slice tuple) instead of ``xxhash64``
    so the oracle can build the identical buckets."""
    if portable:
        band_keys = F.array(
            *[
                F.concat_ws(
                    ",",
                    F.lit(b),
                    *[F.col("sig")[i] for i in range(b * rows_per_band,
                                                     (b + 1) * rows_per_band)],
                )
                for b in range(bands)
            ]
        )
    else:
        band_keys = F.array(
            *[
                F.xxhash64(
                    F.lit(b),
                    *[F.col("sig")[i] for i in range(b * rows_per_band,
                                                     (b + 1) * rows_per_band)],
                )
                for b in range(bands)
            ]
        )
    buckets = sig_df.select(
        F.col("id"), F.posexplode(band_keys).alias("band", "bucket")
    )
    if max_bucket_size is None:
        left = buckets.alias("l")
        right = buckets.alias("r")
        return (
            left.join(right, ["band", "bucket"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
    # hot-bucket guard: ONE window pass over (band, bucket) annotates
    # every row with its bucket size + hub id on the same exchange the
    # self-join needs anyway (guide §2.4 — the hot-set aggregate, the
    # anti-join and the hub join-back of the first cut were three
    # extra shuffled subtrees paid even when NO bucket is hot);
    # all-pairs below the cap, link-to-hub above it (linear)
    from pyspark.sql.window import Window

    w_part = Window.partitionBy("band", "bucket")
    ann = buckets.select(
        "id",
        "band",
        "bucket",
        F.count("*").over(w_part).alias("bsz"),
        F.min("id").over(w_part).alias("first_id"),
    )
    # bsz > 1: a singleton bucket cannot produce a pair (the self-join
    # would only match the row to itself, dropped by id < id), and
    # singletons are the vast majority of buckets — the window's
    # bucket size lets the capped path feed the join a fraction of the
    # rows the uncapped shape must (measured at the synthetic sf1:
    # 800k bucket rows → the join branches shrink to just the
    # multi-member buckets).  Output identical by construction.
    small = ann.where(
        (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)
    ).drop("first_id")
    left, right = small.alias("l"), small.alias("r")
    pairs_small = (
        left.join(right, ["band", "bucket"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    pairs_big = (
        ann.where(
            (F.col("bsz") > max_bucket_size)
            & (F.col("id") != F.col("first_id"))
        )
        # first_id = min(id) of the bucket, so id_a < id_b holds
        .select(
            F.col("first_id").alias("id_a"), F.col("id").alias("id_b")
        )
    )
    return pairs_small.unionByName(pairs_big).distinct()


def jaccard_verify(
    pairs: DataFrame, sig_df: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only → (id_a, id_b,
    jaccard) with jaccard ≥ threshold."""
    sh = sig_df.select("id", "shingles")
    joined = (
        pairs.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}),
                   "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    portable: bool = False,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs, exact-verified.

    ``max_bucket_size`` defaults ON (64): at 100 TB a boilerplate
    near-dup clique of m documents lands in one LSH bucket and an
    uncapped self-join emits m² candidates — the guard caps that at
    linear cost (see :func:`lsh_candidate_pairs` for the exact
    link-to-hub recall semantics).  Buckets this size never occur in
    the correctness fixtures, so the capped and uncapped outputs are
    identical there (property-tested).

    The signature frame feeds four plan branches (both sides of the
    bucket self-join, both sides of the verify join); the expensive
    tokenize→hash map side sits just before the groupBy shuffle, so
    Spark's ReusedExchange executes it once and all branches read the
    shuffle output — no explicit persist() needed (measured slower: it
    materializes the wide shingle arrays to storage)."""
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, portable=portable
    )
    candidates = lsh_candidate_pairs(
        sig, bands, num_hashes // bands, portable=portable,
        max_bucket_size=max_bucket_size,
    )
    return jaccard_verify(candidates, sig, threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    transitive: bool = False,
    materialize: str = "localCheckpoint",
    **kw,
) -> DataFrame:
    """Drop near-duplicate documents, keeping one representative.

    ``transitive=False`` (default): greedy pairwise policy — drop every
    document that directly near-duplicates a lower-id one.  Cheap
    (no iteration) but a chain A≈B≈C with A,C dissimilar keeps A *and*
    C.  ``transitive=True`` runs :func:`connected_components` over the
    pair graph first, keeping exactly the minimum id per near-dup
    cluster — the policy a training corpus wants."""
    pairs = minhash_dedup_pairs(df, text_col, id_col, threshold, **kw)
    if transitive:
        comp = connected_components(pairs, materialize=materialize)
        dup_ids = (
            comp.where(F.col("id") != F.col("component"))
            .select(F.col("id").alias(id_col))
        )
    else:
        dup_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dup_ids, id_col, "left_anti")


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted index)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold, computed exactly
    via an inverted-index self-join (explode shingles → equi-join on
    shingle → per-pair overlap count).  ``max_shingle_df`` drops
    shingles appearing in more than that many documents — the standard
    posting-list skew guard at scale."""
    docs = _widen(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_k).alias("sh")
    )
    # each posting row carries its doc's full shingle-set size, so no
    # separate sizes branch (which would re-run the shingle expression)
    # and no post-aggregation size joins.  explode_outer: see
    # minhash_signatures — avoids the inferred size()>0 filter
    # re-running the shingle expression pre-shuffle.  The '' filter
    # drops zero-token docs (see minhash_signatures).
    postings = docs.select(
        "id", F.size("sh").alias("n"), F.explode_outer("sh").alias("shingle")
    ).where(F.col("shingle") != "")
    if max_shingle_df is not None:
        rare = (
            postings.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        postings = postings.join(rare, "shingle")
    a, b = postings.alias("a"), postings.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("common"),
            F.min("a.n").alias("n_a"),
            F.min("b.n").alias("n_b"),
        )
    )
    return common.select(
        "id_a",
        "id_b",
        F.round(
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")),
            6,
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, simhash) — classic Charikar simhash: per token-hash bit,
    vote +1/−1 weighted by term frequency; signature bit = sign of the
    vote.

    Shape: explode tokens → collapse to ``(id, token_hash, count)``
    (one groupBy whose map-side partial aggregation absorbs the
    duplicate tokens — natural text repeats ~2.3× here) → the
    ``bits`` per-bit vote sums weighted by the collapsed count.  The
    expensive 64-aggregate stage then processes only DISTINCT tokens
    per document; measured at sf0.1 this more than halves the
    signature stage (2.0 s → 0.85 s) vs running the vote aggregates
    straight off the exploded rows.  (A packed-lane variant — 3 bit
    counters per 64-bit sum — was measured SLOWER than the plain
    per-bit conditional sums under whole-stage codegen and rejected.)

    ``portable=True`` hashes tokens with :func:`portable_hash60`
    (60 usable bits) instead of ``xxhash64`` so a DuckDB oracle computes
    the identical signature; callers must then pass ``bits<=60``.
    """
    if portable and bits > 60:
        raise ValueError("portable simhash supports at most 60 bits")
    tok_hash = (
        portable_hash60(F.col("tok"))
        if portable
        else F.xxhash64("tok")
    )
    # rlike prefilter = "has at least one token" (pushed to the scan),
    # so explode_outer is exactly the old explode semantics without the
    # inferred size()>0 filter re-running the tokenizer pre-shuffle
    has_tok = F.lower(F.col(text_col)).rlike("[a-z0-9]")
    toks = _widen(df.where(has_tok)).select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col, "[a-z0-9]+")).alias("tok"),
    ).withColumn("h", tok_hash)
    collapsed = toks.groupBy("id", "h").agg(F.count("*").alias("c"))
    # the per-bit vote aggregates and the bit-assembly chain are
    # rendered as SQL text (one JVM parse each) instead of Column
    # trees: at 64 bits the Python-side construction was ~700 py4j
    # round trips ≈ 1.0 s of driver CPU per plan build (guide §5).
    # The SQL spells the IDENTICAL integer expressions — exact
    # arithmetic, so the signatures are unchanged.
    votes = collapsed.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 "
                f"THEN c ELSE -c END) AS v{j}"
            )
            for j in range(bits)
        ]
    )
    sig_sql = " | ".join(
        f"shiftleft(cast(CASE WHEN v{j} > 0 THEN 1 ELSE 0 END "
        f"as bigint), {j})"
        for j in range(bits)
    )
    return votes.select(
        "id", F.expr(f"cast(0 as bigint) | {sig_sql} AS simhash")
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    portable: bool = False,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation uses the pigeonhole principle: split the
    signature into ``max_hamming + 1`` bands — any pair within
    the distance budget must agree exactly on ≥1 band, so a bucket
    equi-join on (band, band_bits) finds all of them without an
    all-pairs comparison; popcount(xor) then verifies exactly.

    ``max_bucket_size`` (r14, default 512) is the hot-bucket guard of
    :func:`lsh_candidate_pairs`, adapted to simhash's weaker bucket
    key: a 15/16-bit band value can collide UNRELATED documents (it
    is not the near-certain clique a 256-bit minhash band is), so a
    bucket over the cap emits hub links (every member × the min-id
    member) PLUS Manku-style sorted-neighbor links — members sorted
    by full signature, each paired with its next ``4`` neighbors;
    near-identical signatures are adjacent in that order, so real
    near-dups inside a mixed bucket still surface.  Cost is linear
    in bucket size (≤ 5 pairs per member vs m²/2).  Capped pairs
    are a strict SUBSET of uncapped; the documented recall cost is
    a pair of docs >4 apart in signature order whose hub distances
    also fail — which is why the default is 512, well above the
    natural mixed-bucket sizes the synthetic sf0.1 corpus produces
    (max observed 269; all-pairs there costs ≤ m²/2 ≈ 131k rows per
    bucket, fine), so the guard only rewrites genuine boilerplate
    explosions.  ``None`` disables the guard."""
    bits = 60 if portable else 64
    sigs = simhash(df, text_col, id_col, bits=bits, portable=portable)
    n_bands = max_hamming + 1
    width = bits // n_bands
    bands = F.array(
        *[
            F.shiftright("simhash", b * width).bitwiseAND(
                F.lit((1 << width) - 1).cast("long")
            )
            for b in range(n_bands)
        ]
    )
    buckets = sigs.select(
        "id", "simhash", F.posexplode(bands).alias("band", "bits")
    )
    if max_bucket_size is not None:
        # ONE window pass over (band, bits) annotates every bucket row
        # with its bucket size, hub (min-id member incl. signature)
        # and the 4 sorted-neighbor successors (guide §2.4: the r14
        # first cut spent a hot-bucket aggregate + an anti-join + a
        # hub join + 4 lead-union branches — 6 shuffled subtrees even
        # when NO bucket is hot; the window computes all of it on the
        # single (band, bits) exchange the self-join needs anyway,
        # and the small-bucket self-join reuses that partitioning)
        from pyspark.sql.window import Window

        n_neighbors = 4
        w_part = Window.partitionBy("band", "bits")
        w_ord = w_part.orderBy("simhash", "id")
        ann = buckets.select(
            "id",
            "simhash",
            "band",
            "bits",
            F.count("*").over(w_part).alias("bsz"),
            F.min(F.struct("id", "simhash")).over(w_part).alias(
                "first"
            ),
            F.array(
                *[
                    F.struct(
                        F.lead("id", k).over(w_ord).alias("nid"),
                        F.lead("simhash", k).over(w_ord).alias(
                            "nsig"
                        ),
                    )
                    for k in range(1, n_neighbors + 1)
                ]
            ).alias("nbrs"),
        )
        # bsz > 1: singleton buckets (the vast majority) cannot
        # produce a pair — dropping them here shrinks both self-join
        # branches to just the multi-member buckets; identical output
        small = ann.where(
            (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)
        ).select("id", "simhash", "band", "bits")
        left, right = small.alias("l"), small.alias("r")
        pairs_small = (
            left.join(right, ["band", "bits"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
                F.bit_count(
                    F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
                ).alias("hamming"),
            )
        )
        big = ann.where(F.col("bsz") > max_bucket_size)
        # hub links: every member × the bucket's min-id member — no
        # join, the hub rode in on the window aggregate
        pairs_hub = big.where(F.col("id") != F.col("first.id")).select(
            F.col("first.id").alias("id_a"),
            F.col("id").alias("id_b"),
            F.bit_count(
                F.col("first.simhash").bitwiseXOR(F.col("simhash"))
            ).alias("hamming"),
        )
        # sorted-neighbor links: signature order clusters near-dups
        # together even in a MIXED bucket; one explode instead of 4
        # union branches
        pairs_nbr = (
            big.select(
                "id", "simhash", F.explode("nbrs").alias("nb")
            )
            .where(F.col("nb.nid").isNotNull())
            .select(
                F.least("id", F.col("nb.nid")).alias("id_a"),
                F.greatest("id", F.col("nb.nid")).alias("id_b"),
                F.bit_count(
                    F.col("simhash").bitwiseXOR(F.col("nb.nsig"))
                ).alias("hamming"),
            )
        )
        return (
            pairs_small.unionByName(pairs_hub)
            .unionByName(pairs_nbr)
            .where(F.col("hamming") <= max_hamming)
            .distinct()
        )
    left, right = buckets.alias("l"), buckets.alias("r")
    return (
        left.join(right, ["band", "bits"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Winnowing (rolling-hash fingerprint overlap)
# --------------------------------------------------------------------------


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_overlap: float = 0.5,
    max_fingerprint_df: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Near-dup/containment pairs by winnowing-fingerprint overlap
    (character-level rolling-hash sketch — catches edits that
    word-shingle Jaccard misses, e.g. whitespace/punctuation rewrites).

    Score = MOSS-style containment: shared fingerprints / the smaller
    document's sketch size, so a short document pasted into a long one
    still scores near 1.0.  Measured on the synthetic corpus, char
    8-grams separate cleanly (true near-dups ≥0.8, unrelated docs
    <0.2); 5-grams collide heavily on same-vocabulary text.

    Same inverted-index shape as :func:`ngram_jaccard_pairs`: explode
    fingerprints → equi-join → per-pair overlap count;
    ``max_fingerprint_df`` drops ultra-common fingerprints (boilerplate)
    — the posting-list skew guard at scale."""
    from glue_table_cache_spark.functions.text import winnow_postings

    postings = winnow_postings(
        _widen(df), text_col, id_col, k, window, portable=portable
    ).withColumnRenamed("fingerprint", "f")
    if max_fingerprint_df is not None:
        rare = (
            postings.groupBy("f")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_fingerprint_df)
            .select("f")
        )
        postings = postings.join(rare, "f")
    sizes = postings.groupBy("id").agg(F.count("*").alias("n"))
    a, b = postings.alias("a"), postings.alias("b")
    common = (
        a.join(b, "f")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}),
                    "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(
                F.col("n_common") / F.least("n_a", "n_b"), 6
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= min_overlap)
    )


# --------------------------------------------------------------------------
# Connected components (transitive near-dup closure)
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    materialize: str = "localCheckpoint",
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``, where
    ``component`` is the minimum id reachable through the pair graph —
    the transitive closure a greedy pairwise dedup policy misses (a
    chain A≈B≈C where A,C are not directly similar must still collapse
    to the single representative A).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges within
    graph-diameter rounds (near-dup components are shallow — dup
    clusters are cliques or short chains — so this is 2-4 rounds in
    practice).

    Round shape (guide §2.4 — remove shuffles outright): the edge set
    carries an explicit SELF-LOOP per node, so one ``edges ⋈ labels``
    join + one ``min`` aggregate computes the new label — the node's
    own current label arrives through its self-loop, so no second
    ``labels`` join is needed, and the convergence probe is an inline
    flag (``min-over-neighbors < own label``) read off the same
    aggregate instead of a full join of old vs new labels.  This
    halves the joins (and removes one shuffle + one localCheckpoint
    re-reference) per round vs the r13 shape; measured on the curate
    bench label the CC rounds dropped from ~6 s of fixed job overhead
    to ~2.5 s.  ``localCheckpoint`` still cuts the plan lineage so
    round N does not re-execute rounds 1..N-1.  At extreme scale swap
    in the large-star/small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce", SOCC'14) — same DataFrame
    shape, fewer rounds on high-diameter graphs."""
    # checkpoint the RAW pair list first: the pair pipeline feeding
    # this (LSH candidates + exact verify) is by far the most
    # expensive subtree in a dedup flow, and the edge construction
    # below references it three times (forward, reversed, node set) —
    # materializing it once caps the pipeline at ONE evaluation (the
    # r14 first cut unioned three references inside a single
    # checkpoint action and re-ran the pair pipeline per reference:
    # curate's sf1 probe went 27 s → 91 s; this shape restores it).
    # ``materialize`` picks the mechanism (localCheckpoint | persist |
    # off — see operators/materialize.py for the executor-loss /
    # local-disk trade at cluster scale); the ITERATION state below
    # always materializes (mode "off" falls back to localCheckpoint
    # there — unbounded lineage growth across rounds is never valid).
    from glue_table_cache_spark.operators.materialize import (
        materialize_frame,
    )

    iter_mode = materialize if materialize != "off" else "localCheckpoint"
    fwd = materialize_frame(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        materialize,
    )
    nodes = (
        fwd.select(F.col("src").alias("id"))
        .union(fwd.select(F.col("dst").alias("id")))
        .distinct()
    )
    # duplicate input pairs are harmless to a min aggregate, so no
    # distinct() pass over the edge list — the self-loops double as
    # the node set (every id appears as a src).  This checkpoint
    # only re-reads the materialized pair list, so it is one cheap
    # pass over |edges|, and the per-round join reads a flat scan.
    edges = materialize_frame(
        fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .union(nodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))),
        iter_mode,
    )
    # the self-loops are exactly one row per node, already
    # materialized — label init reads the checkpoint, never the
    # (potentially expensive) pair pipeline again
    labels = materialize_frame(
        edges.where(F.col("src") == F.col("dst")).select(
            "src", F.col("src").alias("component")
        ),
        iter_mode,
    )
    prev_cached = labels  # the frame materialize_frame actually cached
    for _ in range(max_iterations):
        new_labels = materialize_frame(
            edges.join(
                labels.withColumnsRenamed(
                    {"src": "dst", "component": "nbr_component"}
                ),
                "dst",
            )
            .groupBy("src")
            .agg(
                F.min("nbr_component").alias("component"),
                # own label rides in on the self-loop (dst == src)
                F.min(
                    F.when(
                        F.col("dst") == F.col("src"),
                        F.col("nbr_component"),
                    )
                ).alias("__own"),
            )
            .withColumn("__chg", F.col("component") < F.col("__own"))
            .drop("__own"),
            iter_mode,
        )
        changed = new_labels.where("__chg").limit(1).count()
        if iter_mode == "persist":
            # retire the previous round's cached labels so persist
            # mode does not accumulate one cached frame per round
            # (unpersist must target the exact frame that was cached)
            prev_cached.unpersist()
        prev_cached = new_labels
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    else:
        # exhausting the budget without a stable round means the labels
        # are NOT component minima — returning them silently would keep
        # extra "representatives" per cluster with no signal to the
        # caller.  Near-dup graphs converge in a handful of rounds; a
        # diameter > max_iterations chain is a pathology worth raising.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations; raise max_iterations for "
            f"very-high-diameter graphs"
        )
    return labels.select(F.col("src").alias("id"), "component")


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its near-dup group id (the component's
    minimum doc id; singletons map to themselves) plus an
    ``is_representative`` flag — the frame a pipeline filters on to keep
    exactly one doc per transitive near-dup cluster."""
    comp = connected_components(pairs)
    return (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(
            df[id_col],
            F.coalesce(comp["component"], df[id_col]).alias("group_id"),
        )
        .withColumn(
            "is_representative", F.col(id_col) == F.col("group_id")
        )
    )


# --------------------------------------------------------------------------
# Line-level corpus dedup (C4 / RefinedWeb style)
# --------------------------------------------------------------------------


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_len: int = 30,
) -> DataFrame:
    """Corpus-wide line-level exact dedup: every line of ``min_len``+
    characters is kept only at its FIRST occurrence (lowest
    ``(id, position)``) across the whole corpus; shorter lines (menu
    items, headers) always survive.  Documents are reassembled from
    their surviving lines in original order — the C4/RefinedWeb
    boilerplate-removal pass, complementing document-level
    :func:`exact_dedup` / :func:`minhash_dedup`.

    Scale shape: ``posexplode`` lines → first occurrence per line via
    ``groupBy(line).agg(min(struct(id, pos)))`` — a *partial-combining*
    aggregate, so a boilerplate line repeated 10⁹ times collapses
    map-side instead of flooding one reducer (why this is an agg+join,
    not a window) → join back on the line (AQE splits residual hot
    keys) → one ``groupBy(id)`` to reassemble.  No Python UDFs.

    Returns the input columns (``text_col`` replaced by its deduped
    text) plus ``n_lines, n_kept``; a document whose every line was
    dropped comes back with empty text, not dropped.  ``sep`` is a
    literal separator (split and rejoin).
    """
    lid = F.col("__ld_id")
    lines = df.select(
        F.col(id_col).alias("__ld_id"),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep), -1)
        ).alias("__pos", "__line"),
    )
    dedupable = F.length("__line") >= min_len
    firsts = (
        lines.where(dedupable)
        .groupBy("__line")
        .agg(F.min(F.struct("__ld_id", "__pos")).alias("__first"))
    )
    kept = lines.join(firsts, on="__line", how="left").where(
        (~dedupable)
        | (F.col("__first") == F.struct(lid.alias("__ld_id"), F.col("__pos")))
    )
    rebuilt = kept.groupBy("__ld_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.withColumn(
        "n_lines", F.size(F.split(F.col(text_col), re.escape(sep), -1))
    )
    return base.join(
        rebuilt, base[id_col] == rebuilt["__ld_id"], "left"
    ).select(
        *[
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col)
            if c == text_col
            else base[c]
            for c in df.columns
        ],
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# Exact substring dedup (suffix-array posture, Lee et al. 2021)
# --------------------------------------------------------------------------


def duplicate_substring_spans(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Maximal duplicated substrings of ≥ ``k`` tokens, first
    occurrence wins — the EXACT substring dedup of "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2021,
    arXiv:2107.06499, public method), whose reference implementation
    builds a corpus-wide suffix array on one machine.  Re-expressed
    for a cluster as the standard distributed equivalent:

    1. every length-``k`` token window becomes a hashed SEED with its
       ``(doc, position)`` — one explode, O(corpus tokens) rows, no
       suffix array;
    2. a seed occurring ≥ 2 times corpus-wide is duplicated; the
       LOWEST ``(doc_id, position)`` occurrence per seed is the kept
       original, every other occurrence is marked (first-occurrence-
       wins, the :func:`line_dedup` posture) — one shuffle keyed on
       the seed hash;
    3. per document, marked seeds merge into MAXIMAL spans (two
       duplicated windows overlapping by ≥ 1 token are one duplicated
       region) via the interval-merge window: running-max end →
       new-span flag → cumulative span id — one shuffle keyed on the
       doc id.

    Returns ``(id_col, span_start, span_end, n_tokens)`` with
    token-index spans, ``span_end`` exclusive.  Tokens are whitespace
    runs; a document shorter than ``k`` tokens can never match.
    Seed equality is by 64-bit hash (``portable=True`` swaps in the
    md5 family for cross-engine parity) — at 2⁶⁴ a collision
    mislabeling a window is vanishingly rarer than the corpus-level
    duplication it hunts, the same trade every MinHash stage makes."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.split(F.trim(F.col(text_col)), "\\s+").alias("__t"),
    ).where(F.size("__t") >= k)

    def gram_hash():
        gram = F.concat_ws(" ", F.slice("__t", F.col("__i") + 1, k))
        if portable:
            return portable_hash60(gram)
        return F.xxhash64(gram)

    occ = (
        toks.select(
            "__id",
            F.explode(
                F.sequence(F.lit(0), F.size("__t") - k)
            ).alias("__i"),
            "__t",
        )
        .select("__id", "__i", gram_hash().alias("__h"))
    )
    keepers = occ.groupBy("__h").agg(
        F.min(F.struct("__id", "__i")).alias("__keep"),
        F.count(F.lit(1)).alias("__c"),
    ).where(F.col("__c") >= 2)
    marked = occ.join(keepers, "__h").where(
        ~(
            (F.col("__id") == F.col("__keep.__id"))
            & (F.col("__i") == F.col("__keep.__i"))
        )
    ).select("__id", "__i", (F.col("__i") + k).alias("__end"))

    w = Window.partitionBy("__id").orderBy("__i")
    prev_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        marked.withColumn(
            "__new",
            F.when(
                prev_end.isNull() | (F.col("__i") > prev_end),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__span",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("__id", "__span")
        .agg(
            F.min("__i").alias("span_start"),
            F.max("__end").alias("span_end"),
        )
    )
    return spans.select(
        F.col("__id").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
    )


def remove_duplicate_substrings(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Drop every duplicated ≥ ``k``-token substring except its first
    corpus occurrence (:func:`duplicate_substring_spans`) and rebuild
    the text.  Only AFFECTED documents are re-tokenized and rebuilt
    (single-space joined — whitespace-normalized, the standard posture
    of these pipelines); untouched documents pass through verbatim.
    Adds ``n_removed_tokens``."""
    spans = duplicate_substring_spans(
        df, k=k, text_col=text_col, id_col=id_col, portable=portable
    ).withColumnRenamed(id_col, "__sid")
    affected = spans.select("__sid").distinct()
    hit = df.join(
        affected, df[id_col] == affected["__sid"], "left_semi"
    )
    toks = hit.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), "\\s+")
        ).alias("__i", "__tok"),
    )
    # per-doc equi-join + range filter: spans per doc are few, so the
    # post-join filter is cheap and needs no interval bucketing
    covered = toks.join(
        spans,
        (toks["__id"] == spans["__sid"])
        & (toks["__i"] >= spans["span_start"])
        & (toks["__i"] < spans["span_end"]),
        "left",
    )
    rebuilt = (
        covered.groupBy("__id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__sid").isNull(),
                                F.struct("__i", "__tok"),
                            )
                        )
                    ),
                    lambda s: s["__tok"],
                ),
            ).alias("__text"),
            (
                F.count(F.lit(1))
                - F.count(F.when(F.col("__sid").isNull(), 1))
            ).cast("long").alias("__rm"),
        )
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
    return out.select(
        *[
            F.coalesce(F.col("__text"), F.col(text_col)).alias(text_col)
            if c == text_col
            else df[c]
            for c in df.columns
        ],
        F.coalesce(F.col("__rm"), F.lit(0)).alias("n_removed_tokens"),
    )
