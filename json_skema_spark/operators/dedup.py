"""Deduplication operators for large-scale training-data pipelines.

No reference analogue (json-sKema is single-document); these generalize its
``uniqueItems`` semantics (Validator.kt:692-708) to content-level duplicate
detection over a documents table:

- exact: hash-groupBy on a content digest (md5 — same algorithm in Spark and
  DuckDB, so oracle-comparable)
- MinHash + LSH: shingle -> per-seed min-hash -> band -> bucket join;
  candidates verified by exact n-gram Jaccard
- SimHash: 64-bit bit-vote fingerprint, banded for candidate generation
- embedding near-dup lives in operators/similarity.py (shared LSH machinery)

Everything below is pure ``pyspark.sql.functions`` (whole-stage codegen; the
only shuffles are the groupBys on digest/band, which are the minimal
theoretical shuffles for the operation). Hash seeds are compile-time
constants, so results are deterministic and resumable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_skema_spark.functions.text import md5_hex_slice
from json_skema_spark.operators.util import ensure_parallelism


# -- exact ------------------------------------------------------------------

def content_digest(col: Column, *, normalize: bool = True) -> Column:
    """md5 digest of (optionally whitespace/case-normalized) text."""
    c = col
    if normalize:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(c)


def exact_duplicates(df: DataFrame, text_col: str, id_col: str, *,
                     normalize: bool = True, max_ids: int | None = 100,
                     id_salts: int = 64) -> DataFrame:
    """Digest groups with >1 member: ``(digest, n_docs, doc_ids)``.

    Two-phase hash agg (map-side combine) on the digest; only digests+ids
    shuffle, never the document text. ``n_docs`` is always exact;
    ``doc_ids`` is the ``max_ids`` lexicographically-smallest member ids.

    Hot-group safety (VERDICT r02 #3): a hyper-duplicated document (empty
    string, boilerplate header) can have millions of members — an unbounded
    ``collect_list`` would build one multi-million-element array cell and a
    straggler task. With ``max_ids`` set, ids are first aggregated per
    (digest, salt) sub-group and sliced to ``max_ids`` *before* the final
    merge, so no agg buffer or shuffled row ever exceeds ~group/``id_salts``
    elements and the final cell is <= ``max_ids``. Per-salt K-smallest
    merged and re-sliced equals the global K-smallest (top-K is
    distributive over partitions). ``max_ids=None`` restores the full list.
    """
    # ensure_parallelism on the (id, text) projection: a small corpus
    # arrives as 1-2 splits (openCostInBytes floors the split size) and the
    # normalize-regex + md5 then run on 1-2 cores; the repartition moves
    # only the projected columns and is a no-op at scale (r06 measurement:
    # 1.2 s -> ~0.45 s at sf1.0 on 32 cores)
    d = ensure_parallelism(df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))) \
        .select("doc_id",
                content_digest(F.col("_text"), normalize=normalize).alias("digest"))
    # null text -> null digest; groupBy treats nulls as equal, which would
    # report documents whose content was never compared as one duplicate
    # cluster — null-text rows are simply not exact duplicates of anything
    d = d.filter(F.col("digest").isNotNull())
    if max_ids is None:
        return (
            d.groupBy("digest")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
            .filter(F.col("n_docs") > 1)
        )
    salted = (
        d.groupBy("digest",
                  F.pmod(F.xxhash64("doc_id"), F.lit(id_salts)).alias("_salt"))
        .agg(F.count("*").alias("_n"),
             F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_ids)
             .alias("_ids"))
    )
    return (
        salted.groupBy("digest")
        .agg(F.sum("_n").alias("n_docs"),
             F.slice(F.sort_array(F.flatten(F.collect_list("_ids"))), 1, max_ids)
             .alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


# -- shingling + MinHash ----------------------------------------------------

def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    tokens = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    k = F.greatest(F.size(tokens) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        )
    )


def shingle_hashes(col: Column, n: int = 3, seed: int = 42) -> Column:
    """Distinct word n-gram shingles reduced to 8-byte xxhash64 values.

    Hashing once at the source makes every downstream stage operate on
    ``array<long>`` instead of ``array<string>`` — the MinHash signature
    derivation and the verify-stage joins then shuffle ~8 bytes per shingle
    rather than the shingle text (3-5x narrower at 100 TB). Jaccard on the
    hashed sets equals Jaccard on the string sets up to 64-bit collisions
    (~n^2 / 2^64 — negligible)."""
    return F.transform(shingles(col, n), lambda s: F.xxhash64(s, F.lit(seed)))


def minhash_signature_from_hashes(hash_col: Column,
                                  num_hashes: int = 64) -> Column:
    """Array of ``num_hashes`` min-hash values in ONE pass over pre-hashed
    shingles: the hash family is derived by re-hashing each 8-byte value with
    the hash index (``xxhash64(h, i)``) — ~10x cheaper than hashing the
    string per family member, and the element-wise ``least`` fold keeps it a
    single ``aggregate`` (no 64 array passes)."""
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    max_long = (1 << 63) - 1
    return F.aggregate(
        hash_col,
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(idx, lambda i: F.xxhash64(h, i)),
            lambda a, m: F.least(a, m)),
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64,
                      seed: int = 42) -> Column:
    """Signature straight from string shingles (see
    ``minhash_signature_from_hashes``). Deterministic in ``seed``."""
    return minhash_signature_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(seed))),
        num_hashes)


_PERSISTED_BASES: list = []


def release_persisted_signatures() -> int:
    """Unpersist every signature dataset cached by
    ``minhash_near_duplicates(persist_signatures=True)`` and return how
    many were released. Call AFTER the pair/cluster results have been
    consumed (an action ran) — the cache exists to dedupe the 3-4 subplan
    re-executions inside one query, so releasing mid-query just recomputes."""
    n = 0
    while _PERSISTED_BASES:
        _PERSISTED_BASES.pop().unpersist()
        n += 1
    return n


def minhash_near_duplicates(df: DataFrame, text_col: str, id_col: str, *,
                            shingle_n: int = 3, num_hashes: int = 64,
                            bands: int = 16, seed: int = 42,
                            jaccard_threshold: float = 0.8,
                            verify: bool = True,
                            max_bucket: int = 1000,
                            persist_signatures: bool = True) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH.

    Pipeline: shingle -> signature -> split into ``bands`` bands of
    ``num_hashes // bands`` rows -> hash each band -> explode -> groupBy
    (band, band_hash) bucket join -> candidate pairs -> (optional) exact
    Jaccard verification on the shingle sets.

    Scale: the only all-to-all movement is the exploded (band_hash, id)
    pairs — ``bands`` rows per document, independent of document length.
    Candidate verification re-joins shingle sets only for candidate ids
    (semi-join pruned). Output: ``(doc_id_a, doc_id_b, jaccard)`` with
    ``doc_id_a < doc_id_b``.
    """
    if bands <= 0 or num_hashes % bands != 0:
        # silent truncation would alter the LSH S-curve the caller tuned
        # (64 hashes / 12 bands would quietly use only 60), and
        # bands > num_hashes would build zero-hash bands
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes})")
    rows_per_band = num_hashes // bands
    # null text is NOT a duplicate of other null text (same convention as
    # exact_duplicates below and the streaming dedup): a null yields a
    # null signature whose band hashes are xxhash64's seed constant, so
    # every null-text doc would land in ONE bucket per band and pair with
    # every other null doc (review r04)
    df = ensure_parallelism(df).filter(F.col(text_col).isNotNull())
    # max_bucket guards the self-join against degenerate buckets (e.g. empty
    # or boilerplate docs all hashing identically): a bucket of m members
    # contributes m^2/2 candidate pairs, so one hot bucket at 10^12-row scale
    # is quadratic blow-up. Oversized buckets are dropped (their members are
    # still compared through their other bands).
    # shingles are hashed to longs ONCE at the source: the signature and the
    # verify-stage joins both consume array<long> — text never shuffles
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingle_hashes(F.col(text_col), shingle_n, seed).alias("sh"),
    ).withColumn("sig", minhash_signature_from_hashes(F.col("sh"), num_hashes))
    if persist_signatures:
        # `base` feeds the bucket-size agg, the self-join, and both
        # verify-stage joins: without a persist the dominant CPU cost
        # (shingling + 64-way minhash over the full corpus) re-executes
        # 3-4x — self-join branches are distinct subplans, so ReuseExchange
        # alone does not dedupe them. MEMORY_AND_DISK spills; footprint is
        # ids + hashed shingles + signatures (~KB/doc), never the text.
        # The handle is tracked in _PERSISTED_BASES: a long-running app
        # processing several corpora calls release_persisted_signatures()
        # between them, or the cached copies pin block-manager storage for
        # the application lifetime (review r04).
        from pyspark import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_BASES.append(base)

    banded = base.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("bh"),
    ).select("doc_id", F.col("bh.band").alias("band"),
             F.col("bh.band_hash").alias("band_hash"))

    cand = _bucket_pairs(banded, ["band", "band_hash"], max_bucket)
    if not verify:
        return cand.withColumn("jaccard", F.lit(None).cast("double"))

    sh = base.select("doc_id", "sh")
    pairs = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_id_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("doc_id", "doc_id_b")
              .withColumnRenamed("sh", "sh_b"), "doc_id_b")
    )
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def _bucket_pairs(keyed: DataFrame, bucket_cols: list[str],
                  max_bucket: int | None,
                  payload: str = "doc_id") -> DataFrame:
    """Distinct candidate id pairs (``doc_id_a < doc_id_b``) from bucket
    co-membership — ONE aggregation instead of the r05 shape (bucket-size
    agg + left-semi prune + self-join): members are collected per bucket,
    oversized buckets dropped by ``size(_ids)`` (identical semantics to the
    old count-then-semi-join prune), and the m^2/2 ordered pairs generated
    by a double explode — no join, and the bucket keys shuffle ONCE instead
    of three times (guide §2.4; r06 measurement: minhash pairs 3.4 s ->
    see OPTIMIZATION_r06.md). The per-bucket member array is bounded by
    ``max_bucket``, so no agg buffer exceeds that; callers that pass
    ``max_bucket=None`` accept unbounded buckets exactly as the old
    self-join accepted their m^2 blow-up.

    ``payload`` names the id column in ``keyed`` (any orderable type);
    ``keyed`` must be ``bucket_cols + [payload]``."""
    grouped = (keyed.groupBy(*bucket_cols)
               .agg(F.collect_list(payload).alias("_ids"))
               .filter(F.size("_ids") >= 2))
    if max_bucket:
        grouped = grouped.filter(F.size("_ids") <= max_bucket)
    return (
        grouped.select("_ids", F.explode("_ids").alias("doc_id_a"))
        .select("doc_id_a", F.explode("_ids").alias("doc_id_b"))
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .distinct()
    )


def ngram_jaccard(df_pairs: DataFrame, left_text: str, right_text: str,
                  n: int = 3) -> Column:
    """Exact n-gram Jaccard between two text columns of a pair DataFrame."""
    a = shingles(F.col(left_text), n)
    b = shingles(F.col(right_text), n)
    return (F.size(F.array_intersect(a, b)).cast("double")
            / F.size(F.array_union(a, b)))


def ngram_jaccard_near_duplicates(df: DataFrame, text_col: str, id_col: str,
                                  *, n: int = 3,
                                  jaccard_threshold: float = 0.8,
                                  seed: int = 42,
                                  max_posting: int = 1000,
                                  prefix_filter: bool = True,
                                  persist_shingles: bool = True) -> DataFrame:
    """EXACT n-gram-Jaccard near-duplicate pairs via a prefix-filtered
    inverted index — the deterministic sibling of ``minhash_near_duplicates``
    (MinHash trades exactness for a fixed-width signature; this keeps exact
    set semantics and prunes the candidate space analytically instead).

    Pipeline: hash distinct word n-grams to longs once at the source ->
    build an inverted index of (gram, doc_id) postings -> self-join postings
    on gram -> exact Jaccard on the hashed shingle sets for candidate pairs.

    Prefix filter (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): under ANY
    fixed total order on grams, two sets A, B with ``J(A,B) >= t`` satisfy
    ``|A ∩ B| >= t * max(|A|,|B|)``, so the first ``|A| - ceil(t*|A|) + 1``
    grams of A (in that order) must share at least one gram with the
    corresponding prefix of B — indexing only prefixes loses no qualifying
    pair. We order by the gram's hash value, which is free to compute
    distributively (rarity order would need a global document-frequency
    pass); at t=0.8 the index carries ~20% of the postings a full index
    would, shrinking the one all-to-all stage by ~5x.

    Scale: the only all-to-all movements are (1) the 16-byte (gram, doc_id)
    postings — never the text, prefix-trimmed by ``1-t`` — and (2) hashed
    shingle ARRAYS for candidate ids only (semi-join-pruned verify, same
    shape as the MinHash verify stage). ``max_posting`` drops stopword-like
    grams whose postings list would contribute quadratic candidates (same
    convention as MinHash ``max_bucket``: a pair whose shared grams are ALL
    hot is missed, and its members are still compared through their other
    grams). Output: ``(doc_id_a, doc_id_b, jaccard)`` with
    ``doc_id_a < doc_id_b``; jaccard is exact (64-bit hash collisions at
    ~|grams|^2/2^64 are the only deviation from string-set Jaccard).
    """
    if not (0.0 < jaccard_threshold <= 1.0):
        # t <= 0 makes every pair qualify (the all-pairs join the operator
        # exists to avoid); t > 1 is vacuous and breaks the prefix length
        raise ValueError(
            f"jaccard_threshold must be in (0, 1], got {jaccard_threshold}")
    base = (
        ensure_parallelism(df)
        # null text is not a near-duplicate of other null text (uniform
        # convention with exact_duplicates / minhash_near_duplicates)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"),
                shingle_hashes(F.col(text_col), n, seed).alias("sh"))
        # shingles() never yields an empty array (it pads k to >= 1), but an
        # explicit guard keeps the Jaccard denominator provably non-zero
        .filter(F.size("sh") > 0)
    )
    if persist_shingles:
        # feeds the postings index AND both verify-stage joins; without a
        # persist the shingling+hash work re-executes 3x (distinct subplans
        # are not deduped by ReuseExchange). Same lifecycle contract as
        # minhash signatures: release via release_persisted_signatures().
        from pyspark import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_BASES.append(base)

    if prefix_filter:
        srt = F.sort_array(F.col("sh"))
        # the 1e-9 keeps ceil from overshooting an exact integer product by
        # one double ulp (e.g. t*|A| = k computing as k+2^-52): overshoot
        # would SHORTEN the prefix below the lossless bound, while the
        # epsilon can only lengthen it — the safe direction
        plen = (F.size("sh")
                - F.ceil(F.lit(float(jaccard_threshold)) * F.size("sh")
                         - F.lit(1e-9))
                .cast("int") + F.lit(1))
        index_grams = F.slice(srt, 1, plen)
    else:
        index_grams = F.col("sh")
    postings = base.select("doc_id", F.explode(index_grams).alias("gram"))

    # one aggregation replaces the posting-size agg + semi-join + self-join
    # (same prune semantics: a gram whose posting list exceeds max_posting
    # is dropped whole) — see _bucket_pairs
    cand = _bucket_pairs(postings, ["gram"], max_posting)
    sh = base.select("doc_id", "sh")
    pairs = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_id_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("doc_id", "doc_id_b")
              .withColumnRenamed("sh", "sh_b"), "doc_id_b")
    )
    jac = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
           / F.size(F.array_union("sh_a", "sh_b")))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 48  # 4 chunks x 12 bits; 2^i stays exactly representable


def simhash(col: Column, *, bits: int = SIMHASH_BITS, seed: int = 42) -> Column:
    """Bit-vote SimHash fingerprint of a text column, entirely JVM-side.

    Each token hashes to 60 bits — the lower md5 half (hex chars 17..31),
    chosen over ``xxhash64`` because md5 is bit-identical across engines, so
    the whole fingerprint is DuckDB-oracle-checkable (same trick as
    functions/text.fingerprint); ``seed`` is appended to the token bytes.
    Bit b of the fingerprint is the sign of the vote sum over tokens.
    Implemented with higher-order functions (aggregate / zip_with) so it
    stays in codegen — no Python in the loop. Bit masks are ``pow(2, i)``
    (exact in double for i <= 52), because ``shiftleft`` requires a static
    shift amount.
    """
    tokens = F.array_distinct(
        F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " "))
    hashes = F.transform(
        tokens,
        lambda t: md5_hex_slice(t, 17, 15, seed=seed).cast("long"))
    masks = F.transform(F.sequence(F.lit(0), F.lit(bits - 1)),
                        lambda i: F.pow(F.lit(2.0), i).cast("long"))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, F.lit(1))
            .otherwise(F.lit(-1)),
        ),
    )
    pairs = F.zip_with(votes, masks,
                       lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")))
    return F.aggregate(pairs, F.lit(0).cast("long"),
                       lambda acc, x: acc.bitwiseOR(x))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two fingerprints (popcount via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(df: DataFrame, text_col: str, id_col: str, *,
                            max_hamming: int = 3, seed: int = 42,
                            max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs by SimHash: band the 48-bit fingerprint into
    ``max_hamming + 1`` chunks (pigeonhole: a pair within hamming distance
    d differs in at most d chunks, so with d+1 chunks at least one matches
    exactly), bucket-join on chunks, verify hamming distance. The chunk
    count is DERIVED from ``max_hamming`` — a fixed 4-chunk banding only
    guarantees recall for d <= 3 and silently loses pairs at d >= 4
    (review r04).

    ``max_bucket`` caps the chunk self-join exactly like the MinHash path: a
    degenerate chunk value (e.g. empty docs all fingerprinting to 0) makes
    one bucket m^2/2 pairs — quadratic at 10^12 rows. Oversized buckets are
    dropped; their members still pair through their other chunks."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= SIMHASH_BITS:
        raise ValueError(
            f"max_hamming must be in [0, {SIMHASH_BITS - 1}]")
    width = SIMHASH_BITS // n_chunks  # last chunk absorbs the remainder
    fp = ensure_parallelism(df).select(F.col(id_col).alias("doc_id"),
                   simhash(F.col(text_col), seed=seed).alias("fp"))

    def _chunk_val(i: int):
        w = width if i < n_chunks - 1 else SIMHASH_BITS - width * (n_chunks - 1)
        return F.shiftrightunsigned(F.col("fp"), width * i) \
            .bitwiseAND(F.lit((1 << w) - 1))

    chunks = fp.select(
        "doc_id", "fp",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"), _chunk_val(i).alias("val"))
            for i in range(n_chunks)
        ])).alias("c"),
    ).select("doc_id", "fp", F.col("c.chunk").alias("chunk"),
             F.col("c.val").alias("val"))
    # same one-aggregation pair generation as _bucket_pairs, with the
    # fingerprint riding along in the member struct so hamming verification
    # needs no join back (8 extra bytes per member in the shuffle)
    grouped = (chunks.groupBy("chunk", "val")
               .agg(F.collect_list(F.struct("doc_id", "fp")).alias("_ids"))
               .filter(F.size("_ids") >= 2))
    if max_bucket:
        grouped = grouped.filter(F.size("_ids") <= max_bucket)
    return (
        grouped.select("_ids", F.explode("_ids").alias("a"))
        .select("a", F.explode("_ids").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
                hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _release_local_checkpoint(df: DataFrame, *, blocking: bool = False) -> None:
    """Release the block-manager storage behind a ``localCheckpoint``-ed
    DataFrame. ``Dataset.unpersist()`` only clears CacheManager entries and
    localCheckpoint blocks are not registered there (ADVICE r04) — the
    persisted RDD lives inside the plan's ``LogicalRDD`` node, so unpersist
    THAT. Best-effort: if the plan shape ever changes, the blocks are still
    reclaimed by the ContextCleaner on GC, just later."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
    except Exception:
        pass


def duplicate_clusters(pairs: DataFrame, id_a: str = "doc_id_a",
                       id_b: str = "doc_id_b", *,
                       max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate PAIRS -> clusters with a
    deterministic canonical representative.

    Every pair-producing dedup op here (exact, MinHash-LSH, SimHash,
    embedding-LSH) stops at pairs; production dedup needs the transitive
    closure — A~B and B~C must collapse to ONE keep-decision even when A~C
    was never emitted. Output one row per document that appears in a pair:
    ``(doc_id, cluster_id, is_canonical)`` with ``cluster_id`` = the
    smallest doc id reachable through the pair graph (deterministic, no
    RNG/ordering dependence) and ``is_canonical`` marking the cluster's
    keeper. Documents in no pair are implicitly their own singleton
    cluster and are not emitted.

    Scale design: min-label propagation with POINTER JUMPING — each round
    (a) takes the min label over graph neighbors (one shuffle on the edge
    list) and (b) compresses label chains by joining labels onto
    themselves (label <- label(label)), the classic hooking + pointer-
    jumping CC, converging in O(log diameter) rounds instead of
    O(diameter). Near-dup graphs are near-cliques (tiny diameter), so this
    terminates in 2-3 rounds; ``max_iter`` bounds adversarial chains.
    Per round the lineage is truncated with an eager ``localCheckpoint``
    (iterative plans otherwise grow exponentially), and the convergence
    probe is a ``limit(1)`` existence check, not a full count. Everything
    shuffled is (id, id) pairs — never document payloads.
    """
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct().persist())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iter):
        neigh = (edges.join(labels, edges["dst"] == labels["node"])
                 .groupBy("src").agg(F.min("label").alias("nlabel")))
        stepped = (labels.join(neigh, labels["node"] == neigh["src"], "left")
                   .select(labels["node"],
                           F.least(labels["label"],
                                   F.coalesce(neigh["nlabel"],
                                              labels["label"]))
                           .alias("label")))
        lab2 = stepped.select(F.col("node").alias("n2"),
                              F.col("label").alias("l2"))
        jumped = (stepped.join(lab2, stepped["label"] == lab2["n2"], "left")
                  .select(stepped["node"],
                          F.least(stepped["label"],
                                  F.coalesce(lab2["l2"], stepped["label"]))
                          .alias("label"))
                  .localCheckpoint(eager=True))
        changed = (jumped.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        # release the SUPERSEDED round's checkpoint blocks: without this,
        # every round's materialized label copy stays in the block manager
        # for the application lifetime (review r04). `jumped` is eager, so
        # the old copy is no longer an input to anything. Released via the
        # LogicalRDD's rdd — Dataset.unpersist is a no-op for
        # localCheckpoint blocks (ADVICE r04).
        prev, labels = labels, jumped
        _release_local_checkpoint(prev)
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # falling out of the loop unconverged would return SPLIT clusters
        # — several canonicals per true component, indistinguishable from
        # a correct labeling — and drop_near_duplicates would silently
        # KEEP those duplicates (review r05c)
        raise RuntimeError(
            f"duplicate_clusters did not converge within max_iter="
            f"{max_iter} pointer-jumping rounds — the pair graph contains "
            "a chain longer than 2^max_iter; raise max_iter (rounds "
            "needed ~ log2 of the longest chain)")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"))


def drop_near_duplicates(df: DataFrame, text_col: str, id_col: str, *,
                         broadcast_losers: bool = True,
                         **minhash_kwargs) -> DataFrame:
    """One-call end-to-end dedup: MinHash-LSH pairs -> connected components
    -> keep one canonical document per cluster. Returns ``df`` minus every
    non-canonical cluster member.

    Composition of the scale-audited pieces above: only (id, id) pairs and
    labels ever shuffle beyond the LSH stage. The final drop broadcasts the
    non-canonical id list by default — the labels come from a
    localCheckpoint whose size statistics Spark cannot estimate, so without
    the hint the anti-join would sort-merge and shuffle the full corpus
    INCLUDING text payloads. Losers scale with the duplicate count, not the
    corpus; pass ``broadcast_losers=False`` only for pathological corpora
    where duplicates themselves exceed executor memory or Spark's 8 GiB
    broadcast-table hard cap — the forced broadcast then fails LOUDLY
    (never silently wrong) and the flag falls back to a shuffle join,
    which is the honest cost at that point.
    """
    pairs = minhash_near_duplicates(df, text_col, id_col, **minhash_kwargs)
    losers = (duplicate_clusters(pairs)
              .filter(~F.col("is_canonical"))
              .select(F.col("doc_id").alias(id_col)))
    if broadcast_losers:
        losers = F.broadcast(losers)
    return df.join(losers, id_col, "left_anti")
