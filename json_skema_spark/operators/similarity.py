"""Similarity search over an embedding column (``array<float|double>``).

No reference analogue (SURVEY.md §2.f "approx distinct — new"); part of the
training-data-pipeline surface. Two paths:

- ``cosine_topk``: brute-force exact top-k against a literal query vector —
  the correctness baseline. Dot products via ``zip_with`` + ``aggregate``
  (JVM-side, codegen); top-k via ``ORDER BY ... LIMIT k`` which Spark
  executes as TakeOrderedAndProject (per-partition heap + driver merge —
  no full sort, no shuffle of the table).
- ``lsh_bucket`` / ``ann_topk``: random-hyperplane LSH (sign of projections
  onto ``num_planes`` driver-seeded hyperplanes). At scale the bucket id is
  a partition key: a query probes one bucket (plus optional neighboring
  buckets by Hamming distance) instead of scanning everything.
- ``embedding_near_duplicates``: same-bucket self-join + exact cosine — the
  embedding-space analogue of MinHash near-dup.

Hyperplanes are generated driver-side from a numpy PRNG with a fixed seed and
baked into the plan as literals — deterministic and resumable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_skema_spark.operators.util import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, zero-vector safe: a zero-norm side scores 0.0,
    not NaN — Spark sorts NaN ABOVE every number, so an unguarded 0/0
    would both pass `>= threshold` filters and displace real top-k hits
    whenever the corpus carries padding/failed-encode all-zero rows."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(df: DataFrame, embedding_col: str, id_col: str, query,
                k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to ``query`` (a Python list/ndarray).

    Output: ``(id, score)`` ordered desc, deterministic ties by id.
    """
    q = _lit_vec(query)
    scored = ensure_parallelism(df).select(
        F.col(id_col),
        cosine(F.col(embedding_col).cast("array<double>"), q).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def make_hyperplanes(dim: int, num_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def lsh_bucket(embedding: Column, hyperplanes: np.ndarray) -> Column:
    """Sign-of-projection bucket id (0 .. 2^num_planes - 1), JVM-side."""
    if len(hyperplanes) > 63:
        # bit 63 is the sign bit: F.lit(2**63) is unrepresentable as a
        # signed long and fails literal conversion at plan build
        # (review r05c) — band the planes instead (bands x <=63)
        raise ValueError(
            f"{len(hyperplanes)} hyperplanes exceed the 63 bits a signed "
            "long bucket id can carry — split them into bands of <= 63 "
            "planes (ann_topk's bands/planes_per_band)")
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        bit = F.when(dot(embedding, _lit_vec(h)) > 0,
                     F.lit(int(2 ** i)).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def ann_topk(df: DataFrame, embedding_col: str, id_col: str, query,
             k: int = 10, *, num_planes: int = 12, seed: int = 42,
             probe_hamming: int = 1, bands: int | None = None,
             planes_per_band: int = 4) -> DataFrame:
    """Approximate top-k. Two probe strategies:

    - single-table (``bands=None``): score rows whose ``num_planes``-bit
      LSH bucket is within ``probe_hamming`` bits of the query's bucket.
      Cuts the scored set by ~2^num_planes / sum_{i<=h} C(num_planes, i),
      but an AND-of-12-planes bucket misses moderate-similarity neighbors
      badly (measured recall@10 ~0.1 at cosine ~0.5 — BENCH ann_recall).
    - banded OR-construction (``bands`` set): a row is a candidate when
      its sign-vector matches the query's on ALL ``planes_per_band``
      planes of ANY band — the same 1-(1-p^r)^b recall amplification the
      near-duplicate ops use. At 16x4 a cosine-0.5 neighbor is a candidate
      with p ~ 0.97 vs ~0.11 for single-table probing; the price is a
      larger candidate set (the OR of b buckets), honest at scale because
      real embedding corpora have high-similarity neighbors where each
      band still prunes hard.

    At 100 TB the table is written bucketed/partitioned by the band
    buckets so the probe prunes partitions at the source; candidates
    stream through one TakeOrderedAndProject (per-partition heap + driver
    merge — no sort, no shuffle of the table)."""
    dim = len(query)
    emb = F.col(embedding_col).cast("array<double>")
    qvec = np.asarray(query, dtype=float)
    if bands is None:
        planes = make_hyperplanes(dim, num_planes, seed)
        bucketed = df.select(F.col(id_col), emb.alias("_e"),
                             lsh_bucket(emb, planes).alias("_bucket"))
        qbucket = int(sum((2 ** i) for i, h in enumerate(planes)
                          if float(np.dot(h, qvec)) > 0))
        probe = bucketed.filter(
            F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbucket)))
            <= probe_hamming)
    else:
        planes = make_hyperplanes(dim, bands * planes_per_band, seed)
        band_cols, q_buckets = [], []
        for b in range(bands):
            sub = planes[b * planes_per_band:(b + 1) * planes_per_band]
            band_cols.append(lsh_bucket(emb, sub))
            q_buckets.append(int(sum(
                (2 ** i) for i, h in enumerate(sub)
                if float(np.dot(h, qvec)) > 0)))
        # OR over bands, evaluated in one pass — no self-join, no explode:
        # the query's b bucket ids are literals folded into the predicate
        match = None
        for c, qb in zip(band_cols, q_buckets):
            m = (c == qb)
            match = m if match is None else (match | m)
        probe = df.select(F.col(id_col), emb.alias("_e"), match.alias("_m")) \
            .filter(F.col("_m"))
    scored = probe.select(F.col(id_col),
                          cosine(F.col("_e"), _lit_vec(query)).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def train_ivf_centroids(df: DataFrame, embedding_col: str, *, n_lists: int = 16,
                        seed: int = 42, max_iter: int = 20,
                        sample_rows: int = 100_000,
                        approx_rows: int | None = None) -> np.ndarray:
    """Coarse quantizer for IVF: KMeans (Spark MLlib) on a deterministic
    UNBIASED sample. Returns (n_lists, dim) centroids. The model is
    centroids-only (broadcast as literals).

    Sampling (VERDICT r02 #6): pass ``approx_rows`` (the table's rough
    size — cheap from table metadata) and the sample fraction is derived
    with NO count job. Without it, one narrow count of the embedding-id
    column sizes the fraction — never ``limit(sample_rows)`` alone, which
    takes the FIRST file splits: on a table written ordered by
    time/tenant the quantizer would be fit to one slice of the
    distribution and probe recall collapses elsewhere.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    frac_df = df.select(F.col(embedding_col).cast("array<double>").alias("e"))
    rows = approx_rows if approx_rows is not None else frac_df.count()
    if rows > sample_rows:
        # the safety cap (4x) must not be a bare GlobalLimit: that consumes
        # head partitions first, so when approx_rows under-estimates by >3x
        # the cap binds and re-biases the sample toward the head of the
        # table (ADVICE r03). Ranking by a deterministic hash of the vector
        # makes the capped subset a uniform draw regardless of physical
        # order — TakeOrderedAndProject, each task keeps at most the cap.
        frac_df = (frac_df
                   .sample(fraction=min(1.0, 1.25 * sample_rows / rows),
                           seed=seed)
                   .withColumn("_h", F.xxhash64(F.col("e"), F.lit(seed)))
                   .orderBy("_h").limit(4 * sample_rows).drop("_h"))
    train = frac_df.select(array_to_vector(F.col("e")).alias("features"))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(train)
    return np.array(km.clusterCenters())


def ivf_list_id(embedding: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid list id, pure Column expressions (argmin over
    ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is common so dropped)."""
    dists = F.array(*[
        (F.lit(float(np.dot(c, c))) - 2.0 * dot(embedding, _lit_vec(c)))
        for c in centroids
    ])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_topk(df: DataFrame, embedding_col: str, id_col: str, query, k: int = 10,
             *, centroids: np.ndarray | None = None, n_lists: int = 16,
             n_probe: int = 3, seed: int = 42) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` inverted lists whose
    centroids are nearest the query, brute-force cosine inside them.

    At scale the table would be written partitioned by ``ivf_list_id`` so the
    probe prunes partitions at the source; pass precomputed ``centroids`` to
    skip training (e.g. loaded from the index build job)."""
    if centroids is None:
        centroids = train_ivf_centroids(df, embedding_col, n_lists=n_lists,
                                        seed=seed)
    q = np.asarray(query, dtype=float)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe_lists = [int(i) for i in np.argsort(d2)[:n_probe]]
    emb = F.col(embedding_col).cast("array<double>")
    assigned = df.select(F.col(id_col), emb.alias("_e"),
                         ivf_list_id(emb, centroids).alias("_list"))
    probed = assigned.filter(F.col("_list").isin(probe_lists))
    scored = probed.select(F.col(id_col),
                           cosine(F.col("_e"), _lit_vec(query)).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def embedding_near_duplicates(df: DataFrame, embedding_col: str, id_col: str, *,
                              cosine_threshold: float = 0.95,
                              bands: int = 16, planes_per_band: int = 4,
                              seed: int = 42, dim: int | None = None,
                              max_bucket: int = 1000,
                              persist_vectors: bool = True) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: **banded** random-hyperplane
    LSH (the SimHash/MinHash banding trick applied to sign-projections), then
    exact-cosine verification. Output ``(id_a, id_b, cosine)``.

    A pair is a candidate when its sign-vector agrees on ALL planes of SOME
    band: P(candidate) = 1 - (1 - p^r)^b with p = 1 - theta/pi. A single
    AND-of-12-planes bucket (the naive design) has recall ~0.28 at cosine
    0.95; 16 bands x 4 planes pushes the miss probability below 1e-7 for
    near-identical vectors while still pruning ~all random pairs. Shuffle
    volume: ``bands`` (band, bucket, id) rows per vector — independent of
    dimension; vectors themselves only move for the verified candidates.

    ``dim`` is the embedding dimension; pass it when known (it is a schema
    property, not data) — the ``.first()`` fallback is a driver action that
    runs an extra job. ``max_bucket`` caps each band's bucket self-join (one
    hot bucket of m members is m^2/2 pairs — quadratic at scale)."""
    if dim is None:
        dim = int(df.select(F.size(embedding_col).alias("d")).first()["d"])
    planes = make_hyperplanes(dim, bands * planes_per_band, seed)
    emb = F.col(embedding_col).cast("array<double>")
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), emb.alias("e"))
    if persist_vectors:
        # reused by the banding stage, the bucket-size agg, and both
        # verify joins (same rationale as minhash_near_duplicates) — and
        # tracked in the SAME release registry: an untracked persist pins
        # block-manager storage for the application lifetime, the exact
        # leak release_persisted_signatures() exists to drain
        # (review r05c)
        from pyspark import StorageLevel

        from json_skema_spark.operators.dedup import _PERSISTED_BASES
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_BASES.append(base)
    banded = base.select(
        "doc_id", "e",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                lsh_bucket(F.col("e"),
                           planes[b * planes_per_band:(b + 1) * planes_per_band])
                .alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "e", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    # one aggregation replaces the bucket-size agg + semi-join + self-join
    # (identical prune semantics); only (band, bucket, id) rows shuffle —
    # never the vectors (dedup._bucket_pairs, r06)
    from json_skema_spark.operators.dedup import _bucket_pairs
    cand = _bucket_pairs(banded.select("band", "bucket", "doc_id"),
                         ["band", "bucket"], max_bucket) \
        .select(F.col("doc_id_a").alias("id_a"),
                F.col("doc_id_b").alias("id_b"))
    vecs = base
    pairs = (
        cand.join(vecs.select(F.col("doc_id").alias("id_a"),
                              F.col("e").alias("e_a")), "id_a")
        .join(vecs.select(F.col("doc_id").alias("id_b"),
                          F.col("e").alias("e_b")), "id_b")
    )
    return (
        pairs.withColumn("cosine", cosine(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
