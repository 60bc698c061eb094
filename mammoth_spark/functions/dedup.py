"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-disciplined for 100 TB corpora:

- ``dedup_exact``      — content-hash groupBy (one shuffle on md5(text)).
- ``minhash_signatures``/``dedup_minhash_lsh`` — shingle -> minhash ->
  banded LSH bucket join. The candidate join is on band keys (high
  selectivity), NEVER all-pairs; exact Jaccard verifies candidates.
- ``dedup_simhash``    — 16-bit SimHash from token md5 nibbles; duplicate
  groups = equal simhash. Pure expressions, one aggregation.
- ``ngram_jaccard_pairs`` — exact word-3-gram Jaccard within a blocking
  key (lang, source); the quadratic step is bounded per block.
- embedding cosine near-dup lives in similarity.py (shared kernels).

Everything is built from the md5-portable expression subset so each query
has an exact DuckDB oracle (queries.py generates the mirrored SQL
programmatically with the same constants).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import round6

# MinHash configuration — mirrored by the oracle SQL generator.
MINHASH_HASHES = 8
LSH_BANDS = 4
LSH_ROWS = 2  # MINHASH_HASHES / LSH_BANDS
SHINGLE_WORDS = 3


def _shingles_from_tokens(toks: Column, text: Column) -> Column:
    """Distinct word 3-gram shingles from a MATERIALIZED token-array
    column; whole text if shorter than 3 words.

    ``toks`` must be a plain column reference, not a split() expression:
    expressions embedded in a higher-order-function lambda are copied into
    every element_at access and re-evaluated per element — measured 3-4x
    slower on the shingle stage."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(SHINGLE_WORDS - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(o)) for o in range(SHINGLE_WORDS)]
        ),
    )
    return F.array_distinct(F.when(n >= SHINGLE_WORDS, grams).otherwise(F.array(text)))


def with_shingles(
    df: DataFrame, text_col: str, id_col: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Project (id, *extra, sh=array<shingle>) with tokens materialized in
    an intermediate projection so the shingle lambda reads an array
    attribute instead of recomputing split() per access."""
    from ..plans.layout import repartition_for_compute

    tok = repartition_for_compute(df).select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    return tok.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        _shingles_from_tokens(F.col("_toks"), F.col("_text")).alias("sh"),
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash; emit groups + canonical id.

    One hash aggregation; at scale the md5 shuffle key is uniformly
    distributed so there is no skew by construction.
    """
    h = F.md5(F.col(text_col))
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def _sig_cols(n_hashes: int = MINHASH_HASHES) -> list[Column]:
    """sig_j = min over shingles of md5('<j>:'||shingle), computed narrowly
    as array_min(transform(sh, ...)): per-row expressions only.

    NB: the per-j lambda must stay unary — F.transform dispatches on lambda
    arity, and a captured-default second parameter would be silently bound
    to the array index."""

    def hash_fn(j: int):
        return lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))

    return [
        F.array_min(F.transform(F.col("sh"), hash_fn(j))).alias(f"sig_{j}")
        for j in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = MINHASH_HASHES,
) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of
    md5('<j>:'||shingle). Lexicographic min over md5 hex IS a uniform
    min-hash (the hex string orders identically to the 128-bit value).

    Entirely narrow — array_min over a transform of the shingle array —
    so signatures cost ZERO shuffles at any scale (the earlier
    explode+groupBy formulation shuffled every shingle)."""
    sh = with_shingles(df, text_col, id_col)
    return sh.select(
        F.col(id_col), F.size("sh").alias("n_shingles"), *_sig_cols(n_hashes)
    )


def _band_cols(n_bands: int = LSH_BANDS, n_rows: int = LSH_ROWS) -> list[Column]:
    cols = []
    for b in range(n_bands):
        parts = [F.col(f"sig_{b * n_rows + r}") for r in range(n_rows)]
        cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    return cols


def _bounded_bucket_pairs(
    rows: DataFrame, bucket_cols: list[str], id_col: str, max_bucket_size: int | None
) -> DataFrame:
    """Candidate pairs within buckets, with the per-bucket blow-up bounded.

    Buckets of n rows enumerate all n(n-1)/2 pairs ONLY while
    n <= max_bucket_size; an oversized bucket (a mega-cluster of
    near-identical boilerplate at corpus scale — 10^6 copies would mean
    10^12 pairs) instead emits a STAR: every member pairs with the
    bucket's canonical (min-id) row, n-1 pairs, preserving cluster
    connectivity (every member still reaches the canonical, so transitive
    duplicate groups survive) while the pair count stays linear.

    One window pass annotates (size, canonical) per bucket; the window's
    hash partitioning on the bucket key is exactly the self-join's key, so
    the annotation adds no extra exchange on the join's probe side.
    ``max_bucket_size=None`` disables the bound (exact pair semantics).
    """
    if max_bucket_size is None:
        a, b = rows.alias("a"), rows.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in bucket_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return (
            a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )

    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_cols)
    ann = rows.select(
        F.col(id_col),
        *bucket_cols,
        F.count(F.lit(1)).over(w).alias("_bn"),
        F.min(id_col).over(w).alias("_canon"),
    )
    small = ann.filter(F.col("_bn") <= max_bucket_size)
    a, b = small.alias("a"), small.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    small_pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    large_pairs = (
        ann.filter(F.col("_bn") > max_bucket_size)
        .filter(F.col(id_col) != F.col("_canon"))
        .select(F.col("_canon").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return small_pairs.unionByName(large_pairs).distinct()


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.2,
    max_bucket_size: int | None = 64,
    n_bands: int = LSH_BANDS,
    n_rows: int = LSH_ROWS,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified by exact Jaccard.

    ``n_bands``/``n_rows`` are the RECALL knobs (VERDICT r1): candidate
    probability for similarity s is 1-(1-s^n_rows)^n_bands, so more
    bands (same rows) raises recall monotonically — and because band b
    always hashes sigs [b*n_rows, ...), a higher-band configuration's
    candidate set is a strict superset of a lower one's (pinned by
    tests/test_compact_property.py). Defaults stay 4x2 to match the
    oracle SQL.

    Stage 1: signatures — narrow per-row expressions, no shuffle.
    Stage 2: band bucket join — docs sharing ANY band become candidates
    (union over bands, distinct), with per-bucket pair enumeration bounded
    by ``max_bucket_size`` (oversized buckets emit star pairs to their
    canonical member instead of the quadratic product — see
    ``_bounded_bucket_pairs``). Stage 3: exact Jaccard on shingle sets
    for candidates only. The all-pairs product never materializes; at
    100 TB the band keys are the partition keys and AQE handles residual
    bucket skew. The shingle frame is computed ONCE and persisted
    (memory-and-disk) because three branches consume it — signatures and
    both sides of the verification join.
    """
    # EAGERLY POPULATED persist (r13): the band join's AQE broadcast
    # jobs are submitted concurrently, and with a lazy persist every one
    # of them raced to populate the cache — the event log showed 5+
    # overlapping broadcast jobs each re-running the full shingle
    # computation (2–5 s apiece at sf0.1). The count() materializes the
    # cache exactly once, synchronously, BEFORE any consumer. The
    # storage stays the COLUMNAR persist, not a localCheckpoint: the
    # scale-curve refresh measured the row-format checkpoint 2.4× slower
    # at sf1/sf10, where materializing the shingle arrays as row blocks
    # dwarfs the race it avoids.
    from pyspark import StorageLevel

    base = with_shingles(df, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    sigs = base.select(F.col(id_col), *_sig_cols(n_bands * n_rows)).select(
        F.col(id_col), *_band_cols(n_bands, n_rows)
    )
    bands = sigs.selectExpr(
        id_col,
        "stack({n}, {args}) as (band_idx, band)".format(
            n=n_bands,
            args=", ".join(f"{b}, band_{b}" for b in range(n_bands)),
        ),
    )
    cand = _bounded_bucket_pairs(bands, ["band_idx", "band"], id_col, max_bucket_size)
    shingles = base.withColumnRenamed("sh", "shingles")
    pairs = (
        cand.join(shingles.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(shingles.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.select(
            "id_a",
            "id_b",
            round6(inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def minhash_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Signature-store row per doc: ``(id, sh_fp array<bigint>, band_0..)``.

    This is the durable index an INCREMENTAL dedup pipeline persists
    between ingests: shingles travel as 64-bit xxhash fingerprints (compact,
    join-able, same collision model ngram_jaccard_pairs documents) and the
    LSH band keys are precomputed. Storage is O(shingles), the price of
    exact-Jaccard verification against history without re-reading old text."""
    base = with_shingles(df, text_col, id_col)
    sigs = base.select(F.col(id_col), F.col("sh"), *_sig_cols())
    return sigs.select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("sh_fp"),
        *_band_cols(),
    )


def _stack_bands(idx: DataFrame, id_col: str) -> DataFrame:
    return idx.selectExpr(
        id_col,
        "stack({n}, {args}) as (band_idx, band)".format(
            n=LSH_BANDS,
            args=", ".join(f"{b}, band_{b}" for b in range(LSH_BANDS)),
        ),
    )


# Partition count of the durable signature store's band index. Band keys
# hash-route to band=<bucket> directories, so an epoch's probe join reads
# ONLY the history files whose bucket appears in the increment — file-level
# pruning instead of a full store scan (parquet PartitionFilters,
# asserted in tests/test_plans.py). 64 at test scale; at 100 TB this is
# the knob that sizes per-epoch history I/O (buckets >> increment band
# cardinality → most history untouched).
# Partition fan-out of the persisted signature store. The knob trades
# per-epoch write/commit overhead (each epoch touches up to this many
# partition dirs) against probe-time pruning granularity; at fixture
# scale 16 keeps the partitioned-commit cost negligible, at 100 TB the
# store would use thousands (a delta's file count stays ∝ its bucket
# fan-out either way — write_sig_store clusters one file per bucket).
N_STORE_BUCKETS = 16


@dataclass
class SigStore:
    """Durable incremental-dedup index, two datasets:

    - ``bands``: ``(doc_id, band_idx, band, band_bucket)`` — the LSH probe
      index, stacked one row per (doc, band) and laid out on disk
      partitioned by ``band_bucket = pmod(band, N_STORE_BUCKETS)``;
    - ``fps``: ``(doc_id, sh_fp array<bigint>)`` — shingle fingerprints
      for exact-Jaccard verification of candidate pairs.

    Published as append-only per-epoch DELTA directories (LSM-style):
    each ingest writes O(increment) new files instead of republishing the
    whole store, and a crashed epoch's overwrite is idempotent."""

    bands: DataFrame
    fps: DataFrame


def _delta_of(idx: DataFrame, id_col: str) -> SigStore:
    # band keys are md5 hex strings — route via xxhash64 so the bucket is
    # uniform regardless of the band-key representation
    bands = _stack_bands(idx, id_col).withColumn(
        "band_bucket",
        F.pmod(F.xxhash64(F.col("band")), F.lit(N_STORE_BUCKETS)).cast("int"),
    )
    return SigStore(bands=bands, fps=idx.select(F.col(id_col), F.col("sh_fp")))


def sig_store_union(a: SigStore, b: SigStore) -> SigStore:
    return SigStore(a.bands.unionByName(b.bands), a.fps.unionByName(b.fps))


def write_sig_store(delta: SigStore, path: str) -> None:
    """Persist one epoch's delta: band rows land under
    ``<path>/bands/band_bucket=<k>/`` (the pruning layout), fingerprints
    under ``<path>/fps/``. Overwrite mode keeps epoch retries idempotent."""
    # cluster by the partition column first: ONE file per touched bucket
    # instead of (tasks x buckets) shards — an epoch's delta file count
    # is bounded by its bucket fan-out, and later probes list/footread
    # far fewer files per pruned bucket
    delta.bands.repartition("band_bucket").write.mode("overwrite").partitionBy(
        "band_bucket"
    ).parquet(path + "/bands")
    delta.fps.coalesce(1).write.mode("overwrite").parquet(path + "/fps")


def write_sig_tombstones(del_ids: DataFrame, path: str, id_col: str = "doc_id") -> None:
    """Erasure delta for the signature store (the dedup-side half of
    user-data removal, cf. ``user_purge_audit`` rows and
    ``delete_from_ivf_index`` vectors): a doc_id-only tombstone
    directory published next to the band/fps deltas — O(purge batch),
    no band or fingerprint file is ever rewritten. ``read_sig_store``
    anti-joins tombstones out, so a future re-ingest of a purged
    document's content is matched only against the SURVIVING history:
    the purged doc can never again suppress a newcomer (the semantics
    erasure requires — the removed copy no longer exists, so the new
    one IS the first occurrence). Decisions already made at earlier
    epochs are history and stay made."""
    del_ids.select(F.col(id_col).alias("doc_id")).distinct().coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def read_sig_store(spark, delta_paths, tombstone_paths=()) -> SigStore | None:
    """Open the union of all published deltas. Each root keeps its
    ``band_bucket`` partition discovery, so a bucket filter prunes files
    across every delta. ``tombstone_paths`` (erasure deltas from
    ``write_sig_tombstones``) are anti-joined out of both datasets —
    the tombstone set is purge-sized, so it broadcasts and the pruned
    band-scan shape is unchanged."""
    from functools import reduce

    paths = sorted(delta_paths)
    if not paths:
        return None
    # each delta is its own partitioned root (multi-root discovery
    # conflicts otherwise); the bucket filter pushes through the union
    # into every per-delta scan, so pruning covers all history
    bands = reduce(
        DataFrame.unionByName, [spark.read.parquet(p + "/bands") for p in paths]
    )
    fps = spark.read.parquet(*[p + "/fps" for p in paths])
    ts_paths = sorted(tombstone_paths)
    if ts_paths:
        ts = spark.read.parquet(*ts_paths).select("doc_id").distinct()
        bands = bands.join(F.broadcast(ts), "doc_id", "left_anti")
        fps = fps.join(F.broadcast(ts), "doc_id", "left_anti")
    return SigStore(bands=bands, fps=fps)


def compact_sig_store(
    spark, delta_paths, out_path: str, tombstone_paths=()
) -> list[str]:
    """Fold every delta + tombstone into ONE physical delta (the
    OPTIMIZE pass of the LSM store, and the step that makes erasure
    PHYSICAL: tombstones only shadow purged signatures logically —
    until this fold rewrites the band/fps files, the purged bytes still
    exist on disk, which data-erasure obligations ultimately forbid).
    Writes the reconciled store to ``out_path`` (must be a fresh
    directory — never one of the inputs, enforced) and returns the new
    one-element delta lineage; the caller retires the old dirs once no
    reader references them (the same publish-then-vacuum discipline as
    the IVF index and the MOR target)."""
    norm_out = out_path.rstrip("/")
    if any(norm_out == p.rstrip("/") for p in delta_paths):
        raise ValueError("compact_sig_store needs a fresh out_path")
    store = read_sig_store(spark, delta_paths, tombstone_paths)
    if store is None:
        return []
    write_sig_store(store, out_path)
    return [out_path]


def dedup_incremental(
    store: SigStore | None,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.2,
) -> tuple[DataFrame, SigStore]:
    """One ingest step of incremental near-dup filtering: returns
    ``(survivor_ids, delta)`` — the delta is the increment's OWN index
    rows, which the caller appends to the store (``write_sig_store`` for
    durable deltas, ``sig_store_union`` for in-memory chaining).

    A new doc is dropped when ANY doc with a lower id — already-ingested
    history (the signature store) or an earlier doc of the same increment —
    is a verified near-duplicate. Because the store keeps every SEEN doc
    (not just survivors), applying increments in id order is EXACTLY
    equivalent to one whole-corpus pass (asserted in tests + by the
    driver oracle): dropping B for matching dropped-A still happens,
    which a survivors-only store would miss.

    Scale shape: candidate generation joins the increment's band keys
    against the store's, and the history side is first pruned to the
    increment's band buckets by a broadcast LEFT SEMI join on the
    store's partition column — file-level partition pruning on the
    partitioned store layout, so per-epoch history I/O is bounded by
    the buckets the increment actually probes, never the corpus, and
    nothing round-trips through the driver. Join-key equality implies
    bucket equality, so the pruning is lossless. Exact-Jaccard
    verification reads fingerprint arrays from the store, so old text
    is never re-read."""
    # the signature computation (shingling + minhash) feeds four branches
    # (delta, band join, fingerprint lookup, survivor anti-join) and the
    # caller's writes — materialize it once instead of paying the
    # regex/shingle pass per consumer (measured ~40% of epoch time in
    # the streaming wrapper)
    new_idx = minhash_index(new_docs, text_col, id_col).localCheckpoint(eager=True)
    delta = _delta_of(new_idx, id_col)
    if store is None:
        probe_bands, all_fps = delta.bands, delta.fps
    else:
        # prune history to the increment's band buckets with a broadcast
        # LEFT SEMI join (delta.bands is already materialized via the
        # localCheckpoint above, so the build side is epoch-sized and
        # costs no recompute). Join-key equality implies bucket equality,
        # so the pruning is lossless; unlike the previous collected
        # .isin() literal, no bucket list rides through the driver — a
        # large ingest epoch can no longer produce a megaliteral plan,
        # and dynamic partition pruning can push the semi-join keys into
        # the partitioned store scan.
        # the band_bucket >= 0 predicate is vacuously true (buckets are
        # 0..N_STORE_BUCKETS-1 by construction) but marks the build side
        # selective, which is what Spark's dynamic-partition-pruning
        # planner requires to inject the semi-join keys into the store
        # scan's PartitionFilters (pinned in tests/test_plans.py:
        # dynamicpruningexpression, no static IN-literal)
        probe_buckets = (
            delta.bands.filter(F.col("band_bucket") >= 0)
            .select("band_bucket")
            .distinct()
        )
        hist_bands = store.bands.join(
            F.broadcast(probe_buckets), "band_bucket", "left_semi"
        )
        probe_bands = hist_bands.unionByName(delta.bands)
        all_fps = store.fps.unionByName(delta.fps)

    a = probe_bands.alias("a")
    b = delta.bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    fa = all_fps.select(F.col(id_col).alias("id_a"), F.col("sh_fp").alias("fp_a"))
    fb = all_fps.select(F.col(id_col).alias("id_b"), F.col("sh_fp").alias("fp_b"))
    inter = F.size(F.array_intersect(F.col("fp_a"), F.col("fp_b")))
    union = F.size(F.array_union(F.col("fp_a"), F.col("fp_b")))
    dups = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(round6(inter / union) >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    survivors = new_idx.select(id_col).join(dups, id_col, "left_anti")
    return survivors, delta


def connected_components(
    edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Distributed connected components over undirected ``(id_a, id_b)``
    edges; returns ``(id, comp)`` with ``comp`` = min id in the component.

    Algorithm: min-label propagation fused with pointer jumping
    ("hash-to-min" family). Each round every vertex takes the min label
    over itself and its neighbors, then follows its label one hop
    (``comp := comp(comp)``), so labels race down star edges AND chain
    edges — convergence is O(log diameter) rounds, not O(diameter). LSH
    near-dup components are shallow (bounded buckets emit stars), so this
    terminates in a handful of rounds even on a 100 TB corpus.

    Scale shape per round: one shuffle join edges⋈labels + map-side
    combinable min, one labels⋈labels pointer jump — all keyed by vertex
    id, so AQE coalesces and the same hash partitioning is reused.
    ``localCheckpoint`` cuts lineage each round (iterative plans otherwise
    grow until the optimizer chokes); the fixpoint test is a single scalar
    aggregate — sum(comp) is strictly decreasing until converged, so one
    equal reading proves no vertex moved (labels only ever decrease).
    """
    from pyspark.sql import Observation

    # Materialize the edge list ONCE — every round joins against it, and
    # without the cut each round would replay the upstream pair pipeline
    # (e.g. the whole LSH candidate generation) from scratch. The edge
    # count rides the SAME materialization job as an Observation (r13:
    # metrics fire on localCheckpoint, verified) instead of a second
    # count() pass.
    obs0 = Observation()
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # Size the iteration to the EDGE count, not the session default: the
    # verified near-dup edge set is orders of magnitude smaller than the
    # corpus, and every round otherwise pays (shuffle partitions × rounds)
    # empty-task scheduling overhead. ~1M edges per partition keeps tasks
    # dense locally and scales the same way on a cluster (a 10^10-edge run
    # gets 10^4 partitions).
    n_edges = int(obs0.get["n"])
    parts = max(1, min(sym.rdd.getNumPartitions(), int(n_edges // 1_000_000) + 1))
    # partition by DST — the per-round join key — so EnsureRequirements
    # reuses this layout every iteration and the edge list is never
    # re-shuffled inside the loop (only the small labels side moves)
    sym = sym.repartition(parts, "dst").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iterations):
        nbr = (
            sym.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("dcomp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("ncomp"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp")
        )
        # comp is always some vertex's id (a min over ids), so the
        # pointer-jump self-join is total: follow comp -> comp(comp).
        # The fixpoint sum rides the SAME materialization job as an
        # Observation (r13): one action per round, not two. decimal(38,0)
        # because ids may span the full bigint domain (e.g. xxhash64-keyed
        # vertices from operators/compact.py) and an ANSI bigint sum
        # would overflow; the decimal sum is exact, so the
        # strictly-decreasing fixpoint argument is unchanged.
        obs = Observation()
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("jcomp")
                ).alias("y"),
                "comp",
            )
            .select(F.col("x.id").alias("id"), F.col("jcomp").alias("comp"))
            .observe(obs, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
        ).localCheckpoint(eager=True)
        s = obs.get["s"]
        labels = jumped
        if s == prev_sum:
            break
        prev_sum = s
    return labels


SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def _nibble(hex_col: Column, pos: int) -> Column:
    """Value 0-15 of the pos-th (1-based) hex char — portable to DuckDB via
    strpos('0123..f', substr(h,pos,1))-1."""
    return F.instr(F.lit(_HEX), F.substring(hex_col, pos, 1)) - 1


def dedup_simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash per doc over distinct tokens; near-dups share the
    value. Bit b comes from nibble b//4 of md5(token), bit 3-(b%4); the
    doc's bit is 1 when more tokens set it than clear it (sum > 0).

    Entirely narrow: tokens are md5-hashed once into an array column, then
    each bit's majority vote is size(filter(...)) arithmetic over that
    array — per-row expressions, ZERO shuffles at any scale (the earlier
    explode+groupBy formulation shuffled one row per doc)."""
    from ..plans.layout import repartition_for_compute

    hashed = repartition_for_compute(df).select(
        F.col(id_col),
        F.transform(
            F.array_distinct(F.split(F.col(text_col), " ")), lambda t: F.md5(t)
        ).alias("_hs"),
    )
    n = F.size(F.col("_hs"))

    def bit_test(pos: int, mask: int):
        # unary lambda — F.filter dispatches on arity (see _sig_cols)
        def f(h):
            nib = F.instr(F.lit(_HEX), F.substring(h, pos, 1)) - 1
            return (F.floor(nib / mask) % 2) == 1

        return f

    simhash = None
    for b in range(SIMHASH_BITS):
        pos, mask = b // 4 + 1, 1 << (3 - (b % 4))
        n_set = F.size(F.filter(F.col("_hs"), bit_test(pos, mask)))
        term = F.when(2 * n_set - n > 0, F.lit(1 << b)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return hashed.select(
        F.col(id_col), simhash.cast("bigint").alias("simhash"), n.alias("n_tokens")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang", "source"),
    jaccard_threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a blocking key.

    Scalable formulation: explode distinct shingles, equi-join on
    (block, shingle) to count intersections — only pairs that SHARE a
    shingle ever materialize (a zero-intersection pair can't pass any
    positive threshold, so this is exactly equivalent to the quadratic
    block product). |A∪B| = |A|+|B|-|A∩B| from per-doc counts. Shuffle
    keys are (block, shingle) — fine-grained, skew-resistant — versus the
    block-only key of the naive pairwise join."""
    shared = _shared_shingle_counts(df, text_col, id_col, tuple(block_cols))
    inter = F.col("n_shared")
    union = F.col("n_a") + F.col("n_b") - inter
    return (
        shared.select(
            "id_a",
            "id_b",
            *block_cols,
            round6(inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang", "source"),
    overlap_threshold: float = 0.5,
) -> DataFrame:
    """Overlap-coefficient pairs (|A∩B| / min(|A|, |B|)) within a
    blocking key — the CONTAINMENT signal Jaccard misses: a short doc
    fully embedded in a long one (a quote, a syndicated excerpt, a
    template wrapper) has tiny Jaccard (union is dominated by the long
    doc) but overlap 1.0. Same shared-shingle plan as
    ngram_jaccard_pairs — only the closed-form measure over
    (n_shared, n_a, n_b) differs, so the scale shape is identical:
    (block, shingle)-keyed shuffle, no block-wide product."""
    shared = _shared_shingle_counts(df, text_col, id_col, tuple(block_cols))
    overlap = F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        shared.select(
            "id_a",
            "id_b",
            *block_cols,
            round6(overlap).alias("overlap"),
        )
        .filter(F.col("overlap") >= overlap_threshold)
    )


def _shared_shingle_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: tuple[str, ...],
) -> DataFrame:
    """(id_a, id_b, *block, n_a, n_b, n_shared) for every same-block doc
    pair sharing at least one distinct shingle."""
    docs = with_shingles(df, text_col, id_col, tuple(block_cols)).select(
        F.col(id_col),
        *block_cols,
        F.size("sh").alias("n_sh"),
        # shingles travel through the shuffle as 64-bit fingerprints, not
        # 3-word strings: identical intersection counts, far fewer bytes
        F.explode(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("shingle"),
    )
    # one shingle computation feeds both join sides; hash join beats
    # sort-merge here (small build side per (block, shingle) key).
    # Eagerly POPULATED columnar persist (r13): the self-join's two map
    # stages are scheduled concurrently and would otherwise BOTH miss
    # the unpopulated cache and recompute the exploded shingle frame;
    # the count() fills the cache once before either starts (columnar
    # persist, not a checkpoint — see dedup_minhash_lsh's note on the
    # row-format cost at scale).
    from pyspark import StorageLevel

    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    a, b = docs.alias("a"), docs.hint("shuffle_hash").alias("b")
    join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a.shingle") == F.col("b.shingle")
    )
    for c in block_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    shared = (
        a.join(b, join_cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared
