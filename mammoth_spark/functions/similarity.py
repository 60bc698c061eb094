"""Similarity search over embedding columns (array<float>).

- ``cosine_pairs_bucketed`` — embedding-cosine near-dup pairs with
  sign-bit LSH blocking: each vector lands in ONE bucket (the sign
  pattern of its first k components); pairs only form within a bucket.
  The all-pairs product never materializes — the join key is the bucket.
- ``ann_topk_bruteforce`` — exact top-k neighbors for a (small) query
  set: broadcast the queries, one pass over the corpus, per-query top-k
  via window. The baseline every approximate method is judged against.
- ``ann_topk_bucketed`` — IVF-style bucket restriction as a pure
  DataFrame formulation: queries only probe their own sign-bucket, but
  the corpus is NOT physically laid out, so the probe is a broadcast
  join over a full scan (right semantics, no pruning — fine when the
  corpus is already in memory or small).
- ``build_ivf_index`` + ``ann_topk_ivf`` — the 100 TB scale path: the
  index build writes the corpus as parquet physically partitioned by
  ``_bucket`` with norms precomputed; a probe then joins the broadcast
  query set on the partition column, and dynamic partition pruning
  (DPP) turns the corpus scan into reads of ONLY the probed buckets —
  asserted in tests/test_plans.py via the scan's
  ``dynamicpruningexpression`` PartitionFilter.

Dot products are F.zip_with + F.aggregate over array<double> — JVM
higher-order functions, sequential summation (bit-identical to the DuckDB
oracle's list_transform/list_sum), no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import round6

SIGN_BUCKET_BITS = 4


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def sign_bucket(emb: Column, bits: int = SIGN_BUCKET_BITS) -> Column:
    """IVF-ish coarse quantizer: bucket id from the sign of the first
    ``bits`` components (element_at is 1-based)."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(emb, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def with_norm_and_bucket(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    emb = _as_double(F.col(emb_col))
    return df.select(
        "*",
        norm(emb).alias("_norm"),
        sign_bucket(F.col(emb_col)).alias("_bucket"),
    )


def cosine_pairs_bucketed(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within sign buckets.

    Pair enumeration per bucket is bounded by ``max_bucket_size``: a dense
    embedding region whose bucket exceeds the cap emits star pairs to the
    bucket's canonical (min-id) vector instead of the quadratic product
    (``functions.dedup._bounded_bucket_pairs``), so one hot bucket cannot
    blow up the join at corpus scale. Candidates then score cosine and
    filter on the threshold as before."""
    from .dedup import _bounded_bucket_pairs

    v = with_norm_and_bucket(df, emb_col).select(
        F.col(id_col), F.col(emb_col), "_norm", "_bucket"
    )
    cand = _bounded_bucket_pairs(v.select(F.col(id_col), "_bucket"), ["_bucket"], id_col, max_bucket_size)
    a = v.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("_emb_a"),
        F.col("_norm").alias("_norm_a"),
        F.col("_bucket").alias("bucket"),
    )
    b = v.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("_emb_b"),
        F.col("_norm").alias("_norm_b"),
    )
    cos = dot(_as_double(F.col("_emb_a")), _as_double(F.col("_emb_b"))) / (
        F.col("_norm_a") * F.col("_norm_b")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", "bucket", round6(cos).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_topk_bruteforce(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 16,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: query set = vec_id < n_queries, broadcast
    against the full corpus; rank by (cos desc, neighbor id) for
    deterministic ties."""
    from pyspark.sql import Window

    v = df.select(F.col(id_col), _as_double(F.col(emb_col)).alias("emb")).withColumn(
        "_norm", norm(F.col("emb"))
    )
    q = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("emb").alias("q_emb"), F.col("_norm").alias("q_norm")
    )
    joined = v.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    cos = dot(F.col("emb"), F.col("q_emb")) / (F.col("_norm") * F.col("q_norm"))
    scored = joined.select(
        "query_id", F.col(id_col).alias("neighbor_id"), round6(cos).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_topk_multiprobe(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 16,
    k: int = 5,
    n_probe: int = 2,
    bits: int = SIGN_BUCKET_BITS,
) -> DataFrame:
    """Multi-probe IVF ANN: each query probes its own sign bucket PLUS the
    buckets reached by flipping its least-confident sign bits — the
    components with the smallest |value|, where the sign quantizer was
    most arbitrary. This is the classic multi-probe LSH recall fix: near
    neighbors straddling a sign boundary live in an adjacent bucket, and
    the flip order is exactly the probe-priority order.

    Probe fan-out is ``n_probe`` buckets per query (not per corpus row):
    the corpus is still scanned once per probed bucket via the broadcast
    join, so at 100 TB the cost is n_probe partition-pruned scans instead
    of a full pass — recall rises with n_probe, cost stays linear in it.
    Each corpus vector lives in exactly ONE bucket, so probed buckets are
    disjoint and no per-pair dedup is needed."""
    from pyspark.sql import Window

    v = with_norm_and_bucket(df, emb_col).select(
        F.col(id_col), _as_double(F.col(emb_col)).alias("emb"), "_norm", "_bucket"
    )
    # (|component|, index) pairs sorted ascending — struct sort orders by
    # abs value then index, giving a deterministic flip priority
    conf = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at(F.col("emb"), i + 1)).alias("a"),
                    F.lit(i).alias("i"),
                )
                for i in range(bits)
            ]
        )
    )
    flips = F.slice(conf, 1, n_probe - 1)
    probes = F.concat(
        F.array(F.col("_bucket")),
        F.transform(
            flips,
            lambda s: F.col("_bucket").bitwiseXOR(F.pow(F.lit(2.0), s["i"]).cast("int")),
        ),
    )
    q = (
        v.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.explode(probes).alias("q_probe"),
        )
    )
    joined = v.join(
        F.broadcast(q),
        (F.col("_bucket") == F.col("q_probe")) & (F.col(id_col) != F.col("query_id")),
    )
    cos = dot(F.col("emb"), F.col("q_emb")) / (F.col("_norm") * F.col("q_norm"))
    scored = joined.select(
        "query_id", F.col(id_col).alias("neighbor_id"), round6(cos).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_topk_bucketed(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 16,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN, logical formulation: probe only the query's sign
    bucket. Same output shape as the brute-force baseline; recall < 1 by
    design. NOTE: this version does not lay the corpus out physically —
    the probe is a broadcast join over a full scan, so it restricts the
    pairs compared, not the bytes read. For the scan-pruned scale path
    use build_ivf_index + ann_topk_ivf (identical results, DPP-pruned
    scan)."""
    from pyspark.sql import Window

    v = with_norm_and_bucket(df, emb_col).select(
        F.col(id_col), _as_double(F.col(emb_col)).alias("emb"), "_norm", "_bucket"
    )
    q = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
        F.col("_bucket").alias("q_bucket"),
    )
    joined = v.join(
        F.broadcast(q),
        (F.col("_bucket") == F.col("q_bucket")) & (F.col(id_col) != F.col("query_id")),
    )
    cos = dot(F.col("emb"), F.col("q_emb")) / (F.col("_norm") * F.col("q_norm"))
    scored = joined.select(
        "query_id", F.col(id_col).alias("neighbor_id"), round6(cos).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# The IVF index root is VERSIONED like every other store in the repo
# (sources/target.py: versioned dirs + write-then-rename pointer): data
# lives under ``<root>/v_<n>/`` with tombstones in ``<root>/v_<n>_ts/``,
# and ``_CURRENT`` names the published version. Probes resolve the
# pointer once, so a compaction publishing v_{n+1} never tears a
# concurrent reader of v_n — the same swap discipline as A12.


def _ivf_pointer(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_CURRENT")


def ivf_current_version(index_dir: str) -> int | None:
    try:
        with open(_ivf_pointer(index_dir)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def ivf_current_dir(index_dir: str) -> str:
    """The published version's data directory (probe target)."""
    import os

    v = ivf_current_version(index_dir)
    if v is None:
        raise FileNotFoundError(f"IVF index {index_dir} not initialized")
    return os.path.join(index_dir, f"v_{v}")


def _ivf_publish(index_dir: str, version: int) -> None:
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=index_dir, prefix="_CURRENT.")
    with os.fdopen(fd, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _ivf_pointer(index_dir))


def _ivf_tombstone_dir(index_dir: str, version: int) -> str:
    import os

    return os.path.join(index_dir, f"v_{version}_ts")


def build_ivf_index(
    df: DataFrame,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """IVF index build: write the corpus as parquet physically
    partitioned by the sign-bucket coarse quantizer, norms precomputed,
    into a fresh version directory published by pointer swap.

    This is the materialization step every real IVF system has (the
    "train + add" phase): pay one full pass + shuffle-free partitioned
    write up front so every later probe reads only its bucket's files.
    At 100 TB with 2^bits buckets the layout also bounds file sizes per
    bucket directory, and the write is append-friendly — new vectors
    land in their bucket partition without touching the rest."""
    import os

    os.makedirs(index_dir, exist_ok=True)
    ver = (ivf_current_version(index_dir) or 0) + 1
    v = with_norm_and_bucket(df, emb_col).select(
        F.col(id_col), F.col(emb_col), "_norm", "_bucket"
    )
    v.write.partitionBy("_bucket").mode("overwrite").parquet(
        os.path.join(index_dir, f"v_{ver}")
    )
    _ivf_publish(index_dir, ver)


def ann_topk_ivf(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    honor_tombstones: bool = True,
) -> DataFrame:
    """Probe a built IVF index: join the broadcast query set on the
    partition column so dynamic partition pruning (DPP) restricts the
    index scan to the probed buckets — the executed plan's index-side
    FileScan carries ``PartitionFilters: [... dynamicpruningexpression
    (_bucket IN ...)]``, i.e. only the probed buckets' files are read.
    No driver-side bucket collection: the pruning subquery is planned by
    Spark from the broadcast side, so the same plan serves 16 or 10^6
    queries. ``queries`` must carry (query_id, q_emb, q_norm, q_bucket).

    ``honor_tombstones`` defaults to True so erased vectors never leak
    from a probe that forgot to opt in (ADVICE r09): when no tombstone
    delta exists against the current version the anti-join is skipped
    entirely, so the default costs nothing on a clean index. Pass False
    only for audit probes that must see pre-erasure state.

    Results are identical to ann_topk_bucketed on the same corpus; the
    difference is purely physical (bytes read per probe)."""
    from pyspark.sql import Window

    idx = spark.read.parquet(ivf_current_dir(index_dir))
    v = idx.select(
        F.col(id_col), _as_double(F.col("embedding")).alias("emb"), "_norm", "_bucket"
    )
    if honor_tombstones:
        ts = read_ivf_tombstones(spark, index_dir)
        if ts is not None:
            # deleted vectors drop BEFORE scoring: the tombstone set is
            # delete-batch-sized, so this broadcasts — the bucket-pruned
            # scan shape of the probe is unchanged
            v = v.join(F.broadcast(ts), id_col, "left_anti")
    joined = v.join(
        F.broadcast(queries),
        (F.col("_bucket") == F.col("q_bucket")) & (F.col(id_col) != F.col("query_id")),
    )
    cos = dot(F.col("emb"), _as_double(F.col("q_emb"))) / (
        F.col("_norm") * F.col("q_norm")
    )
    scored = joined.select(
        "query_id", F.col(id_col).alias("neighbor_id"), round6(cos).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def append_ivf_index(
    df: DataFrame,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental IVF "add": append a new batch of vectors into the
    existing bucket-partitioned layout. Each new vector lands as
    appended files inside its own ``_bucket=`` partition directory —
    already-written files are never rewritten (the LSM discipline of
    functions/dedup.py's MinHash signature store, applied to the vector
    index). Because the coarse quantizer (sign bucket) is a pure
    function of the embedding, batch-built and incrementally-grown
    indexes are file-layout-different but probe-identical — pinned by
    tests/test_round4_ops.py::test_incremental_ivf_probe_equals_batch.

    At 100 TB this is the operation that keeps an embedding index
    fresh under streaming ingest without an O(corpus) rebuild: per
    epoch, work ∝ the epoch's vectors (one narrow pass + partitioned
    append); compaction of small per-epoch files is the same
    compaction_plan/execute_compaction_plan maintenance the row tables
    use."""
    v = with_norm_and_bucket(df, emb_col).select(
        F.col(id_col), F.col(emb_col), "_norm", "_bucket"
    )
    v.write.partitionBy("_bucket").mode("append").parquet(ivf_current_dir(index_dir))


def delete_from_ivf_index(
    del_ids: DataFrame, index_dir: str, id_col: str = "vec_id"
) -> None:
    """Incremental IVF "delete": append an id-only tombstone delta next
    to the current version — cost ∝ the delete batch, bucket files are
    never rewritten (the merge-on-read discipline of sources/target.py
    applied to the vector index). Probes anti-join the tombstones; the
    rewrite is deferred to ``compact_ivf_index`` on an operator-chosen
    schedule. This is the deletion-propagation half a real pipeline
    needs (user data erasure reaching derived embedding stores, cf. the
    row-side ``user_purge_audit``): O(batch) to honor, O(corpus) only
    when compacting. Tombstones are keyed to the version they shadow,
    so the compaction's pointer swap atomically retires them with it.

    Concurrency (ADVICE r09): a ``compact_ivf_index`` pointer swap racing
    this append could land the batch in the just-retired ``v_n_ts``
    directory — the erasure would be silently lost (and vacuumed). After
    the write, ``_CURRENT`` is re-read; on mismatch the same batch is
    re-appended against the new version (idempotent: compaction's
    anti-join tolerates tombstones it already folded, and duplicate ids
    are harmless to probes). Bounded retries, then a hard error — losing
    an erasure silently is never acceptable."""
    del_batch = del_ids.select(id_col).distinct()
    for _ in range(5):
        ver = ivf_current_version(index_dir)
        if ver is None:
            raise FileNotFoundError(f"IVF index {index_dir} not initialized")
        del_batch.write.mode("append").parquet(_ivf_tombstone_dir(index_dir, ver))
        if ivf_current_version(index_dir) == ver:
            return
    raise RuntimeError(
        f"IVF index {index_dir}: version kept moving during tombstone append "
        "(concurrent compaction storm) — erasure batch must be re-driven"
    )


def read_ivf_tombstones(spark, index_dir: str) -> DataFrame | None:
    """The current version's tombstone set, or None when no delete is
    pending against it (probes skip the anti-join entirely then)."""
    import os

    ver = ivf_current_version(index_dir)
    if ver is None:
        return None
    td = _ivf_tombstone_dir(index_dir, ver)
    if not os.path.isdir(td):
        return None
    return spark.read.parquet(td).distinct()


def compact_ivf_index(spark, index_dir: str, id_col: str = "vec_id") -> None:
    """Fold tombstones into a FRESH version (the OPTIMIZE pass): one
    anti-join scan, one partitioned write of v_{n+1}, one pointer swap —
    a concurrent probe keeps reading v_n untorn and the swap retires
    v_n's tombstones with it (the A12 discipline; the old version
    becomes garbage for ``vacuum_ivf_index``). Probe results before and
    after are identical — pinned in tests/test_round4_ops.py."""
    import os

    ver = ivf_current_version(index_dir)
    ts = read_ivf_tombstones(spark, index_dir)
    if ts is None:
        return
    kept = spark.read.parquet(ivf_current_dir(index_dir)).join(
        ts, id_col, "left_anti"
    )
    kept.write.partitionBy("_bucket").mode("overwrite").parquet(
        os.path.join(index_dir, f"v_{ver + 1}")
    )
    _ivf_publish(index_dir, ver + 1)


def vacuum_ivf_index(index_dir: str) -> list[str]:
    """Drop every version/tombstone directory not reachable from the
    pointer. Pointer-file commit makes removal order safe. A missing or
    corrupted ``_CURRENT`` is a hard error (ADVICE r09): without a
    resolvable pointer EVERY version directory would look unreachable
    and vacuum would silently destroy the whole index — the same refusal
    ``ivf_current_dir`` gives probes."""
    import os
    import shutil

    ver = ivf_current_version(index_dir)
    if ver is None:
        raise FileNotFoundError(
            f"IVF index {index_dir} has no _CURRENT pointer — refusing to vacuum"
        )
    dropped = []
    for name in os.listdir(index_dir):
        if not name.startswith("v_"):
            continue
        stem = name[2:].removesuffix("_ts")
        if stem.isdigit() and int(stem) != ver:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
            dropped.append(name)
    return sorted(dropped)
