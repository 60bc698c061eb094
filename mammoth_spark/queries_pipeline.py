"""Training-data-pipeline query surface: text analysis, dedup, similarity.

Each Spark implementation (functions/{text,dedup,similarity}.py) is paired
with a DuckDB oracle GENERATED from the same constants, so both sides stay
mirror-exact: same regexes, same md5-based hashing, same thresholds, same
rounding. The portable primitives (verified identical across engines):
md5 hex, regexp_extract_all, lexicographic min over hex strings,
sequential double summation (F.aggregate <-> list_reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_HASHES,
    SHINGLE_WORDS,
    SIMHASH_BITS,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from .functions.similarity import (
    SIGN_BUCKET_BITS,
    ann_topk_bruteforce,
    ann_topk_bucketed,
    cosine_pairs_bucketed,
)
from .functions.text import (
    LANG_PROFILES,
    STOPWORDS,
    TOKEN_REGEX,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from .model import read_table
from .registry import register

# thresholds shared by Spark impl + oracle
MINHASH_JACCARD_T = 0.2
NGRAM_JACCARD_T = 0.1
COSINE_T = 0.3
ANN_QUERIES = 16
ANN_K = 5
FINGERPRINT_K = 16

# ------------------------------ text analysis ------------------------------

_SQL_TOKS = f"regexp_extract_all(text, '{TOKEN_REGEX}')"


@register(
    "token_count",
    driver=False,
    oracle=f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens,
       len({_SQL_TOKS}) AS n_tokens,
       len(list_distinct({_SQL_TOKS})) AS n_distinct_tokens,
       length(text) AS n_chars
FROM documents
""",
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokens, distinct counts."""
    return token_stats(read_table(spark, sf_dir, "documents"))


def _quality_oracle() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text, {_SQL_TOKS} AS toks,
         len({_SQL_TOKS}) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS n_punct
  FROM documents
),
feat AS (
  SELECT doc_id, length(text) AS n_chars, n_tokens,
         CASE WHEN n_tokens > 0 THEN n_punct * 1.0 / n_tokens ELSE 0.0 END AS punct_ratio_raw,
         CASE WHEN n_tokens > 0 THEN
           len(list_filter(toks, t -> list_contains([{stop_list}], lower(t)))) * 1.0 / n_tokens
           ELSE 0.0 END AS stop_ratio_raw,
         CASE WHEN n_tokens > 0 THEN
           list_sum(list_transform(toks, t -> length(t))) * 1.0 / n_tokens
           ELSE 0.0 END AS mean_tok_len_raw
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
       floor((punct_ratio_raw) * 1000000) / 1000000 AS punct_ratio,
       floor((stop_ratio_raw) * 1000000) / 1000000 AS stopword_ratio,
       floor((mean_tok_len_raw) * 1000000) / 1000000 AS mean_token_len,
       floor((least(n_chars / 500.0, 1.0) * 0.4
             + (1.0 - least(punct_ratio_raw * 4, 1.0)) * 0.3
             + least(stop_ratio_raw * 5, 1.0) * 0.3) * 1000000) / 1000000 AS quality
FROM feat
"""


@register("quality_score", driver=False, oracle=_quality_oracle())
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length/punct/stopword features + composite."""
    return quality_score(read_table(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    codes = sorted(LANG_PROFILES)
    score_exprs = []
    for c in codes:
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[c])
        score_exprs.append(
            f"len(list_intersect(toks, [{words}])) AS score_{c}"
        )
    best = "greatest(" + ", ".join(f"score_{c}" for c in codes) + ")"
    lang_case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND score_{c} = {best} THEN '{c}'" for c in codes
    ) + " ELSE 'und' END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_transform({_SQL_TOKS}, t -> lower(t))) AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, {", ".join(score_exprs)} FROM toks
)
SELECT doc_id, {lang_case} AS lang_pred, {best} AS lang_score,
       {", ".join(f"score_{c}" for c in codes)}
FROM scored
"""


@register("lang_id", driver=False, oracle=_lang_id_oracle())
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-profile voting (n-gram heuristic)."""
    return lang_id(read_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    driver=False,
    oracle=f"""
SELECT doc_id,
       list_min(list_transform(
         generate_series(1, greatest(length(text) - {FINGERPRINT_K - 1}, 1)),
         i -> md5(substr(text, CAST(i AS INT), {FINGERPRINT_K})))) AS fingerprint,
       length(text) AS n_chars
FROM documents
""",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min md5 over k-char grams."""
    return doc_fingerprint(read_table(spark, sf_dir, "documents"), k=FINGERPRINT_K)


# ------------------------------ deduplication ------------------------------

# shared shingle CTE (word 3-grams, distinct, whole-text fallback)
_SHINGLES_CTE = f"""
doc_shingles AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= {SHINGLE_WORDS}
              THEN list_distinct(list_transform(
                     generate_series(1, len(string_split(text, ' ')) - {SHINGLE_WORDS - 1}),
                     i -> string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2]))
              ELSE [text] END AS shingles
  FROM documents
)
"""


@register(
    "dedup_exact",
    # r3 rotation: exact-dedup evidenced by dedup_incremental_minhash /
    # dedup_clusters / streaming_dedup_*; slot freed for gapfill_interpolate
    driver=False,
    oracle="""
SELECT md5(text) AS content_hash, count(*) AS n_copies,
       min(doc_id) AS canonical_id, max(doc_id) AS max_id
FROM documents GROUP BY 1
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash."""
    return dedup_exact(read_table(spark, sf_dir, "documents"))


def _minhash_sig_sql() -> str:
    sig_aggs = ", ".join(
        f"min(md5('{j}:' || shingle)) AS sig_{j}" for j in range(MINHASH_HASHES)
    )
    return f"""
sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM doc_shingles),
sigs AS (
  SELECT doc_id, count(*) AS n_shingles, {sig_aggs}
  FROM sh GROUP BY doc_id
)
"""


@register(
    "minhash_signatures",
    # local-only: signature computation is stage 1 of dedup_minhash_lsh,
    # which stays in the driver set and fails if signatures drift
    driver=False,
    oracle=f"""
WITH {_SHINGLES_CTE}, {_minhash_sig_sql()}
SELECT * FROM sigs
""",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signatures (8 hashes over word-3-gram shingles)."""
    return minhash_signatures(read_table(spark, sf_dir, "documents"))


def _minhash_pairs_ctes() -> str:
    """Shared CTE chain ending in near-dup ``pairs`` (id_a < id_b)."""
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"sig_{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + f") AS band_{b}"
        for b in range(LSH_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS band FROM sigbands"
        for b in range(LSH_BANDS)
    )
    jac = (
        "floor((len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /"
        " len(list_distinct(sa.shingles || sb.shingles))) * 1000000) / 1000000"
    )
    return f"""
WITH {_SHINGLES_CTE}, {_minhash_sig_sql()},
sigbands AS (SELECT doc_id, {band_exprs} FROM sigs),
bands AS ({band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b, {jac} AS jaccard
  FROM cand
  JOIN doc_shingles sa ON sa.doc_id = id_a
  JOIN doc_shingles sb ON sb.doc_id = id_b
  WHERE {jac} >= {MINHASH_JACCARD_T}
)
"""


def _minhash_lsh_oracle() -> str:
    return _minhash_pairs_ctes() + "SELECT id_a, id_b, jaccard FROM pairs"


@register(
    "dedup_minhash_lsh",
    # r3 rotation: the LSH pair chain is driver-evidenced inside
    # dedup_survivorship (pairs -> CC -> canonical selection); the
    # pair-level view stays parity- and plan-checked locally
    driver=False,
    oracle=_minhash_lsh_oracle(),
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidate pairs verified by exact Jaccard."""
    return dedup_minhash_lsh(
        read_table(spark, sf_dir, "documents"), jaccard_threshold=MINHASH_JACCARD_T
    )


@register(
    "dedup_incremental_minhash",
    oracle=_minhash_pairs_ctes()
    + "SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM pairs)",
)
def dedup_incremental_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-ingest near-dup dedup: the corpus arrives in TWO increments
    (doc_id < 200, then the rest), each filtered against the persisted
    signature store via functions.dedup.dedup_incremental. The store is
    round-tripped through parquet between increments — real durable-index
    behavior (band rows land under ``bands/band_bucket=<k>/`` so the
    second increment's probe join PRUNES history partitions), and a
    lineage cut so step 2's plan doesn't replay step 1. The oracle is the
    single-shot whole-corpus dedup: keeping every seen doc in the store
    makes incremental == batch exactly."""
    from .scratch import scratch_dir

    from .functions.dedup import dedup_incremental, read_sig_store, write_sig_store

    docs = read_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") < 200)
    second = docs.filter(F.col("doc_id") >= 200)

    s1, delta1 = dedup_incremental(None, first, jaccard_threshold=MINHASH_JACCARD_T)
    store_dir = scratch_dir(prefix="sig_store_")
    write_sig_store(delta1, store_dir + "/delta_000000")
    store = read_sig_store(spark, [store_dir + "/delta_000000"])
    s2, _ = dedup_incremental(store, second, jaccard_threshold=MINHASH_JACCARD_T)
    return s1.unionByName(s2)


@register(
    "dedup_ingest_after_purge",
    # drop rule with erasure between the epochs: pairs whose EARLIER doc
    # was purged from the store (id_a in the epoch-1 purge set) no
    # longer suppress epoch-2 docs; epoch-1-internal decisions were made
    # before the purge and stand
    oracle=_minhash_pairs_ctes()
    + """
SELECT doc_id FROM documents WHERE doc_id NOT IN (
  SELECT id_b FROM pairs
  WHERE NOT (id_b >= 200 AND id_a < 200 AND id_a % 5 = 2)
)""",
)
def dedup_ingest_after_purge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure propagation into the dedup signature store — the third
    derived store the purge path must reach (rows: ``user_purge_audit``;
    vectors: ``ann_index_delete``; signatures: here). Epoch 1 ingests
    ``doc_id < 200`` and publishes its delta; every seen epoch-1 doc
    with ``doc_id % 5 == 2`` is then purged as an O(batch) tombstone
    delta (``write_sig_tombstones`` — band/fps files untouched); epoch 2
    ingests the rest against the tombstone-filtered store. Semantics the
    oracle pins: a purged doc can never again suppress a newcomer (its
    epoch-2 near-dups SURVIVE — the removed copy no longer exists, so
    the newcomer is the first occurrence), while epoch-1-internal
    decisions made before the purge stand.

    Scale shape: identical to dedup_incremental_minhash plus one
    broadcast anti-join (purge-sized) inside the store read — the
    band-bucket pruning of the history probe is unchanged."""
    from .scratch import scratch_dir

    from .functions.dedup import (
        dedup_incremental,
        read_sig_store,
        write_sig_store,
        write_sig_tombstones,
    )

    docs = read_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") < 200)
    second = docs.filter(F.col("doc_id") >= 200)

    s1, delta1 = dedup_incremental(None, first, jaccard_threshold=MINHASH_JACCARD_T)
    store_dir = scratch_dir(prefix="sig_store_purge_")
    write_sig_store(delta1, store_dir + "/delta_000000")
    write_sig_tombstones(
        first.filter(F.col("doc_id") % 5 == 2).select("doc_id"),
        store_dir + "/purge_000001",
    )
    store = read_sig_store(
        spark,
        [store_dir + "/delta_000000"],
        tombstone_paths=[store_dir + "/purge_000001"],
    )
    s2, _ = dedup_incremental(store, second, jaccard_threshold=MINHASH_JACCARD_T)
    return s1.unionByName(s2)


@register(
    "dedup_ingest_after_purge_compacted",
    # SAME oracle as dedup_ingest_after_purge: folding the tombstones
    # into a fresh physical delta must not change a single epoch-2
    # decision — the driver verifies the logical≡physical claim
    oracle=_minhash_pairs_ctes()
    + """
SELECT doc_id FROM documents WHERE doc_id NOT IN (
  SELECT id_b FROM pairs
  WHERE NOT (id_b >= 200 AND id_a < 200 AND id_a % 5 = 2)
)""",
)
def dedup_ingest_after_purge_compacted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The physical half of signature-store erasure, driver-verified:
    same epochs and purge as ``dedup_ingest_after_purge``, but
    ``compact_sig_store`` folds delta + tombstones into ONE fresh delta
    before epoch 2 — no purged doc_id remains in any band/fps file on
    disk (pinned byte-level in tests/test_functions.py) and epoch 2
    probes the one-element lineage with NO anti-join left in the read
    path. The oracle is identical to the tombstoned variant: the fold
    must not move a single survivor."""
    from .scratch import scratch_dir

    from .functions.dedup import (
        compact_sig_store,
        dedup_incremental,
        read_sig_store,
        write_sig_store,
        write_sig_tombstones,
    )

    docs = read_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") < 200)
    second = docs.filter(F.col("doc_id") >= 200)

    s1, delta1 = dedup_incremental(None, first, jaccard_threshold=MINHASH_JACCARD_T)
    store_dir = scratch_dir(prefix="sig_store_cmp_")
    write_sig_store(delta1, store_dir + "/delta_000000")
    write_sig_tombstones(
        first.filter(F.col("doc_id") % 5 == 2).select("doc_id"),
        store_dir + "/purge_000001",
    )
    lineage = compact_sig_store(
        spark,
        [store_dir + "/delta_000000"],
        store_dir + "/delta_000002",
        tombstone_paths=[store_dir + "/purge_000001"],
    )
    store = read_sig_store(spark, lineage)
    s2, _ = dedup_incremental(store, second, jaccard_threshold=MINHASH_JACCARD_T)
    return s1.unionByName(s2)


def _clusters_oracle() -> str:
    """Connected components via transitive closure: a recursive CTE
    accumulates every (vertex, reachable-vertex) pair over the near-dup
    edge set; min reachable id == the component's canonical label. Fine at
    oracle scale (components are tiny); the Spark side is the scalable
    log-rounds algorithm."""
    recursive = _minhash_pairs_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        recursive
        + """,
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(id, comp) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON r.id = e.v
),
assign AS (
  SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster_id
  FROM reach GROUP BY id
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM assign
"""
    )


@register(
    "dedup_clusters",
    # r3 rotation: the identical pairs->CC chain is driver-evidenced by
    # dedup_survivorship (which adds canonical selection on top); the
    # cluster-labeling view stays parity-checked locally
    driver=False,
    oracle=_clusters_oracle(),
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER canonicalization: LSH-verified pairs → connected
    components → per-doc (cluster_id, cluster_size). This is the form a
    corpus-dedup job actually publishes — keep one canonical doc per
    cluster, attribute the rest — and the component step is where naive
    designs die at 100 TB (transitive chains span buckets). The Spark
    path is functions.dedup.connected_components: min-label propagation
    + pointer jumping, O(log diameter) self-joins, lineage cut per round."""
    from .functions.dedup import connected_components

    pairs = dedup_minhash_lsh(
        read_table(spark, sf_dir, "documents"), jaccard_threshold=MINHASH_JACCARD_T
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").cast("bigint").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


def _simhash_ctes() -> str:
    """CTE chain ending in sh(doc_id, simhash, n_tokens) — shared by the
    per-doc simhash oracle and the banded-pairs oracle."""
    bit_sums = []
    for b in range(SIMHASH_BITS):
        pos = b // 4 + 1
        mask = 1 << (3 - (b % 4))
        nib = f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
        bit_sums.append(
            f"sum(CASE WHEN CAST(floor({nib} / {mask}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS bs_{b}"
        )
    simhash = " + ".join(
        f"CASE WHEN bs_{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH ex AS (
  SELECT doc_id, md5(unnest(list_distinct(string_split(text, ' ')))) AS h
  FROM documents
),
agg AS (
  SELECT doc_id, {", ".join(bit_sums)}, count(*) AS n_tokens
  FROM ex GROUP BY doc_id
),
sh AS (
  SELECT doc_id, CAST({simhash} AS BIGINT) AS simhash, n_tokens FROM agg
)
"""


def _simhash_oracle() -> str:
    return _simhash_ctes() + "SELECT doc_id, simhash, n_tokens FROM sh"


@register("dedup_simhash", driver=False, oracle=_simhash_oracle())
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over distinct tokens."""
    return dedup_simhash(read_table(spark, sf_dir, "documents"))


SIMHASH_HAM_T = 1


@register(
    "simhash_band_pairs",
    driver=False,
    oracle=_simhash_ctes()
    + f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAM_T}
""",
)
def simhash_band_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance via BIT-BAND LSH — the
    bit-vector complement of the minhash band join. The 16-bit simhash
    splits into two 8-bit half-bands; by pigeonhole, any pair within
    Hamming distance 1 is identical in at least one half, so the band
    equi-join is recall-COMPLETE for the threshold (the oracle is the
    brute-force all-pairs join, which the banded plan must reproduce
    exactly). Candidates then verify `bit_count(a XOR b) <= t` — one
    JVM instruction per pair.

    Scale shape: the all-pairs product never materializes — only docs
    sharing a half-band bucket meet. Candidate generation goes through
    `_bounded_bucket_pairs`, whose star-canonicalization cap bounds any
    mega-bucket; the cap is OFF here (`max_bucket_size=None`) because a
    16-bit fixture-scale simhash is deliberately coarse (dense buckets),
    and capping would trade the exact-pairs semantics the oracle checks.
    At production widths (64-bit simhash, 4x16-bit bands) buckets are
    sparse and the same cap=64 used by the minhash path applies.
    Simhash itself is zero-shuffle narrow arithmetic."""
    from .functions.dedup import _bounded_bucket_pairs

    sh = dedup_simhash(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "simhash"
    )
    bands = sh.select(
        "doc_id",
        "simhash",
        F.shiftright(F.col("simhash"), 8).alias("half_hi"),
        (F.col("simhash") % 256).alias("half_lo"),
    ).selectExpr("doc_id", "simhash", "stack(2, 0, half_hi, 1, half_lo) as (band_idx, band)")
    cand = _bounded_bucket_pairs(
        bands.select("doc_id", "band_idx", "band"),
        ["band_idx", "band"],
        "doc_id",
        max_bucket_size=None,
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("bigint")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_HAM_T)
    )


@register(
    "ngram_jaccard_pairs",
    driver=False,
    oracle=f"""
WITH {_SHINGLES_CTE},
docs AS (
  SELECT d.doc_id, d.lang, d.source, s.shingles
  FROM documents d JOIN doc_shingles s ON d.doc_id = s.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang, a.source,
       floor((len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             len(list_distinct(a.shingles || b.shingles))) * 1000000) / 1000000 AS jaccard
FROM docs a JOIN docs b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE floor((len(list_intersect(a.shingles, b.shingles)) * 1.0 /
            len(list_distinct(a.shingles || b.shingles))) * 1000000) / 1000000 >= {NGRAM_JACCARD_T}
""",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs within (lang, source) blocks."""
    return ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), jaccard_threshold=NGRAM_JACCARD_T
    )


NGRAM_OVERLAP_T = 0.5


@register(
    "ngram_containment_pairs",
    driver=False,  # round-5 rotation candidate; parity-checked locally
    oracle=f"""
WITH {_SHINGLES_CTE},
docs AS (
  SELECT d.doc_id, d.lang, d.source, s.shingles
  FROM documents d JOIN doc_shingles s ON d.doc_id = s.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang, a.source,
       floor((len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             least(len(list_distinct(a.shingles)), len(list_distinct(b.shingles)))) * 1000000) / 1000000 AS overlap
FROM docs a JOIN docs b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE floor((len(list_intersect(a.shingles, b.shingles)) * 1.0 /
            least(len(list_distinct(a.shingles)), len(list_distinct(b.shingles)))) * 1000000) / 1000000 >= {NGRAM_OVERLAP_T}
""",
)
def ngram_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-coefficient (containment) pairs within (lang, source)
    blocks — catches a short doc embedded in a long one (syndicated
    excerpt, template wrapper), which Jaccard structurally misses
    because the union is dominated by the longer doc. Same
    (block, shingle)-keyed shared-shingle plan as ngram_jaccard_pairs
    (functions/dedup.py:_shared_shingle_counts); only the closed-form
    measure differs."""
    from .functions.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        read_table(spark, sf_dir, "documents"), overlap_threshold=NGRAM_OVERLAP_T
    )


# ---------------------------- similarity search ----------------------------

_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE) * x[2]),"
    " (acc, v) -> acc + v)"
)


def _bucket_sql(emb: str) -> str:
    terms = [
        f"CASE WHEN {emb}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(SIGN_BUCKET_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


def _vec_cte() -> str:
    dot_self = _DOT.format(a="emb", b="emb")
    return f"""
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         {_bucket_sql("embedding")} AS bucket
  FROM embeddings
),
vn AS (SELECT vec_id, emb, bucket, sqrt({dot_self}) AS nrm FROM v)
"""


@register(
    "embedding_cosine_pairs",
    driver=False,
    oracle=f"""
WITH {_vec_cte()}
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
       floor(({_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm)) * 1000000) / 1000000 AS cos_sim
FROM vn a JOIN vn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE floor(({_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm)) * 1000000) / 1000000 >= {COSINE_T}
""",
)
def embedding_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within sign-LSH buckets."""
    return cosine_pairs_bucketed(
        read_table(spark, sf_dir, "embeddings"), threshold=COSINE_T
    )


@register(
    "ann_topk",
    # r3 rotation: exact ANN baseline stays parity-checked locally; the
    # scale path ann_topk_bucketed keeps the driver slot (freed for pagerank_topk)
    driver=False,
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM vn WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT q.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k for the first 16 vectors."""
    return ann_topk_bruteforce(
        read_table(spark, sf_dir, "embeddings"), n_queries=ANN_QUERIES, k=ANN_K
    )


@register(
    "ann_topk_bucketed",
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
      FROM vn WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT q.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.bucket = q.q_bucket AND vn.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_topk_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a REAL physical index: build_ivf_index lays the
    corpus out as parquet partitioned by sign bucket (the IVF "add"
    phase), then the probe joins the broadcast query set on the
    partition column and dynamic partition pruning restricts the scan
    to the probed buckets — the index-side FileScan carries a
    dynamicpruningexpression PartitionFilter (asserted in
    tests/test_plans.py). Results are identical to the logical
    bucket-restricted formulation (ann_topk_bucketed), which remains
    available for corpora not worth indexing."""
    from .scratch import scratch_dir

    from .functions.similarity import ann_topk_ivf, build_ivf_index, with_norm_and_bucket

    emb = read_table(spark, sf_dir, "embeddings")
    index_dir = scratch_dir(prefix="ivf_index_")
    build_ivf_index(emb, index_dir)
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < ANN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    return ann_topk_ivf(spark, index_dir, q, k=ANN_K)


_ABS_STRUCTS = ", ".join(
    f"{{'a': abs(emb[{i + 1}]), 'i': {i}}}" for i in range(SIGN_BUCKET_BITS)
)


@register(
    "ann_topk_multiprobe",
    driver=False,  # driver contract at its 50-entry cap; pytest-oracle-checked
    oracle=f"""
WITH {_vec_cte()},
qb AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket,
         list_sort([{_ABS_STRUCTS}])[1].i AS flip_i
  FROM vn WHERE vec_id < {ANN_QUERIES}
),
probes AS (
  SELECT query_id, q_emb, q_nrm,
         unnest([q_bucket, xor(q_bucket, CAST(pow(2, flip_i) AS INTEGER))]) AS q_probe
  FROM qb
),
scored AS (
  SELECT p.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="p.q_emb")} / (vn.nrm * p.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN probes p ON vn.bucket = p.q_probe AND vn.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_topk_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (n_probe=2): probe the query's own sign bucket
    plus the bucket flipping its least-confident sign bit — recall
    recovery for near neighbors straddling a quantizer boundary at the
    cost of one extra partition-pruned scan per query."""
    from .functions.similarity import ann_topk_multiprobe

    return ann_topk_multiprobe(
        read_table(spark, sf_dir, "embeddings"), n_queries=ANN_QUERIES, k=ANN_K, n_probe=2
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH {_vec_cte()},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM vn a JOIN vn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE floor(({_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm)) * 1000000) / 1000000 >= {COSINE_T}
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM pairs)
""",
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate DEDUP (not just pair listing): any
    vector with a lower-id near-duplicate partner (cosine >= t inside its
    sign-LSH bucket) is dropped; the lowest id of each near-dup cluster
    survives. Pairing cost is bounded by the bucket join — the same
    candidate generation as `embedding_cosine_pairs` — and the survivor
    set is one broadcast-able anti-join on the duplicate ids."""
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_bucketed(emb, threshold=COSINE_T)
    dups = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return emb.select("vec_id").join(dups, "vec_id", "left_anti")


# ----------------------- deterministic splits / sampling -----------------------


def _split_oracle() -> str:
    from .functions.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id", 1000, salt="split")
    return f"""
SELECT doc_id, CAST({b} AS BIGINT) AS bucket,
       CASE WHEN {b} < 900 THEN 'train'
            WHEN {b} < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@register("train_val_split", driver=False, oracle=_split_oracle())
def train_val_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment as a pure hash of doc_id — zero
    shuffles, reproducible across runs/partitionings/engines (the property
    `df.sample`/`rand()` do NOT have), salted so other hash uses of the
    same id stay independent. functions/sampling.py."""
    from .functions.sampling import split_assign

    docs = read_table(spark, sf_dir, "documents")
    return split_assign(docs, "doc_id").select("doc_id", "bucket", "split")


def _group_split_oracle() -> str:
    from .functions.sampling import hash_bucket_sql

    b = hash_bucket_sql("source", 1000, salt="gsplit")
    return f"""
SELECT doc_id, source, CAST({b} AS BIGINT) AS bucket,
       CASE WHEN {b} < 900 THEN 'train'
            WHEN {b} < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@register("group_split_no_leak", driver=False, oracle=_group_split_oracle())
def group_split_no_leak_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the GROUP
    (source), not the document, so every doc from one source lands in
    the same split — near-duplicates and templated siblings inside a
    source can never straddle the train/eval boundary (the leakage mode
    a doc_id-keyed split like train_val_split permits). Still a pure
    hash projection: zero shuffles, no group materialization,
    reproducible across runs/partitionings/engines."""
    from .functions.sampling import hash_bucket

    docs = read_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("source"), 1000, salt="gsplit").cast("bigint")
    return docs.select(
        "doc_id",
        "source",
        b.alias("bucket"),
        F.when(b < 900, F.lit("train"))
        .when(b < 950, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}


def _stratified_oracle() -> str:
    from .functions.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id", 1000, salt="sample")
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {int(round(f * 1000))}"
        for s, f in sorted(_SAMPLE_FRACTIONS.items())
    )
    return f"""
SELECT doc_id, lang, CAST({b} AS BIGINT) AS bucket
FROM documents
WHERE {b} < (CASE {cases} ELSE 0 END)
"""


@register("stratified_sample", driver=False, oracle=_stratified_oracle())
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (rebalance a skewed corpus): survival is
    hash(doc_id) < quota(lang), compiled to one CASE expression — a pure
    scan, no join/shuffle/driver lookup, deterministic at any scale.
    functions/sampling.py::stratified_sample."""
    from .functions.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", _SAMPLE_FRACTIONS).select(
        "doc_id", "lang", "bucket"
    )


# --------------------------- benchmark contamination ---------------------------


@register(
    "contamination_check",
    driver=False,
    oracle=f"""
WITH {{shingles}},
eval_sh AS (
  SELECT DISTINCT unnest(shingles) AS shingle
  FROM doc_shingles WHERE doc_id % 97 = 0
),
train AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle
  FROM doc_shingles WHERE doc_id % 97 <> 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       floor(count(*) * 1000000.0 / n_shingles) / 1000000 AS contam_rate
FROM train JOIN eval_sh USING (shingle)
GROUP BY doc_id, n_shingles
""".format(shingles=_SHINGLES_CTE),
)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which training docs share word
    shingles with the held-out eval set (doc_id % 97 == 0)? The eval
    side's distinct shingle set is SMALL by definition (benchmarks are
    kilobytes, corpora are terabytes), so it broadcasts; the train side
    streams through explode -> broadcast hash join -> per-doc count with
    map-side partial aggregation. No all-pairs doc comparison ever forms.
    """
    from pyspark import StorageLevel

    from .functions.dedup import with_shingles
    from .functions.numeric import round6

    docs = read_table(spark, sf_dir, "documents")
    # both the eval and train branches read the shingle frame — persist
    # it and POPULATE eagerly (r13): the eval branch is a broadcast-side
    # job scheduled concurrently with the train scan, and a lazy persist
    # let both miss the cache and run the CPU-bound shingling twice
    # (columnar persist, not a checkpoint — see dedup_minhash_lsh's note
    # on the row-format cost at scale)
    sh = with_shingles(docs, "text", "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    is_eval = F.col("doc_id") % 97 == 0
    eval_sh = (
        sh.filter(is_eval).select(F.explode("sh").alias("shingle")).distinct()
    )
    train = sh.filter(~is_eval).select(
        "doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("shingle")
    )
    hits = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.select(
        "doc_id",
        F.col("n_overlap").cast("bigint").alias("n_overlap"),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        round6(F.col("n_overlap") * F.lit(1.0) / F.col("n_shingles")).alias(
            "contam_rate"
        ),
    )


# ------------------------------- tf-idf terms -------------------------------

TFIDF_TOP_K = 3


@register(
    "tfidf_top_terms",
    driver=False,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         ln((1.0 + (SELECT count(*) FROM documents)) / (1.0 + count(DISTINCT doc_id))) AS idf
  FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         floor(tf.tf * idf.idf * 1000000) / 1000000 AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY floor(tf.tf * idf.idf * 1000000) / 1000000 DESC,
                                     tf.term) AS rnk
  FROM tf JOIN idf USING (term)
)
SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= {TFIDF_TOP_K}
""",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by tf-idf. Shape at scale:
    token explode -> (doc,term) count with map-side partial agg; document
    frequency is a second agg over THAT frame (never re-reads text); idf
    joins back on term (uniform key); the final per-doc top-k is one
    window over doc_id. The corpus size N is a scalar agg, broadcast by
    construction (literal in the plan would be wrong — it must come from
    the data), not a driver-side constant."""
    from pyspark.sql import Window

    from .functions.numeric import round6
    from .functions.text import _tokens as tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    idf = (
        tf.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))).alias("idf"),
        )
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", round6(F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "score", "rnk")
    )


# ----------------------------- corpus dataset card -----------------------------


@register(
    "corpus_report",
    driver=False,
    oracle=f"""
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       floor(avg(len({_SQL_TOKS})) * 1000000) / 1000000 AS avg_tokens,
       CAST(count(*) FILTER (WHERE len({_SQL_TOKS}) < 20) AS BIGINT) AS n_short
FROM documents
GROUP BY source, lang
""",
)
def corpus_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "dataset card" rollup a training run publishes per
    (source, lang) cell: doc counts, token totals, length extremes, short-doc
    counts. ONE hash aggregation over a narrow projection — tokenization is
    computed once per row in the projection, every aggregate is map-side
    combinable, output cardinality is #sources x #langs (tiny)."""
    from .functions.numeric import round6
    from .functions.text import _tokens as tokens

    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    proj = docs.select("source", "lang", "n_chars", n_tok.alias("n_tokens"))
    return proj.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        round6(F.avg("n_tokens")).alias("avg_tokens"),
        F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short"),
    )


# ------------------------- vocabulary / budget sample -------------------------

VOCAB_TOP_K = 20


@register(
    "vocab_topk_bigrams",
    driver=False,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
bigrams AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM bigrams GROUP BY bigram
ORDER BY cnt DESC, bigram LIMIT {VOCAB_TOP_K}
""",
)
def vocab_topk_bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{k} bigram vocabulary (the BPE-ish "learn merges"
    counting job). explode -> count with map-side partial agg; the global
    top-k compiles to TakeOrderedAndProject — each partition keeps only
    its local top-k and the driver merges k*partitions rows, so no global
    sort of the vocabulary ever happens (asserted in test_plans)."""
    docs = read_table(spark, sf_dir, "documents")
    from .functions.text import _tokens

    toks = docs.select(_tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                lambda x, i: F.concat(x, F.lit(" "), F.element_at(F.col("t"), i + 2)),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(VOCAB_TOP_K)
    )


SAMPLE_BUDGET = 100


@register(
    "budget_sample",
    driver=False,
    oracle=f"""
SELECT doc_id, md5('budget' || CAST(doc_id AS VARCHAR)) AS tiebreak
FROM documents
ORDER BY tiebreak, doc_id LIMIT {SAMPLE_BUDGET}
""",
)
def budget_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget uniform sample: the {n} docs with the smallest salted
    hash. Equivalent to a reservoir sample but stateless and reproducible —
    and in Spark it is TakeOrderedAndProject (per-partition top-n, driver
    merge of n*partitions), NOT a global sort; at 100 TB that's the
    difference between a scan and a full shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("budget"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", h.alias("tiebreak"))
        .orderBy("tiebreak", "doc_id")
        .limit(SAMPLE_BUDGET)
    )


# ----------------------------- k-means (one step) -----------------------------

KMEANS_K = 8


def _kmeans_ctes() -> str:
    dot = _DOT.format(a="x.emb", b="c.emb")
    return f"""
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
cent AS (
  SELECT vec_id AS centroid_id, emb FROM v WHERE vec_id < {KMEANS_K}
),
dists AS (
  SELECT x.vec_id, c.centroid_id,
         {_DOT.format(a="x.emb", b="x.emb")} - 2 * {dot}
           + {_DOT.format(a="c.emb", b="c.emb")} AS d2
  FROM v x CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, centroid_id, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
)
"""


def _vectors_and_seeds(spark: SparkSession, sf_dir: str):
    """(vectors, seed-centroids) pair shared by the k-means family."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = v.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cemb")
    )
    return v, cent


def _dot_cols(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _assign_nearest(v: DataFrame, cent: DataFrame) -> DataFrame:
    """argmin-d2 centroid assignment: broadcast the K centroids, score
    K distances per vector JVM-side, keep the argmin via one
    min(struct(d2, id)) aggregation — no window, no K x N shuffle."""
    dot = _dot_cols
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        (dot(F.col("emb"), F.col("emb")) - 2 * dot(F.col("emb"), F.col("cemb"))
         + dot(F.col("cemb"), F.col("cemb"))).alias("d2"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "centroid_id")).alias("m")
    )
    return best.select(
        "vec_id",
        F.col("m.centroid_id").alias("centroid_id"),
        F.col("m.d2").alias("d2"),
    )


@register(
    "kmeans_assign",
    driver=False,
    oracle=f"""
WITH {_kmeans_ctes()}
SELECT vec_id, centroid_id, floor(d2 * 1000000) / 1000000 AS d2
FROM assigned WHERE rn = 1
""",
)
def kmeans_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the inner step of k-means / IVF coarse
    quantization): K={k} seed centroids (vec_id < K — deterministic
    seeding) broadcast to every executor; each vector scores K distances
    JVM-side via zip_with/aggregate and keeps the argmin with one
    min(struct(d2, id)) aggregation — no window, no shuffle of the K x N
    cross product beyond the per-vector fold."""
    from .functions.numeric import round6

    v, cent = _vectors_and_seeds(spark, sf_dir)
    best = _assign_nearest(v, cent)
    return best.select(
        "vec_id", "centroid_id", round6(F.col("d2")).alias("d2")
    )


@register(
    "kmeans_step",
    driver=False,
    oracle=f"""
WITH {_kmeans_ctes()},
best AS (SELECT vec_id, centroid_id FROM assigned WHERE rn = 1)
SELECT b.centroid_id, CAST(i AS BIGINT) AS dim,
       floor(avg(v.emb[i]) * 1000000) / 1000000 AS c_val
FROM best b JOIN v USING (vec_id) CROSS JOIN generate_series(1, 64) t(i)
GROUP BY b.centroid_id, i
""",
)
def kmeans_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration: assign (broadcast argmin, as
    kmeans_assign) then recompute centroids as per-dimension means,
    emitted long-form (centroid, dim, value). posexplode turns the mean
    of 64-dim vectors into a map-side-combinable scalar aggregation on
    (centroid, dim) — the classic distributed k-means update, one shuffle
    of K x 64 partial sums per partition regardless of corpus size. The
    full algorithm loops this query driver-side (iterative, hence no
    single-SQL form for the loop itself)."""
    v, cent = _vectors_and_seeds(spark, sf_dir)
    best = _assign_nearest(v, cent).select("vec_id", "centroid_id")
    from .functions.numeric import round6

    dims = best.join(v, "vec_id").select(
        "centroid_id", F.posexplode("emb").alias("pos", "val")
    )
    return dims.groupBy("centroid_id", (F.col("pos") + 1).cast("bigint").alias("dim")).agg(
        round6(F.avg("val")).alias("c_val")
    )


# ----------------------- semantic dedup (SemDeDup) -----------------------

SEMDEDUP_TAU = 0.3
# K ∝ N (the paper's scaling rule: more clusters as the corpus grows, so
# per-cluster pair cost c^2 stays bounded). The paper uses K ≈ N/5000 on
# 100M+ point corpora; the fixture divisor is scaled so proportionality
# is actually EXERCISED at fixture sizes — K = 8 at sf0.001/sf0.01
# (500 vectors) and K = 16 at sf0.1 (2000 vectors), both sides computing
# K from the data so the oracle stays in lockstep at any SF.
SEMDEDUP_K_MIN = 8
SEMDEDUP_K_DIV = 125


def _semdedup_ctes() -> str:
    """k-means assignment CTEs with the SemDeDup K ∝ N rule: K is a
    scalar subquery over the corpus itself, not a literal."""
    dot = _DOT.format(a="x.emb", b="c.emb")
    return f"""
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
kk AS (
  SELECT GREATEST({SEMDEDUP_K_MIN}, CAST(count(*) // {SEMDEDUP_K_DIV} AS BIGINT)) AS k
  FROM v
),
cent AS (
  SELECT vec_id AS centroid_id, emb FROM v WHERE vec_id < (SELECT k FROM kk)
),
dists AS (
  SELECT x.vec_id, c.centroid_id,
         {_DOT.format(a="x.emb", b="x.emb")} - 2 * {dot}
           + {_DOT.format(a="c.emb", b="c.emb")} AS d2
  FROM v x CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, centroid_id, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
)
"""


def _semdedup_oracle() -> str:
    cos = (
        f"{_DOT.format(a='va.emb', b='vb.emb')}"
        f" / (sqrt({_DOT.format(a='va.emb', b='va.emb')})"
        f" * sqrt({_DOT.format(a='vb.emb', b='vb.emb')}))"
    )
    return f"""
WITH {_semdedup_ctes()},
best AS (SELECT vec_id, centroid_id FROM assigned WHERE rn = 1),
sim AS (
  SELECT b.vec_id AS dup_id
  FROM best a JOIN best b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  WHERE {cos} >= {SEMDEDUP_TAU}
),
dups AS (SELECT DISTINCT dup_id AS vec_id FROM sim)
SELECT b.vec_id, b.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
FROM best b LEFT JOIN dups d USING (vec_id)
"""


@register("semdedup_prune", oracle=_semdedup_oracle())
def semdedup_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings (k-means assignment to K
    seed centroids) and then comparing pairs ONLY within a cluster —
    a vector is a semantic duplicate if some lower-id vector in its
    cluster has cosine similarity >= tau. Survivors (is_dup = false)
    keep one representative per near-duplicate neighborhood; the
    lowest-id representative rule makes the prune deterministic under
    any execution order.

    Scale shape: the clustering IS the blocking — the all-pairs product
    never forms; pairs only materialize inside a cluster after ONE
    shuffle of (vec_id, centroid_id, emb) keyed on centroid_id. Per-
    cluster pairwise cost is O(c^2), so K follows the paper's K ∝ N rule
    (SEMDEDUP_K_MIN/SEMDEDUP_K_DIV above; N/5000 at the paper's corpus
    sizes) — K = 8 at sf0.001 and K = 16 at sf0.1, with the oracle
    computing the same K from the same count. The corpus count feeding K
    is a single bounded scalar (at 100 TB it comes from table stats or
    one map-reduced scan, never a row transfer). The centroid scoring
    pass is the same broadcast argmin as kmeans_assign (no window, no
    N x K shuffle)."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    k = max(SEMDEDUP_K_MIN, v.count() // SEMDEDUP_K_DIV)
    cent = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cemb")
    )
    best = _assign_nearest(v, cent).select("vec_id", "centroid_id")
    dot = _dot_cols
    # norms computed ONCE per vector before the pairing (the oracle's
    # per-pair sqrt(dot(a,a)) reduces to the same doubles) — the O(c^2)
    # pair stage then does one dot product per pair, not three
    withemb = best.join(v, "vec_id").select(
        "vec_id",
        "centroid_id",
        "emb",
        F.sqrt(dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    )
    a = withemb.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = withemb.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    dups = (
        a.join(b, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos >= SEMDEDUP_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return best.join(dups, "vec_id", "left").select(
        "vec_id", "centroid_id", F.col("_dup").isNotNull().alias("is_dup")
    )


# --------------------------- quality-quantile filter ---------------------------

QUALITY_CUT = 0.2


def _quality_filter_oracle() -> str:
    # reuse the quality CTE chain, then threshold at the exact p20
    base = _quality_oracle().strip()
    return f"""
WITH q AS ({base}),
thr AS (SELECT quantile_cont(quality, {QUALITY_CUT}) AS thr FROM q)
SELECT doc_id, quality FROM q, thr WHERE quality >= thr
"""


@register("quality_filter", driver=False, oracle=_quality_filter_oracle())
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the bottom-{p}% quality documents. Two passes, NO global sort:
    pass 1 reduces the score column to one exact-percentile scalar (at
    100 TB: percentile_approx — mergeable t-digest sketch, same plan
    shape); pass 2 re-scans and filters against the broadcast scalar.
    The naive rank/ntile formulation would globally sort the corpus."""
    from .functions.text import quality_score

    docs = read_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    thr = q.agg(F.percentile(F.col("quality"), F.lit(QUALITY_CUT)).alias("thr"))
    return (
        q.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("thr"))
        .select("doc_id", "quality")
    )


# --------------------------- product quantization ---------------------------

PQ_SUBSPACES = 8
PQ_SUBDIM = 8  # 64 dims / 8 subspaces
PQ_CODEBOOK = 4  # centroids per subspace (vec_id < 4 seed the codebook)


def _pq_oracle() -> str:
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2])),"
        " (acc, v) -> acc + v)"
    )
    d2 = dot.format(a="x.subvec", b="c.subvec")
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
subs AS (
  SELECT vec_id, m AS sub, emb[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS subvec
  FROM v CROSS JOIN generate_series(0, {PQ_SUBSPACES - 1}) t(m)
),
codebook AS (
  SELECT vec_id AS cid, sub, subvec FROM subs WHERE vec_id < {PQ_CODEBOOK}
),
scored AS (
  SELECT x.vec_id, x.sub, c.cid, {d2} AS d2,
         row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY {d2}, c.cid) AS rn
  FROM subs x JOIN codebook c USING (sub)
)
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(cid AS BIGINT) AS code,
       floor(d2 * 1000000) / 1000000 AS d2
FROM scored WHERE rn = 1
"""


def _pq_subs(v: DataFrame) -> DataFrame:
    """Explode (vec_id, emb) into one row per (vec_id, sub, subvec)."""
    return v.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("emb"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_SUBSPACES)
                ]
            )
        ).alias("sub", "subvec"),
    )


def _sq_dist(a, b):
    """Sequential-fold squared L2 — summation order matches DuckDB's
    list_reduce, so the doubles are bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_assign(subs: DataFrame) -> DataFrame:
    """Nearest-codebook-entry per (vec_id, sub): broadcast the codebook
    (PQ_SUBSPACES x PQ_CODEBOOK rows), argmin via one min(struct) agg."""
    codebook = subs.filter(F.col("vec_id") < PQ_CODEBOOK).select(
        F.col("vec_id").alias("cid"), "sub", F.col("subvec").alias("cvec")
    )
    scored = subs.join(F.broadcast(codebook), "sub").select(
        "vec_id", "sub", "cid", _sq_dist(F.col("subvec"), F.col("cvec")).alias("d2")
    )
    return scored.groupBy("vec_id", "sub").agg(F.min(F.struct("d2", "cid")).alias("m"))


@register("pq_codes", driver=False, oracle=_pq_oracle())
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each 64-dim vector splits into
    {M} 8-dim subvectors, each assigned its nearest codebook entry
    (codebook seeded deterministically from vec_id < {C}). This is the
    compression step that makes billion-vector ANN fit in memory
    (64 floats -> {M} small codes). Shape: subvector explode is narrow;
    the codebook (M x C rows) broadcasts; argmin is one min(struct)
    partial agg keyed (vec_id, sub) — no shuffle of the vector corpus."""
    from .functions.numeric import round6

    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    best = _pq_assign(_pq_subs(v))
    return best.select(
        "vec_id",
        F.col("sub").cast("bigint").alias("sub"),
        F.col("m.cid").cast("bigint").alias("code"),
        round6(F.col("m.d2")).alias("d2"),
    )


def _pq_adc_oracle() -> str:
    d2 = (
        "list_reduce(list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2])),"
        " (acc, v) -> acc + v)"
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
subs AS (
  SELECT vec_id, m AS sub, emb[m * {PQ_SUBDIM} + 1 : m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS subvec
  FROM v CROSS JOIN generate_series(0, {PQ_SUBSPACES - 1}) t(m)
),
codebook AS (
  SELECT vec_id AS cid, sub, subvec FROM subs WHERE vec_id < {PQ_CODEBOOK}
),
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT x.vec_id, x.sub, c.cid,
           row_number() OVER (PARTITION BY x.vec_id, x.sub
                              ORDER BY {d2.format(a="x.subvec", b="c.subvec")}, c.cid) AS rn
    FROM subs x JOIN codebook c USING (sub)
  ) WHERE rn = 1
),
dtable AS (
  SELECT q.vec_id AS query_id, c.sub, c.cid,
         CAST(floor({d2.format(a="q.subvec", b="c.subvec")} * 1000000) AS BIGINT) AS d2_micro
  FROM subs q JOIN codebook c USING (sub)
  WHERE q.vec_id < {ANN_QUERIES}
),
adc AS (
  SELECT d.query_id, x.vec_id AS neighbor_id,
         CAST(sum(d.d2_micro) AS BIGINT) AS adc_d2_micro
  FROM codes x JOIN dtable d ON d.sub = x.sub AND d.cid = x.code
  WHERE x.vec_id <> d.query_id
  GROUP BY d.query_id, x.vec_id
)
SELECT query_id, neighbor_id, adc_d2_micro, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY adc_d2_micro, neighbor_id) AS INT) AS rank
  FROM adc
) WHERE rank <= {ANN_K}
"""


@register("ann_topk_pq", driver=False, oracle=_pq_adc_oracle())
def ann_topk_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k — how billion-vector ANN
    actually runs: vectors live ONLY as 8 small codes; each query
    precomputes a distance table to every codebook entry (Q x M x C rows —
    broadcast), and scoring a database vector is 8 integer table lookups
    + a sum, never touching the original floats. Distances are in
    integer micro-units so the per-sub sum is exact and order-independent
    (float summation order would differ between engines and executors).
    Production then re-ranks the top candidates exactly; recall vs the
    exact top-k is asserted in tests/test_functions.py."""
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    subs = _pq_subs(v)
    codes = _pq_assign(subs).select("vec_id", "sub", F.col("m.cid").alias("code"))
    codebook = subs.filter(F.col("vec_id") < PQ_CODEBOOK).select(
        F.col("vec_id").alias("cid"), "sub", F.col("subvec").alias("cvec")
    )
    dtable = (
        subs.filter(F.col("vec_id") < ANN_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "sub")
        .select(
            "query_id",
            "sub",
            "cid",
            F.floor(_sq_dist(F.col("subvec"), F.col("cvec")) * 1000000)
            .cast("bigint")
            .alias("d2_micro"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(dtable),
            (codes["sub"] == dtable["sub"]) & (codes["code"] == dtable["cid"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_micro").cast("bigint").alias("adc_d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2_micro", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ANN_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_d2_micro",
            "rank",
        )
    )


@register(
    "streaming_dedup_ingest",
    oracle=_minhash_pairs_ctes()
    + "SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM pairs)",
)
def streaming_dedup_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rolling-ingest dedup as a REAL Structured Streaming pipeline:
    documents arrive as files (readStream, maxFilesPerTrigger=1, mtimes
    forced so arrival order == id order), and every micro-batch runs one
    `dedup_incremental` step inside foreachBatch — candidate work ∝ the
    batch, survivors appended to the output table, and the signature
    store growing by an append-only DELTA directory per epoch (LSM-style:
    the epoch writes O(batch) files, never a full-store republish; a
    crashed epoch's delta overwrite is idempotent, and earlier deltas are
    never touched). Delta band rows are partitioned by ``band_bucket``,
    so each epoch's probe join file-prunes ALL prior deltas down to the
    buckets the batch actually hashes into. End state must equal the
    single-shot whole-corpus dedup — the same oracle as
    `dedup_incremental_minhash`, now proven through the streaming path."""
    import glob
    import os
    from .scratch import scratch_dir

    from .functions.dedup import dedup_incremental, read_sig_store, write_sig_store

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = scratch_dir(prefix="stream_dedup_")
    src = os.path.join(base, "src")
    # all three ingest chunks staged in ONE write job (r13, guide §1.2):
    # tag by id range, hash-repartition on the tag (one file per chunk),
    # partitionBy drops the tag from file contents — identical files to
    # the old three filter+coalesce(1) writes, two fewer document scans
    pdir = os.path.join(base, "stage")
    (
        docs.withColumn(
            "_e",
            F.when(F.col("doc_id") < 150, 0)
            .when(F.col("doc_id") < 300, 1)
            .otherwise(2),
        )
        .repartition(3, "_e")
        .write.partitionBy("_e")
        .parquet(pdir)
    )
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        files = glob.glob(os.path.join(pdir, f"_e={i}", "*.parquet"))
        dst = os.path.join(src, f"ingest_{i}.parquet")
        if files:
            (pq,) = files
            os.rename(pq, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # arrival order = id order

    surv_dir = os.path.join(base, "survivors")

    def _step(batch_df, epoch_id):
        s = batch_df.sparkSession
        store = read_sig_store(s, glob.glob(os.path.join(base, "delta_e*")))
        surv, delta = dedup_incremental(
            store, batch_df, jaccard_threshold=MINHASH_JACCARD_T
        )
        write_sig_store(delta, os.path.join(base, f"delta_e{epoch_id:06d}"))
        surv.write.mode("append").parquet(surv_dir)

    # per-epoch joins touch a few hundred keys; 8 shuffle partitions
    # beats paying 32 tasks per stage per epoch (restored after)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_step)
            .option("checkpointLocation", os.path.join(base, "_chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.parquet(surv_dir)


@register(
    "dedup_exact_normalized",
    driver=False,
    oracle="""
WITH norm AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
  FROM documents
)
SELECT content_hash, CAST(count(*) AS BIGINT) AS n_copies,
       min(doc_id) AS canonical_id, max(doc_id) AS max_id
FROM norm GROUP BY content_hash
""",
)
def dedup_exact_normalized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER canonical text normalization (lowercase, collapse
    whitespace, trim) — catches the re-hosted/re-wrapped copies raw-hash
    dedup misses. Normalization is a pure per-row expression chain, so the
    cost over plain dedup_exact is zero extra shuffles; the md5 key stays
    uniform (no skew). DuckDB's regexp_replace needs the 'g' flag to match
    Spark's replace-all default — a documented parity trap."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


SKEW_TOP_N = 10


@register(
    "key_skew_report",
    driver=False,
    oracle=f"""
WITH counts AS (
  SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM counts)
SELECT key, CAST(n AS BIGINT) AS n,
       floor(n * 1000000.0 / total) / 1000000 AS share,
       CAST(n_keys AS BIGINT) AS n_keys
FROM counts, tot
ORDER BY n DESC, key LIMIT {SKEW_TOP_N}
""",
)
def key_skew_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight skew diagnostic for any join/agg key: top-N heaviest
    keys with their share of total rows (feeds the decision to salt — see
    plans/layout.salted_join). One partial-agg shuffle on the key, a
    broadcast scalar for the total, TakeOrderedAndProject for the top-N;
    output is N rows no matter the corpus size."""
    orders = read_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n"),
            (F.floor(F.col("n") * 1000000.0 / F.col("total")) / 1000000.0).alias(
                "share"
            ),
            "n_keys",
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(SKEW_TOP_N)
    )


# --------------------------- repetition / PII signals ---------------------------


@register(
    "repetition_ratio",
    driver=False,
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bigrams
  FROM t
)
SELECT doc_id,
       CAST(len(bigrams) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(bigrams) > 0
            THEN floor((1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)) * 1000000) / 1000000
            ELSE 0.0 END AS rep_ratio
FROM g
""",
)
def repetition_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher-style boilerplate signal):
    1 - distinct/total bigrams. Generated text and templated spam repeat
    n-grams; this is the cheap per-row screen that runs before any
    pairwise dedup. Pure narrow expressions — array transforms JVM-side,
    zero shuffles at any corpus size."""
    from .functions.text import _tokens

    docs = read_table(spark, sf_dir, "documents")
    # materialize the token array ONCE per row before the bigram lambda:
    # referencing the raw _tokens(...) expression inside transform would
    # inline regexp_extract_all per element (O(tokens x text) regex work,
    # measured 6.8s -> ~1s at sf0.1)
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = toked.select("doc_id", bigrams.alias("bigrams"))
    n = F.size("bigrams").cast("bigint")
    nd = F.size(F.array_distinct("bigrams")).cast("bigint")
    return out.select(
        "doc_id",
        n.alias("n_bigrams"),
        nd.alias("n_distinct"),
        F.when(
            n > 0, F.floor((1.0 - nd * F.lit(1.0) / n) * 1000000) / 1000000
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"


@register(
    "pii_scan",
    driver=False,
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_hash
FROM documents
""",
)
def pii_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pre-screening: count email/phone patterns per doc and hash the
    redacted text (the hash proves the redaction transform is
    deterministic without shipping the text through the comparison).
    Regex extraction/replacement is JVM-side codegen — the whole scan is
    one narrow pass; at 100 TB this is purely scan-bound. DuckDB needs
    the 'g' flag to mirror Spark's replace-all default."""
    docs = read_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


PIPELINE_QUALITY_MIN = 0.5


def _pipeline_e2e_oracle() -> str:
    from .functions.sampling import hash_bucket_sql

    b = hash_bucket_sql("q.doc_id", 1000, salt="split")
    return f"""
WITH qchain AS ({_quality_oracle().strip()}),
canon AS (
  SELECT min(doc_id) AS doc_id FROM (
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
    FROM documents
  ) GROUP BY h
)
SELECT q.doc_id, q.quality, CAST({b} AS BIGINT) AS bucket,
       CASE WHEN {b} < 900 THEN 'train'
            WHEN {b} < 950 THEN 'val'
            ELSE 'test' END AS split
FROM qchain q JOIN canon USING (doc_id)
WHERE q.quality >= {PIPELINE_QUALITY_MIN}
"""


@register(
    "pipeline_e2e",
    # r3 rotation: composition evidence stays with rag_retrieval_e2e and
    # wal_batch_pipeline; every screen composed here has its own driver
    # entry. Parity-checked locally.
    driver=False,
    oracle=_pipeline_e2e_oracle(),
)
def pipeline_e2e_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators COMPOSED as one pipeline — normalize-dedup (keep the
    min-id copy), quality gate, deterministic train/val/test assignment —
    exactly the preprocessing chain a training corpus runs, and the plan
    stays a single DAG Catalyst optimizes end-to-end (the dedup agg is the
    only shuffle; quality scoring and splitting fuse into the surrounding
    projections). Every stage is the same operator the standalone queries
    verify; this entry proves they compose without semantic drift."""
    from .functions.sampling import split_assign
    from .functions.text import quality_score

    docs = read_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    canon = (
        docs.select("doc_id", F.md5(norm).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    q = quality_score(docs).select("doc_id", "quality")
    surv = q.join(canon, "doc_id").filter(F.col("quality") >= PIPELINE_QUALITY_MIN)
    return split_assign(surv, "doc_id").select("doc_id", "quality", "bucket", "split")


# --------------------------- feature hashing ---------------------------

FEATURE_HASH_DIM = 64


def _feature_hashing_oracle() -> str:
    from .functions.sampling import hash_bucket_sql

    idx = hash_bucket_sql("tok", FEATURE_HASH_DIM, salt="feat")
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
)
SELECT doc_id,
       CAST({idx} AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS feature_count
FROM ex GROUP BY 1, 2
"""


@register("feature_hashing", driver=False, oracle=_feature_hashing_oracle())
def feature_hashing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Vowpal-Wabbit / sklearn
    HashingVectorizer shape): token -> md5 bucket in a fixed D=64 space,
    long-form (doc, feature_idx, count) sparse vectors. No vocabulary
    pass, no dictionary broadcast, no driver state — the property that
    lets featurization run in ONE narrow pass over 100 TB while a
    vocab-fit pipeline needs a global term index first. The only shuffle
    is the (doc, idx) count agg, map-side combinable by construction.
    Bucket function is the shared deterministic md5 helper
    (functions/sampling.hash_bucket), mirrored nibble-for-nibble in the
    DuckDB oracle."""
    from .functions.sampling import hash_bucket
    from .functions.text import _tokens

    docs = read_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    return ex.groupBy(
        "doc_id",
        hash_bucket(F.col("tok"), FEATURE_HASH_DIM, salt="feat")
        .cast("bigint")
        .alias("feature_idx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("feature_count"))


# --------------------- Unicode-canonical exact dedup ---------------------


@register(
    "dedup_unicode_normalized",
    driver=False,
    oracle="""
WITH canon AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))) AS h
  FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id, h FROM canon GROUP BY h)
SELECT c.doc_id, c.h AS canon_hash,
       c.doc_id IN (SELECT doc_id FROM keep) AS is_canonical
FROM canon c
""",
)
def dedup_unicode_normalized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup under UNICODE canonicalization (NFC + lowercase + ws
    collapse): 'Café' composed and decomposed, or differing whitespace
    runs, hash identically. The normalization is the package's one other
    justified pandas-UDF hop (no NFC expression exists JVM-side — see
    functions/text.normalize_unicode); the dedup itself is the standard
    min-id-per-hash groupBy, one shuffle on the 16-byte digest. DuckDB's
    independent nfc_normalize pins the canonicalization."""
    from .functions.text import normalize_unicode

    docs = read_table(spark, sf_dir, "documents")
    canon = docs.select(
        "doc_id", F.md5(normalize_unicode(F.col("text"))).alias("canon_hash")
    )
    from pyspark.sql import Window

    w_min = F.min("doc_id").over(Window.partitionBy("canon_hash"))
    return canon.select(
        "doc_id", "canon_hash", (F.col("doc_id") == w_min).alias("is_canonical")
    )


# ----------------------- embedding normalization -----------------------

MATRYOSHKA_DIM = 4


@register(
    "embedding_normalize",
    driver=False,
    oracle=f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
n AS (
  SELECT vec_id, emb,
         sqrt(list_sum(list_transform(emb, x -> x * x))) AS l2
  FROM e
),
u AS (
  SELECT vec_id, l2,
         list_transform(emb, x -> x / l2) AS unit,
         list_transform(emb[1:{MATRYOSHKA_DIM}], x -> CAST(x AS DOUBLE)) AS head
  FROM n WHERE l2 > 0
)
SELECT vec_id,
       floor(l2 * 1000000) / 1000000 AS l2_norm,
       floor(list_sum(list_transform(unit, x -> x * x)) * 1000) / 1000 AS unit_sq,
       floor(sqrt(list_sum(list_transform(head, x -> x * x))) / l2 * 1000000) / 1000000
         AS head_mass
FROM u
""",
)
def embedding_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-normalization + matryoshka head-mass audit: unit
    vectors are what cosine retrieval actually indexes, and head_mass
    (the norm fraction in the first MATRYOSHKA_DIM=4 dims) is the signal
    for matryoshka-style dimension truncation — how much of the vector
    survives the cheap prefix. All array lambdas are JVM higher-order
    functions riding the scan (zero shuffles, zero UDFs) at any corpus
    size. unit_sq must floor to 1.0 exactly — the normalization check
    rides along for free."""
    from .functions.numeric import round6
    from .functions.similarity import norm as l2_norm

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    n = emb.select("vec_id", "emb", l2_norm(F.col("emb")).alias("l2")).filter(
        F.col("l2") > 0
    )
    unit = F.transform(F.col("emb"), lambda x: x / F.col("l2"))
    head = F.slice(F.col("emb"), 1, MATRYOSHKA_DIM)
    unit_sq = F.aggregate(
        F.transform(unit, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    head_l2 = F.sqrt(
        F.aggregate(F.transform(head, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return n.select(
        "vec_id",
        round6(F.col("l2")).alias("l2_norm"),
        (F.floor(unit_sq * 1000) / 1000).alias("unit_sq"),
        round6(head_l2 / F.col("l2")).alias("head_mass"),
    )


# --------------------------- value histogram ---------------------------

_HIST_WIDTH = 50.0  # fixed-width buckets over `value`


@register(
    "value_histogram",
    # local-only since r3: slot freed for the IVM/diff pair; the histogram
    # plan stays asserted in tests/test_plans.py
    driver=False,
    oracle=f"""
SELECT event_type,
       CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       floor(min(value) * 1000000) / 1000000 AS lo,
       floor(max(value) * 1000000) / 1000000 AS hi
FROM events
GROUP BY 1, 2
""",
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group: ONE hash aggregation keyed by
    (group, floor(value/width)) — the dashboard/profiling primitive. At
    100 TB the combine is map-side (bucket count is bounded by the value
    range, not the row count) and no sort or window appears; contrast
    with ntile/percentile histograms which need a global ordering.
    Min/max per bucket ride along so the renderer gets exact bucket
    support without a second scan."""
    from .functions.numeric import round6

    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(_HIST_WIDTH)).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round6(F.min("value")).alias("lo"),
        round6(F.max("value")).alias("hi"),
    )


# ----------------------- cluster survivorship -----------------------


def _survivorship_oracle() -> str:
    recursive = _minhash_pairs_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        recursive
        + """,
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(id, comp) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, r.comp FROM edges e JOIN reach r ON r.id = e.v
),
assign AS (
  SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster_id
  FROM reach GROUP BY id
),
ranked AS (
  SELECT d.doc_id, d.source, d.n_chars, a.cluster_id,
         CASE WHEN a.cluster_id IS NULL THEN 1
              ELSE row_number() OVER (
                PARTITION BY a.cluster_id ORDER BY d.n_chars DESC, d.doc_id)
         END AS rk
  FROM documents d LEFT JOIN assign a ON d.doc_id = a.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM ranked GROUP BY source
"""
    )


@register("dedup_survivorship", oracle=_survivorship_oracle())
def dedup_survivorship_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship — the END of the dedup pipeline: given near-dup
    clusters (LSH pairs -> connected components), keep ONE canonical
    document per cluster (longest text wins, doc_id tie-break — the
    deterministic 'best record' rule of entity-resolution survivorship)
    and every unclustered singleton; everything else drops. This is the
    operator that actually shrinks the corpus; dedup_clusters only
    labels it.

    Scale shape: the ranking window partitions by cluster_id — cluster
    populations, bounded by the LSH bucket cap, never a global sort; the
    cluster assignment joins the corpus once on doc_id (left join: the
    overwhelmingly-common singleton case never enters the window — the
    CASE keeps them rank-1 without shuffling into cluster partitions).
    Emission re-aggregates per source so the checked surface is compact
    while keep/drop decisions are made for every document."""
    from .functions.dedup import connected_components
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pairs = dedup_minhash_lsh(
        read_table(spark, sf_dir, "documents"), jaccard_threshold=MINHASH_JACCARD_T
    ).select("id_a", "id_b")
    cc = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").cast("bigint").alias("cluster_id")
    )
    joined = docs.join(cc, "doc_id", "left")
    # the window runs ONLY over clustered docs: a single plan-level
    # when(null, 1).otherwise(row_number) would still shuffle every
    # singleton into one NULL window partition — the classic null-key
    # straggler. Splitting the paths keeps the window input bounded by
    # cluster membership (small) and the singleton majority narrow.
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    clustered = joined.filter(F.col("cluster_id").isNotNull()).withColumn(
        "rk", F.row_number().over(w)
    )
    singles = joined.filter(F.col("cluster_id").isNull()).withColumn(
        "rk", F.lit(1)
    )
    ranked = clustered.unionByName(singles)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("rk") == 1, 0).otherwise(1))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum(F.when(F.col("rk") == 1, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


# ----------------------- LSH recall audit -----------------------

# Audit sample: doc_id % mod == 0, where mod = max(MOD_MIN, N DIV 100) —
# i.e. a ~2% RATE up to 5000 docs, then an ABSOLUTE cap of ~100 sampled
# docs. The cap is what keeps the audit linear: with a fixed rate the
# brute-force truth side is |sample| x |corpus| = O(N^2/50) — the sf1
# scale stress measured exactly that (x32.7 for x10 data, BENCH_SF1
# round 4) before the cap; with it the audit is <= ~100 x N. Both sides
# derive mod from the same corpus count, so the oracle stays in lockstep
# at any SF (and fixture results at sf<=0.1 are unchanged: mod stays 50).
RECALL_SAMPLE_MOD_MIN = 50
RECALL_SAMPLE_TARGET = 100  # absolute sample-size cap


def _lsh_recall_oracle() -> str:
    jac = (
        "floor((len(list_intersect(a.shingles, b.shingles)) * 1.0 /"
        " len(list_distinct(a.shingles || b.shingles))) * 1000000) / 1000000"
    )
    return (
        _minhash_pairs_ctes()
        + f""",
mm AS (
  SELECT GREATEST({RECALL_SAMPLE_MOD_MIN},
                  CAST(count(*) // {RECALL_SAMPLE_TARGET} AS BIGINT)) AS m
  FROM documents
),
truth AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi
  FROM doc_shingles a JOIN doc_shingles b
    ON a.doc_id < b.doc_id
   AND (a.doc_id % (SELECT m FROM mm) = 0 OR b.doc_id % (SELECT m FROM mm) = 0)
  WHERE {jac} >= {MINHASH_JACCARD_T}
),
found AS (
  SELECT t.lo FROM truth t JOIN pairs p ON p.id_a = t.lo AND p.id_b = t.hi
)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
       CAST(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1000000
            ELSE (SELECT count(*) FROM found) * 1000000 // (SELECT count(*) FROM truth)
            END AS BIGINT) AS recall_micro
"""
    )


@register(
    "lsh_recall_report",
    # local-only: audits two already-driver-checked paths (LSH pairs +
    # exact shingle Jaccard); the brute-force truth side makes its oracle
    # the most expensive in the suite — parity-checked here instead
    driver=False,
    oracle=_lsh_recall_oracle(),
)
def lsh_recall_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL AUDIT for the LSH dedup path — the measurement that turns
    (bands, rows) from folklore into an engineering decision: on a
    deterministic ~2% document sample, compute the TRUE near-dup pairs
    by brute force (every sampled doc against the whole corpus, exact
    shingle Jaccard) and report what fraction the banded LSH pipeline
    actually surfaced. LSH-found pairs are exact-verified against the
    same Jaccard, so found ⊆ true and the ratio IS recall.

    Scale shape — why auditing is tractable when all-pairs isn't: the
    truth side is |sample| x |corpus|, with the sampled shingle arrays
    BROADCAST so the corpus streams through a map-side nested probe
    (never a shuffle of the corpus, never corpus x corpus); the sample
    is an ABSOLUTE size (~RECALL_SAMPLE_TARGET docs via a corpus-scaled
    modulus), not a rate — a fixed rate made the audit quadratic, which
    the sf1 scale stress measured (x32.7) and this cap removed. The LSH
    side reuses dedup_minhash_lsh verbatim. Production runs this audit per corpus snapshot and alarms
    on recall drift when content shifts (e.g. shorter docs => fewer
    shingles => bands saturate)."""
    from .functions.dedup import dedup_minhash_lsh, with_shingles

    docs = read_table(spark, sf_dir, "documents")
    # absolute sample-size cap (see RECALL_SAMPLE_* above): the modulus
    # grows with the corpus so the broadcast truth side stays ~100 docs
    # and audit cost stays linear in N; the count is one bounded scalar
    mod = max(RECALL_SAMPLE_MOD_MIN, docs.count() // RECALL_SAMPLE_TARGET)
    sh = with_shingles(docs, "text", "doc_id")
    sample = sh.filter(F.col("doc_id") % mod == 0).select(
        F.col("doc_id").alias("s_id"), F.col("sh").alias("s_sh")
    )
    corpus = sh.select(F.col("doc_id").alias("c_id"), F.col("sh").alias("c_sh"))
    jac = F.floor(
        F.size(F.array_intersect("s_sh", "c_sh"))
        * F.lit(1_000_000.0)
        / F.size(F.array_union("s_sh", "c_sh"))
    ) / F.lit(1_000_000.0)
    truth = (
        corpus.join(F.broadcast(sample), F.col("s_id") != F.col("c_id"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select(
            F.least("s_id", "c_id").alias("lo"),
            F.greatest("s_id", "c_id").alias("hi"),
        )
        .distinct()
    )
    lsh = dedup_minhash_lsh(docs, jaccard_threshold=MINHASH_JACCARD_T).select(
        F.col("id_a").alias("lo"), F.col("id_b").alias("hi")
    )
    found = truth.join(lsh, ["lo", "hi"])
    n_true = truth.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    n_found = found.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    return (
        n_true.select(F.col("n").alias("n_true"), "_k")
        .join(n_found.select(F.col("n").alias("n_found"), "_k"), "_k")
        .drop("_k")
        .select(
            F.col("n_true").cast("bigint"),
            F.col("n_found").cast("bigint"),
            F.when(F.col("n_true") == 0, F.lit(1_000_000))
            .otherwise(F.expr("n_found * 1000000 DIV n_true"))
            .cast("bigint")
            .alias("recall_micro"),
        )
    )


@register(
    "ann_index_incremental",
    driver=False,  # round-5 rotation candidate (ROTATE_NEXT)
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
      FROM vn WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT q.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.bucket = q.q_bucket AND vn.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_index_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-grown IVF index: the corpus arrives in three
    epochs (vec_id % 3), the first builds the bucket-partitioned layout
    and the next two APPEND into their bucket partitions — per-epoch
    work ∝ epoch size, never a rebuild. The probe then runs against the
    grown index and must equal the batch answer — the oracle here is
    literally ann_topk_bucketed's, because an IVF index whose quantizer
    is a pure function of the vector cannot drift under incremental
    adds (the property that makes streaming index maintenance safe;
    equality with a batch-BUILT index is additionally pinned in
    tests/test_round4_ops.py). The streaming twin of the LSM MinHash
    signature store (functions/dedup.py) on the embedding side."""
    from .functions.similarity import (
        append_ivf_index,
        ann_topk_ivf,
        build_ivf_index,
        with_norm_and_bucket,
    )
    from .scratch import scratch_dir

    emb = read_table(spark, sf_dir, "embeddings")
    index_dir = scratch_dir(prefix="ivf_inc_")
    for epoch in range(3):
        part = emb.filter(F.col("vec_id") % 3 == epoch)
        if epoch == 0:
            build_ivf_index(part, index_dir)
        else:
            append_ivf_index(part, index_dir)
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < ANN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    return ann_topk_ivf(spark, index_dir, q, k=ANN_K)


@register(
    "ann_index_delete",
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
      FROM vn WHERE vec_id < {ANN_QUERIES}),
vd AS (SELECT * FROM vn
       WHERE NOT (vec_id % 7 = 3 AND vec_id >= {ANN_QUERIES})),
scored AS (
  SELECT q.query_id, vd.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vd.emb", b="q.q_emb")} / (vd.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vd JOIN q ON vd.bucket = q.q_bucket AND vd.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_index_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion propagation into the vector index (the erasure half of
    streaming index maintenance — user data removal must reach derived
    embedding stores, the embedding-side twin of ``user_purge_audit``):
    build the IVF index, DELETE every ``vec_id % 7 == 3`` (query panel
    excluded) as an O(batch) tombstone append — bucket files are never
    rewritten — then probe honoring tombstones. The top-k must equal
    the bucketed answer over the surviving corpus (the oracle's ``vd``),
    i.e. deleted vectors can never surface as neighbors, and the ranks
    re-close over the survivors. ``compact_ivf_index`` folds tombstones
    into the bucket files on an operator schedule; probe-before ==
    probe-after is pinned in tests/test_round4_ops.py.

    Scale shape: the delete is one id-only append; the probe adds one
    broadcast anti-join (tombstone set is delete-sized) to the same
    DPP-pruned bucket scan — nothing O(corpus) happens until OPTIMIZE."""
    from .functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        delete_from_ivf_index,
        with_norm_and_bucket,
    )
    from .scratch import scratch_dir

    emb = read_table(spark, sf_dir, "embeddings")
    index_dir = scratch_dir(prefix="ivf_del_")
    build_ivf_index(emb, index_dir)
    delete_from_ivf_index(
        emb.filter(
            (F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= ANN_QUERIES)
        ).select("vec_id"),
        index_dir,
    )
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < ANN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    return ann_topk_ivf(spark, index_dir, q, k=ANN_K, honor_tombstones=True)


@register(
    "ann_index_compact",
    # SAME oracle as ann_index_delete: compaction makes the erasure
    # physical without changing a single probe result — the driver
    # verifies that claim end-to-end
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
      FROM vn WHERE vec_id < {ANN_QUERIES}),
vd AS (SELECT * FROM vn
       WHERE NOT (vec_id % 7 = 3 AND vec_id >= {ANN_QUERIES})),
scored AS (
  SELECT q.query_id, vd.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vd.emb", b="q.q_emb")} / (vd.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vd JOIN q ON vd.bucket = q.q_bucket AND vd.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
)
def ann_index_compact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The physical half of vector erasure, driver-verified: after the
    same delete as ``ann_index_delete``, ``compact_ivf_index`` folds the
    tombstones into a FRESH version (one anti-join scan, one partitioned
    write, one A12 pointer swap — concurrent probes of v_n never tear)
    and the probe runs WITHOUT tombstone handling against v_{n+1}. The
    oracle is identical to ann_index_delete's: compaction must not move
    a single neighbor. The probe plan is back to the plain DPP bucket
    scan — no anti-join remains once erasure is physical."""
    from .functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        vacuum_ivf_index,
        with_norm_and_bucket,
    )
    from .scratch import scratch_dir

    emb = read_table(spark, sf_dir, "embeddings")
    index_dir = scratch_dir(prefix="ivf_cmp_")
    build_ivf_index(emb, index_dir)
    delete_from_ivf_index(
        emb.filter(
            (F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= ANN_QUERIES)
        ).select("vec_id"),
        index_dir,
    )
    compact_ivf_index(spark, index_dir)
    vacuum_ivf_index(index_dir)  # the purged bytes are gone from disk
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < ANN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    return ann_topk_ivf(spark, index_dir, q, k=ANN_K)


# ----------------------- PMI collocations (round 6) -----------------------

PMI_WINDOW = 2  # forward skip-gram window (center i -> contexts i+1, i+2)
PMI_MIN_SUPPORT = 20  # pair-count floor: kills the 1-occurrence noise tail
PMI_TOP_K = 30


@register(
    "cooccurrence_pmi",
    oracle=f"""
WITH toks AS (
  SELECT {{toks}} AS t FROM documents
),
uni AS (SELECT unnest(t) AS w FROM toks),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM uni),
prs AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> {{'a': t[i], 'b': t[i+1]}})) AS p
  FROM toks WHERE len(t) >= 2
  UNION ALL
  SELECT unnest(list_transform(generate_series(1, len(t) - 2),
                               i -> {{'a': t[i], 'b': t[i+2]}})) AS p
  FROM toks WHERE len(t) >= 3
),
pc AS (
  SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM prs GROUP BY 1, 2
)
SELECT pc.a || ' ' || pc.b AS pair, pc.n_ab AS n_ab,
       CAST((pc.n_ab * 1000000 * tot.n_tok) // (wa.n_w * wb.n_w) AS BIGINT)
         AS lift_micro
FROM pc
JOIN wc wa ON wa.w = pc.a
JOIN wc wb ON wb.w = pc.b
CROSS JOIN tot
WHERE pc.n_ab >= {PMI_MIN_SUPPORT}
ORDER BY lift_micro DESC, pair
LIMIT {PMI_TOP_K}
""".replace("{toks}", _SQL_TOKS),
)
def cooccurrence_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (word2vec-style skip-gram statistics): the
    top-{k} token pairs within a forward ±{w} window, ranked by
    pointwise mutual information. The ranking statistic is the exact
    integer micro-lift ``n_ab * 1e6 * N_tok DIV (n_a * n_b)`` — a
    monotone transform of PMI (they differ by the corpus-constant
    log(N_pair/N_tok)), so the top-k ORDER is the PMI order while every
    distributed value stays a bigint (cross-engine bit-exact; beyond
    ~1e9 tokens switch the numerator to DECIMAL(38,0) — the plan is
    unchanged).

    Physical shape for 100 TB: pair generation stays INSIDE the token
    array (slice + transform + one explode — no posexplode self-join,
    which would shuffle the token stream twice and blow up skewed
    docs); pair counts and unigram counts are two map-side-combined
    aggregations; the unigram table joins the pair table keyed on each
    side (vocabulary-sized, Zipf-bounded — far below the pair stream;
    AQE broadcasts it at fixture scale); N_tok arrives as a broadcast
    scalar; the top-k is TakeOrderedAndProject, never a global sort.
    """
    from .functions.text import _tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens(F.col("text")).alias("t"))
    sz = F.size("t")

    def offset_pairs(off: int):
        # center at 1-based i pairs with t[i+off]; slice() needs a
        # non-negative length so short docs guard to an empty array
        return F.when(
            sz >= off + 1,
            F.transform(
                F.slice(F.col("t"), 1, sz - off),
                lambda x, i: F.struct(
                    x.alias("a"), F.element_at(F.col("t"), i + off + 1).alias("b")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    pairs = toks.select(
        F.explode(F.concat(*[offset_pairs(o) for o in range(1, PMI_WINDOW + 1)])).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    uni = toks.select(F.explode("t").alias("w"))
    wc = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n_w"))
    tot = uni.agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"))

    wa = wc.select(F.col("w").alias("_wa"), F.col("n_w").alias("n_w_a"))
    wb = wc.select(F.col("w").alias("_wb"), F.col("n_w").alias("n_w_b"))
    scored = (
        pc.filter(F.col("n_ab") >= PMI_MIN_SUPPORT)
        .join(wa, F.col("a") == F.col("_wa"))
        .join(wb, F.col("b") == F.col("_wb"))
        .join(F.broadcast(tot))
        .select(
            F.concat("a", F.lit(" "), "b").alias("pair"),
            "n_ab",
            F.expr("CAST((n_ab * 1000000L * n_tok) DIV (n_w_a * n_w_b) AS BIGINT)")
            .alias("lift_micro"),
        )
    )
    return scored.orderBy(F.desc("lift_micro"), "pair").limit(PMI_TOP_K)
