"""Corpus-curation operators over duplicated spans and deterministic
global ordering — the remaining pieces of a web-scale training-data
pipeline (alongside queries_corpus.py's assembly and queries_pipeline.py's
dedup/sampling families).

- ``dup_span_stats`` — cross-document duplicated-span detection at the
  token n-gram level (the substring-dedup signal of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better",
  arXiv:2107.06499): memorization risk comes from SPANS repeated across
  documents, not only whole-document clones.
- ``corpus_shuffle`` — a deterministic global training-order shuffle:
  every document gets a reproducible (shard, position, global position)
  independent of cluster size or partition layout — the manifest a data
  loader consumes.

Determinism discipline matches functions/sampling.py: order and
assignment are pure functions of stable ids (md5), never rand() or
partition order, mirroring the reference's reproducible snapshot-export
semantics (/root/reference/sync/service/sync_service.go:159-221).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.sampling import hash_bucket, hash_bucket_sql
from .functions.text import _tokens
from .queries_corpus import _SQL_TOKS
from .model import read_table
from .registry import register

# ----------------------- duplicated-span statistics -----------------------

SPAN_N = 4  # n-gram span width (tokens)


def _dup_span_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(toks[i:i+{SPAN_N - 1}], ' ') AS gram
  FROM tok, unnest(generate_series(1, len(toks) - {SPAN_N - 1})) s(i)
),
gd AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN gd USING (gram)),
cov AS (
  SELECT doc_id, CAST(count(DISTINCT pos + o) AS BIGINT) AS n_dup_tokens
  FROM dup, unnest(generate_series(0, {SPAN_N - 1})) t(o)
  GROUP BY doc_id
),
dg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams FROM dup GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(greatest(len(toks) - {SPAN_N - 1}, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(dg.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(cov.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
FROM tok t LEFT JOIN dg USING (doc_id) LEFT JOIN cov USING (doc_id)
"""


@register("dup_span_stats", oracle=_dup_span_oracle())
def dup_span_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span statistics (Lee et al. 2022,
    arXiv:2107.06499): for every document, how many of its token
    {n}-grams also occur in at least one OTHER document, and how many
    token positions those duplicated spans cover (exact union of the
    overlapping [i, i+n) intervals via distinct covered indices). The
    per-doc dup-token fraction is the filter signal: a doc that is 80%
    duplicated spans is boilerplate even if no whole-doc hash matches.

    Scale shape: grams explode once and shuffle ONCE on the gram key;
    the cross-doc aggregate and the dup-gram join reuse that same
    hash partitioning (asserted in tests/test_plans.py — one exchange
    on gram, not two). Coverage union explodes only the DUPLICATED
    positions (a small fraction of the corpus) by a constant factor n.
    This entry keeps the RAW STRING gram key so the DuckDB oracle
    groups on an identical key; ``dup_span_stats_fp`` below is the
    100 TB entry — same pipeline with the gram fingerprinted to
    xxhash64 before the shuffle."""
    return _dup_span_stats(spark, sf_dir, fingerprint=False)


@register("dup_span_stats_fp", oracle=_dup_span_oracle())
def dup_span_stats_fp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dup_span_stats with the gram key FINGERPRINTED to xxhash64 before
    anything shuffles — the scale entry (VERDICT r03 next-round #6): the
    exchange carries 8-byte keys instead of ~n-word strings, shrinking
    shuffle width by roughly the mean gram length. The per-doc outputs
    are identical to the raw-string twin (the hash only renames the
    group/join key), so the SAME DuckDB oracle checks this query; the
    one semantic caveat is 64-bit collision probability (~m^2/2^65 for m
    distinct grams — at 10^12 grams a handful of false dup-grams, which
    this signal's downstream thresholding tolerates; exact substring
    dedup would use the raw-key twin per shard).
    tests/test_plans.py::test_dup_span_fp_shuffles_hashed_key asserts
    the exchange key is the 8-byte hash, not the string."""
    return _dup_span_stats(spark, sf_dir, fingerprint=True)


def _dup_span_stats(spark: SparkSession, sf_dir: str, fingerprint: bool) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    g = (
        tok.filter(F.size("toks") >= SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (SPAN_N - 1)),
                    lambda i: F.struct(
                        i.cast("bigint").alias("pos"),
                        F.concat_ws(
                            " ", F.slice(F.col("toks"), i, F.lit(SPAN_N))
                        ).alias("gram"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "s.pos", "s.gram")
    )
    if fingerprint:
        # narrow, pre-shuffle: every downstream exchange/group/join on
        # "gram" now moves 8 bytes per key instead of the string
        g = g.select("doc_id", "pos", F.xxhash64("gram").alias("gram"))
    gd = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    dup = g.join(gd, "gram").select("doc_id", "pos")
    cov = (
        dup.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SPAN_N - 1))
            ).alias("tokidx"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("tokidx").cast("bigint").alias("n_dup_tokens"))
    )
    dg = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_grams")
    )
    base = tok.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.greatest(F.size("toks") - (SPAN_N - 1), F.lit(0))
        .cast("bigint")
        .alias("n_grams"),
    )
    return (
        base.join(dg, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("bigint").alias("n_dup_tokens"),
        )
    )


# ----------------------- deterministic corpus shuffle -----------------------

SHUF_SHARDS = 16


def _corpus_shuffle_oracle() -> str:
    return f"""
WITH a AS (
  SELECT doc_id,
         CAST({hash_bucket_sql("doc_id", SHUF_SHARDS, "shufshard")} AS BIGINT) AS shard,
         md5('shufpos' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
p AS (
  SELECT doc_id, shard,
         CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM a
),
sizes AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY shard),
offs AS (
  SELECT shard,
         CAST(coalesce(sum(n) OVER (ORDER BY shard
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM sizes
)
SELECT p.doc_id, p.shard, p.pos, p.pos + o.off AS global_pos
FROM p JOIN offs o USING (shard)
"""


@register("corpus_shuffle", oracle=_corpus_shuffle_oracle())
def corpus_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: each document gets a
    shard (salted hash of doc_id), a position within the shard (rank of
    an independent salted hash), and its global position in the
    shard-major concatenation — the exact manifest a training data
    loader reads sequentially for a reproducible epoch. Changing the
    salt is "reshuffle for epoch 2" with zero data movement.

    Scale shape: a true global sort by random key (the naive shuffle)
    is the single most expensive operation you can run at 100 TB. Here
    the only per-row wide op is ONE rank window per shard — shard count
    is the parallelism/memory knob (16 here, ~100k at scale so each
    shard sorts an executor-sized slice). The shard-offset table is
    shards-rows tiny: its running sum is a single-partition window over
    16 rows, then a broadcast join back. Hash-derived order also means
    the manifest is identical under ANY input partitioning — the
    reproducibility contract of the reference's snapshot export."""
    docs = read_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), SHUF_SHARDS, "shufshard")
        .cast("bigint")
        .alias("shard"),
        F.md5(F.concat(F.lit("shufpos"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    p = a.select(
        "doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )
    sizes = p.groupBy("shard").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_off = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "shard",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).cast("bigint").alias("off"),
    )
    return p.join(F.broadcast(offs), "shard").select(
        "doc_id", "shard", "pos", (F.col("pos") + F.col("off")).alias("global_pos")
    )


# ----------------------- RAG retrieval end-to-end -----------------------

RAG_QUERIES = [
    (0, "spark join window"),
    (1, "fast hash merge"),
    (2, "stream batch data"),
]
RAG_DIMS = 16  # hashed bag-of-words embedding width
RAG_TOPK = 3
_RAG_SALTS = 8
RAG_CHUNK_CHARS = 400
RAG_CHUNK_STRIDE = 300


def _rag_oracle() -> str:
    from .functions.text import TOKEN_REGEX

    qvals = ", ".join(f"({qid}, '{q}')" for qid, q in RAG_QUERIES)
    bucket = hash_bucket_sql("t.term", RAG_DIMS, "ragdim")
    qbucket = hash_bucket_sql("qt.term", RAG_DIMS, "ragdim")
    return f"""
WITH n AS (
  SELECT doc_id, text,
         CAST(floor((greatest(length(text), 1) - 1) / {RAG_CHUNK_STRIDE}) AS BIGINT) + 1 AS n_chunks
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         substr(text, i * {RAG_CHUNK_STRIDE} + 1, {RAG_CHUNK_CHARS}) AS chunk
  FROM n, unnest(generate_series(0, n_chunks - 1)) AS s(i)
),
cdim AS (
  SELECT doc_id, chunk_idx, CAST({bucket} AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, chunk_idx,
               unnest(regexp_extract_all(chunk, '{TOKEN_REGEX}')) AS term
        FROM chunks) t
  GROUP BY doc_id, chunk_idx, {bucket}
),
cnorm AS (
  SELECT doc_id, chunk_idx, sqrt(sum(cnt * cnt * 1.0)) AS nrm
  FROM cdim GROUP BY doc_id, chunk_idx
),
q(qid, query) AS (VALUES {qvals}),
qdim AS (
  SELECT qid, CAST({qbucket} AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT qid, unnest(regexp_extract_all(query, '{TOKEN_REGEX}')) AS term
        FROM q) qt
  GROUP BY qid, {qbucket}
),
qnorm AS (SELECT qid, sqrt(sum(cnt * cnt * 1.0)) AS nrm FROM qdim GROUP BY qid),
dots AS (
  SELECT qd.qid, cd.doc_id, cd.chunk_idx, sum(qd.cnt * cd.cnt * 1.0) AS dot
  FROM qdim qd JOIN cdim cd USING (bucket)
  GROUP BY qd.qid, cd.doc_id, cd.chunk_idx
),
scored AS (
  SELECT d.qid, d.doc_id, d.chunk_idx,
         CAST(floor(1000000.0 * d.dot / (qn.nrm * cn.nrm)) AS BIGINT) AS cos_micro
  FROM dots d
  JOIN qnorm qn ON qn.qid = d.qid
  JOIN cnorm cn ON cn.doc_id = d.doc_id AND cn.chunk_idx = d.chunk_idx
),
ranked AS (
  SELECT qid, doc_id, chunk_idx, cos_micro,
         CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos_micro DESC, doc_id, chunk_idx) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, doc_id, chunk_idx, cos_micro, rank
FROM ranked WHERE rank <= {RAG_TOPK}
"""


@register("rag_retrieval_e2e", oracle=_rag_oracle())
def rag_retrieval_e2e_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG indexing + retrieval as ONE Catalyst DAG: chunk every document
    (stride windows, as doc_chunks), embed each chunk as a hashed
    bag-of-words vector ({d} dims — the deterministic stand-in for a
    neural encoder, same plumbing either way), embed the query strings
    the same way, and return the top-{k} chunks per query by cosine.
    Proves the curation operators COMPOSE: chunking, feature hashing,
    sparse dot product, and two-level top-k run as one optimized plan.

    Scale shape: chunk embeddings stay SPARSE — (chunk, bucket, count)
    rows, never a dense corpus-wide matrix; the query side is a tiny
    broadcast, so scoring is broadcast-join + partial agg with no
    fact-to-fact shuffle. The per-query top-k uses the same two-level
    salted pattern as domain_cap (local top-k per salt, then top-k of
    survivors) so no single task ever sorts a query's full candidate
    list. At 100 TB swap the hash encoder for a real model over
    mapInPandas (functions/multimodal.py shows that boundary) — every
    plan property here is encoder-agnostic."""
    from .functions.text import _tokens

    docs = read_table(spark, sf_dir, "documents")
    n_chunks = (
        F.floor(
            (F.greatest(F.length("text"), F.lit(1)) - 1) / RAG_CHUNK_STRIDE
        ).cast("bigint")
        + 1
    )
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.substring(
        F.col("text"),
        (F.col("chunk_idx") * RAG_CHUNK_STRIDE + 1).cast("int"),
        RAG_CHUNK_CHARS,
    )
    cdim = (
        exploded.select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.explode(_tokens(chunk)).alias("term"),
        )
        .groupBy(
            "doc_id",
            "chunk_idx",
            hash_bucket(F.col("term"), RAG_DIMS, "ragdim")
            .cast("bigint")
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cnorm = cdim.groupBy("doc_id", "chunk_idx").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt") * 1.0)).alias("c_nrm")
    )
    from .model import local_df

    q = local_df(spark, RAG_QUERIES, "qid long, query string")
    qdim = (
        q.select("qid", F.explode(_tokens(F.col("query"))).alias("term"))
        .groupBy(
            "qid",
            hash_bucket(F.col("term"), RAG_DIMS, "ragdim")
            .cast("bigint")
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("q_cnt"))
    )
    qnorm = qdim.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("q_cnt") * F.col("q_cnt") * 1.0)).alias("q_nrm")
    )
    dots = (
        cdim.join(F.broadcast(qdim), "bucket")
        .groupBy("qid", "doc_id", "chunk_idx")
        .agg(F.sum(F.col("q_cnt") * F.col("cnt") * 1.0).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(qnorm), "qid")
        .join(cnorm, ["doc_id", "chunk_idx"])
        .select(
            "qid",
            "doc_id",
            "chunk_idx",
            F.floor(1000000.0 * F.col("dot") / (F.col("q_nrm") * F.col("c_nrm")))
            .cast("bigint")
            .alias("cos_micro"),
        )
    )
    order = [F.col("cos_micro").desc(), F.col("doc_id"), F.col("chunk_idx")]
    salted = scored.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(_RAG_SALTS)))
    w_local = Window.partitionBy("qid", "salt").orderBy(*order)
    survivors = (
        salted.withColumn("lrank", F.row_number().over(w_local))
        .filter(F.col("lrank") <= RAG_TOPK)
        .drop("salt", "lrank")
    )
    w_global = Window.partitionBy("qid").orderBy(*order)
    return (
        survivors.withColumn(
            "rank", F.row_number().over(w_global).cast("bigint")
        )
        .filter(F.col("rank") <= RAG_TOPK)
        .select("qid", "doc_id", "chunk_idx", "cos_micro", "rank")
    )


# ----------------------- k-anonymity suppression -----------------------

K_ANON = 8  # minimum group size for a quasi-identifier combination


@register(
    "k_anonymize",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         count(*) AS n,
         CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CASE WHEN n >= {K_ANON} THEN CAST(nat AS VARCHAR) ELSE '*' END AS nation_qid,
       CASE WHEN n >= {K_ANON} THEN seg ELSE '*' END AS segment_qid,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(bal_cents) AS BIGINT) AS bal_cents,
       CAST(count(*) AS BIGINT) AS n_merged_groups
FROM g GROUP BY 1, 2
""",
)
def k_anonymize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity suppression over quasi-identifiers — the privacy gate a
    curation pipeline applies before releasing per-group statistics: any
    (nation, market-segment) combination identifying fewer than K
    individuals is suppressed into the '*' bucket instead of being
    published (Sweeney 2002's suppression step, the group-size twin of
    the row-level pii_scan).

    Spark shape: ONE hash aggregation produces the quasi-identifier
    groups with partial (map-side) combine; the suppression relabel is a
    projection; the re-aggregation that merges all suppressed groups
    into '*' operates on |groups| rows — at 100 TB that second exchange
    moves |nations x segments| rows, not data. No window, no sort, no
    second scan of the fact table."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    g = cust.groupBy(
        F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint")).alias("bal_cents"),
    )
    keep = F.col("n") >= K_ANON
    relabeled = g.select(
        F.when(keep, F.col("nat").cast("string")).otherwise(F.lit("*")).alias(
            "nation_qid"
        ),
        F.when(keep, F.col("seg")).otherwise(F.lit("*")).alias("segment_qid"),
        "n",
        "bal_cents",
    )
    return relabeled.groupBy("nation_qid", "segment_qid").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("bal_cents").cast("bigint").alias("bal_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged_groups"),
    )


# ----------------------- blocked fuzzy matching -----------------------

FUZZY_LEV_T = 16  # max edit distance for a candidate match
FUZZY_LEN_BAND = 32  # length-band width for the blocking key
FUZZY_MAX_BLOCK = 64  # per-block pair-enumeration cap (star above it)


@register(
    "fuzzy_match_blocked",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, split_part(text, ' ', 1) AS tok1,
         len(text) // {FUZZY_LEN_BAND} AS lb
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM d a JOIN d b ON a.tok1 = b.tok1 AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= {FUZZY_LEV_T}
""",
)
def fuzzy_match_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance similarity join — the entity-resolution
    primitive (record linkage over noisy text): candidate pairs form
    ONLY inside blocks keyed by (first token, length band), because
    length alone bounds edit distance (len diff > t => dist > t), and
    the naive all-pairs product never exists in the plan.

    Candidates route through the same bounded-pair helper every LSH
    bucket uses (functions/dedup.py:_bounded_bucket_pairs): a block of
    n <= FUZZY_MAX_BLOCK docs enumerates its exact n(n-1)/2 pairs, while
    a hot block (a stopword first token at web scale — 10^6 docs would
    otherwise mean 10^12 pairs) emits the linear star to its canonical
    doc instead. Fixture blocks are far under the cap at every SF
    (max 25 at sf0.1), so the exact-pair oracle holds unchanged;
    tests/test_plans.py::test_fuzzy_hot_block_pairs_stay_linear pins the
    1000-copy-block bound.

    Scale shape: one shuffle of each side on the composite block key for
    candidate generation (the helper's size/canonical window reuses that
    same hash partitioning), then one id-keyed join to re-attach texts —
    pair volume, not block-size^2, crosses that exchange. Levenshtein
    runs JVM-side WITH the threshold argument, so the DP matrix
    short-circuits at t (banded O(t*n) instead of O(n*m))."""
    from .functions.dedup import _bounded_bucket_pairs

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.split(F.col("text"), " ")[0].alias("tok1"),
        F.expr(f"CAST(length(text) DIV {FUZZY_LEN_BAND} AS BIGINT)").alias("lb"),
    )
    cand = _bounded_bucket_pairs(
        d.select("doc_id", "tok1", "lb"), ["tok1", "lb"], "doc_id", FUZZY_MAX_BLOCK
    )
    ta = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_text_a"))
    tb = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_text_b"))
    # threshold-bounded levenshtein: returns -1 when the distance
    # exceeds FUZZY_LEV_T, after O(threshold)-banded work
    dist = F.levenshtein(F.col("_text_a"), F.col("_text_b"), FUZZY_LEV_T)
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", dist.cast("bigint").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


# ----------------------- sequence packing report -----------------------

SEQ_LEN = 512  # training sequence length (tokens)


def _packing_oracle() -> str:
    return f"""
WITH a AS (
  SELECT doc_id,
         CAST({hash_bucket_sql("doc_id", SHUF_SHARDS, "shufshard")} AS BIGINT) AS shard,
         md5('shufpos' || CAST(doc_id AS VARCHAR)) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM a
),
sizes AS (SELECT shard, CAST(sum(n_tokens) AS BIGINT) AS tok FROM c GROUP BY shard),
offs AS (
  SELECT shard,
         CAST(coalesce(sum(tok) OVER (ORDER BY shard
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM sizes
),
g AS (
  SELECT c.doc_id, c.n_tokens,
         c.cum + o.off - c.n_tokens AS gstart,
         c.cum + o.off AS gend
  FROM c JOIN offs o USING (shard)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(n_tokens) + {SEQ_LEN - 1}) // {SEQ_LEN} AS BIGINT) AS n_sequences,
       CAST(sum(CASE WHEN n_tokens > 0
                      AND gstart // {SEQ_LEN} <> (gend - 1) // {SEQ_LEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       CAST((1000000 * sum(CASE WHEN n_tokens > 0
                      AND gstart // {SEQ_LEN} <> (gend - 1) // {SEQ_LEN}
                     THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS crossing_micro,
       CAST((1000000 * sum(n_tokens))
            // (((sum(n_tokens) + {SEQ_LEN - 1}) // {SEQ_LEN}) * {SEQ_LEN})
            AS BIGINT) AS fill_micro
FROM g
"""


@register("sequence_packing_report", driver=False, oracle=_packing_oracle())
def sequence_packing_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing audit: lay the corpus out in
    the deterministic corpus_shuffle order, concatenate token streams,
    split at SEQ_LEN, and report what a packed training run pays —
    how many documents straddle a sequence boundary (the fraction that
    needs cross-document attention masking) and the fill factor of the
    last sequence. Packing itself wastes zero tokens by construction;
    the boundary-crossing rate is the real cost knob (longer SEQ_LEN
    -> fewer sequences but more crossings).

    Scale shape: identical to corpus_shuffle — per-shard token cumsum
    (ONE rank-window exchange over hash shards), a shards-row offset
    table broadcast back, then a single fold to one row. The global
    concatenation order is a pure function of doc_id, so the report is
    reproducible under any input partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), SHUF_SHARDS, "shufshard")
        .cast("bigint")
        .alias("shard"),
        F.md5(F.concat(F.lit("shufpos"), F.col("doc_id").cast("string"))).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = a.select(
        "doc_id", "shard", "n_tokens", F.sum("n_tokens").over(w).alias("cum")
    )
    sizes = c.groupBy("shard").agg(F.sum("n_tokens").cast("bigint").alias("tok"))
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "shard",
        F.coalesce(F.sum("tok").over(w_off), F.lit(0)).cast("bigint").alias("off"),
    )
    g = c.join(F.broadcast(offs), "shard").select(
        "n_tokens",
        (F.col("cum") + F.col("off") - F.col("n_tokens")).alias("gstart"),
        (F.col("cum") + F.col("off")).alias("gend"),
    )
    crossing = F.when(
        (F.col("n_tokens") > 0)
        & (
            F.expr(f"gstart div {SEQ_LEN}") != F.expr(f"(gend - 1) div {SEQ_LEN}")
        ),
        1,
    ).otherwise(0)
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr(f"CAST((sum(n_tokens) + {SEQ_LEN - 1}) div {SEQ_LEN} AS BIGINT)").alias(
            "n_sequences"
        ),
        F.sum(crossing).cast("bigint").alias("n_crossing"),
        F.expr(
            f"CAST((1000000 * sum(CASE WHEN n_tokens > 0 AND gstart div {SEQ_LEN}"
            f" <> (gend - 1) div {SEQ_LEN} THEN 1 ELSE 0 END)) div count(*) AS BIGINT)"
        ).alias("crossing_micro"),
        F.expr(
            f"CAST((1000000 * sum(n_tokens)) div"
            f" (((sum(n_tokens) + {SEQ_LEN - 1}) div {SEQ_LEN}) * {SEQ_LEN})"
            " AS BIGINT)"
        ).alias("fill_micro"),
    )
