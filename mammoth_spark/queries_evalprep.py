"""Evaluation-prep operators: retrieval metrics, phrase search, and
split-hygiene — the measurement half of a corpus pipeline (the
build half is the dedup/filter/tokenize waves).

- ``phrase_search``: exact adjacent-bigram phrase matching via a
  POSITIONAL inverted index (token, doc, position) self-joined on
  pos+1 — the index shape that also serves "did this exact k-gram
  appear" decontamination probes. Panel = the corpus's own top-5
  bigrams so the query is fixture-agnostic.

- ``mrr_at_k``: Mean-Reciprocal-Rank harness — rank documents per
  query term by term frequency (tf desc, doc_id asc), labels come from
  an INDEPENDENT deterministic relevance oracle (md5 of term||doc_id,
  the repo's hash-assignment discipline — in production this is the
  human qrels table), report the first relevant rank and its
  reciprocal in integer micros (1e6 div rank — exact).

- ``ndcg_at_k``: graded-relevance nDCG@10, fully integer: the only
  transcendental (log2 of ranks 2..11) is a FIXED 10-value table, so it
  ships as micro-integer literals (``_LOG2_MICRO``) and the per-rank
  gain is rel*1e12 div log2_micro — no libm anywhere, no float crosses
  rows, and both engines evaluate the identical integer expression.

- ``cross_split_leak_report``: the leak detector a train/val split
  must pass — duplicate groups keyed by a PREFIX FINGERPRINT (md5 of
  the first 64 lowercased chars, the cheap near-dup proxy; swap in the
  minhash cluster id for full near-dup hygiene) that span both sides
  of the hash split contaminate validation; reports group and document
  counts. Uses the SAME split rule as
  train_val_split (functions/sampling.py) so it audits the split the
  pipeline actually ships.

Scale posture: everything here is token-exploded scans folded to
bounded tables (top-5 bigrams, Q=8 query terms, k=10 ranks) before any
window; the per-query rankings partition by term — Q partitions of
matching docs, never a global sort. The leak report is two hash-key
aggs (dup key, then group) — the dedup_exact shape with a split
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.sampling import HASH_BUCKETS, hash_bucket, hash_bucket_sql
from .model import read_table
from .registry import register

PHRASE_TOP = 5
MRR_QUERIES = 8
RANK_K = 10
REL_SCALE = 1_000_000

# floor(log2(rank + 1) * 1e6) for rank 1..RANK_K — the nDCG discount
# denominators as exact micro-integer literals. Fixed table, not a
# runtime log2: removes the last libm-agreement assumption from this
# module (verified against math.log2 in tests/test_mixture_evalprep.py).
_LOG2_MICRO = [
    1_000_000,  # rank 1: log2(2)
    1_584_962,  # rank 2: log2(3)
    2_000_000,  # rank 3: log2(4)
    2_321_928,  # rank 4: log2(5)
    2_584_962,  # rank 5: log2(6)
    2_807_354,  # rank 6: log2(7)
    3_000_000,  # rank 7: log2(8)
    3_169_925,  # rank 8: log2(9)
    3_321_928,  # rank 9: log2(10)
    3_459_431,  # rank 10: log2(11)
]


def _gain_sql(rnk: str, div: str) -> str:
    """Per-rank nDCG gain, identical integer arithmetic on both engines:
    (rel * 1e12) intdiv log2_micro(rank) — i.e. (rel / log2(rank+1))
    truncated to micros. ``div`` is the engine's integer-division
    spelling ('//' DuckDB, 'div' Spark SQL)."""
    whens = " ".join(f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_LOG2_MICRO))
    return (
        f"CAST((CAST(rel AS BIGINT) * {REL_SCALE * 1_000_000}) "
        f"{div} (CASE {rnk} {whens} END) AS BIGINT)"
    )

_WORDS = "string_split(text, ' ')"


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, token) — the positional explode both retrieval
    queries start from; filtered to the alpha vocabulary like the
    tokenizer trainers."""
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter(F.col("token").rlike("^[a-z]{2,}$"))
    )


_TOKENS_SQL = """
  SELECT doc_id, i - 1 AS pos, words[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       unnest(range(1, len(words) + 1)) AS t(i)
  WHERE regexp_matches(words[i], '^[a-z]{2,}$')
"""


@register(
    "phrase_search",
    driver=False,
    oracle=f"""
WITH toks AS ({_TOKENS_SQL}),
bigrams AS (
  SELECT a.token AS w1, b.token AS w2, a.doc_id
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
panel AS (
  SELECT w1, w2, count(*) AS total
  FROM bigrams GROUP BY w1, w2
  ORDER BY total DESC, w1, w2 LIMIT {PHRASE_TOP}
)
SELECT p.w1 || ' ' || p.w2 AS phrase,
       CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM panel p JOIN bigrams g ON g.w1 = p.w1 AND g.w2 = p.w2
GROUP BY phrase ORDER BY n_occurrences DESC, phrase
""",
)
def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase (adjacent bigram) search over a positional index:
    doc and occurrence counts for the corpus's top-5 bigram phrases.
    The positional self-join keys on (doc_id) with the pos+1 adjacency
    as a join predicate — co-partitioned by doc, no cross-doc pairs
    ever form; the panel is a broadcast 5-row table."""
    toks = _tokens(spark, sf_dir)
    bigrams = toks.alias("a").join(
        toks.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.token").alias("w1"),
        F.col("b.token").alias("w2"),
        F.col("a.doc_id").alias("doc_id"),
    )
    panel = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.desc("total"), "w1", "w2")
        .limit(PHRASE_TOP)
        .drop("total")
    )
    return (
        bigrams.join(F.broadcast(panel), ["w1", "w2"])
        .groupBy(F.concat_ws(" ", "w1", "w2").alias("phrase"))
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), "phrase")
    )


def _rel_sql(grades: int) -> str:
    """Deterministic graded relevance: first md5 hex nibble of
    term||':'||doc_id mod ``grades`` — the stand-in for a qrels table,
    reproducible on both engines."""
    return (
        "(strpos('0123456789abcdef', "
        "substr(md5(q.token || ':' || CAST(t.doc_id AS VARCHAR)), 1, 1)) - 1) "
        f"% {grades}"
    )


def _rel_col(grades: int) -> F.Column:
    h = F.md5(F.concat("q.token", F.lit(":"), F.col("t.doc_id").cast("string")))
    return F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % grades


def _query_panel_sql() -> str:
    return f"""
qpanel AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
  ORDER BY cnt DESC, token LIMIT {MRR_QUERIES}
),
tf AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY token, doc_id
),
ranked AS (
  SELECT q.token, t.doc_id, t.tf,
         row_number() OVER (PARTITION BY q.token
                            ORDER BY t.tf DESC, t.doc_id) AS rnk,
         {_rel_sql(4)} AS rel
  FROM qpanel q JOIN tf t ON t.token = q.token
)"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    qpanel = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(MRR_QUERIES)
        .drop("cnt")
    )
    tf = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    w = Window.partitionBy("q.token").orderBy(F.desc("t.tf"), F.asc("t.doc_id"))
    return (
        qpanel.alias("q")
        .join(tf.alias("t"), F.col("t.token") == F.col("q.token"))
        .select(
            F.col("q.token").alias("token"),
            F.col("t.doc_id").alias("doc_id"),
            F.col("t.tf").alias("tf"),
            F.row_number().over(w).alias("rnk"),
            _rel_col(4).alias("rel"),
        )
    )


@register(
    "mrr_at_k",
    driver=False,
    oracle=f"""
WITH toks AS ({_TOKENS_SQL}),
{_query_panel_sql()}
SELECT token AS query_term,
       CAST(min(rnk) AS BIGINT) AS first_rel_rank,
       CAST({REL_SCALE} // min(rnk) AS BIGINT) AS rr_micro
FROM ranked
WHERE rnk <= {RANK_K} AND rel >= 2
GROUP BY token ORDER BY token
""",
)
def mrr_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first relevant document (grade >= 2) in
    the tf-ranked top-{RANK_K}, per query term. rr_micro = 1e6 div rank
    — pure integer, no float anywhere. Terms whose top-k holds no
    relevant doc are absent (the aggregate-then-average step belongs to
    the caller, who must decide how to score empties)."""
    ranked = _ranked(spark, sf_dir)
    return (
        ranked.filter((F.col("rnk") <= RANK_K) & (F.col("rel") >= 2))
        .groupBy(F.col("token").alias("query_term"))
        .agg(
            F.min("rnk").cast("bigint").alias("first_rel_rank"),
            F.expr(f"CAST({REL_SCALE} div min(rnk) AS BIGINT)").alias("rr_micro"),
        )
        .orderBy("query_term")
    )


@register(
    "ndcg_at_k",
    driver=False,
    oracle=f"""
WITH toks AS ({_TOKENS_SQL}),
{_query_panel_sql()},
topk AS (SELECT * FROM ranked WHERE rnk <= {RANK_K}),
dcg AS (
  SELECT token,
         CAST(sum({_gain_sql("rnk", "//")}) AS BIGINT) AS dcg_micro
  FROM topk GROUP BY token
),
ideal AS (
  SELECT token,
         CAST(sum({_gain_sql("irnk", "//")}) AS BIGINT) AS idcg_micro
  FROM (SELECT token, rel,
               row_number() OVER (PARTITION BY token
                                  ORDER BY rel DESC, doc_id) AS irnk
        FROM topk) WHERE irnk <= {RANK_K}
  GROUP BY token
)
SELECT d.token AS query_term, d.dcg_micro, i.idcg_micro,
       CAST(CASE WHEN i.idcg_micro > 0
                 THEN (CAST(d.dcg_micro AS HUGEINT) * {REL_SCALE}) // i.idcg_micro
                 ELSE 0 END AS BIGINT) AS ndcg_micro
FROM dcg d JOIN ideal i ON d.token = i.token
ORDER BY query_term
""",
)
def ndcg_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per query term with md5-graded relevance (0..3): per-rank
    gains truncate to micros BEFORE the bigint sum, the ideal ordering
    re-ranks the same top-k by grade, and the final ratio is integer
    div. The log2 discounts are the fixed ``_LOG2_MICRO`` literal table
    — no transcendental function runs on either engine."""
    ranked = _ranked(spark, sf_dir)
    topk = ranked.filter(F.col("rnk") <= RANK_K)
    gain = lambda r: F.expr(_gain_sql(r, "div"))  # noqa: E731
    dcg = topk.groupBy("token").agg(F.sum(gain("rnk")).cast("bigint").alias("dcg_micro"))
    iw = Window.partitionBy("token").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        topk.select("token", "rel", "doc_id", F.row_number().over(iw).alias("irnk"))
        .filter(F.col("irnk") <= RANK_K)
        .groupBy("token")
        .agg(F.sum(gain("irnk")).cast("bigint").alias("idcg_micro"))
    )
    return (
        dcg.join(ideal, "token")
        .select(
            F.col("token").alias("query_term"),
            "dcg_micro",
            "idcg_micro",
            F.expr(
                f"CAST(CASE WHEN idcg_micro > 0 THEN "
                f"(CAST(dcg_micro AS DECIMAL(38,0)) * {REL_SCALE}) div idcg_micro "
                f"ELSE 0 END AS BIGINT)"
            ).alias("ndcg_micro"),
        )
        .orderBy("query_term")
    )


@register(
    "cross_split_leak_report",
    driver=False,
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, md5(substr(lower(text), 1, 64)) AS dup_key,
         CASE WHEN {hash_bucket_sql("doc_id", HASH_BUCKETS, "split")} < 900
              THEN 'train' ELSE 'heldout' END AS split
  FROM documents
),
groups AS (
  SELECT dup_key,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train,
         CAST(sum(CASE WHEN split = 'heldout' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_heldout
  FROM assigned GROUP BY dup_key
  HAVING count(*) > 1
)
SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
       CAST(coalesce(sum(CASE WHEN n_train > 0 AND n_heldout > 0
                              THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_leaking_groups,
       CAST(coalesce(sum(CASE WHEN n_train > 0 THEN n_heldout ELSE 0 END), 0)
            AS BIGINT) AS n_heldout_contaminated
FROM groups
""",
)
def cross_split_leak_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygiene audit: duplicate groups (prefix-fingerprint
    near-dup key) spanning the train/heldout hash split. A heldout document
    whose duplicate sits in train is CONTAMINATED — its eval score
    measures memorization. Same hash-assignment rule as
    train_val_split (train = buckets 0..899 of 1000), so this audits
    the split the pipeline actually produces. Two hash aggs, no joins:
    the dedup_exact plan with a split dimension."""
    docs = read_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        F.md5(F.substring(F.lower("text"), 1, 64)).alias("dup_key"),
        F.when(hash_bucket(F.col("doc_id"), HASH_BUCKETS, "split") < 900, "train")
        .otherwise("heldout")
        .alias("split"),
    )
    groups = (
        assigned.groupBy("dup_key")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") == "heldout", 1).otherwise(0)).alias(
                "n_heldout"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 1)
    )
    leak = (F.col("n_train") > 0) & (F.col("n_heldout") > 0)
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_groups"),
        F.coalesce(F.sum(F.when(leak, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_leaking_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n_train") > 0, F.col("n_heldout")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_heldout_contaminated"),
    )
