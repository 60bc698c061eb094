"""Corpus-assembly operators: the last mile of a training-data pipeline.

After screening (text.py), dedup (dedup.py), and sampling (sampling.py),
a 100 TB corpus still has to be ASSEMBLED into training input: documents
packed into fixed-token-budget sequences, sources re-weighted to a target
mixture, heavy domains capped, an inverted index built for inspection
tooling, and the result written as balanced shards. Each operator here is
the Spark-shaped version of that step, registered with a DuckDB oracle
(driver=False: the 50-entry driver contract is full; tests/
test_oracle_parity.py replicates the driver's comparison for these).

The determinism discipline follows functions/sampling.py: every
assignment is a pure function of stable ids (md5 buckets), never rand()
or partition order — reproducibility is the contract, mirroring the
reference's snapshot-pinned export semantics
(/root/reference/sync/service/sync_service.go:159-221).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.sampling import hash_bucket, hash_bucket_sql
from .functions.text import TOKEN_REGEX, _tokens
from .model import read_table
from .registry import register

_SQL_TOKS = f"regexp_extract_all(text, '{TOKEN_REGEX}')"

# --------------------------- sequence packing ---------------------------

PACK_CAPACITY = 512  # tokens per training sequence
PACK_SHARDS = 64  # independent packing streams (parallelism knob)


@register(
    "pack_sequences",
    driver=False,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {hash_bucket_sql("doc_id", PACK_SHARDS, "pack")} AS shard,
         CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       cum_tokens - n_tokens AS tok_offset,
       CAST(floor((cum_tokens - n_tokens) / {PACK_CAPACITY}) AS BIGINT) AS pack_id,
       CAST(floor((cum_tokens - n_tokens + greatest(n_tokens, 1) - 1) / {PACK_CAPACITY}) AS BIGINT)
         - CAST(floor((cum_tokens - n_tokens) / {PACK_CAPACITY}) AS BIGINT) + 1 AS n_spans
FROM cum
""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a
    deterministic order and chunk the token stream into fixed-capacity
    training sequences. Each doc gets its byte/token offset in the
    stream, the pack (sequence) its first token lands in, and how many
    packs it spans — exactly the manifest a tokenizer-sharder needs to
    materialize training examples without re-scanning the corpus.

    Spark shape: per-doc token counts are a narrow projection; the only
    wide operation is ONE running-sum window per shard. Packing is
    inherently sequential *within a stream*, so the shard count is the
    parallelism knob — 64 here, ~100k at 100 TB (each shard packs
    independently; shard assignment is a pure hash of doc_id, so the
    layout is reproducible under any cluster size or partitioning).
    A global (unsharded) running sum would serialize the whole corpus
    through one partition — the window partition key IS the scale design.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), PACK_SHARDS, "pack").cast("bigint").alias("shard"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
    offset = F.col("cum_tokens") - F.col("n_tokens")
    start_pack = F.floor(offset / PACK_CAPACITY).cast("bigint")
    end_pack = F.floor(
        (offset + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / PACK_CAPACITY
    ).cast("bigint")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        offset.alias("tok_offset"),
        start_pack.alias("pack_id"),
        (end_pack - start_pack + 1).alias("n_spans"),
    )


# --------------------------- mixture sampling ---------------------------

# Target language mixture (per-mille) and the global sampling budget
# (per-mille of the corpus): the knobs a curriculum designer sets.
MIX_WEIGHTS = {"en": 300, "zh": 250, "es": 200, "de": 150, "fr": 100}
MIX_BUDGET_PM = 500  # sample half the corpus
_MIX_BUCKETS = 1000


def _mixture_oracle() -> str:
    w_cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_WEIGHTS.items())
    )
    bucket = hash_bucket_sql("doc_id", _MIX_BUCKETS, "mix")
    return f"""
WITH per_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_total) AS BIGINT) AS corpus_n FROM per_lang),
rates AS (
  SELECT lang, n_total,
         CAST(floor(corpus_n * {MIX_BUDGET_PM} * (CASE lang {w_cases} ELSE 0 END)
                    / 1000000.0) AS BIGINT) AS desired_n
  FROM per_lang, tot
),
cuts AS (
  SELECT lang, n_total, desired_n,
         least({_MIX_BUCKETS}, CAST(floor(desired_n * {_MIX_BUCKETS} * 1.0 / n_total) AS BIGINT)) AS cut
  FROM rates
),
kept AS (
  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
  FROM documents d JOIN cuts c ON d.lang = c.lang
  WHERE {bucket} < c.cut
  GROUP BY d.lang
)
SELECT c.lang, c.n_total, c.desired_n, c.cut,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM cuts c LEFT JOIN kept k ON c.lang = k.lang
"""


@register("mixture_sample", driver=False, oracle=_mixture_oracle())
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture (curriculum) sampling: re-weight the corpus so each
    language hits a target share of a global token/doc budget. Per-lang
    keep-rates are derived from per-lang counts (a tiny aggregate), then
    every row is kept iff its deterministic hash bucket clears its
    lang's cut — the selection itself is a pure scan with a broadcast
    rate map, no shuffle of the corpus.

    All rate math is integer (floor to desired counts, bucket cuts out
    of 1000) so Spark and the oracle agree bit-for-bit; float rates
    would drift between engines. Returns the per-lang audit row
    (requested vs achieved) — the sampled rows themselves are the same
    filter applied to the full frame.
    """
    docs = read_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_expr = None
    for k, v in sorted(MIX_WEIGHTS.items()):
        cond = F.col("lang") == k
        w_expr = F.when(cond, v) if w_expr is None else w_expr.when(cond, v)
    w_expr = w_expr.otherwise(F.lit(0))
    # corpus total via an unpartitioned window over the per-lang frame
    # (a handful of rows): ONE corpus count scan, not two — Catalyst does
    # not dedupe a per_lang subplan referenced from two branches
    corpus_n = F.sum("n_total").over(Window.partitionBy()).cast("bigint")
    cuts = (
        per_lang.select(
            "lang",
            "n_total",
            F.floor(corpus_n * MIX_BUDGET_PM * w_expr / 1000000.0)
            .cast("bigint")
            .alias("desired_n"),
        )
        .withColumn(
            "cut",
            F.least(
                F.lit(_MIX_BUCKETS),
                F.floor(F.col("desired_n") * _MIX_BUCKETS * 1.0 / F.col("n_total")).cast(
                    "bigint"
                ),
            ),
        )
    )
    # cuts feeds BOTH the selection broadcast and the final audit join;
    # materialize the handful of rows once or the corpus-count scan runs
    # once per consumer (Catalyst does not dedupe the shared subplan)
    cuts = cuts.localCheckpoint(eager=True)
    sampled = (
        docs.select("doc_id", "lang", hash_bucket(F.col("doc_id"), _MIX_BUCKETS, "mix"))
        .join(F.broadcast(cuts.select("lang", "cut")), "lang")
        .filter(F.col("bucket") < F.col("cut"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        cuts.join(F.broadcast(sampled), "lang", "left")
        .select(
            "lang",
            "n_total",
            "desired_n",
            "cut",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


# --------------------------- per-domain cap ---------------------------

DOMAIN_CAP_N = 15
_CAP_SALTS = 8


@register(
    "domain_cap",
    driver=False,
    oracle=f"""
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
) WHERE rank <= {DOMAIN_CAP_N}
""",
)
def domain_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (C4/RefinedWeb-style): keep at most N best docs per
    source/domain, ranked by quality proxy (n_chars desc, doc_id
    tiebreak). The naive single window over `source` puts an entire
    mega-domain (at 100 TB: one domain can be >1 executor's memory) in
    one sort partition. So the top-N runs TWO-LEVEL: a salted local
    top-N first (each (source, salt) partition keeps <= N rows — bounded
    state), then the global top-N over the <= N*salts survivors per
    source. Result is identical to the single window (top-N of a union
    of per-salt top-Ns is the global top-N: any globally-top row is in
    its salt's top-N), which is what the oracle checks.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    salted = docs.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(_CAP_SALTS)))
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    w_local = Window.partitionBy("source", "salt").orderBy(*order)
    survivors = (
        salted.withColumn("lrank", F.row_number().over(w_local))
        .filter(F.col("lrank") <= DOMAIN_CAP_N)
        .drop("salt", "lrank")
    )
    w_global = Window.partitionBy("source").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w_global).cast("bigint"))
        .filter(F.col("rank") <= DOMAIN_CAP_N)
        .select("doc_id", "source", "n_chars", "rank")
    )


# --------------------------- inverted index ---------------------------

IDX_MIN_DF = 20
IDX_POSTINGS_K = 10


@register(
    "inverted_index",
    driver=False,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
per AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
         (list(doc_id ORDER BY doc_id))[1:{IDX_POSTINGS_K}] AS postings
  FROM per GROUP BY term
)
SELECT term, df, tf_total, postings FROM agg WHERE df >= {IDX_MIN_DF}
""",
)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (term -> document-frequency, total term
    frequency, capped posting list of the K smallest doc_ids) — the
    backbone of corpus inspection tooling ("which docs contain X?").

    Scale shape: explode -> ONE shuffle on (term, doc_id) for tf, then
    term-level stats and the capped postings both derive from that
    already-term-partitioned frame, so Catalyst reuses the exchange
    (no second corpus-wide shuffle). The posting cap is enforced with a
    row_number window BEFORE collect_list — per-term state is bounded at
    K rows even for stopword terms with billions of postings; an
    uncapped collect_list-then-slice would materialize the full posting
    list per term (OOM at scale). min_df prunes the hapax tail, which
    at 100 TB is the vast majority of distinct terms.
    """
    docs = read_table(spark, sf_dir, "documents")
    per = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    # stats AND capped postings in ONE pass over the term-ranked frame:
    # collect_list skips the nulls the rn<=K guard produces, so per-term
    # collected state is bounded at K while df/tf_total see every row —
    # and the final groupBy(term) reuses the window's hashpartitioning
    # (a separate stats-branch would re-aggregate the whole exploded
    # corpus; Catalyst does not dedupe the shared subplan)
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = per.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("tf_total"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= IDX_POSTINGS_K, F.col("doc_id"))
                )
            ).alias("postings"),
        )
        .filter(F.col("df") >= IDX_MIN_DF)
        .select("term", "df", "tf_total", "postings")
    )


# --------------------------- shard manifest ---------------------------

N_SHARDS_OUT = 32


@register(
    "shard_manifest",
    driver=False,
    oracle=f"""
WITH assigned AS (
  SELECT CAST({hash_bucket_sql("doc_id", N_SHARDS_OUT, "shard")} AS BIGINT) AS shard,
         doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens, length(text) AS n_chars
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM assigned GROUP BY shard
""",
)
def shard_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment + manifest: every doc maps to
    one of K output shards by a stable hash; the manifest records per-
    shard doc/token/char totals (what a data loader reads to plan
    epochs, and what proves the shards are balanced). The write itself
    is `df.repartition(K, shard).write` — this query is the audit.

    One partial-agg shuffle on K keys; the hash assignment is uniform by
    construction so there is no skew regardless of corpus distribution —
    unlike sharding by source or date, which inherits domain skew.
    """
    docs = read_table(spark, sf_dir, "documents")
    assigned = docs.select(
        hash_bucket(F.col("doc_id"), N_SHARDS_OUT, "shard").cast("bigint").alias("shard"),
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
