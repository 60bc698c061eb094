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
         (list(doc_id ORDER BY doc_id))[1:{IDX_POSTINGS_K}] AS postings_arr
  FROM per GROUP BY term
)
SELECT term, df, tf_total,
       array_to_string(list_transform(postings_arr, x -> CAST(x AS VARCHAR)), ',') AS postings
FROM agg WHERE df >= {IDX_MIN_DF}
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

    Postings are emitted as a comma-joined STRING, not array<bigint>:
    the correctness driver canonicalizes results through a pandas
    column sort, which cannot hash list cells (r04's one red row was
    exactly this — ``TypeError: unhashable type: 'list'``). The string
    form is also what an index manifest file would store.
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
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("rn") <= IDX_POSTINGS_K, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
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


# --------------------------- bigram LM scoring ---------------------------

LM_VOCAB_K = 500  # model pruned to the K most frequent tokens
_MICRO = 1000000


def _lm_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
uni AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS c1 FROM
    (SELECT unnest(toks) AS term FROM tok) t
  GROUP BY t.term
),
vocab AS (
  SELECT term, c1 FROM uni ORDER BY c1 DESC, term LIMIT {LM_VOCAB_K}
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM tok, unnest(generate_series(1, len(toks) - 1)) AS s(i)
  WHERE len(toks) >= 2
),
model AS (
  SELECT b.w1, b.w2, CAST(floor(count(*) * {_MICRO}.0 / any_value(v1.c1)) AS BIGINT) AS microprob
  FROM bg b JOIN vocab v1 ON b.w1 = v1.term JOIN vocab v2 ON b.w2 = v2.term
  GROUP BY b.w1, b.w2
),
scored AS (
  SELECT b.doc_id, count(*) AS n_scored, CAST(sum(m.microprob) AS BIGINT) AS sum_microprob
  FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
  GROUP BY b.doc_id
),
per_doc AS (
  SELECT doc_id, CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams FROM tok
)
SELECT p.doc_id, p.n_bigrams,
       CAST(coalesce(s.n_scored, 0) AS BIGINT) AS n_scored,
       CAST(CASE WHEN coalesce(s.n_scored, 0) > 0
                 THEN floor(s.sum_microprob * 1.0 / s.n_scored) ELSE 0 END AS BIGINT) AS mean_microprob
FROM per_doc p LEFT JOIN scored s ON p.doc_id = s.doc_id
"""


def _lm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram-LM scores (doc_id, n_bigrams, n_scored,
    mean_microprob) — the shared engine behind lm_score and
    perplexity_buckets."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    terms = tok.select(F.explode("toks").alias("term"))
    uni = terms.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vocab = uni.orderBy(F.col("c1").desc(), "term").limit(LM_VOCAB_K)
    bg = (
        tok.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    v1 = F.broadcast(vocab.select(F.col("term").alias("w1"), F.col("c1")))
    v2 = F.broadcast(vocab.select(F.col("term").alias("w2")))
    model = (
        bg.join(v1, "w1")
        .join(v2, "w2")
        .groupBy("w1", "w2")
        .agg(
            F.floor(F.count(F.lit(1)) * float(_MICRO) / F.any_value("c1"))
            .cast("bigint")
            .alias("microprob")
        )
    )
    scored = (
        bg.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("microprob").cast("bigint").alias("sum_microprob"),
        )
    )
    per_doc = tok.select(
        "doc_id",
        F.greatest(F.size("toks") - 1, F.lit(0)).cast("bigint").alias("n_bigrams"),
    )
    return per_doc.join(scored, "doc_id", "left").select(
        "doc_id",
        "n_bigrams",
        F.coalesce("n_scored", F.lit(0)).cast("bigint").alias("n_scored"),
        F.when(
            F.coalesce("n_scored", F.lit(0)) > 0,
            F.floor(F.col("sum_microprob") * 1.0 / F.col("n_scored")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mean_microprob"),
    )


@register("lm_score", driver=False, oracle=_lm_oracle())
def lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality scoring (the CCNet/KenLM-filter shape):
    train a bigram model on the corpus, score every document by its mean
    bigram conditional probability, flag low-scoring docs as gibberish/
    boilerplate candidates. The model is PRUNED to the top-K vocabulary —
    that is what makes it a broadcastable, fixed-size artifact at 100 TB
    (an unpruned bigram table is itself corpus-sized and would force a
    fact-to-fact shuffle join per scoring pass; CCNet ships a fixed LM
    for the same reason). OOV bigrams are simply unscored (n_scored vs
    n_bigrams exposes coverage).

    Parity note: scores are integer micro-probabilities
    (floor(1e6 * c(w1,w2)/c(w1))), not log-probs — JVM and DuckDB `ln`
    are not guaranteed to round identically at the ulp, and floored
    integer ratios are exact on both engines while ranking docs the
    same way for the filter's purpose."""
    return _lm_scored(spark, sf_dir)


# ------------------- perplexity bucketing (CCNet-style) -------------------


@register(
    "perplexity_buckets",
    oracle=f"""
WITH lm AS ({_lm_oracle()}),
thr AS (
  SELECT quantile_cont(mean_microprob, 0.25) AS p25,
         quantile_cont(mean_microprob, 0.75) AS p75
  FROM lm
)
SELECT doc_id, mean_microprob,
       CASE WHEN mean_microprob >= thr.p75 THEN 'head'
            WHEN mean_microprob >= thr.p25 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lm, thr
""",
)
def perplexity_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity partitioning: score every doc with the
    corpus bigram LM (lm_score), then split the corpus into head /
    middle / tail buckets at the p75/p25 score quantiles (higher mean
    bigram probability = more in-distribution = "head"). Downstream,
    the head trains, the middle is sampled, the tail is audited —
    the standard CCNet curriculum cut.

    Scale shape: the per-doc score table (doc_id + three bigints — ~1 %
    of corpus bytes, the CCNet artifact shape) is materialized ONCE
    (localCheckpoint) and feeds both passes; without it the full LM
    pipeline (two corpus-sized tokenize scans + the model shuffles) ran
    TWICE, once under the quantile agg and once under the labeling scan
    (r13 measurement: the un-pinned form re-executed ~6 s of upstream
    work). Pass 1 reduces the pinned scores to TWO scalar quantiles (at
    100 TB: percentile_approx — a mergeable t-digest — in place of the
    exact percentile; same plan shape); pass 2 labels against the
    broadcast thresholds. No global sort, no window: the naive ntile(3)
    formulation would sort the whole corpus through one partition.
    Quantiles 0.25/0.75 are exactly-representable binary fractions and
    both engines interpolate at rank (n-1)*p over exact integer scores,
    so the cut is reproducible cross-engine."""
    lm = _lm_scored(spark, sf_dir).localCheckpoint()
    thr = lm.agg(
        F.expr("percentile(mean_microprob, array(0.25, 0.75))").alias("q")
    ).select(F.col("q")[0].alias("p25"), F.col("q")[1].alias("p75"))
    return lm.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "mean_microprob",
        F.when(F.col("mean_microprob") >= F.col("p75"), F.lit("head"))
        .when(F.col("mean_microprob") >= F.col("p25"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# --------------------------- BM25 retrieval ---------------------------

BM25_TERMS = ("spark", "join", "window")
BM25_TOPK = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         sum(dl) * 1.0 / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok) u
  WHERE term IN ({terms})
  GROUP BY doc_id, term
),
docfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(floor(1000000.0
              * ((2 * s.n_docs - 2 * f.df + 1.0) / (2 * f.df + 1.0))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS BIGINT)
           AS term_score
  FROM tf
  JOIN docfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
),
total AS (
  SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_micro
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score_micro FROM total
ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOPK}
"""


@register("bm25_topk", oracle=_bm25_oracle())
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (k1=1.2, b=0.75) for a fixed query-term set
    over the corpus — the inspection/eval-retrieval companion to
    inverted_index ("show me the strongest docs for these terms").

    Scale shape: the corpus-wide work is two narrow passes — per-doc
    lengths (a projection) and the term-filtered explode (the IN-list
    filter runs BEFORE any shuffle, so only postings of the query terms
    ever leave the scan). df and the corpus stats are tiny aggregates
    broadcast to the scorer; the final top-k is orderBy().limit() =
    TakeOrderedAndProject (per-partition heaps + driver merge of
    k*partitions rows), never a global sort. Scores are integer
    micro-BM25: the idf ratio ((N-df+0.5)/(df+0.5)) is computed as the
    exact integer rational (2N-2df+1)/(2df+1) so the floored score is
    bit-identical cross-engine (same reason lm_score avoids ln)."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    dl = tok.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                1000000.0
                * ((2 * F.col("n_docs") - 2 * F.col("df") + 1.0) / (2 * F.col("df") + 1.0))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
            )
            .cast("bigint")
            .alias("term_score"),
        )
    )
    total = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("bigint").alias("score_micro")
    )
    return total.orderBy(F.col("score_micro").desc(), "doc_id").limit(BM25_TOPK)


# ------------------- hashed linear quality classifier -------------------

QW_BUCKETS = 4096  # hashed feature space (fastText-style)
QW_MULT = 2654435761  # Knuth multiplicative constant: bucket -> weight
QW_MOD = 2001  # weights land in [-1000, 1000] micro-units


def _classifier_oracle() -> str:
    w = f"((({hash_bucket_sql('x', QW_BUCKETS, 'qw')}) * {QW_MULT}) % {QW_MOD}) - 1000"
    return f"""
WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(toks) > 0
              THEN floor(list_sum(list_transform(toks, x -> {w})) * 1000000.0 / len(toks))
              ELSE 0 END AS BIGINT) AS score_micro
  FROM tk
)
SELECT doc_id, n_tokens, score_micro, score_micro >= 0 AS keep FROM s
"""


@register("classifier_score", oracle=_classifier_oracle())
def classifier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring (the fastText-filter shape used
    by GPT-3/LLaMA-style web curation): each token hashes into a fixed
    feature space, a deterministic weight table maps bucket -> integer
    weight, and the doc score is the mean token weight; keep = score>=0.
    Here the "trained" weight table is a pure hash of the bucket id (a
    stand-in for real learned weights, which would arrive as a 4096-entry
    broadcast map — same plan either way).

    Scale shape: the entire operator is ONE narrow projection — the
    token transform, weight lookup, and mean run inside
    transform()/aggregate() higher-order expressions per row, JVM-side,
    with NO explode, NO shuffle, and no Python. This is the cheapest
    possible formulation of per-doc model scoring: at 100 TB it is
    exactly one scan. Integer weights keep the floored mean
    bit-identical cross-engine."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def w(t):
        return (hash_bucket(t, QW_BUCKETS, "qw") * QW_MULT) % QW_MOD - 1000

    sum_w = F.aggregate(
        F.transform(toks, w), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    n = F.size(toks)
    score = (
        F.when(n > 0, F.floor(sum_w * 1000000.0 / n))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        score.alias("score_micro"),
        (score >= 0).alias("keep"),
    )


# --------------------------- document chunking ---------------------------

CHUNK_CHARS = 400
CHUNK_STRIDE = 300  # 100-char overlap between consecutive chunks


@register(
    "doc_chunks",
    driver=False,
    oracle=f"""
WITH n AS (
  SELECT doc_id, text, length(text) AS n_chars,
         CAST(floor((greatest(length(text), 1) - 1) / {CHUNK_STRIDE}) AS BIGINT) + 1 AS n_chunks
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {CHUNK_STRIDE} AS BIGINT) AS start,
       CAST(length(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})) AS BIGINT) AS chunk_len,
       md5(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})) AS chunk_hash
FROM n, unnest(generate_series(0, n_chunks - 1)) AS s(i)
""",
)
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width document chunking (the RAG-indexing /
    long-doc-training split): every doc explodes into ceil stride-spaced
    windows with {CHUNK_CHARS - CHUNK_STRIDE}-char overlap. A pure
    narrow transform — sequence+posexplode+substring ride the scan with
    zero shuffles at any corpus size; output rows ~= corpus_chars /
    stride. Chunk text travels as md5 in this audit query (the real
    writer emits the substring itself identically)."""
    docs = read_table(spark, sf_dir, "documents")
    n_chunks = (
        F.floor((F.greatest(F.length("text"), F.lit(1)) - 1) / CHUNK_STRIDE).cast(
            "bigint"
        )
        + 1
    )
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.substring(
        F.col("text"), (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("int"), CHUNK_CHARS
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * CHUNK_STRIDE).cast("bigint").alias("start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
    )


# --------------------------- column profiling ---------------------------


@register(
    "table_profile",
    driver=False,
    oracle="""
WITH s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(o_totalprice) AS BIGINT) AS price_nonnull,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
         CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS price_min_cents,
         CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS price_max_cents,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_sum_cents,
         min(o_orderdate) AS orderdate_min, max(o_orderdate) AS orderdate_max
  FROM orders
)
SELECT * FROM s
""",
)
def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (the dbt/Deequ `profile` shape): row
    count, per-column null counts, distinct cardinalities, ranges, and
    integer-cents sums, all fused into a SINGLE aggregate — one scan,
    one partial-agg reduce, no matter how many stats ride along. The
    distinct counts are exact here (count(DISTINCT ..) expands to one
    extra Expand pass inside the same agg); at 100 TB swap in
    approx_count_distinct (HLL) per column — same single-scan shape,
    constant memory — which the cross-check test pins against the exact
    values at fixture scale."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("o_totalprice").cast("bigint").alias("price_nonnull"),
        F.countDistinct("o_custkey").cast("bigint").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("status_distinct"),
        F.floor(F.min("o_totalprice") * 100).cast("bigint").alias("price_min_cents"),
        F.floor(F.max("o_totalprice") * 100).cast("bigint").alias("price_max_cents"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("price_sum_cents"),
        F.min("o_orderdate").alias("orderdate_min"),
        F.max("o_orderdate").alias("orderdate_max"),
    )


# ------------------- mergeable-sketch cardinality -------------------

HLL_SHARDS = 8


@register(
    "hll_shard_merge",
    oracle="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       TRUE AS hll_within_5pct
FROM events
""",
)
def hll_shard_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch cardinality, the 100 TB distinct-count pattern:
    each shard builds an HLL sketch of its users (hll_sketch_agg, a
    map-side-combinable partial), the tiny binary sketches are unioned
    (hll_union_agg) and estimated — a two-level tree aggregation whose
    cross-shard traffic is KB of sketch state instead of the key stream
    that exact countDistinct's Expand pass shuffles. The estimate is
    deterministic for fixed input (Datasketches is seedless-stable), so
    the published check — estimate within 5% of exact — is a stable fact
    the oracle pins as a literal; the exact count rides along and is
    value-checked against DuckDB. Swap-in guidance for the profile
    operator lives in table_profile's docstring; this is the mechanism.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id")
    shards = ev.withColumn(
        "shard", F.pmod(F.xxhash64("user_id"), F.lit(HLL_SHARDS)).cast("int")
    )
    partials = shards.groupBy("shard").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("shard_exact"),
    )
    merged = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("shard_exact").alias("n_users_exact"),  # shards partition users: sum = global
    )
    return merged.select(
        F.col("n_users_exact").cast("bigint").alias("n_users_exact"),
        (
            F.abs(F.col("est") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("hll_within_5pct"),
    )


# ----------------------- screening funnel report -----------------------

_FUNNEL_MIN_CHARS = 60
_FUNNEL_MIN_TOKS = 12
_FUNNEL_MAX_REP = 700  # max repeated-bigram share, in milli-units
_EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def _funnel_oracle() -> str:
    return f"""
WITH t AS (
  SELECT text, n_chars, {_SQL_TOKS} AS toks FROM documents
),
g AS (
  SELECT text, n_chars, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bigrams
  FROM t
),
base AS (
  SELECT n_chars >= {_FUNNEL_MIN_CHARS} AS p_len,
         len(toks) >= {_FUNNEL_MIN_TOKS} AS p_tok,
         (CASE WHEN len(bigrams) > 0
               THEN CAST(floor(1000.0 * (1.0 -
                      len(list_distinct(bigrams)) * 1.0 / len(bigrams))) AS BIGINT)
               ELSE 1000 END) <= {_FUNNEL_MAX_REP} AS p_rep,
         NOT regexp_matches(text, '{_EMAIL_RX}') AS p_pii
  FROM g
),
agg AS (
  SELECT count(*) AS n0,
         sum(CASE WHEN p_len THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN p_len AND p_tok THEN 1 ELSE 0 END) AS n2,
         sum(CASE WHEN p_len AND p_tok AND p_rep THEN 1 ELSE 0 END) AS n3,
         sum(CASE WHEN p_len AND p_tok AND p_rep AND p_pii THEN 1 ELSE 0 END) AS n4
  FROM base
)
SELECT * FROM (
  SELECT 1 AS stage, 'min_length' AS screen, CAST(n0 AS BIGINT) AS n_in,
         CAST(n1 AS BIGINT) AS n_out FROM agg
  UNION ALL SELECT 2, 'min_tokens', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT) FROM agg
  UNION ALL SELECT 3, 'repetition', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT) FROM agg
  UNION ALL SELECT 4, 'pii_email', CAST(n3 AS BIGINT), CAST(n4 AS BIGINT) FROM agg
)
"""


@register("filter_funnel", driver=False, oracle=_funnel_oracle())
def filter_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Screening-funnel report: the dataset-card artifact every corpus
    release publishes — how many documents each screen (length, token
    floor, repetition, PII) rejects, cumulatively staged in filter order.
    All four predicates are narrow JVM expressions evaluated in ONE scan
    and reduced in ONE partial-aggregate row; the per-stage rows are
    unpivoted from that single row with stack(), so the plan reads the
    100 TB corpus exactly once, no matter how many screens ride along.
    Predicate parity with the standalone screens: length/token floors
    (token_stats), repeated-bigram share (repetition_ratio), email
    pattern (pii_scan)."""
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(
        "text", "n_chars", _tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep_milli = F.when(
        F.size(toks) >= 2,
        F.floor(
            1000.0
            * (
                1.0
                - F.size(F.array_distinct(bigrams)).cast("double")
                / (F.size(toks) - 1)
            )
        ).cast("bigint"),
    ).otherwise(F.lit(1000))
    flags = toked.select(
        (F.col("n_chars") >= _FUNNEL_MIN_CHARS).alias("p_len"),
        (F.size(toks) >= _FUNNEL_MIN_TOKS).alias("p_tok"),
        (rep_milli <= _FUNNEL_MAX_REP).alias("p_rep"),
        (~F.col("text").rlike(_EMAIL_RX)).alias("p_pii"),
    )
    one = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("p_len"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("p_len") & F.col("p_tok"), 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(F.col("p_len") & F.col("p_tok") & F.col("p_rep"), 1).otherwise(0)
        ).alias("n3"),
        F.sum(
            F.when(
                F.col("p_len") & F.col("p_tok") & F.col("p_rep") & F.col("p_pii"), 1
            ).otherwise(0)
        ).alias("n4"),
    )
    return one.select(
        F.expr(
            "stack(4, "
            "1, 'min_length', n0, n1, "
            "2, 'min_tokens', n1, n2, "
            "3, 'repetition', n2, n3, "
            "4, 'pii_email', n3, n4) AS (stage, screen, n_in, n_out)"
        )
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "screen",
        F.col("n_in").cast("bigint").alias("n_in"),
        F.col("n_out").cast("bigint").alias("n_out"),
    )


# ----------------------- vocabulary OOV coverage -----------------------

VOCAB_K = 100


@register(
    "vocab_oov_rate",
    driver=False,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
cnt AS (
  SELECT term, count(*) AS n FROM tok GROUP BY term
),
vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM cnt
  ) WHERE rnk <= {VOCAB_K}
),
vlist AS (SELECT list(term) AS v FROM vocab),
per_doc AS (
  SELECT d.doc_id,
         {_SQL_TOKS} AS toks,
         len({_SQL_TOKS}) AS n_tokens
  FROM documents d
)
SELECT p.doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, t -> NOT list_contains(vl.v, t))) AS BIGINT) AS n_oov,
       CASE WHEN n_tokens > 0
            THEN floor(len(list_filter(toks, t -> NOT list_contains(vl.v, t)))
                       * 1000000.0 / n_tokens) / 1000000
            ELSE 0.0 END AS oov_rate
FROM per_doc p, vlist vl
""",
)
def vocab_oov_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-K unigram vocabulary — the tokenizer-planning metric (how much
    of each doc a K-entry vocab covers). Two-phase, both scale-shaped:
    (1) the vocab is ONE (term) count agg + orderBy(n desc, term).limit(K),
    which compiles to TakeOrderedAndProject: every partition keeps a
    local K-row heap and the driver merges heaps, so NO task ever sorts
    the whole dictionary (the round-2 row_number()-over-unpartitioned-
    window form pushed every distinct term through one task — 10^8-10^9
    rows at web-corpus scale; the limit form is result-identical,
    tie-break count-desc/term-asc included); (2) the K-entry vocab array
    is broadcast as a one-row literal relation and each doc's tokens are
    screened with array expressions riding the scan — no token-level
    join, no second corpus shuffle. K=100 here, where the O(K)
    array_contains screen per token is fine; at a real 50k vocab the
    membership structure must be O(1) per token — that variant is
    vocab_oov_rate_large below.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = cnt.orderBy(F.col("n").desc(), F.col("term")).limit(VOCAB_K).select("term")
    vlist = vocab.agg(F.collect_list("term").alias("v"))  # one row, K terms

    per_doc = docs.select(
        "doc_id",
        _tokens(F.col("text")).alias("toks"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    joined = per_doc.crossJoin(F.broadcast(vlist))
    n_oov = F.size(
        F.filter(F.col("toks"), lambda t: ~F.array_contains(F.col("v"), t))
    ).cast("bigint")
    return joined.select(
        "doc_id",
        "n_tokens",
        n_oov.alias("n_oov"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(n_oov * 1000000.0 / F.col("n_tokens")) / 1000000,
        )
        .otherwise(F.lit(0.0))
        .alias("oov_rate"),
    )


VOCAB_K_LARGE = 2000  # stands in for the ~50k production vocab; >> VOCAB_K


@register(
    "vocab_oov_rate_large",
    driver=False,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
cnt AS (
  SELECT term, count(*) AS n FROM tok GROUP BY term
),
vocab AS (
  SELECT term FROM cnt ORDER BY n DESC, term LIMIT {VOCAB_K_LARGE}
),
probe AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (term)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_oov, 0) AS n_oov,
       CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN floor(p.n_oov * 1000000.0 / p.n_tokens) / 1000000
            ELSE 0.0 END AS oov_rate
FROM documents d LEFT JOIN probe p USING (doc_id)
""",
)
def vocab_oov_rate_large_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab-scale OOV rate: same metric as vocab_oov_rate but built for
    a REAL vocabulary size (50k+), where the per-token O(K)
    array_contains screen is the wrong data structure. The membership
    test becomes a broadcast HASH join: tokens are exploded once, probed
    against the broadcast K-row vocab with O(1) JVM hash lookups, and
    re-aggregated per doc. The only shuffle is the per-doc count
    aggregation, and partial aggregation collapses it to ~one row per
    (partition, doc) before the exchange — token rows themselves never
    shuffle (the broadcast join and the partial agg both ride the scan).
    The vocab build is the same TakeOrderedAndProject top-K as
    vocab_oov_rate. K=2000 here (the sf-test dictionary is small);
    the plan is K-independent — a 50k vocab broadcast is ~1 MB.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode_outer(_tokens(F.col("text"))).alias("term"))
    cnt = (
        tok.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = (
        cnt.orderBy(F.col("n").desc(), F.col("term"))
        .limit(VOCAB_K_LARGE)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "term", "left")
    per_doc = probed.groupBy("doc_id").agg(
        F.count("term").cast("bigint").alias("n_tokens"),
        F.sum(
            F.when(F.col("term").isNotNull() & F.col("_in_vocab").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_oov"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("n_oov") * 1000000.0 / F.col("n_tokens")) / 1000000,
        )
        .otherwise(F.lit(0.0))
        .alias("oov_rate"),
    )


# --------------------- mergeable top-k frequency sketch ---------------------

TOPK_SKETCH_K = 5
_TOPK_SKETCH_PROBE = 20
_TOPK_SKETCH_CAP = 10000  # items tracked per shard sketch
_TOPK_SHARDS = 32


@register(
    "topk_sketch_merge",
    # r3 rotation: the sketch-merge mechanism keeps two driver entries
    # (hll_shard_merge, quantile_sketch_merge); the frequent-items twin
    # stays parity- and plan-checked locally
    driver=False,
    oracle=f"""
WITH toks AS (
  SELECT unnest({_SQL_TOKS}) AS term FROM documents
),
cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY term)
SELECT term, n, TRUE AS sketch_agrees
FROM cnt ORDER BY n DESC, term LIMIT {TOPK_SKETCH_K}
""",
)
def topk_sketch_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters: per-shard approx_top_k_accumulate
    sketches over the token stream, approx_top_k_combine across shards,
    estimate — the frequent-items twin of hll_shard_merge. At 100 TB the
    cross-shard traffic is KB of sketch state per shard instead of the
    full (term, count) key stream an exact global top-k shuffles; the
    sketch is the standard first pass that prunes the candidate set
    before any exact confirmation.

    Correctness contract (what the oracle pins): terms are sharded BY
    TERM, so each term's whole count lands in one sketch; with sketch
    capacity >> the fixture's distinct-term count the estimates are
    exact, and the top-{{k}} by exact count (ties broken by term) must
    appear in the merged estimate with IDENTICAL counts —
    sketch_agrees=TRUE rides the row like hll_within_5pct. The exact
    top-k side uses TakeOrderedAndProject, never a global sort."""
    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    shards = terms.withColumn(
        "shard", F.pmod(F.xxhash64("term"), F.lit(_TOPK_SHARDS)).cast("int")
    )
    partials = shards.groupBy("shard").agg(
        F.expr(f"approx_top_k_accumulate(term, {_TOPK_SKETCH_CAP})").alias("sk")
    )
    est_pairs = (
        partials.agg(
            F.expr(
                f"approx_top_k_estimate(approx_top_k_combine(sk), {_TOPK_SKETCH_PROBE})"
            ).alias("est")
        )
        .select(F.explode("est").alias("e"))
        .select(
            F.col("e.item").alias("term"),
            F.col("e.count").cast("bigint").alias("est_n"),
        )
    )
    exact = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(TOPK_SKETCH_K)
    )
    return exact.join(F.broadcast(est_pairs), "term", "left").select(
        "term",
        "n",
        (F.coalesce("est_n", F.lit(-1)) == F.col("n")).alias("sketch_agrees"),
    )


# ------------------- mergeable-sketch quantiles -------------------

Q_SHARDS = 16
Q_BIN_CENTS = 500_000  # $5,000 histogram bin


@register(
    "quantile_sketch_merge",
    oracle=f"""
WITH p AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
hist AS (
  SELECT cents // {Q_BIN_CENTS} AS bin, count(*) AS cnt FROM p GROUP BY bin
),
nn AS (SELECT count(*) AS n FROM p),
cum AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c FROM hist
)
SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_rows,
       CAST((SELECT min(bin) * {Q_BIN_CENTS} FROM cum
             WHERE c >= (SELECT (n + 1) // 2 FROM nn)) AS BIGINT) AS est_p50_cents,
       CAST((SELECT min(bin) * {Q_BIN_CENTS} FROM cum
             WHERE c >= (SELECT (9 * n + 9) // 10 FROM nn)) AS BIGINT) AS est_p90_cents,
       CAST((SELECT min(bin) * {Q_BIN_CENTS} FROM cum
             WHERE c >= (SELECT (99 * n + 99) // 100 FROM nn)) AS BIGINT) AS est_p99_cents,
       TRUE AS p50_within_bin, TRUE AS p90_within_bin, TRUE AS p99_within_bin
""",
)
def quantile_sketch_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch QUANTILES — the distribution twin of
    hll_shard_merge (cardinality) and topk_sketch_merge (heavy hitters):
    each shard summarizes its values into a fixed-width histogram (the
    simplest mergeable quantile sketch — deterministic, unlike t-digest),
    the per-shard histograms merge by bin addition, and quantiles read
    off the cumulative merged histogram at the ceil(qN) rank.

    Scale shape: the fact scan reduces to (shard x bin) partial counts
    with map-side combine; cross-shard traffic is the histogram — KB per
    shard, independent of row count. The cumulative walk runs on the
    ~120-row merged histogram (sketch-sized, constant in the data), so
    its window sort is free. The exact-percentile comparison pins the
    sketch's error contract: each estimate (bin lower edge) must sit
    within one bin width of the true quantile — published as booleans
    the oracle pins as literals (the hll_within_5pct pattern)."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.pmod(F.xxhash64("o_orderkey"), F.lit(Q_SHARDS)).cast("int").alias("shard"),
    )
    # stage 1: per-shard histograms (the "sketches")
    shard_hist = orders.groupBy(
        "shard", (F.col("cents") / F.lit(Q_BIN_CENTS)).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # stage 2: merge sketches = add bins across shards
    hist = shard_hist.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("c", F.sum("cnt").over(w))
    totals = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(cents, array(0.5, 0.9, 0.99))").alias("exact"),
    )
    est = cum.crossJoin(F.broadcast(totals)).agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.min(
            F.when(
                F.col("c") >= (F.col("n") / 2).cast("bigint") + F.col("n") % 2,
                F.col("bin") * Q_BIN_CENTS,
            )
        )
        .cast("bigint")
        .alias("est_p50_cents"),
        F.min(
            F.when(
                F.col("c") >= ((9 * F.col("n") + 9) / 10).cast("bigint"),
                F.col("bin") * Q_BIN_CENTS,
            )
        )
        .cast("bigint")
        .alias("est_p90_cents"),
        F.min(
            F.when(
                F.col("c") >= ((99 * F.col("n") + 99) / 100).cast("bigint"),
                F.col("bin") * Q_BIN_CENTS,
            )
        )
        .cast("bigint")
        .alias("est_p99_cents"),
        F.first("exact").alias("exact"),
    )
    return est.select(
        "n_rows",
        "est_p50_cents",
        "est_p90_cents",
        "est_p99_cents",
        (F.abs(F.col("est_p50_cents") - F.col("exact")[0]) <= Q_BIN_CENTS).alias(
            "p50_within_bin"
        ),
        (F.abs(F.col("est_p90_cents") - F.col("exact")[1]) <= Q_BIN_CENTS).alias(
            "p90_within_bin"
        ),
        (F.abs(F.col("est_p99_cents") - F.col("exact")[2]) <= Q_BIN_CENTS).alias(
            "p99_within_bin"
        ),
    )


# ------------------- BPE pair-frequency (one merge step) -------------------

BPE_TOPK = 10


@register(
    "bpe_merge_step",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT token, count(*) AS freq FROM tok
  WHERE len(token) >= 2 GROUP BY token
),
pairs AS (
  SELECT substr(token, unnest(range(1, len(token))), 2) AS pair, freq
  FROM tf
),
pf AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq FROM pairs GROUP BY pair
)
SELECT pair, pair_freq FROM pf ORDER BY pair_freq DESC, pair LIMIT {BPE_TOPK}
""",
)
def bpe_merge_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One merge step of byte-pair-encoding TOKENIZER TRAINING (Sennrich
    et al. 2016): count every adjacent symbol pair across the corpus,
    weighted by word frequency, and surface the top merge candidates.
    This is the inner loop a corpus-scale BPE trainer runs ~50k times —
    the operator that must be cheap at 100 TB.

    Scale shape, the trick that makes corpus-scale BPE feasible: pair
    counting runs over the DISTINCT-WORD table (vocabulary-sized, Heaps'
    law sublinear) weighted by word frequency — never over the raw token
    stream. The plan is: one shuffle to build word frequencies (map-side
    combined), a narrow explode of per-word positions
    (explode(sequence) — same generator shape as gapfill), one
    vocabulary-keyed aggregation of pair counts, and a
    TakeOrderedAndProject top-K. Zero Python; every expression
    whole-stage-codegens."""
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") >= 2)
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    pairs = tf.select(
        F.explode(F.sequence(F.lit(1), F.length("token") - 1)).alias("i"),
        "token",
        "freq",
    ).select(F.expr("substring(token, i, 2)").alias("pair"), "freq")
    pf = pairs.groupBy("pair").agg(F.sum("freq").cast("bigint").alias("pair_freq"))
    return pf.orderBy(F.desc("pair_freq"), "pair").limit(BPE_TOPK)


# ------------------- BPE training loop (T unrolled merges) -------------------

BPE_TRAIN_ROUNDS = 3
_BPE_SEP = "\x1f"  # unit separator: absent from corpus text by construction


def _bpe_merge_rounds(
    wrapped: DataFrame, rounds: int, carry_cols: list[str]
) -> tuple[DataFrame, list[DataFrame]]:
    """The greedy BPE merge loop shared by bpe_train (reports the
    trajectory) and bpe_encode (uses the final merged vocab) — one
    implementation so the trained merge table and the reported one can
    never drift. ``wrapped`` is the U+001F-wrapped distinct-word table
    with a ``freq`` weight plus ``carry_cols`` riding along; returns the
    final table and one lazy 1-row record per round
    (round, merge_pair, pair_freq, n_symbol_types).

    Per round: vocab-keyed pair aggregation (map-side combined), 1-row
    argmax (TakeOrderedAndProject), broadcast of that scalar onto the
    vocab table, codegen'd replace, localCheckpoint so round r+1 doesn't
    recompute rounds 1..r. Tie-break (freq desc, pair asc) is binary
    string order in both engines."""
    sep2 = _BPE_SEP + _BPE_SEP
    syms_of = F.split(F.expr("substring(wrapped, 2, length(wrapped) - 2)"), sep2)
    records = []
    for r in range(1, rounds + 1):
        pairs = (
            wrapped.select(syms_of.alias("syms"), "freq")
            # fully-merged single-symbol words emit no pairs; unlike
            # DuckDB's empty range(1,1), Spark's sequence(1, 0) is a
            # DESCENDING sequence, so the guard is load-bearing
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
                "syms",
                "freq",
            )
            .select(
                F.concat(
                    F.element_at("syms", F.col("i")),
                    F.lit(_BPE_SEP),
                    F.element_at("syms", F.col("i") + 1),
                ).alias("pair"),
                "freq",
            )
        )
        best_rows = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), "pair")
            .take(1)  # 1-row argmax: TakeOrderedAndProject, bounded collect
        )
        if not best_rows:
            # Fully merged (or degenerate) corpus: no adjacent pairs
            # remain before `rounds` rounds. The pure-Python BPE
            # reference breaks out of its merge loop here; continuing
            # would fold an empty argmax into the vocab and silently
            # empty it. Records end at the rounds actually executed.
            break
        pair = best_rows[0]["pair"]
        pair_freq = int(best_rows[0]["pair_freq"])
        # The argmax scalar is in hand, so the merge rewrite folds it as
        # a literal (codegen'd constant replace) instead of a broadcast
        # crossJoin — one less exchange per round.
        wrapped = (
            wrapped.select(
                F.replace(
                    F.col("wrapped"),
                    F.lit(_BPE_SEP + pair.replace(_BPE_SEP, sep2) + _BPE_SEP),
                    F.lit(_BPE_SEP + pair.replace(_BPE_SEP, "") + _BPE_SEP),
                ).alias("wrapped"),
                *carry_cols,
                F.lit(pair).alias("pair"),
                F.lit(pair_freq).cast("bigint").alias("pair_freq"),
            )
            .localCheckpoint()
        )
        n_syms = wrapped.select(F.explode(syms_of).alias("sym")).agg(
            F.count_distinct("sym").cast("bigint").alias("n_symbol_types")
        )
        records.append(
            wrapped.select("pair", "pair_freq")
            .limit(1)
            .crossJoin(n_syms)
            .select(
                F.lit(r).cast("int").alias("round"),
                F.replace(F.col("pair"), F.lit(_BPE_SEP), F.lit("+")).alias(
                    "merge_pair"
                ),
                F.col("pair_freq"),
                "n_symbol_types",
            )
        )
        wrapped = wrapped.select("wrapped", *carry_cols)
    return wrapped, records


def _bpe_wrapped_vocab(spark: SparkSession, sf_dir: str, extra: list[str]) -> DataFrame:
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token").rlike("^[a-z]{2,}$"))
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return tf.select(
        *extra,
        F.regexp_replace("token", "(.)", f"{_BPE_SEP}$1{_BPE_SEP}").alias("wrapped"),
        "freq",
    ).localCheckpoint()


@register(
    "bpe_train",
    oracle=rf"""
WITH tf0 AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE regexp_matches(token, '^[a-z]{{2,}}$') GROUP BY token
),
w0 AS (SELECT regexp_replace(token, '(.)', chr(31)||'\1'||chr(31), 'g') AS wrapped,
              freq FROM tf0),
p0 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w0),
       unnest(range(1, len(syms))) AS t(i)
),
b0 AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq FROM p0 GROUP BY pair
       ORDER BY pair_freq DESC, pair LIMIT 1),
w1 AS (SELECT replace(wrapped, chr(31)||replace(b0.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b0.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w0, b0),
n1 AS (SELECT CAST(count(DISTINCT sym) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(substr(wrapped, 2, len(wrapped)-2),
                                   chr(31)||chr(31))) AS sym FROM w1)),
p1 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w1),
       unnest(range(1, len(syms))) AS t(i)
),
b1 AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq FROM p1 GROUP BY pair
       ORDER BY pair_freq DESC, pair LIMIT 1),
w2 AS (SELECT replace(wrapped, chr(31)||replace(b1.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b1.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w1, b1),
n2 AS (SELECT CAST(count(DISTINCT sym) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(substr(wrapped, 2, len(wrapped)-2),
                                   chr(31)||chr(31))) AS sym FROM w2)),
p2 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w2),
       unnest(range(1, len(syms))) AS t(i)
),
b2 AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq FROM p2 GROUP BY pair
       ORDER BY pair_freq DESC, pair LIMIT 1),
w3 AS (SELECT replace(wrapped, chr(31)||replace(b2.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b2.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w2, b2),
n3 AS (SELECT CAST(count(DISTINCT sym) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(substr(wrapped, 2, len(wrapped)-2),
                                   chr(31)||chr(31))) AS sym FROM w3))
SELECT * FROM (
  SELECT CAST(1 AS INT) AS round, replace(b0.pair, chr(31), '+') AS merge_pair,
         b0.pair_freq AS pair_freq, n1.n AS n_symbol_types FROM b0, n1
  UNION ALL
  SELECT CAST(2 AS INT), replace(b1.pair, chr(31), '+'), b1.pair_freq, n2.n FROM b1, n2
  UNION ALL
  SELECT CAST(3 AS INT), replace(b2.pair, chr(31), '+'), b2.pair_freq, n3.n FROM b2, n3
) ORDER BY round
""",
)
def bpe_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE TRAINING LOOP (Sennrich et al. 2016), not just one
    pair count: BPE_TRAIN_ROUNDS=3 greedy merge rounds, each picking the
    most frequent adjacent symbol pair and REWRITING every word's symbol
    sequence before the next count — the part bpe_merge_step stops short
    of. Returns one row per round: the merge chosen, its frequency, and
    the symbol-type count after applying it (pins that the rewrite
    actually happened, not just the argmax).

    Representation trick shared with the oracle: a word's symbol
    sequence is one string with every symbol wrapped in U+001F
    (``\\x1fs1\\x1f\\x1fs2\\x1f...``). Merging pair (p1,p2) is then a
    plain left-to-right ``replace`` of ``\\x1f p1 \\x1f\\x1f p2 \\x1f``
    with ``\\x1f p1p2 \\x1f`` — string replace scans left-to-right
    non-overlapping, which IS greedy BPE merge order, and the wrapping
    makes a mid-symbol false match impossible (no U+001F inside a
    symbol). Both engines share these semantics exactly, so the merge
    trajectory is bit-identical cross-engine.

    Scale shape: every round runs over the DISTINCT-WORD table weighted
    by frequency (vocabulary-sized, Heaps'-law sublinear — never the
    token stream), exactly like production BPE trainers. Per round: one
    vocab-keyed pair aggregation (map-side combined), a 1-row argmax
    (TakeOrderedAndProject), broadcast of that scalar onto the vocab
    table, and a codegen'd replace. localCheckpoint pins each round's
    rewritten vocab so round r+1's plan doesn't recompute rounds 1..r
    (the IVM convention); the checkpointed table is vocabulary-sized.
    At 100 TB the only data-sized work is the ONE initial word-frequency
    shuffle; all 3 (or, in production, 50k) rounds after it are
    vocab-sized. Tie-break: (freq desc, pair asc) — binary string order
    in both engines."""
    wrapped = _bpe_wrapped_vocab(spark, sf_dir, extra=[])
    _, rounds = _bpe_merge_rounds(wrapped, BPE_TRAIN_ROUNDS, carry_cols=["freq"])
    from functools import reduce

    return reduce(DataFrame.unionByName, rounds).orderBy("round")


@register(
    "bpe_encode",
    oracle=rf"""
WITH tf0 AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE regexp_matches(token, '^[a-z]{{2,}}$') GROUP BY token
),
w0 AS (SELECT token, regexp_replace(token, '(.)', chr(31)||'\1'||chr(31), 'g') AS wrapped,
              freq FROM tf0),
p0 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w0),
       unnest(range(1, len(syms))) AS t(i)
),
b0 AS (SELECT pair FROM p0 GROUP BY pair ORDER BY sum(freq) DESC, pair LIMIT 1),
w1 AS (SELECT token, replace(wrapped, chr(31)||replace(b0.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b0.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w0, b0),
p1 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w1),
       unnest(range(1, len(syms))) AS t(i)
),
b1 AS (SELECT pair FROM p1 GROUP BY pair ORDER BY sum(freq) DESC, pair LIMIT 1),
w2 AS (SELECT token, replace(wrapped, chr(31)||replace(b1.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b1.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w1, b1),
p2 AS (
  SELECT syms[i] || chr(31) || syms[i+1] AS pair, freq
  FROM (SELECT freq, string_split(substr(wrapped, 2, len(wrapped)-2),
                                  chr(31)||chr(31)) AS syms FROM w2),
       unnest(range(1, len(syms))) AS t(i)
),
b2 AS (SELECT pair FROM p2 GROUP BY pair ORDER BY sum(freq) DESC, pair LIMIT 1),
w3 AS (SELECT token, replace(wrapped, chr(31)||replace(b2.pair, chr(31), chr(31)||chr(31))||chr(31),
                      chr(31)||replace(b2.pair, chr(31), '')||chr(31)) AS wrapped, freq
       FROM w2, b2),
vocab AS (SELECT token,
                 CAST(len(string_split(substr(wrapped, 2, len(wrapped)-2),
                                       chr(31)||chr(31))) AS BIGINT) AS n_syms
          FROM w3),
doc_tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT d.doc_id,
       CAST(count(v.token) AS BIGINT) AS n_words,
       CAST(coalesce(sum(v.n_syms), 0) AS BIGINT) AS n_bpe_tokens
FROM doc_tok d LEFT JOIN vocab v USING (token)
GROUP BY d.doc_id
""",
)
def bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of BPE: train the 3-round merge table (same greedy
    trajectory as bpe_train), then ENCODE the corpus — per document, the
    word count that passed the vocab filter and the total BPE token count
    after the learned merges. The train/apply split mirrors production
    tokenization: training touches only the distinct-word table; encoding
    never re-runs merges per occurrence, it joins each document's words
    against the already-merged vocabulary (token -> symbol count).

    Scale shape: the vocab (Heaps'-law sublinear, with per-word symbol
    counts precomputed) broadcasts; encoding is one scan of the token
    stream with a broadcast hash join and a doc_id-keyed count — the only
    data-sized shuffle. This is how a 100 TB corpus gets tokenized: the
    merge table is KBs, the corpus streams through map-side."""
    wrapped = _bpe_wrapped_vocab(spark, sf_dir, extra=["token"])
    wrapped, _ = _bpe_merge_rounds(
        wrapped, BPE_TRAIN_ROUNDS, carry_cols=["token", "freq"]
    )
    syms_of = F.split(
        F.expr("substring(wrapped, 2, length(wrapped) - 2)"), _BPE_SEP + _BPE_SEP
    )
    vocab = wrapped.select("token", F.size(syms_of).cast("bigint").alias("n_syms"))
    doc_tok = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return (
        doc_tok.join(F.broadcast(vocab), on="token", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("n_syms").cast("bigint").alias("n_words"),
            F.coalesce(F.sum("n_syms"), F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
    )


# ----------------------- lexical diversity (exact) -----------------------


@register(
    "token_diversity_report",
    driver=False,
    oracle=f"""
WITH toks AS (SELECT unnest({_SQL_TOKS}) AS term FROM documents),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS c2,
         CAST(max(c) AS BIGINT) AS cmax,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM tc
)
SELECT vocab, n_tok, cmax AS top1_count, hapax,
       CAST(1000000 - (1000000 * c2)
            // (CAST(n_tok AS HUGEINT) * n_tok) AS BIGINT) AS gini_micro,
       CAST((1000000 * cmax) // n_tok AS BIGINT) AS top1_share_micro,
       CAST((1000000 * hapax) // vocab AS BIGINT) AS hapax_share_micro,
       CAST((1000000 * vocab) // n_tok AS BIGINT) AS ttr_micro
FROM s
""",
)
def token_diversity_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lexical-diversity panel, all EXACT rationals (no
    entropy/log, so no libm anywhere): Gini-Simpson index
    1 - sum(p_i^2) — the collision probability complement that tracks
    entropy monotonically for screening purposes — plus top-1 token
    share, hapax-legomena share (the Heaps'-law tail mass), and the
    type-token ratio. Degenerate corpora (template spam, mode
    collapse in synthetic data) crater gini/hapax and spike top1 —
    the cheap tripwire before the expensive dedup passes.

    Physical shape: one token explode folded to the vocab table
    (map-side combined), then a scalar fold over vocab rows. sum(c^2)
    runs in DECIMAL(38,0)/HUGEINT — at web scale n_tok^2 is ~10^22
    and would silently wrap int64."""
    tc = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return tc.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n_tok"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("_c2"),
        F.max("c").cast("bigint").alias("top1_count"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("hapax"),
    ).selectExpr(
        "vocab",
        "n_tok",
        "top1_count",
        "hapax",
        "CAST(1000000 - (1000000 * _c2) div (CAST(n_tok AS DECIMAL(38,0)) * n_tok)"
        " AS BIGINT) AS gini_micro",
        "CAST((1000000 * top1_count) div n_tok AS BIGINT) AS top1_share_micro",
        "CAST((1000000 * hapax) div vocab AS BIGINT) AS hapax_share_micro",
        "CAST((1000000 * vocab) div n_tok AS BIGINT) AS ttr_micro",
    )
