"""Data-selection operators: weighted sampling without replacement and
MMR diversity reranking.

Two selection primitives every training-data pipeline eventually needs
beyond the uniform/stratified/mixture samplers (functions/sampling.py,
queries_cleaning.py):

- ``weighted_sample_wor``: Efraimidis-Spirakis reservoir keys — select
  the k documents with the smallest (-ln u_i)/w_i, which is provably a
  weight-proportional sample WITHOUT replacement (Efraimidis &
  Spirakis, IPL 2006: the top-k of u_i^(1/w_i) — same ordering). The
  uniform u_i is a pure function of doc_id (52 bits of md5, the
  deterministic-assignment discipline of functions/sampling.py), so the
  sample is reproducible run-to-run and engine-to-engine; ln is applied
  PER ROW on an exact integer (the tfidf/drift convention — no float
  ever crosses rows) and the key is floored to integer micros before
  the ranking, with doc_id tie-breaks.

- ``mmr_rerank``: Maximal Marginal Relevance (Carbonell & Goldstein,
  SIGIR 1998) — greedy re-ranking of an ANN candidate list that trades
  relevance against redundancy: pick argmax of
  lambda*rel(d) - (1-lambda)*max_{s in S} sim(d, s). With lambda=0.7
  and micro-integer cosines (floor(cos*1e6), the embedding-eval
  convention) the objective is the exact integer
  7*mrel - 3*max_msim, so the greedy trajectory is bit-identical
  cross-engine.

Cross-engine bit-identity caveat (documented assumption): key_micro —
like the classifier's exp/sigmoid and the unigram/KN micro-logs —
floors a TRANSCENDENTAL (ln/exp) of an exact integer, and IEEE 754
does not guarantee correctly-rounded transcendentals; the parity gate
therefore assumes JVM StrictMath-adjacent libm and DuckDB's libm agree
to the last bit on these inputs (they do on this container's glibc,
and the fixtures sit far from micro boundaries). On a platform where a
1-ulp libm difference flips a floor at a micro boundary, the fix is a
1-micro tolerance on transcendental-derived columns in the comparator —
NOT a change to either engine's plan. Every other integer convention in
the repo (div, floor of exact decimals) is exact regardless of libm.

Scale posture: weighted_sample_wor is a single corpus scan + bounded
top-k (TakeOrderedAndProject — the reservoir never materializes);
mmr_rerank does ONE corpus pass to build the bounded candidate list
(the ann_topk brute-force shape; at 100 TB the candidate pass swaps to
the IVF/multiprobe path unchanged), after which every greedy round
works on the MMR_N-row candidate table with 1-row argmax collects (the
BPE/kmeans bounded-driver-control convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.similarity import dot, norm
from .model import read_table
from .queries_pipeline import _DOT, _vec_cte
from .registry import register

WOR_K = 120  # sample size
WOR_SALT = "wor"
_U_BITS = 52  # md5 bits used for the uniform (13 hex nibbles)
# 52*ln(2): shifts -ln(u_int/2^52) to -ln(u_int) + C; repr() embeds the
# IDENTICAL double literal in the Spark expression and the DuckDB SQL
_C_LN = repr(_U_BITS * math.log(2.0))
_KEY_SCALE = 1_000_000

MMR_N = 40  # ANN candidates entering the rerank
MMR_K = 8  # items selected
# lambda = 0.7 -> integer objective 7*mrel - 3*max_msim (x10 microcosines)


def _u_int_col() -> F.Column:
    """52-bit uniform from md5(doc_id), in [1, 2^52]: +1 keeps ln(u)
    finite at the (2^-52-probability) zero hash."""
    h = F.md5(F.concat(F.lit(WOR_SALT), F.col("doc_id").cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint") + 1


def _u_int_sql() -> str:
    h = f"md5('{WOR_SALT}' || CAST(doc_id AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"(({terms}) + 1)"


@register(
    "weighted_sample_wor",
    driver=False,
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(floor(({_C_LN} - ln(CAST({_u_int_sql()} AS DOUBLE)))
                    * {_KEY_SCALE} / n_chars) AS BIGINT) AS key_micro
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, key_micro FROM keyed
ORDER BY key_micro, doc_id LIMIT {WOR_K}
""",
)
def weighted_sample_wor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement, weights =
    document length (n_chars): the token-budget-proportional draw a
    mixture builder uses when long documents should enter the corpus
    with proportionally higher probability but never twice.

    Physical shape: one scan computing the per-row key (md5 -> 52-bit
    uniform -> E-S exponential key, all JVM expression tree), then a
    bounded top-k — TakeOrderedAndProject, no global sort, no shuffle
    beyond the k-row merge (plan-asserted). At 100 TB this is the
    textbook distributed reservoir: each partition keeps its local
    top-k and only k-row heads cross the wire."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.floor(
            (F.lit(float(_C_LN)) - F.log(_u_int_col().cast("double")))
            * _KEY_SCALE
            / F.col("n_chars")
        )
        .cast("bigint")
        .alias("key_micro"),
    )
    return keyed.orderBy("key_micro", "doc_id").limit(WOR_K)


def _mmr_oracle() -> str:
    """Greedy MMR unrolled to MMR_K generated CTE rounds (the
    BPE-oracle convention): s{k} accumulates the selected ids, m{k} is
    the per-candidate max similarity to the selected set, p{k} the
    1-row argmax."""
    # every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # s{k} references s{k-1} three times, so the un-materialized
    # expansion is 3^k copies of the parquet scan (observed as an
    # fd-exhaustion error at k=8)
    rounds = []
    for k in range(1, MMR_K + 1):
        rounds.append(
            f"""m{k} AS MATERIALIZED (
  SELECT p.a AS vec_id, max(p.msim) AS mx
  FROM pairs p JOIN s{k - 1} s ON p.b = s.vec_id GROUP BY p.a
),
p{k} AS MATERIALIZED (
  SELECT c.vec_id, c.mrel, CAST(coalesce(m.mx, 0) AS BIGINT) AS max_msim,
         CAST(7 * c.mrel - 3 * coalesce(m.mx, 0) AS BIGINT) AS score_micro
  FROM cand c LEFT JOIN m{k} m ON c.vec_id = m.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM s{k - 1})
  ORDER BY score_micro DESC, c.vec_id LIMIT 1
),
s{k} AS MATERIALIZED (
  SELECT vec_id FROM s{k - 1} UNION ALL SELECT vec_id FROM p{k})"""
        )
    head = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS sel_rank, vec_id, mrel, max_msim,"
        f" score_micro FROM p{k}"
        for k in range(1, MMR_K + 1)
    )
    return f"""
WITH {_vec_cte()},
q AS (SELECT emb AS q_emb, nrm AS q_nrm FROM vn WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vn.vec_id, CAST(floor(({_DOT.format(a="vn.emb", b="q.q_emb")}
           / (vn.nrm * q.q_nrm)) * 1000000) AS BIGINT) AS mrel
  FROM vn, q WHERE vn.vec_id <> 0
  ORDER BY mrel DESC, vn.vec_id LIMIT {MMR_N}
),
candv AS MATERIALIZED (SELECT c.vec_id, c.mrel, vn.emb, vn.nrm FROM cand c
          JOIN vn ON vn.vec_id = c.vec_id),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(floor(({_DOT.format(a="a.emb", b="b.emb")}
              / (a.nrm * b.nrm)) * 1000000) AS BIGINT) AS msim
  FROM candv a JOIN candv b ON a.vec_id <> b.vec_id
),
s0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id WHERE 1 = 0),
{",".join(rounds)}
{head}
"""


@register("mmr_rerank", driver=False, oracle=_mmr_oracle())
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity rerank of the top-MMR_N ANN candidates for the
    vec_id=0 probe: emit the greedy selection trajectory (sel_rank,
    vec_id, relevance microcosine, max similarity to the already-
    selected set at pick time, and the integer objective
    7*mrel - 3*max_msim). The first pick is pure relevance; every later
    pick is provably the exact integer argmax, so the trajectory — not
    just the set — is deterministic.

    Physical shape: candidate generation is one corpus pass against the
    broadcast probe with a bounded TakeOrdered head (the ann_topk
    shape); the pairwise-similarity table is a bounded
    MMR_N x MMR_N broadcast self-join; each greedy round is a 1-row
    argmax collect over the candidate table (bounded driver control,
    the BPE convention) with the literal id list folded into the next
    round's filter."""
    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    v = v.withColumn("nrm", norm(F.col("emb")))
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cos = dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm"))
    cand = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "emb",
            "nrm",
            F.floor(cos * 1000000).cast("bigint").alias("mrel"),
        )
        .orderBy(F.desc("mrel"), "vec_id")
        .limit(MMR_N)
        .localCheckpoint()
    )
    pair_cos = dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    pairs = (
        cand.select(
            F.col("vec_id").alias("a"),
            F.col("emb").alias("a_emb"),
            F.col("nrm").alias("a_nrm"),
        )
        .crossJoin(
            F.broadcast(
                cand.select(
                    F.col("vec_id").alias("b"),
                    F.col("emb").alias("b_emb"),
                    F.col("nrm").alias("b_nrm"),
                )
            )
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            "a", "b", F.floor(pair_cos * 1000000).cast("bigint").alias("msim")
        )
    )
    # Bounded driver argmax, extended (r13): the candidate table (MMR_N
    # rows) and the pairwise-sim table (MMR_N^2 rows) are BOUNDED by
    # construction at any corpus size, so collect both ONCE and run the
    # greedy loop in plain Python — the old shape paid one Spark argmax
    # job per selection round over a ~40-row in-memory table (MMR_K
    # fixed-cost jobs for zero distributed work). Trajectory identical:
    # same integer scores, same (score desc, vec_id asc) argmax, and the
    # tie-break is total so iteration order cannot matter.
    rel = {
        int(r["vec_id"]): int(r["mrel"])
        for r in cand.select("vec_id", "mrel").collect()
    }
    msim = {
        (int(r["a"]), int(r["b"])): int(r["msim"]) for r in pairs.collect()
    }
    selected: list[int] = []
    records = []
    for rank in range(1, MMR_K + 1):
        best = None
        for vid, mrel in rel.items():
            if vid in selected:
                continue
            mx = max((msim.get((vid, s), 0) for s in selected), default=0)
            score = 7 * mrel - 3 * mx
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, mrel, mx, score)
        selected.append(best[1])
        records.append((rank, best[1], best[2], best[3], best[4]))
    from .model import local_df

    return local_df(
        spark,
        records,
        "sel_rank int, vec_id bigint, mrel bigint, max_msim bigint,"
        " score_micro bigint",
    )


# ------------------- Neyman stratified allocation -------------------

STRAT_BUDGET = 10_000  # documents to allocate across source strata
_S_MILLI = 1_000  # milli fixed-point for the per-stratum stddev


@register(
    "stratified_sample_alloc",
    driver=False,
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sx,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY source
),
v AS (
  SELECT source, n_docs,
         CAST((n_docs * sxx - sx * sx) // (n_docs * (n_docs - 1)) AS BIGINT)
           AS var_floor
  FROM s WHERE n_docs > 1
),
w AS (
  SELECT source, n_docs, var_floor,
         CAST(floor(sqrt(CAST(var_floor AS DOUBLE)) * {_S_MILLI}) AS BIGINT)
           AS s_milli,
         CAST(n_docs * CAST(floor(sqrt(CAST(var_floor AS DOUBLE)) * {_S_MILLI})
                            AS BIGINT) AS BIGINT) AS weight
  FROM v
),
quota AS (
  SELECT source, n_docs, var_floor, s_milli, weight,
         CAST((CAST(weight AS HUGEINT) * {STRAT_BUDGET})
              // (SELECT sum(CAST(weight AS HUGEINT)) FROM w) AS BIGINT)
           AS base_alloc,
         CAST((CAST(weight AS HUGEINT) * {STRAT_BUDGET})
              % (SELECT sum(CAST(weight AS HUGEINT)) FROM w) AS BIGINT)
           AS remainder
  FROM w
),
ranked AS (
  SELECT *, rank() OVER (ORDER BY remainder DESC, source) AS rem_rank,
         (SELECT {STRAT_BUDGET} - sum(base_alloc) FROM quota) AS leftover
  FROM quota
)
SELECT source, n_docs, var_floor, s_milli,
       CAST(base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked ORDER BY source
""",
)
def stratified_sample_alloc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: budget shares
    proportional to N_h * S_h (stratum size times stddev — the
    allocation that minimizes the estimator's variance for a fixed
    budget), apportioned EXACTLY to STRAT_BUDGET with the
    largest-remainder step (the token_budget_allocation pattern).

    Exactness discipline: the sample variance is floored to an integer
    FIRST ((n*Σx² - (Σx)²) div (n(n-1)) — exact bigint arithmetic),
    then S_h = floor(sqrt(var_floor)*1e3): int64→double conversion and
    sqrt are both correctly rounded under IEEE 754, and the once-scaled
    product rounds identically on both engines (the
    temperature_mixture_weights argument — no libm caveat, sqrt is the
    one root IEEE mandates). Scale shape: one corpus pass to a
    domain-sized moment table; everything after runs on strata rows
    (bounded windows, the Hamilton class)."""
    from pyspark.sql import Window

    s = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
        )
        .filter(F.col("n_docs") > 1)
    )
    w = s.selectExpr(
        "source",
        "n_docs",
        "CAST((n_docs * sxx - sx * sx) div (n_docs * (n_docs - 1)) AS BIGINT)"
        " AS var_floor",
    ).selectExpr(
        "source",
        "n_docs",
        "var_floor",
        f"CAST(floor(sqrt(CAST(var_floor AS DOUBLE)) * {_S_MILLI}) AS BIGINT)"
        " AS s_milli",
    ).withColumn("weight", F.col("n_docs") * F.col("s_milli"))
    total = w.select(F.sum(F.col("weight").cast("decimal(38,0)")).alias("_t"))
    quota = w.crossJoin(F.broadcast(total)).selectExpr(
        "source",
        "n_docs",
        "var_floor",
        "s_milli",
        f"CAST((CAST(weight AS DECIMAL(38,0)) * {STRAT_BUDGET}) div _t AS BIGINT)"
        " AS base_alloc",
        f"CAST((CAST(weight AS DECIMAL(38,0)) * {STRAT_BUDGET}) % _t AS BIGINT)"
        " AS remainder",
    )
    w_all = Window.partitionBy()  # strata-sized: bounded single partition
    ranked = quota.select(
        "*",
        F.rank().over(w_all.orderBy(F.desc("remainder"), F.asc("source"))).alias(
            "rem_rank"
        ),
        (F.lit(STRAT_BUDGET) - F.sum("base_alloc").over(w_all)).alias("leftover"),
    )
    extra = F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "source",
        "n_docs",
        "var_floor",
        "s_milli",
        (F.col("base_alloc") + extra).cast("bigint").alias("alloc"),
    ).orderBy("source")
