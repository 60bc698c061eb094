"""Embedding-evaluation operators: the measurement loop a training-data
pipeline runs on top of its embedding store — k-NN label-prediction
accuracy (is the embedding space linearly usable?), hard-negative mining
(contrastive training pairs), and a nearest-centroid confusion matrix
(which labels collide?).

These compose the existing similarity machinery (functions/similarity.py)
rather than re-deriving it: scoring is zip_with/aggregate dot products
(JVM-side, sequential summation — bit-identical to DuckDB's
list_reduce), rankings order by the ROUNDED cosine with id tie-breaks so
both engines pick identical top-k sets, and centroid averages go through
integer-scaled sums (floor(x*1e6) bigints) because a double SUM is
summation-order-dependent across engines while a bigint sum is exact.

Scale posture: the eval queries score a BOUNDED query set (broadcast)
against the corpus — one corpus pass per eval, the same shape as
ann_topk's brute-force baseline; at 100 TB the probe side swaps to the
IVF/multiprobe path (ann_topk_bucketed / ann_topk_multiprobe) without
changing the vote/confusion logic, which only ever sees |Q| x k rows.
The centroid build is a posexplode scalar aggregation — K x 64 partial
sums per partition regardless of corpus size (same shape as
kmeans_step)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round6
from .functions.similarity import dot, norm
from .model import read_table
from .registry import register
from .queries_pipeline import _DOT, _vec_cte

KNN_QUERIES = 100
KNN_K = 5
HN_QUERIES = 32
HN_K = 3
EMB_DIM = 64
CENT_SCALE = 1_000_000


def _spread_scan(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Input-split fix (guide §2.5, r13): the embedding store at bench
    scale is ONE small parquet file, so the scan is a single task and
    every per-row-heavy consumer (the D^2/2 gram cells especially)
    serializes on one core. When — and only when — the scan is
    under-parallel, hash-repartition on the unique vec_id to the
    session's core count; at scale the scan's natural splits already
    exceed this and the branch is a no-op (the conditional is what
    keeps this scale-adaptive rather than a local-mode constant)."""
    target = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < target:
        emb = emb.repartition(target, "vec_id")
    return emb


def _scored_queries(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    """(query_id, q_label, neighbor_id, n_label, cos_sim): every corpus
    vector scored against the broadcast query slice, self excluded."""
    v = _spread_scan(spark, read_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    v = v.withColumn("_norm", norm(F.col("emb")))
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    joined = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = dot(F.col("emb"), F.col("q_emb")) / (F.col("_norm") * F.col("q_norm"))
    return joined.select(
        "query_id",
        "q_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        round6(cos).alias("cos_sim"),
    )


@register(
    "knn_label_accuracy",
    oracle=f"""
WITH {_vec_cte()},
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
q AS (
  SELECT vn.vec_id AS query_id, l.label AS q_label, vn.emb AS q_emb, vn.nrm AS q_nrm
  FROM vn JOIN lab l ON l.vec_id = vn.vec_id WHERE vn.vec_id < {KNN_QUERIES}
),
scored AS (
  SELECT q.query_id, q.q_label, vn.vec_id AS neighbor_id, l.label AS n_label,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.vec_id <> q.query_id
  JOIN lab l ON l.vec_id = vn.vec_id
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {KNN_K}
),
votes AS (
  SELECT query_id, q_label, n_label, count(*) AS cnt
  FROM topk GROUP BY 1, 2, 3
),
pred AS (
  SELECT query_id, q_label, n_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cnt DESC, n_label) AS vr
    FROM votes
  ) WHERE vr = 1
)
SELECT q_label AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred GROUP BY 1
""",
)
def knn_label_accuracy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation: predict each query vector's label by
    majority vote of its {KNN_K} nearest neighbors (cosine), report
    correct counts per true label. Determinism chain: neighbors rank by
    the ROUNDED cosine with neighbor-id tie-break (identical sets in
    both engines), votes tie-break toward the smaller label. The window
    top-k is the brute-force eval baseline (one corpus pass against a
    broadcast query slice — |Q| x N scored rows partition by query);
    at 100 TB the neighbor source swaps to the bucketed IVF probe and
    everything from the vote down only touches |Q| x k rows. Accuracy
    is reported as exact integer counts, never a float ratio."""
    scored = _scored_queries(spark, sf_dir, KNN_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KNN_K
    )
    votes = topk.groupBy("query_id", "q_label", "n_label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # argmax(cnt) with smaller-label tie-break == min over (-cnt, label)
    pred = votes.groupBy("query_id", "q_label").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("n_label"))).alias("_b")
    ).select("query_id", "q_label", F.col("_b.n_label").alias("pred_label"))
    return pred.groupBy(F.col("q_label").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("pred_label") == F.col("q_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH {_vec_cte()},
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
q AS (
  SELECT vn.vec_id AS query_id, l.label AS anchor_label, vn.emb AS q_emb, vn.nrm AS q_nrm
  FROM vn JOIN lab l ON l.vec_id = vn.vec_id WHERE vn.vec_id < {HN_QUERIES}
),
scored AS (
  SELECT q.query_id, q.anchor_label, vn.vec_id AS neighbor_id, l.label AS neg_label,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.vec_id <> q.query_id
  JOIN lab l ON l.vec_id = vn.vec_id
  WHERE l.label <> q.anchor_label
)
SELECT query_id, anchor_label, neighbor_id, neg_label, cos_sim,
       CAST(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {HN_K}
""",
)
def hard_negative_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the {HN_K} highest-cosine vectors with a DIFFERENT label — the
    negatives closest to the decision boundary, which carry the most
    gradient signal. Identical scoring/ranking determinism as
    knn_label_accuracy; the label-mismatch filter applies BEFORE
    ranking, so the window ranks only cross-label candidates. Same
    scale posture: brute-force baseline here, IVF probe at corpus
    scale (mining quality degrades gracefully with probe recall, which
    ann_recall_report pins)."""
    scored = _scored_queries(spark, sf_dir, HN_QUERIES).filter(
        F.col("n_label") != F.col("q_label")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_K)
        .select(
            "query_id",
            F.col("q_label").alias("anchor_label"),
            "neighbor_id",
            F.col("n_label").alias("neg_label"),
            "cos_sim",
            "rank",
        )
    )


def _centroid_sql() -> str:
    """Label centroids from integer-scaled sums (exact cross-engine)."""
    return f"""
lv AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings
),
csums AS (
  SELECT label, i,
         sum(CAST(floor(emb[i] * {CENT_SCALE}) AS BIGINT)) AS s,
         count(*) AS n
  FROM lv CROSS JOIN generate_series(1, {EMB_DIM}) t(i)
  GROUP BY 1, 2
),
cent AS (
  SELECT label AS c_label,
         list((CAST(s AS DOUBLE) / n) / {CENT_SCALE} ORDER BY i) AS c_emb
  FROM csums GROUP BY 1
),
centn AS (
  SELECT c_label, c_emb,
         sqrt({_DOT.format(a="c_emb", b="c_emb")}) AS c_nrm
  FROM cent
)
"""


@register(
    "nearest_centroid_confusion",
    oracle=f"""
WITH {_centroid_sql()},
v AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings
),
vn AS (SELECT vec_id, label, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM v),
scored AS (
  SELECT vn.vec_id, vn.label,
         c.c_label,
         floor(({_DOT.format(a="vn.emb", b="c.c_emb")} / (vn.nrm * c.c_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn CROSS JOIN centn c
),
assigned AS (
  SELECT vec_id, label, c_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, c_label) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT label AS true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM assigned GROUP BY 1, 2
""",
)
def nearest_centroid_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier confusion matrix: which labels'
    embedding clouds collide. Centroids are per-label means computed
    through integer-scaled bigint sums (a double SUM is
    summation-order-dependent and would diverge between engines; the
    scaled-int sum is exact, and the single s/n division afterwards is
    IEEE-deterministic) via posexplode — K x {EMB_DIM} partial sums
    per partition, corpus-size-independent state, exactly the
    kmeans_step shuffle shape. Assignment broadcasts the K-row
    centroid table and folds the argmax per vector with one
    min(struct) aggregation keyed by vec_id — no window over the
    corpus, no K x N shuffle (the plan test pins zero
    corpus-partition Window and the broadcast). Cosine rounds to 6
    decimals BEFORE the argmax so both engines break near-ties the
    same way (then by smaller label)."""
    v = _spread_scan(spark, read_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    scaled = v.select(
        "label", F.posexplode(F.col("emb")).alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val") * CENT_SCALE).cast("bigint").alias("sval"),
    )
    csums = scaled.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.sum("sval").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cent = (
        csums.select(
            "c_label",
            "pos",
            ((F.col("s").cast("double") / F.col("n")) / CENT_SCALE).alias("cval"),
        )
        .groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"],
            ).alias("c_emb")
        )
    )
    cent = cent.withColumn("c_nrm", norm(F.col("c_emb")))
    vn = v.withColumn("_nrm", norm(F.col("emb")))
    cos = dot(F.col("emb"), F.col("c_emb")) / (F.col("_nrm") * F.col("c_nrm"))
    scored = vn.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", round6(cos).alias("cos_sim")
    )
    assigned = scored.groupBy("vec_id", "label").agg(
        F.min(
            F.struct((-F.col("cos_sim")).alias("nc"), F.col("c_label"))
        ).alias("_b")
    ).select("vec_id", "label", F.col("_b.c_label").alias("pred_label"))
    return assigned.groupBy(
        F.col("label").alias("true_label"), "pred_label"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# ------------------- embedding second-moment statistics -------------------

_COV_SCALE = 1_000_000  # per-element micro fixed point


def _dims_sql() -> str:
    """(vec_id, i, m): micro-floored embedding elements, 1-based dim."""
    return f"""
dims AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_COV_SCALE}) AS BIGINT) AS m
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)
"""


@register(
    "embedding_dim_stats",
    driver=False,
    oracle=f"""
WITH {_dims_sql()}
SELECT CAST(i AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       -- sign * (abs // n): truncation toward zero, matching Spark's
       -- `div` (DuckDB's bare // FLOORS, which differs on negatives)
       CAST(CASE WHEN sum(m) < 0 THEN -((-sum(m)) // count(*))
                 ELSE sum(m) // count(*) END AS BIGINT) AS mean_micro,
       CAST((CAST(count(*) AS HUGEINT) * sum(CAST(m AS HUGEINT) * m)
             - CAST(sum(m) AS HUGEINT) * sum(m))
            // (CAST(count(*) AS HUGEINT) * (count(*) - 1)) AS BIGINT)
         AS var_micro2
FROM dims GROUP BY i ORDER BY dim
""",
)
def embedding_dim_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and sample variance of the embedding store in
    exact fixed point: elements floor to micros, so the moment sums are
    bigint-exact and the variance is one integer division (means in
    micros, variances in micro^2). The whitening/normalization
    diagnostic every embedding pipeline checks before cosine math —
    a dimension with variance far off the others dominates distances.

    Physical shape: one posexplode scan folded by (dim) — 64 keys,
    map-side combined, so the shuffle carries 64 rows per task no
    matter the corpus size. Wide sums run in DECIMAL(38,0) because
    n * sum(m^2) overflows int64 past ~100k vectors."""
    emb = _spread_scan(spark, read_table(spark, sf_dir, "embeddings"))
    dims = emb.select(
        F.posexplode(
            F.expr(
                f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
                f" * {_COV_SCALE}) AS BIGINT))"
            )
        ).alias("i0", "m")
    ).select((F.col("i0") + 1).cast("int").alias("dim"), "m")
    return (
        dims.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("m").alias("_s"),
            F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * m")).alias("_ss"),
        )
        .selectExpr(
            "dim",
            "n_vecs",
            "CAST(_s div n_vecs AS BIGINT) AS mean_micro",
            "CAST((CAST(n_vecs AS DECIMAL(38,0)) * _ss - CAST(_s AS DECIMAL(38,0))"
            " * _s) div (CAST(n_vecs AS DECIMAL(38,0)) * (n_vecs - 1)) AS BIGINT)"
            " AS var_micro2",
        )
        .orderBy("dim")
    )


@register(
    "embedding_covariance_summary",
    driver=False,
    oracle=f"""
WITH {_dims_sql()},
sums AS (
  SELECT a.i AS i, b.i AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.m) AS BIGINT) AS si,
         CAST(sum(b.m) AS BIGINT) AS sj,
         CAST(sum(CAST(a.m AS HUGEINT) * b.m) AS HUGEINT) AS sij
  FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
cov AS (
  -- sign * (abs // d): truncation toward zero (covariances go
  -- negative; DuckDB // floors, Spark div truncates)
  SELECT i, j,
         CAST(CASE WHEN num < 0 THEN -((-num) // den) ELSE num // den END
              AS BIGINT) AS c
  FROM (
    SELECT i, j,
           CAST(n AS HUGEINT) * sij - CAST(si AS HUGEINT) * sj AS num,
           CAST(n AS HUGEINT) * (n - 1) AS den
    FROM sums
  )
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN i = j THEN c ELSE 0 END) AS BIGINT) AS trace_micro2,
       CAST(sum(CASE WHEN i < j THEN abs(c) ELSE 0 END) AS BIGINT)
         AS offdiag_abs_sum_micro2,
       CAST(max(CASE WHEN i < j THEN abs(c) ELSE 0 END) AS BIGINT)
         AS offdiag_abs_max_micro2,
       CAST((1000000 * CAST(sum(CASE WHEN i < j THEN abs(c) ELSE 0 END) AS HUGEINT))
            // sum(CASE WHEN i = j THEN c ELSE 0 END) AS BIGINT)
         AS offdiag_ratio_micro
FROM cov
""",
)
def embedding_covariance_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy audit of the embedding space: the exact covariance
    matrix's trace vs off-diagonal mass (all in micro^2 fixed point).
    A well-conditioned space for cosine retrieval has small
    offdiag_ratio; a collapsed/anisotropic one (the classic
    representation-collapse failure) shows off-diagonal mass rivaling
    the trace — the go/no-go check before shipping an embedding store
    to the semdedup/ANN family.

    Physical shape: the pair products are generated INSIDE the row
    (nested transform over the 64-element array -> 2080 (i<=j) cells
    per vector, whole-stage codegen, no self-join), then one hash
    aggregation keyed by (i,j) — map-side combine means the shuffle
    carries 2080 rows per task regardless of corpus size, and the
    final fold runs on the 2080-row cell table. At 100 TB the same
    plan holds; the per-row cost is D^2/2 multiplies, the classic
    gram-matrix map-reduce (a Pandas-UDF BLAS kernel per partition is
    the constant-factor upgrade, plan shape unchanged)."""
    emb = _spread_scan(spark, read_table(spark, sf_dir, "embeddings"))
    d = EMB_DIM
    pairs = emb.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, {d - 1}), i ->
                     transform(sequence(i, {d - 1}), j -> struct(
                       i AS i, j AS j,
                       CAST(floor(CAST(embedding[i] AS DOUBLE) * {_COV_SCALE}) AS BIGINT)
                         AS mi,
                       CAST(floor(CAST(embedding[j] AS DOUBLE) * {_COV_SCALE}) AS BIGINT)
                         AS mj))))"""
            )
        ).alias("p")
    ).select(
        (F.col("p.i") + 1).alias("i"),
        (F.col("p.j") + 1).alias("j"),
        F.col("p.mi").alias("mi"),
        F.col("p.mj").alias("mj"),
    )
    sums = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mi").alias("si"),
        F.sum("mj").alias("sj"),
        F.sum(F.expr("CAST(mi AS DECIMAL(38,0)) * mj")).alias("sij"),
    )
    cov = sums.selectExpr(
        "i",
        "j",
        "CAST((CAST(n AS DECIMAL(38,0)) * sij - CAST(si AS DECIMAL(38,0)) * sj)"
        " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) AS c",
    )
    return cov.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("i") == F.col("j"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("trace_micro2"),
        F.sum(F.when(F.col("i") < F.col("j"), F.abs("c")).otherwise(0))
        .cast("bigint")
        .alias("offdiag_abs_sum_micro2"),
        F.max(F.when(F.col("i") < F.col("j"), F.abs("c")).otherwise(0))
        .cast("bigint")
        .alias("offdiag_abs_max_micro2"),
        F.expr(
            "CAST((1000000 * CAST(sum(CASE WHEN i < j THEN abs(c) ELSE 0 END)"
            " AS DECIMAL(38,0))) div sum(CASE WHEN i = j THEN c ELSE 0 END)"
            " AS BIGINT)"
        ).alias("offdiag_ratio_micro"),
    )
