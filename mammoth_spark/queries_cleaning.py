"""Corpus CLEANING operators — the wave that materializes cleaned text,
not just filter signals (round 4). Where queries_curation.py measures
(dup-span stats, shuffle manifests) and queries_pipeline.py selects
(dedup keep-lists, samples), these operators REWRITE the corpus the way
the C4/RefinedWeb pipelines do before tokenization:

- ``chunk_dedup`` — cross-document exact dedup at sub-document chunk
  granularity (the C4 "deduplicate repeated lines" rule, arXiv:1910.10683
  §2.2; our corpus has no newlines so the line analog is the
  non-overlapping W-token chunk): every chunk keeps exactly its first
  corpus occurrence and every later copy is cut from the rebuilt text.
- ``boilerplate_strip`` — per-source boilerplate removal (RefinedWeb /
  CCNet shape): a chunk appearing in >= BP_MIN distinct documents of the
  SAME source is a header/footer/navigation artifact; remove every
  occurrence, including the first.
- ``dup_span_remove`` — the REMOVER for Lee et al. 2022 duplicated spans
  (arXiv:2107.06499): where dup_span_stats reports coverage, this entry
  rebuilds each document with every non-canonical duplicated-span
  position cut (the gram's lexicographically-first (doc_id, pos)
  occurrence is canonical and survives).
- ``dsir_select`` — Data Selection with Importance Resampling (DSIR,
  arXiv:2302.03169): hashed-unigram bucket distributions for a target
  slice vs the raw corpus give each document an importance weight; the
  top-N weighted documents are the selected pretraining subset. The
  likelihood ratio is an exact integer micro-rational (like bm25_topk's
  idf) so ranking is bit-identical cross-engine.
- ``ann_recall_report`` — the recall AUDIT for the ANN family, twin of
  lsh_recall_report: exact brute-force top-k vs the IVF bucket probe,
  per-query recall@k. The measurement that turns the bucket-bits /
  n_probe knobs into engineering.

Reference parity note: the reference engine (a CDC replicator) has no
corpus operators; these derive from the cited public papers. The
determinism discipline (md5 buckets, struct-min canonical picks, integer
micro-rationals) matches functions/sampling.py and queries_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.sampling import hash_bucket, hash_bucket_sql
from .functions.similarity import ann_topk_bruteforce, ann_topk_bucketed
from .functions.text import _tokens
from .model import read_table
from .queries_corpus import _SQL_TOKS
from .queries_curation import SPAN_N
from .queries_pipeline import ANN_K, ANN_QUERIES, _DOT, _vec_cte
from .registry import register

# Scratch base of the most recent streaming_chunk_clean run, THREAD-
# LOCAL (set by the query, read by the on-disk-layout audit test):
# concurrent runs in one process each see their own base instead of
# clobbering a shared module global (ADVICE r05). The module-level
# attribute lookup is kept working via __getattr__ below.
import threading as _threading

_STREAM_CHUNK_TL = _threading.local()


def stream_chunk_last_base() -> str | None:
    """The scratch base of THIS thread's most recent run, or None."""
    return getattr(_STREAM_CHUNK_TL, "base", None)


def __getattr__(name: str):
    if name == "STREAM_CHUNK_LAST_BASE":  # back-compat module attribute
        return stream_chunk_last_base()
    raise AttributeError(name)

CHUNK_W = 8  # tokens per non-overlapping chunk (the "line" analog)
BP_MIN = 3  # chunk in >= this many distinct docs of one source = boilerplate
DSIR_BUCKETS = 256  # hashed-unigram feature dimension
DSIR_TOP_N = 100  # documents selected


# --------------------------- shared chunking ---------------------------


def _chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, source, chunk_idx, chunk): non-overlapping CHUNK_W-token
    windows; the final chunk is the (possibly shorter) remainder so the
    chunk set covers the whole document. Pure per-row expressions — the
    explode is narrow, nothing shuffles here."""
    tok = docs.select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 1)
    return tok.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.expr(f"(size(toks) + {CHUNK_W - 1}) DIV {CHUNK_W} - 1")
                ),
                lambda c: F.struct(
                    c.cast("bigint").alias("chunk_idx"),
                    F.concat_ws(
                        " ", F.slice(F.col("toks"), c * CHUNK_W + 1, F.lit(CHUNK_W))
                    ).alias("chunk"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "source", "s.chunk_idx", "s.chunk")


def _chunks_cte() -> str:
    """DuckDB mirror of :func:`_chunks`."""
    return f"""
tok AS (
  SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
),
t1 AS (SELECT doc_id, source, toks FROM tok WHERE len(toks) >= 1),
ch AS (
  SELECT doc_id, source, CAST(c AS BIGINT) AS chunk_idx,
         array_to_string(array_slice(toks, c*{CHUNK_W}+1, c*{CHUNK_W}+{CHUNK_W}), ' ') AS chunk
  FROM t1, unnest(generate_series(0, (len(toks) + {CHUNK_W - 1}) // {CHUNK_W} - 1)) s(c)
)
"""


# ----------------------------- chunk_dedup -----------------------------


_CHUNK_DEDUP_ORACLE = f"""
WITH {_chunks_cte()},
k AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), '') AS clean_text
FROM k GROUP BY doc_id
"""


def _rebuild_docs(flagged, kept_col, n_kept_alias):
    """Per-document rebuild shared by every chunk-level cleaner: count
    chunks, count survivors, and reassemble clean_text from the kept
    chunks in chunk_idx order. The collect_list holds only ONE document's
    chunks (bounded by doc length, never corpus size); array_sort on the
    (chunk_idx, chunk) struct restores order without a window sort."""
    kept = F.col(kept_col) if isinstance(kept_col, str) else kept_col
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias(n_kept_alias),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(kept, F.struct("chunk_idx", "chunk")))
                ),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )


@register(
    "chunk_dedup",
    driver=False,  # round-4 contract is full; round-5 rotation candidate
    oracle=_CHUNK_DEDUP_ORACLE,
)
def chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-rule chunk-level exact dedup (arXiv:1910.10683 §2.2): every
    W-token chunk keeps only its first corpus-wide occurrence (min
    (doc_id, chunk_idx)); each document is rebuilt from its surviving
    chunks in order. Output: per-doc chunk counts + the cleaned text.

    Scale shape: ONE exchange on the chunk key — the canonical pick is
    a sort-free min(struct) window (no row_number sort), then the
    rebuild is one doc_id-keyed aggregate whose collect_list holds only
    the document's own chunks (bounded by doc length, never corpus
    size). No join back: the winner flag rides the same window. At
    100 TB the chunk key would be xxhash64-fingerprinted pre-shuffle
    exactly like dup_span_stats_fp; the raw string key here keeps the
    DuckDB oracle grouping on an identical key."""
    docs = read_table(spark, sf_dir, "documents")
    ch = _chunks(docs)
    occ = F.struct(F.col("doc_id"), F.col("chunk_idx"))
    flagged = ch.withColumn(
        "kept",
        F.min(occ).over(Window.partitionBy("chunk")) == occ,
    )
    return _rebuild_docs(flagged, "kept", "n_kept")


# --------------------------- boilerplate_strip ---------------------------


@register(
    "boilerplate_strip",
    driver=False,
    oracle=f"""
WITH {_chunks_cte()},
bp AS (
  SELECT source, chunk FROM ch
  GROUP BY source, chunk HAVING count(DISTINCT doc_id) >= {BP_MIN}
)
SELECT ch.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN bp.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       coalesce(string_agg(CASE WHEN bp.chunk IS NULL THEN ch.chunk END, ' ' ORDER BY ch.chunk_idx), '') AS clean_text
FROM ch LEFT JOIN bp ON ch.source = bp.source AND ch.chunk = bp.chunk
GROUP BY ch.doc_id
""",
)
def boilerplate_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate removal (RefinedWeb/CCNet shape): a chunk
    occurring in >= BP_MIN distinct documents of the SAME source is a
    template artifact (header/footer/nav) and every occurrence is cut —
    unlike chunk_dedup, the first copy does not survive.

    Scale shape: the boilerplate census and the flagging join both key
    on (source, chunk) — one hash partitioning computed once and reused
    (AQE reuses the exchange). The boilerplate set is NOT assumed
    broadcastable: per-source template chunks are few relative to the
    corpus but unbounded in aggregate, so this stays a shuffle join.
    Rebuild is the same bounded per-doc aggregate as chunk_dedup."""
    docs = read_table(spark, sf_dir, "documents")
    ch = _chunks(docs)
    bp = (
        ch.groupBy("source", "chunk")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BP_MIN)
        .select("source", "chunk", F.lit(True).alias("is_bp"))
    )
    flagged = ch.join(bp, ["source", "chunk"], "left")
    rebuilt = _rebuild_docs(flagged, F.col("is_bp").isNull(), "n_kept")
    return rebuilt.select(
        "doc_id",
        "n_chunks",
        (F.col("n_chunks") - F.col("n_kept")).alias("n_boiler"),
        "clean_text",
    )


# ---------------------------- dup_span_remove ----------------------------


@register(
    "dup_span_remove",
    driver=False,
    oracle=f"""
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
dup AS (
  SELECT g.doc_id, g.pos, g.gram,
         row_number() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM g JOIN gd USING (gram)
),
rem AS (
  SELECT DISTINCT doc_id, pos + o AS ridx
  FROM dup, unnest(generate_series(0, {SPAN_N - 1})) t(o)
  WHERE rn > 1
),
ra AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM rem GROUP BY doc_id),
tp AS (
  SELECT doc_id, CAST(i AS BIGINT) AS idx, toks[i] AS t
  FROM tok, unnest(generate_series(1, len(toks))) s(i)
),
keep AS (
  SELECT tp.doc_id, tp.idx, tp.t
  FROM tp LEFT JOIN rem ON tp.doc_id = rem.doc_id AND tp.idx = rem.ridx
  WHERE rem.doc_id IS NULL
),
ct AS (SELECT doc_id, string_agg(t, ' ' ORDER BY idx) AS clean_text FROM keep GROUP BY doc_id)
SELECT tok.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       coalesce(ra.n_removed, 0) AS n_removed,
       coalesce(ct.clean_text, '') AS clean_text
FROM tok LEFT JOIN ra USING (doc_id) LEFT JOIN ct USING (doc_id)
""",
)
def dup_span_remove_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remover for Lee et al. 2022 duplicated spans: each cross-doc
    duplicated token {SPAN_N}-gram keeps exactly one canonical occurrence
    (lexicographic min (doc_id, pos)); every position covered by any
    NON-canonical occurrence is cut and the document rebuilt from its
    surviving tokens in order. dup_span_stats measures; this rewrites.

    Scale shape: the gram shuffle happens ONCE (same single-exchange
    discipline as dup_span_stats, which this shares its gram CTE with);
    the canonical pick is a sort-free min(struct) window on that same
    partitioning. Removed positions collapse to a per-doc array via
    collect_set (bounded by doc length), and the rebuild is an
    index-aware array filter on the token list — the full token stream
    is never shuffled; only DUPLICATED positions (a small corpus
    fraction) cross the wire. At 100 TB the gram key would be
    fingerprinted pre-shuffle (dup_span_stats_fp); raw strings here keep
    the oracle key identical."""
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
    gd = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    occ = F.struct(F.col("doc_id"), F.col("pos"))
    noncanon = (
        g.join(gd, "gram")
        .withColumn("_canon", F.min(occ).over(Window.partitionBy("gram")))
        .filter(F.col("_canon") != occ)
    )
    rem = (
        noncanon.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (SPAN_N - 1))).alias(
                "ridx"
            ),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("ridx").alias("rem"))
    )
    empty = F.array().cast("array<bigint>")
    return tok.join(rem, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.coalesce(F.size("rem"), F.lit(0)).cast("bigint").alias("n_removed"),
        F.concat_ws(
            " ",
            F.filter(
                F.col("toks"),
                lambda t, i: ~F.array_contains(
                    F.coalesce(F.col("rem"), empty), (i + 1).cast("bigint")
                ),
            ),
        ).alias("clean_text"),
    )


# ------------------------------ dsir_select ------------------------------


@register(
    "dsir_select",
    driver=False,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_SQL_TOKS}) AS t FROM documents
),
b AS (
  SELECT doc_id, lang, {hash_bucket_sql("t", DSIR_BUCKETS, "dsir")} AS b FROM tok
),
stats AS (
  SELECT b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt,
         count(*) AS r_cnt
  FROM b GROUP BY b
),
sc AS (SELECT b, ((t_cnt + 1) * 1000000) // (r_cnt + 1) AS score FROM stats),
d AS (
  SELECT doc_id, lang, CAST(sum(score) // count(*) AS BIGINT) AS weight
  FROM b JOIN sc USING (b) GROUP BY doc_id, lang
)
SELECT doc_id, lang, weight, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS INT) AS rank
  FROM d
) WHERE rank <= {DSIR_TOP_N}
""",
)
def dsir_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (arXiv:2302.03169) importance selection: estimate hashed
    unigram-bucket distributions for the TARGET slice (lang='en' stands
    in for "high-quality domain") and the RAW corpus, weight every
    document by its tokens' target/raw likelihood ratios, and keep the
    top-N. The ratio is the exact integer micro-rational
    ((t_b+1)*1e6) DIV (r_b+1) — add-one smoothed, monotone in the true
    ratio, bit-identical across engines (bm25_topk's idf discipline;
    log-sums would differ in final ulps). (t_b+1)*1e6 stays inside
    int64 until a single bucket holds ~9.2e12 target tokens — at that
    corpus size you'd widen DSIR_BUCKETS anyway. The document weight is
    the MEAN per-token score (integer DIV by token count): the raw sum
    is monotone in document length, which would make "select top-N"
    degenerate to "select the longest documents"; the mean measures
    target-likeness at any length (on the fixture corpus it lifts the
    target slice from 39% of the corpus to ~59% of the selection).

    Scale shape: two token scans, zero wide joins — scan 1 aggregates
    both distributions in ONE pass (conditional sums after a single
    bucket-key exchange of B=256 partial rows per task); the 256-row
    score table then broadcasts into scan 2 (plan-asserted), and the
    per-doc weight is a doc_id-keyed partial agg. Top-N is
    TakeOrderedAndProject; the rank back-fill is a window over the
    already-limited {DSIR_TOP_N} rows, never the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(_tokens(F.col("text"))).alias("t")
    ).withColumn("b", hash_bucket(F.col("t"), DSIR_BUCKETS, "dsir"))
    stats = toks.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    scores = stats.select(
        "b", F.expr("((t_cnt + 1) * 1000000) DIV (r_cnt + 1)").alias("score")
    )
    weighted = (
        toks.join(F.broadcast(scores), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.expr("sum(score) DIV count(*)").cast("bigint").alias("weight")
        )
    )
    top = weighted.orderBy(F.col("weight").desc(), "doc_id").limit(DSIR_TOP_N)
    return top.select(
        "doc_id",
        "lang",
        "weight",
        F.row_number()
        .over(Window.orderBy(F.col("weight").desc(), "doc_id"))
        .cast("int")
        .alias("rank"),
    )


# --------------------------- ann_recall_report ---------------------------


@register(
    "ann_recall_report",
    driver=False,
    oracle=f"""
WITH {_vec_cte()},
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
      FROM vn WHERE vec_id < {ANN_QUERIES}),
ex_scored AS (
  SELECT q.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.vec_id <> q.query_id
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM ex_scored
  ) WHERE rank <= {ANN_K}
),
ap_scored AS (
  SELECT q.query_id, vn.vec_id AS neighbor_id,
         floor(({_DOT.format(a="vn.emb", b="q.q_emb")} / (vn.nrm * q.q_nrm)) * 1000000) / 1000000 AS cos_sim
  FROM vn JOIN q ON vn.bucket = q.q_bucket AND vn.vec_id <> q.query_id
),
ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM ap_scored
  ) WHERE rank <= {ANN_K}
),
hit AS (
  SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_found
  FROM ex JOIN ap USING (query_id, neighbor_id) GROUP BY ex.query_id
),
base AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY query_id)
SELECT base.query_id, base.n_exact,
       coalesce(hit.n_found, 0) AS n_found,
       coalesce(hit.n_found, 0) / base.n_exact AS recall
FROM base LEFT JOIN hit USING (query_id)
""",
)
def ann_recall_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for the ANN family (lsh_recall_report's twin on the
    embedding side): exact brute-force cosine top-k vs the single-probe
    IVF bucket answer, per-query recall@k. found ⊆ true is NOT
    guaranteed here (the probe can rank a different same-bucket vector
    into its top-k), so recall counts the intersection.

    Scale shape: the audit reuses the production operators unchanged —
    brute force on the broadcast query panel is the truth side (cost ∝
    |queries| × corpus, the panel size is the knob, exactly like
    lsh_recall_report's sample rate), the probe side is the bucketed
    operator under test. The intersection and the per-query ratios run
    on 2·|queries|·k rows — nothing."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = ann_topk_bruteforce(emb, n_queries=ANN_QUERIES, k=ANN_K).select(
        "query_id", "neighbor_id"
    )
    ap = ann_topk_bucketed(emb, n_queries=ANN_QUERIES, k=ANN_K).select(
        "query_id", "neighbor_id"
    )
    hit = (
        ex.join(ap, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    )
    base = ex.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return base.join(hit, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_found", F.lit(0)).cast("bigint").alias("n_found"),
        (
            F.coalesce("n_found", F.lit(0)).cast("double") / F.col("n_exact")
        ).alias("recall"),
    )


# ------------------------- streaming_chunk_clean -------------------------

CHUNK_STORE_BUCKETS = 16  # cb= partition fan-out of the chunk-hash store


def chunk_clean_increment(
    batch_docs: DataFrame, seen: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """One incremental chunk-clean step: clean ``batch_docs`` against the
    chunk-hash store ``seen`` (columns (cb, ch_h); None = empty store).
    Returns ``(cleaned, delta)`` — the batch's rebuilt documents and the
    store delta of the batch's NEW chunk hashes (unique per ch_h by
    construction: only the batch-min occurrence of an unseen chunk is
    kept). First-occurrence-keep is prefix-monotone, so folding this
    step over any id-ordered partition of a corpus reproduces the
    single-shot chunk_dedup — property-tested across arbitrary splits in
    tests/test_round4_ops.py, and exercised through a real readStream in
    ``streaming_chunk_clean``."""
    ch = _chunks(batch_docs).withColumn("ch_h", F.md5("chunk")).withColumn(
        "cb",
        (
            F.conv(F.substring("ch_h", 1, 4), 16, 10).cast("bigint")
            % CHUNK_STORE_BUCKETS
        ).cast("int"),
    )
    occ = F.struct(F.col("doc_id"), F.col("chunk_idx"))
    ch = ch.withColumn("bmin", F.min(occ).over(Window.partitionBy("ch_h")) == occ)
    if seen is not None:
        ch = ch.join(
            seen.select("cb", "ch_h").withColumn("seen", F.lit(True)),
            ["cb", "ch_h"],
            "left",
        )
    else:
        ch = ch.withColumn("seen", F.lit(None).cast("boolean"))
    ch = ch.withColumn("kept", F.col("bmin") & F.col("seen").isNull())
    delta = ch.filter(F.col("kept")).select("cb", "ch_h")
    cleaned = _rebuild_docs(ch, "kept", "n_kept")
    return cleaned, delta


def _earlier_chunk_deltas(base: str, epoch_id: int) -> list[str]:
    """Delta dirs of STRICTLY earlier epochs (replay-safe history probe:
    a retried micro-batch must never read its own half-written delta)."""
    import glob
    import os

    return sorted(
        p
        for p in glob.glob(os.path.join(base, "chunk_e*"))
        if int(os.path.basename(p)[len("chunk_e"):]) < epoch_id
    )


@register(
    "streaming_chunk_clean",
    driver=False,
    oracle=_CHUNK_DEDUP_ORACLE,
)
def streaming_chunk_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk_dedup as a REAL Structured Streaming ingest (the
    streaming_dedup_ingest discipline applied to the C4 chunk rule):
    documents arrive as files in three epochs (mtimes pinned so arrival
    order == doc_id order), and each micro-batch cleans ITS documents
    against an append-only chunk-hash store — a chunk survives iff it
    is new to the store AND the batch-min occurrence. The epoch then
    publishes only its own NEW chunk hashes as a delta directory
    partitioned by ``cb=<hash bucket>`` (LSM-style: O(batch) files per
    epoch, earlier deltas never touched; an epoch retry overwrites its
    own delta idempotently). The store carries md5 hashes, never chunk
    text — 16 bytes per distinct chunk crosses the probe join.

    End state must equal the single-shot batch chunk_dedup — the SAME
    oracle checks this entry, proving incremental ≡ batch through the
    streaming path (the property that makes per-epoch cleaning safe:
    first-occurrence-keep is prefix-monotone, so cleaning each epoch
    against the union of earlier epochs composes to the global rule).

    Scale shape per epoch: one chunk-key window inside the batch, one
    probe join against the store pruned to the batch's cb buckets
    (partition-column filter pushes through the per-delta scans), one
    doc_id rebuild agg, one partitioned delta write."""
    import glob
    import os

    from functools import reduce

    from .scratch import scratch_dir

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    base = scratch_dir(prefix="stream_chunk_")
    # Public audit hook: tests assert the store's on-disk layout
    # (append-only per-epoch deltas, cb= partitioning) and need this
    # call's scratch base without reaching into scratch internals.
    _STREAM_CHUNK_TL.base = base
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
        (pq,) = glob.glob(os.path.join(pdir, f"_e={i}", "*.parquet"))
        dst = os.path.join(src, f"ingest_{i}.parquet")
        os.rename(pq, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # arrival order = id order

    out_dir = os.path.join(base, "clean")

    def _step(batch_df, epoch_id):
        s = batch_df.sparkSession
        # STRICTLY earlier epochs only: on a micro-batch retry the glob
        # would otherwise match this epoch's own half-written delta, and
        # cleaning the batch against itself marks every chunk seen —
        # emptying the retried delta (hashes lost forever) and the
        # rebuilt texts. Epoch ids are the replay-stable filter.
        deltas = _earlier_chunk_deltas(base, int(epoch_id))
        seen = (
            # each delta keeps its own cb= partition discovery; the join
            # key includes cb so the filter prunes files across history
            reduce(DataFrame.unionByName, [s.read.parquet(p) for p in deltas])
            if deltas
            else None
        )
        cleaned, delta = chunk_clean_increment(batch_df, seen)
        delta.repartition("cb").write.mode("overwrite").partitionBy("cb").parquet(
            os.path.join(base, f"chunk_e{int(epoch_id):06d}")
        )
        # per-epoch dir + overwrite: a replayed epoch replaces its own
        # output instead of appending a duplicate copy
        cleaned.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"e{int(epoch_id):06d}")
        )

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
    return spark.read.parquet(os.path.join(out_dir, "e*"))


# -------------------------- gopher_rules_report --------------------------

GOPHER_WC_MIN, GOPHER_WC_MAX = 20, 100_000
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 3_000_000, 10_000_000  # micro chars/word
GOPHER_STOP_MIN = 2  # distinct stopwords required
GOPHER_TOP_SHARE_MAX = 200_000  # micro: top token <= 20% of doc
_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "gopher_rules_report",
    driver=False,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS wc,
         CAST(list_reduce(list_transform(toks, t -> len(t)), (acc, v) -> acc + v)
              * 1000000 // len(toks) AS BIGINT) AS mwl_micro,
         CAST(len(list_intersect(list_distinct(toks), [{_STOP_SQL}])) AS BIGINT) AS stop_hits,
         CAST(list_max(list_transform(list_distinct(toks),
              x -> len(list_filter(toks, t -> t = x))))
              * 1000000 // len(toks) AS BIGINT) AS top_share_micro
  FROM tok WHERE len(toks) >= 1
)
SELECT doc_id, wc, mwl_micro, stop_hits, top_share_micro,
       (wc BETWEEN {GOPHER_WC_MIN} AND {GOPHER_WC_MAX}) AS r_wordcount,
       (mwl_micro BETWEEN {GOPHER_MWL_MIN} AND {GOPHER_MWL_MAX}) AS r_wordlen,
       (stop_hits >= {GOPHER_STOP_MIN}) AS r_stopwords,
       (top_share_micro <= {GOPHER_TOP_SHARE_MAX}) AS r_repetition,
       ((wc BETWEEN {GOPHER_WC_MIN} AND {GOPHER_WC_MAX})
        AND (mwl_micro BETWEEN {GOPHER_MWL_MIN} AND {GOPHER_MWL_MAX})
        AND (stop_hits >= {GOPHER_STOP_MIN})
        AND (top_share_micro <= {GOPHER_TOP_SHARE_MAX})) AS keep
FROM m
""",
)
def gopher_rules_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filtering (Rae et al., arXiv:2112.11446
    A1.1, adapted to the fixture corpus): per-document hard rules —
    word-count bounds, mean-word-length bounds, minimum distinct
    stopwords, and a repetition cap on the top token's share — each
    reported as its own boolean beside the raw metric, plus the AND'd
    keep verdict. The rule-based complement to quality_filter's
    score-quantile cut: rules are auditable per document (you can see
    WHICH rule killed a doc), need no corpus pass to calibrate, and are
    the standard first gate before model-based scoring.

    Scale shape: pure per-row expressions over the token array — ONE
    scan, ZERO exchanges (plan-asserted), whole-stage codegen. The
    top-token share is O(|toks|·|distinct|) per doc inside
    transform/filter higher-order expressions — bounded by doc length,
    embarrassingly parallel, no Python. Ratios are integer micro values
    (×1e6 DIV) so both engines compare exact integers."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    m = docs.select(
        "doc_id", toks.alias("toks")
    ).filter(F.size("toks") >= 1).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("wc"),
        F.expr(
            "CAST(aggregate(transform(toks, t -> length(t)), 0L, (acc, v) -> acc + v)"
            " * 1000000 DIV size(toks) AS BIGINT)"
        ).alias("mwl_micro"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.col("toks")),
                F.array(*[F.lit(w) for w in _STOPWORDS]),
            )
        )
        .cast("bigint")
        .alias("stop_hits"),
        F.expr(
            "CAST(array_max(transform(array_distinct(toks),"
            " x -> size(filter(toks, t -> t = x))))"
            " * 1000000 DIV size(toks) AS BIGINT)"
        ).alias("top_share_micro"),
    )
    r_wc = F.col("wc").between(GOPHER_WC_MIN, GOPHER_WC_MAX)
    r_mwl = F.col("mwl_micro").between(GOPHER_MWL_MIN, GOPHER_MWL_MAX)
    r_stop = F.col("stop_hits") >= GOPHER_STOP_MIN
    r_rep = F.col("top_share_micro") <= GOPHER_TOP_SHARE_MAX
    return m.select(
        "doc_id",
        "wc",
        "mwl_micro",
        "stop_hits",
        "top_share_micro",
        r_wc.alias("r_wordcount"),
        r_mwl.alias("r_wordlen"),
        r_stop.alias("r_stopwords"),
        r_rep.alias("r_repetition"),
        (r_wc & r_mwl & r_stop & r_rep).alias("keep"),
    )
