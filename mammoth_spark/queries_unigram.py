"""Unigram-LM tokenizer training (the SentencePiece family — Kudo 2018),
completing the tokenizer loop next to BPE (queries_corpus.py): where BPE
grows a vocab bottom-up by greedy pair merges, the unigram model starts
from an over-complete substring vocabulary and re-estimates piece scores
by EM, segmenting each word with Viterbi under the current scores.

Simplifications relative to production SentencePiece, chosen so both
engines compute the SAME deterministic answer:

- **Hard (Viterbi) EM** instead of forward-backward expectations: the
  E-step charges each word's full frequency to its single best
  segmentation. Deterministic, and the M-step count table stays integer.
- **Integer micro-log scoring**: a segmentation's cost is
  ``sum_i (mlog(total) - mlog(cnt_i))`` with
  ``mlog(x) = floor(ln(x) * 1e6)`` — bigint arithmetic end to end (the
  tfidf/drift-wave convention: ln is applied per row to doubles derived
  from exact integers, never summed as floats), so DP comparisons can
  never diverge across engines on summation order. The per-piece term is
  >= 0, and minimizing total cost == maximizing the unigram-LM
  log-likelihood sum(ln(cnt_i/total)).
- **No vocabulary pruning schedule**: EM_ROUNDS fixed small; the M-step
  keeps exactly the pieces used by some best segmentation (unused pieces
  carry zero expected count — the degenerate limit of SentencePiece's
  shrinking step). Every word stays segmentable in round r+1 because its
  round-r best segmentation only uses kept pieces.
- **Tie-breaks are total**: (cost asc, piece-count asc, piece-length
  string asc). The length string is digit chars, and two distinct
  segmentations of the same prefix can never relate as string-prefixes
  (digit sums differ), so lexicographic order is decided inside the
  common length — which makes the greedy per-(word, pos) DP merge agree
  with the oracle's global argmin over whole segmentations.

Scale shape (the BPE precedent, reference-free — the reference
implements no tokenizer; SURVEY §2 Table B): all EM work runs on the
DISTINCT-WORD table weighted by frequency (vocabulary-sized, Heaps'-law
sublinear), never on the token stream. The only data-sized job at any SF
is the ONE initial word-frequency shuffle. Per EM round, the Viterbi DP
is ONE pass: explode <= W_MAX x P_MAX candidate substrings,
BroadcastHashJoin against the piece table (bounded: <= V_MULTI + alphabet
rows), one groupBy(word) edge-collect, then the whole forward DP rolls
inside a single higher-order ``aggregate`` expression per row (r13: this
replaced W_MAX distributed relaxation rounds — 12 exchanges per EM round
— with one, bit-identical results). The
DuckDB oracle replicates the arithmetic but swaps the DP for exhaustive
recursive-CTE enumeration of all segmentations — affordable at oracle
scale (<= tetranacci(W_MAX) ~ 1.5k paths/word), impossible at 100 TB,
which is exactly why the engine side is the DP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

W_MAX = 12  # max word length trained on (SentencePiece max_sentencepiece_length analog)
P_MAX = 4  # max piece length in the seed vocabulary
V_MULTI = 300  # multi-char seed pieces kept (all single chars always kept)
EM_ROUNDS = 2  # full Viterbi-EM cycles
K_OUT = 40  # final vocabulary rows reported
_MLOG = 1_000_000


def _word_table(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """Frequency-weighted distinct words (the one data-sized shuffle).

    Same word definition as the BPE trainer (split on space, lowercase
    alpha, >= 2 chars) plus the W_MAX cap that bounds both the DP depth
    and the oracle's enumeration. ``checkpoint=False`` keeps the lineage
    visible for the plan tests (checkpointing truncates it).
    """
    tf = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .filter(F.length("word") <= W_MAX)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return tf.localCheckpoint() if checkpoint else tf


def _seed_vocab(words: DataFrame) -> DataFrame:
    """Over-complete seed: every substring of length 1..P_MAX, corpus
    frequency = sum(word freq x occurrences-in-word); keep all single
    chars (guarantees segmentability) + the top V_MULTI multi-char
    pieces by (cnt desc, piece asc) — a bounded TakeOrdered, never a
    global sort of the data."""
    subs = (
        words.select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("s"),
        )
        .select(
            "word",
            "freq",
            "s",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(P_MAX), F.length("word") - F.col("s") + 1),
                )
            ).alias("l"),
        )
        .select(F.expr("substring(word, s, l)").alias("piece"), "freq")
    )
    cnts = subs.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("cnt"))
    chars = cnts.filter(F.length("piece") == 1)
    multi = (
        cnts.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(V_MULTI)
    )
    return chars.unionByName(multi)


def _edge_table(words: DataFrame, pieces: DataFrame) -> DataFrame:
    """Per-word DP edge list: every (start, len) substring of the word
    that is a vocabulary piece, with its micro-log cost. The candidate
    substrings explode JVM-side (<= P_MAX per position) and probe the
    BOUNDED piece table via BroadcastHashJoin — plan-asserted: this is
    the step that would become a data-sized shuffle if the piece table
    were ever joined shuffled. ONE groupBy(word) collects the edges
    (<= W_MAX x P_MAX structs, order-independent downstream)."""
    return (
        words.select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("s"),
        )
        .select(
            "word",
            "freq",
            "s",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(P_MAX), F.length("word") - F.col("s") + 1),
                )
            ).alias("l"),
        )
        .withColumn("sub", F.expr("substring(word, s, l)"))
        .join(F.broadcast(pieces), F.col("sub") == F.col("piece"))
        .groupBy("word")
        .agg(
            F.any_value("freq").alias("freq"),
            F.collect_list(
                F.struct(
                    F.col("s").alias("s"),
                    F.col("l").alias("l"),
                    F.col("pcost").alias("pcost"),
                    F.col("sub").alias("p"),
                )
            ).alias("edges"),
        )
    )


def _viterbi_best(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Best segmentation per word under integer micro-log costs.

    Forward DP per word, run as ONE codegen'd expression (r13
    optimization): the bounded piece table broadcast-joins the word's
    candidate substrings once, one groupBy(word) collects the <= W_MAX x
    P_MAX matching edges, and ``aggregate(sequence(1, len), ...)`` rolls
    best (cost, nseg, lens, pcs) forward position by position inside the
    row — ``acc[i]`` holds the best struct for the length-(i-1) prefix
    (NULL when unreachable), each step min-merges the candidates ending
    at that position (``array_min`` skips NULLs), and the answer is the
    final entry. Replaces the previous W_MAX distributed relaxation
    rounds (union + groupBy shuffle each, 12 exchanges + periodic
    localCheckpoints per EM round) with exactly ONE exchange per EM
    round; the per-(word,pos) greedy min under the (cost, nseg, lens)
    total order is unchanged, so results are bit-identical (equal lens
    implies identical boundaries, hence identical pcs — the tie-break
    is total). Returns one row per segmentable word: freq, nseg, pcs.
    """
    mlog_total = int(
        vocab.agg(
            F.floor(F.log(F.sum("cnt").cast("double")) * _MLOG)
            .cast("bigint")
            .alias("mt")
        ).collect()[0]["mt"]
    )  # bounded scalar collect (driver control, not data)
    pieces = vocab.select(
        "piece",
        (
            F.lit(mlog_total)
            - F.floor(F.log(F.col("cnt").cast("double")) * _MLOG).cast("bigint")
        ).alias("pcost"),
    )

    edges = _edge_table(words, pieces)

    init = F.array(
        F.struct(
            F.lit(0).cast("bigint").alias("cost"),
            F.lit(0).alias("nseg"),
            F.lit("").alias("lens"),
            F.array().cast("array<string>").alias("pcs"),
        )
    )

    def _step(acc, p):
        def _cand(e):
            pred = F.element_at(acc, e["s"])
            return F.when(
                (e["s"] + e["l"] - 1 == p) & pred.isNotNull(),
                F.struct(
                    (pred["cost"] + e["pcost"]).alias("cost"),
                    (pred["nseg"] + 1).alias("nseg"),
                    F.concat(pred["lens"], e["l"].cast("string")).alias("lens"),
                    F.concat(pred["pcs"], F.array(e["p"])).alias("pcs"),
                ),
            )

        return F.concat(acc, F.array(F.array_min(F.transform(F.col("edges"), _cand))))

    best = F.element_at(
        F.aggregate(F.sequence(F.lit(1), F.length("word")), init, _step),
        F.length("word") + 1,
    )
    return (
        edges.select("word", "freq", best.alias("b"))
        .filter(F.col("b").isNotNull())
        .select(
            "word",
            "freq",
            F.col("b.nseg").alias("nseg"),
            F.col("b.pcs").alias("pcs"),
        )
    )


def _em_counts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Run the EM loop; returns (words, final piece-count table)."""
    words = _word_table(spark, sf_dir)
    vocab = _seed_vocab(words).localCheckpoint()
    best = None
    for _ in range(EM_ROUNDS):
        best = _viterbi_best(words, vocab)
        vocab = (
            best.select("freq", F.explode("pcs").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .localCheckpoint()
        )
    return best, vocab


# One oracle building block per EM round: exhaustive recursive-CTE
# enumeration of all segmentations under vocab {v}, then the global
# argmin per word with the same (cost, nseg, lens) tie-break.
_ORACLE_ROUND = """
t{r} AS (SELECT CAST(floor(ln(sum(cnt)) * 1000000) AS BIGINT) AS mt FROM {v}),
p{r} AS (SELECT piece,
               (SELECT mt FROM t{r})
               - CAST(floor(ln(cnt) * 1000000) AS BIGINT) AS pcost
        FROM {v}),
seg{r} AS (
  SELECT word, freq, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS nseg,
         '' AS lens, CAST([] AS VARCHAR[]) AS pcs
  FROM tf
  UNION ALL
  SELECT s.word, s.freq, s.pos + length(p.piece), s.cost + p.pcost,
         s.nseg + 1, s.lens || CAST(length(p.piece) AS VARCHAR),
         list_append(s.pcs, p.piece)
  FROM seg{r} s JOIN p{r} p
    ON s.pos < length(s.word)
   AND substr(s.word, s.pos + 1, length(p.piece)) = p.piece
),
best{r} AS (
  SELECT word, freq, nseg, pcs FROM (
    SELECT word, freq, nseg, pcs,
           row_number() OVER (PARTITION BY word
                              ORDER BY cost, nseg, lens) AS rn
    FROM seg{r} WHERE pos = length(word)
  ) WHERE rn = 1
),
cnt{rnext} AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT unnest(pcs) AS piece, freq FROM best{r})
  GROUP BY piece
)"""

_ORACLE_BASE = f"""
WITH RECURSIVE
tf AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE regexp_matches(word, '^[a-z]{{2,}}$') AND length(word) <= {W_MAX}
  GROUP BY word
),
subs AS (
  SELECT substr(word, s, l) AS piece, freq
  FROM tf,
       unnest(range(1, length(word) + 1)) AS ts(s),
       unnest(range(1, least({P_MAX}, length(word) - s + 1) + 1)) AS tl(l)
),
cnt0 AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM subs GROUP BY piece),
v0 AS (
  SELECT piece, cnt FROM cnt0 WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM cnt0 WHERE length(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {V_MULTI}
  )
),""" + ",".join(
    _ORACLE_ROUND.format(r=r, v=("v0" if r == 0 else f"cnt{r}"), rnext=r + 1)
    for r in range(EM_ROUNDS)
)


@register(
    "unigram_lm_train",
    oracle=_ORACLE_BASE
    + f"""
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank,
       piece, cnt
FROM cnt{EM_ROUNDS} ORDER BY cnt DESC, piece LIMIT {K_OUT}
""",
)
def unigram_lm_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM vocabulary: seed substring counts, then
    EM_ROUNDS of (Viterbi segmentation of every distinct word under
    integer micro-log scores -> integer count re-estimation). Reports the
    top K_OUT pieces of the final count table — the trained vocabulary
    head, rank-stable across engines by the (cnt desc, piece asc) order.
    """
    _, vocab = _em_counts(spark, sf_dir)
    w = Window.orderBy(F.desc("cnt"), "piece")
    return (
        vocab.orderBy(F.desc("cnt"), "piece")
        .limit(K_OUT)
        .select(F.row_number().over(w).cast("int").alias("rank"), "piece", "cnt")
    )


@register(
    "unigram_encode_stats",
    oracle=_ORACLE_BASE
    + f"""
SELECT CAST(sum(freq) AS BIGINT) AS n_words,
       CAST(sum(freq * nseg) AS BIGINT) AS n_pieces,
       CAST(sum(freq * nseg) * 1000 // sum(freq) AS BIGINT)
         AS pieces_per_kword
FROM best{EM_ROUNDS - 1}
""",
)
def unigram_encode_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the trained model: every corpus word is
    charged its final-round Viterbi piece count, weighted by frequency —
    the compression-rate report (pieces per 1000 words, integer DIV
    micro-rational) a tokenizer team tracks across vocab sizes. The
    corpus side never re-runs the DP: the distinct-word best-segmentation
    table carries the token stream's full weight by construction."""
    best, _ = _em_counts(spark, sf_dir)
    return best.agg(
        F.sum("freq").cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * F.col("nseg")).cast("bigint").alias("n_pieces"),
        # integer DIV on both sides — a double divide would truncate off
        # a ...99999 representation where DuckDB's // stays exact
        F.expr("CAST(sum(freq * nseg) * 1000 DIV sum(freq) AS BIGINT)").alias(
            "pieces_per_kword"
        ),
    )
