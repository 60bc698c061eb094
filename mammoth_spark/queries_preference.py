"""Preference aggregation and behavior transitions — the
arena/judge-panel half of an LLM data pipeline: turn pairwise duels
into strengths and rankings, and event streams into transition models.

- ``bt_strength_duels``: Bradley-Terry strengths via the MM update
  (Hunter, Annals of Statistics 2004: s_i' = W_i / sum_j n_ij/(s_i+s_j))
  — the estimator behind chatbot-arena-style leaderboards. Duels are
  derived deterministically from the fixture: within each multi-line
  order, the supplier of the top line (quantity desc, suppkey asc)
  beats the supplier of the second line. The MM loop runs R=3 rounds on
  the PLAYER-sized strength table (suppliers — dozens) against the
  PAIR-sized game table (<= P^2/2 rows); per-pair contributions floor
  to integers BEFORE the per-player sum (the no-float-crosses-rows
  convention) and the update is integer div, so the trajectory is
  bit-identical cross-engine.

- ``preference_winrate``: per-player win/loss counts, win rate, and the
  WILSON LOWER BOUND (z=1.96) — the ranking-safe statistic (a 2-0
  player must not outrank a 95-5 player). The Wilson expression is one
  per-row double tree over integer inputs; +,-,*,/ and sqrt are all
  IEEE-correctly-rounded, and both engines evaluate the SAME
  parenthesization, so the micro-floored result is exact cross-engine
  with no libm assumption (unlike ln/exp).

- ``event_transition_matrix``: first-order Markov transitions over each
  user's time-ordered event stream (lead() within user) with
  row-normalized micro probabilities — the behavioral prior a
  recommendation or anomaly model trains on.

Scale posture: duels are one window over lineitem partitioned by order
(co-partitioned top-2, no self-join); everything after folds to
player- and pair-sized tables — the BPE/kmeans bounded-driver-control
class. Transitions partition by user (never global), and the matrix is
event-type^2-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .model import read_table
from .registry import register

BT_ROUNDS = 3
S0 = 1_000_000  # initial strength, micros
BT_SCALE = 10**12  # numerator scale for the MM division
WILSON_Z = 1.96
PROB_SCALE = 1_000_000

def _duels_sql() -> str:
    """Per order: rank lines by (quantity desc, suppkey asc); line 1's
    supplier beats line 2's. Explicit window ranking (a min_by/max_by
    shortcut mis-handles the 2nd-place row)."""
    return """
  SELECT w AS winner, l AS loser FROM (
    SELECT l_orderkey,
           any_value(CASE WHEN rn = 1 THEN l_suppkey END) AS w,
           any_value(CASE WHEN rn = 2 THEN l_suppkey END) AS l
    FROM (
      SELECT l_orderkey, l_suppkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_quantity DESC, l_suppkey) AS rn
      FROM lineitem)
    WHERE rn <= 2 GROUP BY l_orderkey
  ) WHERE l IS NOT NULL AND w <> l
"""


def _duels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_quantity"), F.asc("l_suppkey")
    )
    top2 = li.select(
        "l_orderkey", "l_suppkey", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    per_order = top2.groupBy("l_orderkey").agg(
        # max over {NULL, value}: exactly one non-null per group (rn is
        # unique), and unlike any_value it never returns the NULL arm
        F.max(F.when(F.col("rn") == 1, F.col("l_suppkey"))).alias("winner"),
        F.max(F.when(F.col("rn") == 2, F.col("l_suppkey"))).alias("loser"),
    )
    return per_order.filter(
        F.col("loser").isNotNull() & (F.col("winner") != F.col("loser"))
    ).select("winner", "loser")


def _bt_ctes(rounds: int) -> str:
    """Unrolled MM iterations (the BPE-oracle convention)."""
    out = [
        f"duels AS ({_duels_sql()})",
        """dirpairs AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT winner AS i, loser AS j FROM duels
    UNION ALL SELECT loser AS i, winner AS j FROM duels)
  GROUP BY i, j
)""",
        """wins AS (
  SELECT p.i, CAST(coalesce(w.nw, 0) AS BIGINT) AS w
  FROM (SELECT DISTINCT i FROM dirpairs) p
  LEFT JOIN (SELECT winner AS i, count(*) AS nw FROM duels GROUP BY winner) w
    ON p.i = w.i
)""",
        f"s0 AS (SELECT i, CAST({S0} AS BIGINT) AS s FROM wins)",
    ]
    for r in range(1, rounds + 1):
        out.append(
            f"""d{r} AS (
  SELECT p.i,
         CAST(sum(CAST((CAST(p.n AS HUGEINT) * {BT_SCALE})
                       // greatest(si.s + sj.s, 1) AS BIGINT)) AS BIGINT) AS d
  FROM dirpairs p
  JOIN s{r - 1} si ON si.i = p.i
  JOIN s{r - 1} sj ON sj.i = p.j
  GROUP BY p.i
),
s{r} AS (
  SELECT w.i,
         CAST(CASE WHEN d.d > 0
                   THEN (CAST(w.w AS HUGEINT) * {BT_SCALE}) // d.d
                   ELSE 0 END AS BIGINT) AS s
  FROM wins w JOIN d{r} d ON d.i = w.i
)"""
        )
    return ",\n".join(out)


@register(
    "bt_strength_duels",
    driver=False,
    oracle=f"""
WITH {_bt_ctes(BT_ROUNDS)}
SELECT s.i AS suppkey, w.w AS n_wins, s.s AS strength_micro,
       CAST((CAST(s.s AS HUGEINT) * {PROB_SCALE})
            // (SELECT sum(CAST(s AS HUGEINT)) FROM s{BT_ROUNDS}) AS BIGINT)
         AS strength_share_micro,
       CAST(rank() OVER (ORDER BY s.s DESC, s.i) AS BIGINT) AS rnk
FROM s{BT_ROUNDS} s JOIN wins w ON w.i = s.i
ORDER BY rnk, suppkey
""",
)
def bt_strength_duels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry leaderboard over supplier duels: 3 MM rounds from
    uniform strengths, reported as raw micros, normalized share, and
    rank. Every round is two joins + one agg over the bounded pair
    table; strengths localCheckpoint per round so round r+1 never
    recomputes rounds 1..r."""
    duels = _duels(spark, sf_dir).localCheckpoint()
    # dirpairs is repartitioned by i BEFORE its (i, j) aggregation —
    # hash(i) satisfies the groupBy(i, j) clustering requirement, so the
    # agg adds no second exchange — and PERSISTED (not checkpointed):
    # InMemoryRelation retains the hash(i) output partitioning, so every
    # MM round's groupBy("i") below reuses this layout with ZERO
    # exchanges (r13, guide §2.4; a localCheckpoint would erase the
    # partitioning info and re-shuffle the pair table once per round).
    dirpairs = (
        duels.select(F.col("winner").alias("i"), F.col("loser").alias("j"))
        .unionAll(duels.select(F.col("loser").alias("i"), F.col("winner").alias("j")))
        .repartition("i")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    # one union-aggregate replaces distinct + left join + coalesce
    # (r13): winners and losers together ARE the participant universe,
    # and summing 1-for-win / 0-for-loss gives the win count directly
    wins = (
        duels.select(F.col("winner").alias("i"), F.lit(1).alias("win"))
        .unionAll(duels.select(F.col("loser").alias("i"), F.lit(0).alias("win")))
        .groupBy("i")
        .agg(F.sum("win").cast("bigint").alias("w"))
        .persist()
    )
    # eager: materializing s0 populates the wins cache exactly once —
    # the two concurrent round-1 broadcast jobs would otherwise BOTH
    # miss the lazy persist and recompute the wins aggregation
    s = wins.select("i", F.lit(S0).cast("bigint").alias("s")).localCheckpoint()
    for _ in range(BT_ROUNDS):
        d = (
            # explicit broadcasts: the strength table is player-sized;
            # hinting guarantees the streamed side stays the persisted
            # hash(i)-partitioned pair table (a checkpointed RDD has no
            # stats, so without AQE's runtime fallback a sort-merge join
            # would re-shuffle dirpairs every round)
            dirpairs.alias("p")
            .join(F.broadcast(s.alias("si")), F.col("si.i") == F.col("p.i"))
            .join(F.broadcast(s.alias("sj")), F.col("sj.i") == F.col("p.j"))
            .select(
                F.col("p.i").alias("i"),
                F.expr(
                    f"CAST((CAST(p.n AS DECIMAL(38,0)) * {BT_SCALE}) "
                    f"div greatest(si.s + sj.s, 1) AS BIGINT)"
                ).alias("term"),
            )
            .groupBy("i")
            .agg(F.sum("term").cast("bigint").alias("d"))
        )
        s = (
            wins.join(d, "i")
            .select(
                "i",
                F.expr(
                    f"CAST(CASE WHEN d > 0 THEN "
                    f"(CAST(w AS DECIMAL(38,0)) * {BT_SCALE}) div d "
                    f"ELSE 0 END AS BIGINT)"
                ).alias("s"),
            )
            .localCheckpoint()
        )
    total = s.select(F.sum(F.col("s").cast("decimal(38,0)")).alias("_t"))
    return (
        s.join(wins, "i")
        .crossJoin(F.broadcast(total))  # 1-row scalar
        .select(
            F.col("i").alias("suppkey"),
            F.col("w").alias("n_wins"),
            F.col("s").alias("strength_micro"),
            F.expr(
                f"CAST((CAST(s AS DECIMAL(38,0)) * {PROB_SCALE}) div _t AS BIGINT)"
            ).alias("strength_share_micro"),
            F.rank()
            .over(Window.orderBy(F.desc("s"), F.asc("i")))
            .cast("bigint")
            .alias("rnk"),
        )
        .orderBy("rnk", "suppkey")
    )


_WILSON = (
    "(p + zz / (2*n) - {z} * sqrt(p * (1.0 - p) / n + zz / (4*n*n)))"
    " / (1.0 + zz / n)"
)


@register(
    "preference_winrate",
    driver=False,
    oracle=f"""
WITH duels AS ({_duels_sql()}),
tallies AS (
  SELECT i,
         CAST(sum(win) AS BIGINT) AS n_wins,
         CAST(count(*) AS BIGINT) AS n_games
  FROM (SELECT winner AS i, 1 AS win FROM duels
        UNION ALL SELECT loser AS i, 0 AS win FROM duels)
  GROUP BY i
)
SELECT i AS suppkey, n_wins, n_games,
       CAST((CAST(n_wins AS HUGEINT) * {PROB_SCALE}) // n_games AS BIGINT)
         AS winrate_micro,
       CAST(floor((SELECT {_WILSON.format(z=WILSON_Z)} FROM
                   (SELECT CAST(n_wins AS DOUBLE) / n_games AS p,
                           CAST(n_games AS DOUBLE) AS n,
                           {WILSON_Z} * {WILSON_Z} AS zz))
                  * {PROB_SCALE}) AS BIGINT) AS wilson_lb_micro
FROM tallies ORDER BY suppkey
""",
)
def preference_winrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win/loss tallies with the Wilson lower bound (z=1.96) — the
    sample-size-aware ranking statistic. The Wilson tree is per-row
    doubles over integer inputs with only correctly-rounded ops
    (+,-,*,/ and sqrt — no transcendentals), identically parenthesized
    on both engines, micro-floored at the end: exact with no libm
    assumption."""
    duels = _duels(spark, sf_dir)
    tallies = (
        duels.select(F.col("winner").alias("i"), F.lit(1).alias("win"))
        .unionAll(duels.select(F.col("loser").alias("i"), F.lit(0).alias("win")))
        .groupBy("i")
        .agg(
            F.sum("win").cast("bigint").alias("n_wins"),
            F.count(F.lit(1)).cast("bigint").alias("n_games"),
        )
    )
    z = WILSON_Z
    wilson = (
        "(p + zz / (2*n) - {z} * sqrt(p * (1.0 - p) / n + zz / (4*n*n)))"
        " / (1.0 + zz / n)"
    ).format(z=z)
    return tallies.select(
        F.col("i").alias("suppkey"),
        "n_wins",
        "n_games",
        F.expr(
            f"CAST((CAST(n_wins AS DECIMAL(38,0)) * {PROB_SCALE}) div n_games AS BIGINT)"
        ).alias("winrate_micro"),
        F.expr(
            f"""CAST(floor((SELECT {wilson} FROM
            (SELECT CAST(n_wins AS DOUBLE) / n_games AS p,
                    CAST(n_games AS DOUBLE) AS n,
                    {z} * {z} AS zz)) * {PROB_SCALE}) AS BIGINT)"""
        ).alias("wilson_lb_micro"),
    ).orderBy("suppkey")


@register(
    "event_transition_matrix",
    driver=False,
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST((CAST(n AS HUGEINT) * {PROB_SCALE})
            // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_micro
FROM counts ORDER BY from_type, to_type
""",
)
def event_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lead() within (user, time) gives the next event, counts fold to the
    event_type^2-sized matrix, rows normalize to micro probabilities.
    The window partitions by user — per-user state only, never a global
    sort; the normalizing window runs on the tiny matrix itself."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = ordered.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wnorm = Window.partitionBy("from_type")
    return (
        counts.withColumn("_row_total", F.sum("n").over(wnorm))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr(
                f"CAST((CAST(n AS DECIMAL(38,0)) * {PROB_SCALE}) div _row_total AS BIGINT)"
            ).alias("prob_micro"),
        )
        .orderBy("from_type", "to_type")
    )
