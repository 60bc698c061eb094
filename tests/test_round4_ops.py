"""Round-4 operator invariants: degree-ordered triangle orientation,
SemDeDup's K ∝ N rule, and the compaction-plan executor."""

from pyspark.sql import functions as F

import mammoth_spark.queries  # noqa: F401  (populates the registry)
from mammoth_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _star_with_triangles(spark):
    # skewed star: hub 0 with 1000 spokes, plus a 3-clique among spokes
    # {1,2,3}. Triangles: (0,1,2), (0,2,3), (0,1,3) via the hub and
    # (1,2,3) itself = 4.
    spokes = spark.range(1, 1001).select(F.lit(0).alias("u"), F.col("id").alias("v"))
    clique = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u bigint, v bigint")
    return spokes.unionByName(clique)


def test_degree_orientation_counts_match_and_bound_wedges(spark):
    # VERDICT r03 next-round #7: the documented skew refinement must be
    # implemented and count-equivalent with the id orientation — and on
    # a 1000-spoke star the wedge volume must collapse. Id orientation
    # gives the hub (id 0, degree 1003) out-degree 1003 => C(1003,2)
    # ~ 5*10^5 wedges; degree orientation points every spoke INTO the
    # hub, so the hub emits zero wedges and the whole graph emits 4.
    from mammoth_spark.queries_joins import _degree_oriented_triangles

    edges = _star_with_triangles(spark)
    tri, o = _degree_oriented_triangles(edges)
    assert tri.count() == 4

    # id-oriented reference count (the registered triangle_count shape)
    wedge = (
        edges.alias("a")
        .join(edges.alias("b"), F.col("a.v") == F.col("b.u"))
        .select(F.col("a.u").alias("wu"), F.col("b.v").alias("ww"))
    )
    tri_id = wedge.join(
        edges.alias("c"),
        (F.col("c.u") == F.col("wu")) & (F.col("c.v") == F.col("ww")),
    )
    assert tri_id.count() == 4

    # edge/node conservation through reorientation
    assert o.count() == edges.count()

    # the skew bound itself: wedge volume = sum C(outdeg, 2) over the
    # DEGREE-oriented list is 4 (spoke 1 emits 3, spoke 2 emits 1); the
    # hub emits none because its out-degree is zero
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ann = (
        edges.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    )
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = ann.select(F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("src"))
    outdeg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    assert outdeg.filter(F.col("src") == 0).count() == 0  # hub emits nothing
    wedges = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("bigint").alias("w")
    ).first()["w"]
    assert wedges == 4


def test_triangle_orientations_agree_on_trade_graph(spark):
    a = QUERIES["triangle_count"](spark, SF).first()
    b = QUERIES["triangle_count_degree"](spark, SF).first()
    assert a["n_triangles"] == b["n_triangles"]
    assert a["n_edges"] == b["n_edges"] and a["n_nodes"] == b["n_nodes"]


def test_compaction_executor_closes_plan_action_loop(spark, tmp_path):
    # VERDICT r03 next-round #8: execute the compaction plan — read each
    # bin's files, write ONE file per bin — and verify (a) exact content
    # equivalence, (b) output file count == bin count, (c) every output
    # file within the planner's size bound (target + largest input file).
    from mammoth_spark.operators.maintenance import execute_compaction

    src = str(tmp_path / "small_files")
    dest = str(tmp_path / "compacted")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.repartition(37).write.parquet(src)  # fragmented ingest state
    n_in = (
        spark.read.parquet(src)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_in == 37

    target = 1000
    plan = execute_compaction(spark, src, dest, target_rows=target)
    n_bins = plan.select("bin").distinct().count()
    max_in = plan.agg(F.max("n_rows")).first()[0]

    out = spark.read.parquet(dest)
    out_files = out.groupBy(F.input_file_name().alias("f")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # one file per bin, fewer files than the fragmented input
    assert out_files.count() == n_bins
    assert n_bins < n_in
    # size bound: a bin exceeds target only by its last file's overshoot
    assert out_files.agg(F.max("n")).first()[0] <= target + max_in
    # exact content equivalence (multiset, both directions)
    a = spark.read.parquet(src)
    b = out.drop("bin")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_semdedup_k_scales_with_corpus(spark):
    # K ∝ N (arXiv:2303.09540): 500 fixture vectors keep the K=8 floor,
    # the sf0.1 corpus (2000 vectors) must cluster with K=16 — the
    # assignment output must actually USE centroids >= 8.
    from mammoth_spark.queries_pipeline import SEMDEDUP_K_DIV, SEMDEDUP_K_MIN

    assert max(SEMDEDUP_K_MIN, 500 // SEMDEDUP_K_DIV) == 8
    assert max(SEMDEDUP_K_MIN, 2000 // SEMDEDUP_K_DIV) == 16
    out = QUERIES["semdedup_prune"](spark, "/root/testdata/sf0.1")
    n_cent = out.select("centroid_id").distinct().count()
    assert out.agg(F.max("centroid_id")).first()[0] >= 8
    assert n_cent > 8


# ----------------------- cleaning-wave invariants -----------------------


def test_chunk_dedup_keeps_each_distinct_chunk_exactly_once(spark):
    # conservation law: summed kept-chunks across the corpus == the
    # number of DISTINCT chunk strings (each survives exactly once)
    from mammoth_spark.queries_cleaning import _chunks
    from mammoth_spark.model import read_table

    out = QUERIES["chunk_dedup"](spark, SF)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    distinct_chunks = (
        _chunks(read_table(spark, SF, "documents")).select("chunk").distinct().count()
    )
    assert total_kept == distinct_chunks
    # and chunk accounting is exact per doc
    assert out.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0


def test_boilerplate_strip_removes_every_occurrence(spark):
    # unlike chunk_dedup, the first copy dies too: total boilerplate
    # removals == total occurrences of flagged (source, chunk) pairs
    from mammoth_spark.queries_cleaning import BP_MIN, _chunks
    from mammoth_spark.model import read_table

    out = QUERIES["boilerplate_strip"](spark, SF)
    removed = out.agg(F.sum("n_boiler")).collect()[0][0]
    ch = _chunks(read_table(spark, SF, "documents"))
    bp = (
        ch.groupBy("source", "chunk")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BP_MIN)
        .select("source", "chunk")
    )
    occurrences = ch.join(bp, ["source", "chunk"]).count()
    assert removed == occurrences


def test_dup_span_remove_consistent_with_stats(spark):
    # removed positions are a subset of the covered positions that
    # dup_span_stats reports: per doc, n_removed <= n_dup_tokens, and
    # the fixture corpus (which has cross-doc dup spans) removes > 0
    stats = {r["doc_id"]: r for r in QUERIES["dup_span_stats"](spark, SF).collect()}
    out = QUERIES["dup_span_remove"](spark, SF).collect()
    assert sum(r["n_removed"] for r in out) > 0
    for r in out:
        s = stats[r["doc_id"]]
        assert r["n_removed"] <= s["n_dup_tokens"], r["doc_id"]
        assert r["n_tokens"] == s["n_tokens"]
        # rebuilt text really has n_tokens - n_removed tokens
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert kept == r["n_tokens"] - r["n_removed"], r["doc_id"]


def test_dsir_select_enriches_target_language(spark):
    # DSIR's whole point: the importance-weighted top-N is enriched in
    # the target slice relative to the corpus base rate
    from mammoth_spark.model import read_table

    sel = QUERIES["dsir_select"](spark, SF).collect()
    docs = read_table(spark, SF, "documents")
    base_rate = docs.filter(F.col("lang") == "en").count() / docs.count()
    sel_rate = sum(1 for r in sel if r["lang"] == "en") / len(sel)
    assert sel_rate > base_rate, (sel_rate, base_rate)
    # ranking is dense 1..N and weight-monotone
    ranks = sorted(r["rank"] for r in sel)
    assert ranks == list(range(1, len(sel) + 1))
    by_rank = sorted(sel, key=lambda r: r["rank"])
    assert all(
        a["weight"] >= b["weight"] for a, b in zip(by_rank, by_rank[1:])
    )


def test_ann_recall_report_bounds(spark):
    rows = QUERIES["ann_recall_report"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_found"] <= r["n_exact"]
        assert abs(r["recall"] - r["n_found"] / r["n_exact"]) < 1e-12


def test_incremental_ivf_probe_equals_batch_and_never_rewrites(spark):
    # growing the index by epoch appends must (a) leave every
    # previously-written file untouched and (b) produce probe results
    # identical to a batch-built index over the same corpus
    import glob

    from mammoth_spark.functions.similarity import (
        append_ivf_index,
        ann_topk_ivf,
        build_ivf_index,
        with_norm_and_bucket,
    )
    from mammoth_spark.model import read_table
    from mammoth_spark.scratch import scratch_dir

    emb = read_table(spark, SF, "embeddings")
    inc_dir, batch_dir = scratch_dir("ivf_t_inc_"), scratch_dir("ivf_t_batch_")

    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), inc_dir)
    after_build = set(glob.glob(f"{inc_dir}/**/*.parquet", recursive=True))
    append_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), inc_dir)
    append_ivf_index(emb.filter(F.col("vec_id") % 3 == 2), inc_dir)
    after_appends = set(glob.glob(f"{inc_dir}/**/*.parquet", recursive=True))
    assert after_build <= after_appends, "append must never rewrite existing files"
    assert len(after_appends) > len(after_build)

    build_ivf_index(emb, batch_dir)
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    inc = sorted(map(tuple, ann_topk_ivf(spark, inc_dir, q).collect()))
    bat = sorted(map(tuple, ann_topk_ivf(spark, batch_dir, q).collect()))
    assert inc == bat


def test_streaming_chunk_clean_store_is_append_only_and_complete(spark):
    # after the run: one delta dir per epoch, every delta partitioned by
    # cb=, and the union of deltas holds exactly the corpus's distinct
    # chunk hashes (the store is complete, with no chunk stored twice)
    import glob
    import os

    from mammoth_spark import queries_cleaning
    from mammoth_spark.queries_cleaning import _chunks
    from mammoth_spark.model import read_table

    out = QUERIES["streaming_chunk_clean"](spark, SF)
    out.count()
    # the query publishes its scratch base through a module-level hook
    base = queries_cleaning.STREAM_CHUNK_LAST_BASE
    assert base is not None
    deltas = sorted(glob.glob(os.path.join(base, "chunk_e*")))
    assert len(deltas) == 3
    assert all(glob.glob(os.path.join(d, "cb=*")) for d in deltas)
    from functools import reduce

    from pyspark.sql import DataFrame

    store = reduce(DataFrame.unionByName, [spark.read.parquet(d) for d in deltas])
    n_distinct_corpus = (
        _chunks(read_table(spark, SF, "documents")).select("chunk").distinct().count()
    )
    assert store.count() == n_distinct_corpus
    assert store.select("ch_h").distinct().count() == n_distinct_corpus


def test_chunk_clean_increment_is_prefix_monotone(spark):
    # the property streaming_chunk_clean rests on: folding the
    # incremental step over ANY id-ordered partition of the corpus
    # reproduces the single-shot chunk_dedup — tested at three very
    # different split shapes (one big batch, skewed, per-~50-docs)
    from functools import reduce

    from pyspark.sql import DataFrame

    from mammoth_spark.model import read_table
    from mammoth_spark.queries_cleaning import chunk_clean_increment

    docs = read_table(spark, SF, "documents").select("doc_id", "source", "text")
    batch = {tuple(r) for r in QUERIES["chunk_dedup"](spark, SF).collect()}

    for bounds in ([10_000], [3, 10_000], [50, 100, 150, 200, 250, 10_000]):
        seen, cleaned_parts, lo = None, [], -1
        for hi in bounds:
            part = docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi))
            cleaned, delta = chunk_clean_increment(part, seen)
            cleaned_parts.append(cleaned)
            seen = delta if seen is None else seen.unionByName(delta)
            # materialize: the streaming path persists deltas per epoch
            seen = spark.createDataFrame(seen.collect(), schema=seen.schema)
            lo = hi
        inc = {
            tuple(r)
            for r in reduce(DataFrame.unionByName, cleaned_parts).collect()
        }
        assert inc == batch, f"split {bounds} diverged from batch chunk_dedup"


def test_cleaning_ops_survive_fully_duplicated_docs(spark, tmp_path):
    # adversarial fixture: doc 1 is an exact clone of doc 0 (every chunk
    # and every span duplicated), doc 2 is unique. The clone must come
    # back as an EMPTY rebuilt text (not a dropped row) from both
    # removers, and accounting must stay exact.
    import os

    text_a = " ".join(f"tok{i % 7} word{i % 11}" for i in range(40))
    text_b = "solo unique content nothing shared here at all " * 3
    docs = spark.createDataFrame(
        [(0, text_a, "en", "srcA", len(text_a)),
         (1, text_a, "en", "srcA", len(text_a)),
         (2, text_b, "en", "srcB", len(text_b))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf_adv")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    out = {r["doc_id"]: r for r in QUERIES["chunk_dedup"](spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}, "no row may vanish"
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""
    assert out[0]["n_kept"] == out[0]["n_chunks"]  # first copy intact
    # doc 2 is "phrase x3": 3 identical 8-token chunks — the chunk rule
    # is first occurrence CORPUS-wide, which includes intra-doc copies
    assert out[2]["n_chunks"] == 3 and out[2]["n_kept"] == 1

    rem = {r["doc_id"]: r for r in QUERIES["dup_span_remove"](spark, sf_dir).collect()}
    assert set(rem) == {0, 1, 2}
    assert rem[1]["n_removed"] == rem[1]["n_tokens"] and rem[1]["clean_text"] == ""
    assert rem[0]["n_removed"] == 0  # canonical occurrences all live in doc 0
    # the span rule is CROSS-doc (count distinct docs >= 2): doc 2's
    # intra-doc phrase repetition alone must not mark anything
    assert rem[2]["n_removed"] == 0


def test_bpe_train_greedy_left_to_right_merge_order(spark, tmp_path):
    # hand-computed trajectory on a corpus where merge order matters:
    # "aaa" must merge greedily left-to-right ((a,a) twice would
    # over-count; "aaa" -> [aa, a], never [a, aa] or [aa, aa]).
    import os

    docs = spark.createDataFrame(
        [(0, "aaa aaa bb", "en", "s", 10), (1, "aaa bb bb", "en", "s", 9)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf_bpe")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    rows = {r["round"]: r for r in QUERIES["bpe_train"](spark, sf_dir).collect()}
    # vocab: aaa (freq 3), bb (freq 3). Pairs r1: (a,a) 2*3=6, (b,b) 3.
    assert rows[1]["merge_pair"] == "a+a" and rows[1]["pair_freq"] == 6
    # after r1: aaa -> [aa, a] (greedy), bb -> [bb]. symbols {aa, a, bb}
    assert rows[1]["n_symbol_types"] == 3
    # r2 pairs: (aa,a) 3 vs (b,b) 3 — tie broken by pair string asc:
    # "aa\x1fa" < "b\x1fb"
    assert rows[2]["merge_pair"] == "aa+a" and rows[2]["pair_freq"] == 3
    # after r2: aaa -> [aaa], bb -> [bb]; symbols {aaa, bb}
    assert rows[2]["n_symbol_types"] == 2
    # r3: only (b,b) remains
    assert rows[3]["merge_pair"] == "b+b" and rows[3]["pair_freq"] == 3
    assert rows[3]["n_symbol_types"] == 2


def test_incremental_topk_reads_maintained_agg_without_reshuffle(spark):
    # the top-k read must be a TakeOrderedAndProject over the maintained
    # (checkpointed) aggregate with the recompute side broadcast — a
    # sort-merge join or Python eval here would defeat the IVM point.
    df = QUERIES["incremental_topk_maintenance"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert all(r["matches_recompute"] for r in df.collect())


def test_merge_additive_delta_never_shuffles_the_base(spark):
    # the checkpointed loop hides per-batch plans, so the merge helper is
    # plan-asserted directly: a broadcast hint on a full-outer join is
    # silently DROPPED by Spark (both sides would sort-merge-shuffle);
    # the decomposed form must show only broadcast joins and no base-side
    # Exchange hashpartitioning.
    from pyspark.sql import functions as F

    from mammoth_spark.queries_analytics import merge_additive_delta

    base = spark.range(0, 100000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("n")
    )
    delta = spark.range(0, 50).select(
        (F.col("id") * 3000).alias("k"), F.lit(5).alias("d")
    )
    merged = merge_additive_delta(base, delta, "k", "n", "d")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # left-outer + semi/anti

    # value correctness incl. delta-only keys (k >= 100000)
    got = {r["k"]: r["n"] for r in merged.filter(F.col("k") % 3000 == 0).collect()}
    assert got[0] == 0 + 5 and got[3000] == (3000 % 7) + 5
    assert got[120000] == 5  # insert path
    # the ineffective-hint form really does shuffle both sides (the trap)
    trap = base.join(F.broadcast(delta), on="k", how="full_outer")
    tplan = trap._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in tplan


def test_dynamic_partition_overwrite_touches_only_replaced_partitions(spark):
    # the query self-asserts the filesystem evidence (no write
    # amplification, no dropped partitions); this pins the surfaced
    # flags and that every event_type partition survives the overwrite.
    rows = {r["event_type"]: r for r in QUERIES["dynamic_partition_overwrite"](spark, SF).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    assert {t for t, r in rows.items() if r["rewritten"]} == {"click", "error"}
    assert all(r["n_rows"] > 0 for r in rows.values())


def test_bpe_encode_broadcasts_vocab_and_counts_exactly(spark, tmp_path):
    # encoding must be a broadcast hash join of the token stream against
    # the merged vocab (no shuffle of the stream side for the join), and
    # the counts must reflect the learned merges: with corpus
    # "aaa aaa bb" / "aaa bb bb" the 3 trained merges collapse aaa->1
    # symbol and bb->1 symbol, so every word encodes to exactly 1 token.
    import os

    docs = spark.createDataFrame(
        [(0, "aaa aaa bb", "en", "s", 10), (1, "aaa bb bb x7", "en", "s", 12)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf_bpe_enc")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    df = QUERIES["bpe_encode"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_words"] == 3 and rows[0]["n_bpe_tokens"] == 3
    # "x7" fails the [a-z]{2,} vocab filter: counted in neither column
    assert rows[1]["n_words"] == 3 and rows[1]["n_bpe_tokens"] == 3


def test_user_purge_audit_zero_leaks_and_consistent_accounting(spark):
    row = QUERIES["user_purge_audit"](spark, SF).collect()[0]
    assert row["leak_count"] == 0
    assert row["rows_before"] == row["rows_after"] + row["rows_removed"]
    assert row["n_users_purged"] > 0 and row["rows_removed"] > 0


def test_range_partition_sort_uses_range_partitioning_and_holds_adversarial(spark, tmp_path):
    # plan: the exchange must be RANGE partitioning (the one shuffle
    # strategy the rest of the repo never uses), and the invariants must
    # hold on an adversarial skewed distribution (90% identical values
    # force range split-point ties; ranges_nonoverlapping uses >= so
    # boundary-equal shards stay legal).
    import os

    from pyspark.sql import functions as F

    df = QUERIES["range_partition_sort"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()

    skewed = spark.range(0, 5000).select(
        F.col("id").alias("event_id"),
        F.current_timestamp().alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.when(F.col("id") % 10 < 9, F.lit(1.0)).otherwise(F.col("id") / 100.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sf_dir = str(tmp_path / "sf_skew")
    os.makedirs(sf_dir, exist_ok=True)
    skewed.write.parquet(os.path.join(sf_dir, "events.parquet"))
    row = QUERIES["range_partition_sort"](spark, sf_dir).collect()[0]
    assert row["rows_total"] == 5000
    assert row["ranges_nonoverlapping"] and row["globally_sorted"]


def _reference_bpe(word_freqs, rounds):
    # independent pure-Python BPE (Sennrich 2016): returns the per-round
    # (merged pair, pair frequency, distinct symbol types after merge)
    out = []
    words = {w: [list(w), f] for w, f in word_freqs.items()}
    for _ in range(rounds):
        counts = {}
        for syms, f in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # tie-break matches the query: freq desc, then the SEP-joined
        # pair string ascending (plain tuple order over the two symbols)
        (p1, p2), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, (syms, f) in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    merged.append(p1 + p2)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w][0] = merged
        n_types = len({s for syms, _ in words.values() for s in syms})
        out.append((p1 + "+" + p2, freq, n_types))
    return out


def test_bpe_train_matches_pure_python_reference_on_random_corpora(spark, tmp_path):
    # cross-check against an INDEPENDENT implementation (not the DuckDB
    # oracle, which shares the wrapped-string representation): random
    # lowercase corpora, full trajectory equality per round.
    import os
    import random

    rng = random.Random(20260814)
    for case in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(2, 6)))
            for _ in range(rng.randint(4, 12))
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
            for _ in range(6)
        ]
        docs = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        sf_dir = str(tmp_path / f"sf_ref_{case}")
        os.makedirs(sf_dir, exist_ok=True)
        docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

        freqs = {}
        for t in texts:
            for w in t.split(" "):
                if len(w) >= 2:
                    freqs[w] = freqs.get(w, 0) + 1
        expected = _reference_bpe(freqs, 3)
        got = [
            (r["merge_pair"], r["pair_freq"], r["n_symbol_types"])
            for r in QUERIES["bpe_train"](spark, sf_dir).orderBy("round").collect()
        ]
        assert got == expected, f"case {case}: {got} != {expected}"


def test_bpe_merge_loop_stops_early_on_fully_merged_corpus(spark, tmp_path):
    # a corpus whose whole vocab is one 2-char word fully merges in ONE
    # round; rounds 2-3 have no adjacent pairs left. The merge loop must
    # break (like the pure-Python reference) instead of folding an empty
    # argmax into the vocab — which would silently empty it and make
    # bpe_encode report 0 words/tokens for every doc (ADVICE r04).
    import os

    docs = spark.createDataFrame(
        [(0, "ab ab ab", "en", "s", 8), (1, "ab", "en", "s", 2)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf_bpe_degen")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    rows = QUERIES["bpe_train"](spark, sf_dir).orderBy("round").collect()
    assert [(r["round"], r["merge_pair"]) for r in rows] == [(1, "a+b")]

    enc = {r["doc_id"]: r for r in QUERIES["bpe_encode"](spark, sf_dir).collect()}
    # vocab survives the early stop: every word encodes to 1 token
    assert enc[0]["n_words"] == 3 and enc[0]["n_bpe_tokens"] == 3
    assert enc[1]["n_words"] == 1 and enc[1]["n_bpe_tokens"] == 1


def test_incremental_topk_invariant_under_any_batch_boundary(spark):
    # the maintained aggregate must be split-invariant: whatever event_id
    # boundary separates the two batches, the final top-k matches the
    # from-scratch recompute (the per-row flag the query publishes).
    # The registered query pins boundary 600; this exercises two others
    # by monkey-patching nothing — the invariant is visible through the
    # published matches_recompute column only for 600, so re-derive the
    # merge here for boundaries {1, 250, 999} directly.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mammoth_spark.model import read_table

    ev = read_table(spark, SF, "events").select(
        "event_id", F.col("user_id").cast("bigint").alias("user_id")
    )
    recompute = {
        (r["user_id"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(15)
        .collect()
    }
    for boundary in (1, 250, 999):
        agg = None
        for lo, hi in [(0, boundary), (boundary, 1 << 62)]:
            delta = (
                ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            if agg is None:
                agg = delta.select("user_id", F.col("d").alias("n_events"))
            else:
                agg = agg.join(F.broadcast(delta), on="user_id", how="full_outer").select(
                    "user_id",
                    (
                        F.coalesce(F.col("n_events"), F.lit(0))
                        + F.coalesce(F.col("d"), F.lit(0))
                    ).alias("n_events"),
                )
            agg = agg.localCheckpoint()
        got = {
            (r["user_id"], r["n_events"])
            for r in agg.orderBy(F.desc("n_events"), "user_id").limit(15).collect()
        }
        assert got == recompute, f"boundary {boundary} diverged"


def test_streaming_chunk_clean_history_probe_is_replay_safe(tmp_path):
    # a retried micro-batch must not read its own (possibly half-written)
    # delta: the history probe filters to STRICTLY earlier epoch ids.
    import os

    from mammoth_spark.queries_cleaning import _earlier_chunk_deltas

    base = str(tmp_path)
    for e in (0, 1, 2):
        os.makedirs(os.path.join(base, f"chunk_e{e:06d}"))
    assert _earlier_chunk_deltas(base, 0) == []
    assert [os.path.basename(p) for p in _earlier_chunk_deltas(base, 2)] == [
        "chunk_e000000",
        "chunk_e000001",
    ]


def test_ivf_delete_tombstones_then_compact_probe_identical(spark):
    """Deletion propagation (round 9): tombstoned probe results must (a)
    never surface a deleted vector, (b) equal a from-scratch index built
    over the survivors, and (c) be identical before and after
    compact_ivf_index folds the tombstones into the bucket files —
    with the tombstone dir gone and the files actually shrunk."""
    import glob
    import os

    from mammoth_spark.functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_current_dir,
        read_ivf_tombstones,
        vacuum_ivf_index,
        with_norm_and_bucket,
    )
    from mammoth_spark.model import read_table
    from mammoth_spark.scratch import scratch_dir

    emb = read_table(spark, SF, "embeddings")
    idx_dir, truth_dir = scratch_dir("ivf_del_t_"), scratch_dir("ivf_del_truth_")
    deleted = emb.filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= 16))

    build_ivf_index(emb, idx_dir)
    data_dir = ivf_current_dir(idx_dir)
    files_before = set(glob.glob(f"{data_dir}/**/*.parquet", recursive=True))
    delete_from_ivf_index(deleted.select("vec_id"), idx_dir)
    # the delete touched ZERO bucket files — O(batch) by construction
    # (tombstones land in their own v_1_ts dir beside the data)
    assert set(glob.glob(f"{data_dir}/**/*.parquet", recursive=True)) == files_before

    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    tomb = sorted(
        map(tuple, ann_topk_ivf(spark, idx_dir, q, honor_tombstones=True).collect())
    )
    del_ids = {r["vec_id"] for r in deleted.select("vec_id").collect()}
    assert del_ids, "fixture must contain deletable vectors"
    assert not {n for _, n, _, _ in tomb} & del_ids

    build_ivf_index(emb.join(deleted.select("vec_id"), "vec_id", "left_anti"), truth_dir)
    truth = sorted(map(tuple, ann_topk_ivf(spark, truth_dir, q).collect()))
    assert tomb == truth

    compact_ivf_index(spark, idx_dir)
    # the pointer swap retired v_1 AND its tombstones together
    assert read_ivf_tombstones(spark, idx_dir) is None
    assert ivf_current_dir(idx_dir).endswith("v_2")
    after = sorted(
        map(tuple, ann_topk_ivf(spark, idx_dir, q, honor_tombstones=True).collect())
    )
    assert after == tomb
    n_left = spark.read.parquet(ivf_current_dir(idx_dir)).count()
    assert n_left == emb.count() - len(del_ids)
    # vacuum drops exactly the unreachable version + its tombstones
    assert vacuum_ivf_index(idx_dir) == ["v_1", "v_1_ts"]
    assert os.path.isdir(os.path.join(idx_dir, "v_2"))


def test_ivf_vacuum_refuses_missing_pointer(tmp_path):
    """ADVICE r09: vacuum on an index whose _CURRENT is missing must be a
    hard error, not a silent destruction of every version directory."""
    import os

    import pytest

    from mammoth_spark.functions.similarity import vacuum_ivf_index

    root = str(tmp_path / "ivf")
    os.makedirs(os.path.join(root, "v_1"))
    os.makedirs(os.path.join(root, "v_2"))
    with pytest.raises(FileNotFoundError):
        vacuum_ivf_index(root)
    # nothing was deleted by the refused call
    assert os.path.isdir(os.path.join(root, "v_1"))
    assert os.path.isdir(os.path.join(root, "v_2"))


def test_ivf_probe_honors_tombstones_by_default(spark):
    """ADVICE r09: a probe that does NOT opt in must still exclude erased
    vectors — honor_tombstones defaults on (the anti-join is free when no
    tombstone delta exists)."""
    from mammoth_spark.functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        delete_from_ivf_index,
        with_norm_and_bucket,
    )
    from mammoth_spark.model import read_table
    from mammoth_spark.scratch import scratch_dir

    emb = read_table(spark, SF, "embeddings")
    idx_dir = scratch_dir("ivf_default_ts_")
    build_ivf_index(emb, idx_dir)
    deleted = emb.filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") >= 16))
    delete_from_ivf_index(deleted.select("vec_id"), idx_dir)
    q = (
        with_norm_and_bucket(emb)
        .filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.col("_bucket").alias("q_bucket"),
        )
    )
    del_ids = {r["vec_id"] for r in deleted.select("vec_id").collect()}
    assert del_ids
    default_probe = ann_topk_ivf(spark, idx_dir, q)  # no opt-in argument
    assert not {r["neighbor_id"] for r in default_probe.collect()} & del_ids
    # the audit opt-OUT still sees pre-erasure state
    audit = ann_topk_ivf(spark, idx_dir, q, honor_tombstones=False)
    assert {r["neighbor_id"] for r in audit.collect()} & del_ids


def test_ivf_delete_retries_on_concurrent_pointer_swap(spark, monkeypatch, tmp_path):
    """ADVICE r09: a compaction pointer swap racing delete_from_ivf_index
    must not lose the erasure — the append re-checks _CURRENT and retries
    against the new version; a version that never stabilizes is a hard
    error rather than a silently dropped tombstone batch."""
    import os

    import pytest

    from mammoth_spark.functions import similarity as sim
    from mammoth_spark.model import local_df
    from pyspark.sql import types as T

    root = str(tmp_path / "ivf")
    os.makedirs(root)
    ids = local_df(
        spark, [(1,)], T.StructType([T.StructField("vec_id", T.LongType())])
    )

    # one swap mid-append: first check sees v1, post-write check sees v2,
    # retry lands in v2_ts and the second post-write check confirms v2
    seq = iter([1, 2, 2, 2])
    monkeypatch.setattr(sim, "ivf_current_version", lambda d: next(seq))
    sim.delete_from_ivf_index(ids, root)
    assert os.path.isdir(os.path.join(root, "v_2_ts"))

    # a pointer that never stabilizes exhausts the bounded retries
    import itertools

    counter = itertools.count(10)
    monkeypatch.setattr(sim, "ivf_current_version", lambda d: next(counter))
    with pytest.raises(RuntimeError, match="re-driven"):
        sim.delete_from_ivf_index(ids, root)
