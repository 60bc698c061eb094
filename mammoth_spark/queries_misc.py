"""Remaining operator queries: snapshot scan, PG array conversion,
multimodal media stats/features."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.arrays import pg_array_to_json
from .functions.multimodal import documents_as_media, extract_features, media_stats
from .model import read_table
from .registry import register


@register(
    "snapshot_scan",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 30
""",
)
def snapshot_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: consistent-snapshot table scan with predicate + projection.
    Declarative filter/select so Catalyst pushes both into the parquet
    scan (PushedFilters + 4-column ReadSchema — verified in tests)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "pg_array_json",
    oracle="""
SELECT doc_id,
       CAST(to_json(string_split(text, ' ')) AS VARCHAR) AS words_json,
       len(string_split(text, ' ')) AS n_words
FROM documents
""",
)
def pg_array_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21: PG array text -> JSON via the Arrow-batched parser UDF. The
    PG literal is synthesized from each document's words ({w1,w2,...}),
    exercising the real parse path; DuckDB's independent to_json is the
    oracle (word tokens are alphanumeric, so quoting agrees)."""
    docs = read_table(spark, sf_dir, "documents")
    pg_literal = F.concat(F.lit("{"), F.regexp_replace(F.col("text"), " ", ","), F.lit("}"))
    return docs.select(
        "doc_id",
        pg_array_to_json(pg_literal).alias("words_json"),
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
    )


@register(
    "media_stats",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         (['image','audio','video'])[(doc_id % 3) + 1] AS media_type,
         encode(text) AS content,
         n_chars % 1920 AS width,
         n_chars % 1080 AS height
  FROM documents
)
SELECT media_type,
       count(*) AS n_items,
       sum(octet_length(content)) AS total_bytes,
       max(octet_length(content)) AS max_bytes,
       floor((sum(width) * 1.0 / count(*)) * 1000000) / 1000000 AS avg_width,
       floor((sum(height) * 1.0 / count(*)) * 1000000) / 1000000 AS avg_height
FROM media GROUP BY media_type
""",
)
def media_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pre-pass: per-type byte totals + dimension
    stats over binary content columns — pure expressions, no decode."""
    from .functions.numeric import round6

    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.max(F.length(F.col("content"))).alias("max_bytes"),
        round6(F.sum(F.col("meta.width")) / F.count(F.lit(1))).alias("avg_width"),
        round6(F.sum(F.col("meta.height")) / F.count(F.lit(1))).alias("avg_height"),
    )


@register("media_features")  # no oracle: mapInPandas feature extraction is
# not SQL-expressible (md5-digest-seeded floats); driver records rows-only
def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature path: binary content through Arrow-batched
    mapInPandas with the deterministic fake extractor (real codecs are
    stubbed in this environment — see functions/multimodal.py)."""
    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "media_id", "media_type", "n_bytes", "content_hash", F.size("feature").alias("feature_dim")
    )


# ---- A2 schema introspection + A20 snapshot/stream boundary ----

from .model import EVENTS_KIND_SQL  # noqa: E402
from .operators.ddl import introspect_tables  # noqa: E402
from .operators.merge import merge_upsert  # noqa: E402
from .operators.compact import compact_last_wins  # noqa: E402
from .model import events_as_change_log  # noqa: E402

ALL_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# DuckDB side of the type map: its DESCRIBE types -> the engine's target
# types, mirroring spark_type_to_target. events.ts is TIMESTAMP(NANOS)
# parquet, which this engine reads as epoch-nanos INT (nanosAsLong) — the
# one deliberate divergence, encoded explicitly on both sides.
_DUCK_TYPE_CASE = """
CASE WHEN column_type LIKE '%[]' THEN 'ARRAY'
     WHEN column_type = 'BOOLEAN' THEN 'BOOLEAN'
     WHEN column_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT','HUGEINT') THEN 'INT'
     WHEN column_type = 'FLOAT' THEN 'FLOAT4'
     WHEN column_type = 'DOUBLE' THEN 'FLOAT8'
     WHEN column_type = 'DATE' THEN 'DATE'
     WHEN column_type LIKE 'TIMESTAMP%TIME ZONE' THEN 'TIMESTAMP_TZ'
     WHEN column_type LIKE 'TIMESTAMP%' THEN 'TIMESTAMP_NTZ'
     ELSE 'STRING' END
"""

_PKS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _introspect_oracle() -> str:
    branches = []
    for t in ALL_TABLES:
        ts_fix = (
            "CASE WHEN column_name = 'ts' THEN 'INT' ELSE " + _DUCK_TYPE_CASE + " END"
            if t == "events"
            else _DUCK_TYPE_CASE
        )
        branches.append(
            f"SELECT '{t}' AS tbl, column_name, {ts_fix} AS target_type, "
            f"column_name = '{_PKS[t]}' AS is_identity FROM (DESCRIBE {t})"
        )
    return " UNION ALL ".join(branches)


@register("schema_introspect", oracle=_introspect_oracle())
def schema_introspect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3: catalog introspection through the engine's type map
    (reference sync/service/sync_service.go:323-412 + the getSfType table,
    target/snowflake/snowflake_target.go:675-714). Spark resolves each
    parquet schema (footer-only read); DuckDB independently DESCRIBEs the
    same tables and applies the same documented mapping."""
    return introspect_tables(spark, sf_dir, ALL_TABLES)


@register(
    "snapshot_incremental_equiv",
    oracle=f"""
WITH {{cte}},
agg AS (
  SELECT key,
         arg_max(kind, seq) AS last_kind,
         arg_max(value, CASE WHEN kind <> 'DELETE' THEN seq END) AS value
  FROM change_log GROUP BY key
)
SELECT key, value FROM agg WHERE last_kind <> 'DELETE'
""".format(
        cte=f"""
change_log AS (
  SELECT CAST(floor(event_id / 50) AS BIGINT) AS lsn,
         event_id AS seq,
         {EVENTS_KIND_SQL} AS kind,
         CAST(user_id AS BIGINT) AS key,
         value
  FROM events
)
"""
    ),
)
def snapshot_incremental_equiv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20+A12: gap-free snapshot/stream hand-off. The slot's consistent
    LSN (reference sync/stream/stream.go:53-68) becomes a seq boundary:
    backfill applies everything <= boundary to an empty target, the
    incremental phase compacts and MERGEs the remainder — and the result
    must equal one-shot compaction of the full log (the oracle). The
    boundary capture is a single scalar agg (the LSN read), not a data
    collect."""
    log = events_as_change_log(read_table(spark, sf_dir, "events")).select(
        "seq", "kind", "key", "value"
    )
    boundary = log.agg((F.floor(F.max("seq") / 2)).cast("long")).collect()[0][0]
    snap = (
        compact_last_wins(log.filter(F.col("seq") <= boundary), ["key"], ["value"])
        .filter(F.col("kind") != "DELETE")
        .select("key", "value")
    )
    # Incremental compaction nets to the LAST action per key (not the
    # (I,D)->drop rule): the key may already exist in the backfilled
    # target, so an insert-then-delete chain must still emit the DELETE.
    inc = (
        log.filter(F.col("seq") > boundary)
        .groupBy("key")
        .agg(
            F.max_by("kind", "seq").alias("kind"),
            F.max_by("value", F.when(F.col("kind") != "DELETE", F.col("seq"))).alias("value"),
        )
    )
    return merge_upsert(snap, inc, ["key"], ["value"])
