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
