"""mammoth_spark — a PySpark-native CDC + data-pipeline analytics engine.

Re-expresses the capabilities of the reference engine (samjbobb/mammoth,
a Postgres→Snowflake CDC replicator, see /root/reference) on Apache Spark:

- change-data-capture algebra (keyed compaction, merge/upsert, snapshot +
  incremental sync) as DataFrame operators and Structured Streaming pipelines
  (reference: target/common/multirowaction/multi_row_action.go,
  target/snowflake/snowflake_target.go, sync/stream/stream.go);
- plus the large-scale training-data-pipeline operators a 100 TB corpus
  needs: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  cosine), ANN similarity search, text analysis, multimodal column plumbing.

Everything is declared through the DataFrame API so Catalyst/Tungsten pick
the physical plan; Python UDFs appear only where semantics genuinely demand
them (the order-sensitive CDC fold), and then as Arrow-batched applyInPandas.
"""

__version__ = "0.1.0"
