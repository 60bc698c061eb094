"""Debug sinks (A23 jsonl_sink / `mammoth streamtofile`).

The reference's debug path serializes each assembled WalTransaction as one
JSON line with no batching, no compaction, no acks
(sync/stream/stream.go:383-433, supervisor.go:85-106). Spark equivalents
for both modes: a streaming json writer (no checkpoint = no acks,
mirroring SkipAcknowledge=true) and a batch json dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_to_jsonlines(change_log_stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Streaming capture: change log -> JSON lines, at-least-once (the
    debug profile tolerates duplicates just like SkipAcknowledge)."""
    return (
        change_log_stream.writeStream.format("json")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dump_jsonlines(change_log: DataFrame, out_dir: str) -> None:
    """Batch capture of an assembled change log as JSON lines."""
    change_log.write.mode("overwrite").json(out_dir)
