"""The engine's IR: the change-log DataFrame schema.

The reference's only intermediate representation is the row-change model
``RowAction``/``WalTransaction`` (reference sync/db/db.go:116-138): each
committed Postgres transaction carries an LSN and an ordered list of row
actions; each action has a kind (INSERT/UPDATE/DELETE), the row identity
*before* the action, and the new values — where every value is a text
representation plus two flags, ``is_null`` and ``is_unchanged`` (TOAST:
value not re-sent because unchanged; sync/db/db.go:24-30).

Here that model is one flat DataFrame, the shape every CDC operator in this
package consumes:

    change_log(
      lsn    bigint,   -- commit LSN of the enclosing transaction
      seq    bigint,   -- global action order (total order within a batch)
      schema string, tbl string,
      kind   string,   -- 'INSERT' | 'UPDATE' | 'DELETE'
      changes_row_identity boolean,
      key_before  map/struct of pk col -> text value,
      new_values  map of col -> struct<v string, is_null bool, is_unchanged bool>
    )

Flat > nested for scale: a struct-of-structs column defeats parquet column
pruning and predicate pushdown; the operators below therefore also accept
"wide" change logs where key/value columns are ordinary top-level columns.

This module also defines the deterministic mapping from the driver's
``events`` fixture table onto a change log (see FIXTURES.md §3) used by the
oracle-checked queries: seq=event_id, key=user_id,
kind = signup→INSERT, error→DELETE, click/view/purchase→UPDATE,
lsn = event_id / 50 (micro-transactions of ~50 actions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KIND_INSERT = "INSERT"
KIND_UPDATE = "UPDATE"
KIND_DELETE = "DELETE"
VALID_KINDS = (KIND_INSERT, KIND_UPDATE, KIND_DELETE)

# One cell of a change row: text value + null/TOAST-unchanged flags
# (reference sync/db/db.go:24-30).
VALUE_STRUCT = T.StructType(
    [
        T.StructField("v", T.StringType()),
        T.StructField("is_null", T.BooleanType()),
        T.StructField("is_unchanged", T.BooleanType()),
    ]
)


def change_log_schema(value_columns: list[str]) -> T.StructType:
    """Wide change-log schema for a relation with the given value columns."""
    fields = [
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("tbl", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("changes_row_identity", T.BooleanType()),
        T.StructField("key_before", T.ArrayType(T.StringType())),
        T.StructField(
            "new_values",
            T.StructType([T.StructField(c, VALUE_STRUCT) for c in value_columns]),
        ),
    ]
    return T.StructType(fields)


# --- events fixture -> change log (deterministic; mirrored in oracle SQL) ---

# SQL CASE used verbatim by DuckDB oracles; keep in sync with kind_column().
EVENTS_KIND_SQL = (
    "CASE WHEN event_type = 'signup' THEN 'INSERT' "
    "WHEN event_type = 'error' THEN 'DELETE' "
    "ELSE 'UPDATE' END"
)
EVENTS_LSN_DIVISOR = 50


def ts_ns_expr(col: Column, dtype: T.DataType) -> Column:
    """Epoch-nanoseconds BIGINT from a fixture timestamp column.

    The driver fixtures have carried the ``ts``/date columns as either
    TIMESTAMP(NANOS) parquet (readable only as epoch-nanos longs) or, in
    the current generation, ``timestamp[us]`` (surfacing as TIMESTAMP_NTZ
    under Spark 4's NTZ inference, or TIMESTAMP if inference is off).
    Dispatch on the actual type so every query works under any fixture
    generation and ANY caller-owned SparkSession:

    - LongType: already epoch nanos.
    - TIMESTAMP_NTZ: wall-clock micros since epoch via ``timestamp_diff``
      (NO session-timezone dependence — a cast through TIMESTAMP would
      shift by the caller's zone) × 1000. Matches DuckDB ``epoch_ns`` on
      the same naive column exactly.
    - TIMESTAMP: ``unix_micros`` × 1000 (UTC-internal, tz-free).
    """
    if isinstance(dtype, T.LongType):
        return col.cast("bigint")
    if isinstance(dtype, T.TimestampNTZType):
        zero = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return (F.timestamp_diff("MICROSECOND", zero, col) * F.lit(1000)).cast("bigint")
    return (F.unix_micros(col) * F.lit(1000)).cast("bigint")


def ts_us_expr(col: Column, dtype: T.DataType) -> Column:
    """Epoch-microseconds BIGINT (truncating) from a fixture timestamp.

    The long (epoch-nanos) path truncates through DECIMAL integer
    division — float division of ~1.7e18 nanos loses precision past 2^53
    BEFORE dividing, so ``floor(col / 1000)`` over doubles is wrong.
    """
    if isinstance(dtype, T.LongType):
        return F.floor(col.cast("decimal(38,0)") / F.lit(1000)).cast("bigint")
    if isinstance(dtype, T.TimestampNTZType):
        zero = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", zero, col).cast("bigint")
    return F.unix_micros(col).cast("bigint")


def ts_ns_col(df: DataFrame, name: str = "ts") -> Column:
    """``ts_ns_expr`` dispatched on ``df``'s actual column type."""
    return ts_ns_expr(F.col(name), df.schema[name].dataType)


def kind_column(event_type: Column) -> Column:
    return (
        F.when(event_type == "signup", F.lit(KIND_INSERT))
        .when(event_type == "error", F.lit(KIND_DELETE))
        .otherwise(F.lit(KIND_UPDATE))
    )


def events_as_change_log(events: DataFrame) -> DataFrame:
    """Map the ``events`` fixture to a change log on key ``user_id``.

    Stays entirely in JVM expressions — no UDFs — so the scan prunes to the
    referenced columns and the mapping is free at any scale.
    """
    return events.select(
        (F.col("event_id") / EVENTS_LSN_DIVISOR).cast("bigint").alias("lsn"),
        F.col("event_id").alias("seq"),
        F.lit("public").alias("schema"),
        F.lit("users").alias("tbl"),
        kind_column(F.col("event_type")).alias("kind"),
        F.lit(False).alias("changes_row_identity"),
        F.col("user_id").cast("bigint").alias("key"),
        F.col("value"),
        F.col("props"),
        # engine-internal event time is epoch-nanos BIGINT regardless of
        # how the fixture surfaces ts (long / TIMESTAMP_NTZ / TIMESTAMP)
        ts_ns_col(events).alias("ts_ns"),
    )


def local_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Build a small driver-side relation via the Arrow fast path.

    ``spark.createDataFrame(list_of_rows)`` goes through the Python-RDD
    path and distributes the rows over ``defaultParallelism`` tasks, each
    needing a Python worker — 32 tasks for a 40-row metadata listing
    (~0.35 s per ACTION over the frame, since RDD-backed relations
    re-evaluate; ~4 s if a ``coalesce(1)`` funnels all 32 worker
    round-trips through one sequential task). Routing through pandas
    takes the Arrow conversion instead: a single-partition JVM-side
    scan, no Python workers at execution time. EMPTY frames skip Python
    entirely via ``range(0)`` + typed NULL casts — same schema, same
    one-empty-parquet-file write layout, ~4x cheaper per action. Use
    for catalog listings, sentinels and fixture relations; real data
    always comes from parquet.
    """
    import pandas as pd

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if isinstance(schema, T.StructType) and not rows:
        out = spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        # statically-empty marker (r13 pass 7): consumers that would
        # otherwise pay a Spark write job per empty frame (catalog
        # backfills) can recognize provable emptiness and take the
        # per-schema template path instead
        out._mammoth_static_empty = True
        return out
    names = [f.name for f in schema.fields] if isinstance(schema, T.StructType) else list(schema)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.DataFrame(rows, columns=names), schema=schema)


_shipped_pkg_sessions: set[int] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Ship the mammoth_spark package to Spark's Python workers.

    Pandas UDFs defined inside this package pickle by *reference*
    (module + qualname), so executors must be able to
    ``import mammoth_spark`` themselves. When the driver process runs
    from a different cwd (the grading driver does), the package is only
    on the driver's sys.path. Zip it once per session and addPyFile —
    on a real cluster this is also exactly how the package reaches
    executors without any shared filesystem.
    """
    key = id(spark)
    if key in _shipped_pkg_sessions:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "mammoth_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _shipped_pkg_sessions.add(key)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (TESTDATA.md).

    Timestamp columns are consumed through ``ts_ns_expr``/``ts_us_expr``,
    which dispatch on the surfaced type — the fixtures have shipped as
    TIMESTAMP(NANOS) (long under nanosAsLong) and as timestamp[us]
    (TIMESTAMP_NTZ) across generations. The legacy conf is still set for
    older-generation fixtures; current Spark ignores it for micro columns.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_worker_imports(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
