"""schema_introspect + target DDL/MERGE codegen (A2, A10, A14-text).

The reference introspects every replicated table from the Postgres
catalogs (reference sync/service/sync_service.go:323-412) and generates
target-side SQL from the resulting Relation: CREATE TABLE DDL through the
``getSfType`` type map (reference target/snowflake/snowflake_target.go:368-383,
675-714) and a three-branch MERGE statement from a fixed template
(reference target/snowflake/snowflake_target.go:536-602).

Here introspection reads the *parquet* schema Spark resolves for each
fixture table — schema-on-read is the Spark-native catalog — and the
codegen walks our Relation model (types.py). Identifiers are upper-cased
and double-quoted like the reference's ``quoteID``
(snowflake_target.go:615-650). Codegen is driver-side string templating
over metadata: it costs nothing at any data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..types import Relation

# Target type names follow the reference's getSfType table
# (snowflake_target.go:675-714): ints collapse to INT, numeric/decimal and
# unknowns fall through to STRING, arrays collapse to ARRAY.
_SIMPLE_TARGET_TYPES: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.ByteType, "INT"),
    (T.ShortType, "INT"),
    (T.IntegerType, "INT"),
    (T.LongType, "INT"),
    (T.FloatType, "FLOAT4"),
    (T.DoubleType, "FLOAT8"),
    (T.DateType, "DATE"),
    (T.TimestampNTZType, "TIMESTAMP_NTZ"),
    (T.TimestampType, "TIMESTAMP_TZ"),
]


def spark_type_to_target(dt: T.DataType) -> str:
    """Map a Spark DataType to the engine's target type name."""
    if isinstance(dt, T.ArrayType):
        return "ARRAY"
    if isinstance(dt, (T.MapType, T.StructType)):
        return "VARIANT"  # json/jsonb -> VARIANT (snowflake_target.go:683,704)
    for cls, name in _SIMPLE_TARGET_TYPES:
        if isinstance(dt, cls):
            return name
    return "STRING"  # fallthrough branch (snowflake_target.go:713)


# Fixture-table identity columns (FIXTURES.md convention: leading key col).
FIXTURE_PKS: dict[str, str] = {
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


def introspect_tables(spark: SparkSession, sf_dir: str, tables: list[str]) -> DataFrame:
    """A2: column inventory for a set of tables as a DataFrame.

    Pure metadata: parquet footers are read on the driver (no data scan),
    exactly as the reference's introspection touches only pg catalogs.
    """
    from ..model import local_df, read_table

    rows = []
    for tbl in tables:
        schema = read_table(spark, sf_dir, tbl).schema
        pk = FIXTURE_PKS.get(tbl)
        for f in schema.fields:
            rows.append((tbl, f.name, spark_type_to_target(f.dataType), f.name == pk))
    return local_df(
        spark,
        rows,
        T.StructType(
            [
                T.StructField("tbl", T.StringType(), False),
                T.StructField("column_name", T.StringType(), False),
                T.StructField("target_type", T.StringType(), False),
                T.StructField("is_identity", T.BooleanType(), False),
            ]
        ),
    )


def quote_ident(name: str) -> str:
    """Upper-case + double-quote an identifier (snowflake_target.go:615-650)."""
    return '"' + name.upper().replace('"', '""') + '"'


def create_table_stmt(relation: Relation, temporary: bool = False, name_override: str | None = None) -> str:
    """A10: CREATE TABLE DDL for a relation (snowflake_target.go:368-383)."""
    tbl = quote_ident(name_override or relation.name)
    cols = ", ".join(
        f"{quote_ident(c.name)} {spark_type_to_target(c.spark_type)}" for c in relation.columns
    )
    kw = "CREATE TEMPORARY TABLE" if temporary else "CREATE TABLE"
    return f"{kw} {quote_ident(relation.schema)}.{tbl} ({cols})"


def staging_columns(relation: Relation) -> list[tuple[str, str]]:
    """A13 staging layout as (name, target type) pairs — the scratch-table
    shape the reference loads (columnDefForLoading,
    snowflake_target.go:406-450): _IDENTITY_<pk>..., _DELETE_ROW, each
    value column, then _IS_UNCHANGED_/_IS_NULL_ flags per column."""
    cols: list[tuple[str, str]] = [
        (f"_IDENTITY_{c.name}", spark_type_to_target(c.spark_type))
        for c in relation.columns
        if c.is_identity
    ]
    cols.append(("_DELETE_ROW", "BOOLEAN"))
    for c in relation.columns:
        cols.append((c.name, spark_type_to_target(c.spark_type)))
    for c in relation.columns:
        cols.append((f"_IS_UNCHANGED_{c.name}", "BOOLEAN"))
    for c in relation.columns:
        cols.append((f"_IS_NULL_{c.name}", "BOOLEAN"))
    return cols


# verbatim from the reference (snowflake_target.go:29)
COPY_FILE_FORMAT = (
    "file_format = (type = 'CSV' field_delimiter = ',' "
    "field_optionally_enclosed_by='\"' skip_header = 1)"
)


def batch_statements(batch: list[Relation], batch_id: str = "0") -> list[str]:
    """A15: the statement plan for applying one micro-batch — per table
    [create-or-replace temp scratch with the staging layout, ONE staged
    CSV upload, bulk load, MERGE], ALL tables inside one target
    transaction (the reference wraps multi-table batches in a single
    Snowflake tx because one PG tx can touch many tables,
    snowflake_target.go:283-340; statement plan :346-366:
    create-or-replace + one PUT with overwrite=true to the scratch's
    table stage + COPY from the explicit @stage/file with the full file
    format). ``batch_id`` stands in for the reference's per-batch uuid in
    the staged file name (pure codegen must stay deterministic). The
    engine executes the same semantics relationally (operators/merge.py)
    inside foreachBatch."""
    stmts = ["BEGIN"]
    for relation in batch:
        scratch = f"{relation.name}_SCRATCH"
        safe = f"{relation.schema}_{relation.name}".upper()  # safeTableIdentifier (:644-646)
        file_name = f"{safe}-{batch_id}.csv"
        cols = ", ".join(f"{quote_ident(n)} {t}" for n, t in staging_columns(relation))
        stmts.append(f"CREATE OR REPLACE TEMPORARY TABLE {quote_ident(scratch)} ({cols})")
        stmts.append(
            f"PUT file://{file_name} @%{quote_ident(scratch)} "
            "auto_compress=true parallel=30 overwrite=true"
        )
        stmts.append(
            f"COPY INTO {quote_ident(scratch)} FROM @%{quote_ident(scratch)}/{file_name} "
            f"{COPY_FILE_FORMAT}"
        )
        stmts.append(merge_statement(relation, scratch))
    stmts.append("COMMIT")
    return stmts


def create_table_stmt_from_spark_schema(
    schema_name: str, table: str, struct: T.StructType
) -> str:
    """A10 over an introspected Spark schema: same DDL shape as
    :func:`create_table_stmt` (snowflake_target.go:368-383) but driven by
    schema-on-read instead of a declared Relation."""
    cols = ", ".join(
        f"{quote_ident(f.name)} {spark_type_to_target(f.dataType)}" for f in struct.fields
    )
    return f"CREATE TABLE {quote_ident(schema_name)}.{quote_ident(table)} ({cols})"


def merge_statement(relation: Relation, scratch: str | None = None) -> str:
    """A14 codegen: the three-branch MERGE applying a flattened staging
    table (change_flatten layout: _IDENTITY_*, _DELETE_ROW, _IS_NULL_*,
    _IS_UNCHANGED_*) to the target — textual parity with the reference's
    template (snowflake_target.go:537-567). The engine executes the same
    semantics relationally (operators/merge.py); this statement is what a
    SQL-speaking target (Snowflake, Delta SQL) would be sent.
    """
    tgt = f"{quote_ident(relation.schema)}.{quote_ident(relation.name)}"
    src = quote_ident(scratch or f"{relation.name}_SCRATCH")
    pks = [c.name for c in relation.columns if c.is_identity]
    vals = [c.name for c in relation.columns]
    on = " AND ".join(f"t.{quote_ident(k)} = s.{quote_ident('_IDENTITY_' + k)}" for k in pks)
    set_clauses = ", ".join(
        f"{quote_ident(c)} = CASE WHEN s.{quote_ident('_IS_UNCHANGED_' + c)} THEN t.{quote_ident(c)} "
        f"WHEN s.{quote_ident('_IS_NULL_' + c)} THEN NULL ELSE s.{quote_ident(c)} END"
        for c in vals
    )
    insert_cols = ", ".join(quote_ident(c) for c in vals)
    insert_vals = ", ".join(
        f"CASE WHEN s.{quote_ident('_IS_NULL_' + c)} THEN NULL ELSE s.{quote_ident(c)} END"
        for c in vals
    )
    return (
        f"MERGE INTO {tgt} t USING {src} s ON {on} "
        f'WHEN MATCHED AND s."_DELETE_ROW" THEN DELETE '
        f"WHEN MATCHED THEN UPDATE SET {set_clauses} "
        f'WHEN NOT MATCHED AND NOT s."_DELETE_ROW" THEN INSERT ({insert_cols}) VALUES ({insert_vals})'
    )
