"""Golden tests for target DDL / MERGE codegen (A10, A14-text), mirroring
the reference's golden-SQL unit tests (snowflake_target_test.go:17-88)."""

from pyspark.sql import types as T

from mammoth_spark.operators.ddl import (
    create_table_stmt,
    merge_statement,
    quote_ident,
    spark_type_to_target,
)
from mammoth_spark.types import Column, Relation

USERS = Relation(
    schema="public",
    name="users",
    columns=(
        Column("id", "int8", is_identity=True),
        Column("name", "text"),
        Column("balance", "float8"),
        Column("tags", "text[]"),
        Column("created", "timestamptz"),
    ),
)


def test_quote_ident_uppercases_and_escapes():
    assert quote_ident("users") == '"USERS"'
    assert quote_ident('we"ird') == '"WE""IRD"'


def test_spark_type_to_target_table():
    assert spark_type_to_target(T.BooleanType()) == "BOOLEAN"
    assert spark_type_to_target(T.LongType()) == "INT"
    assert spark_type_to_target(T.IntegerType()) == "INT"
    assert spark_type_to_target(T.FloatType()) == "FLOAT4"
    assert spark_type_to_target(T.DoubleType()) == "FLOAT8"
    assert spark_type_to_target(T.DateType()) == "DATE"
    assert spark_type_to_target(T.TimestampNTZType()) == "TIMESTAMP_NTZ"
    assert spark_type_to_target(T.TimestampType()) == "TIMESTAMP_TZ"
    assert spark_type_to_target(T.ArrayType(T.StringType())) == "ARRAY"
    # numeric/decimal deliberately falls through to STRING (SURVEY §1.2)
    assert spark_type_to_target(T.DecimalType(10, 2)) == "STRING"
    assert spark_type_to_target(T.StringType()) == "STRING"


def test_create_table_golden():
    assert create_table_stmt(USERS) == (
        'CREATE TABLE "PUBLIC"."USERS" ("ID" INT, "NAME" STRING, '
        '"BALANCE" FLOAT8, "TAGS" ARRAY, "CREATED" TIMESTAMP_TZ)'
    )
    assert create_table_stmt(USERS, temporary=True, name_override="users_scratch").startswith(
        'CREATE TEMPORARY TABLE "PUBLIC"."USERS_SCRATCH" ('
    )


def test_merge_statement_golden():
    stmt = merge_statement(USERS)
    assert stmt.startswith(
        'MERGE INTO "PUBLIC"."USERS" t USING "USERS_SCRATCH" s ON t."ID" = s."_IDENTITY_ID" '
    )
    assert 'WHEN MATCHED AND s."_DELETE_ROW" THEN DELETE' in stmt
    assert (
        '"BALANCE" = CASE WHEN s."_IS_UNCHANGED_BALANCE" THEN t."BALANCE" '
        'WHEN s."_IS_NULL_BALANCE" THEN NULL ELSE s."BALANCE" END'
    ) in stmt
    assert 'WHEN NOT MATCHED AND NOT s."_DELETE_ROW" THEN INSERT' in stmt
    # every non-key column appears in the insert column list
    assert '("ID", "NAME", "BALANCE", "TAGS", "CREATED")' in stmt


def test_merge_statement_composite_pk():
    rel = Relation(
        schema="s",
        name="t",
        columns=(
            Column("a", "int8", is_identity=True),
            Column("b", "text", is_identity=True),
            Column("v", "float8"),
        ),
    )
    stmt = merge_statement(rel)
    assert 'ON t."A" = s."_IDENTITY_A" AND t."B" = s."_IDENTITY_B"' in stmt


def test_batch_statements_plan():
    from mammoth_spark.operators.ddl import batch_statements, staging_columns

    items = Relation(
        schema="public",
        name="items",
        columns=(Column("id", "int8", is_identity=True), Column("qty", "int4")),
    )
    plan = batch_statements([USERS, items], batch_id="b7")
    # one transaction wraps every table (snowflake_target.go:295-297)
    assert plan[0] == "BEGIN" and plan[-1] == "COMMIT"
    # per table: create-or-replace scratch, ONE overwrite PUT, COPY from
    # the explicit stage/file with the reference's file format, MERGE
    # (statement plan snowflake_target.go:346-366)
    users_stmts = [s for s in plan if "USERS" in s]
    assert users_stmts[0].startswith('CREATE OR REPLACE TEMPORARY TABLE "USERS_SCRATCH"')
    puts = [s for s in users_stmts if s.startswith("PUT ")]
    assert len(puts) == 1 and "overwrite=true" in puts[0]
    assert "file://PUBLIC_USERS-b7.csv" in puts[0]
    copies = [s for s in users_stmts if s.startswith('COPY INTO "USERS_SCRATCH"')]
    assert len(copies) == 1
    assert 'FROM @%"USERS_SCRATCH"/PUBLIC_USERS-b7.csv' in copies[0]
    assert "field_optionally_enclosed_by='\"'" in copies[0]
    assert users_stmts[-1].startswith('MERGE INTO "PUBLIC"."USERS"')
    # staging layout: identities first, then _DELETE_ROW, values, flags
    names = [n for n, _ in staging_columns(USERS)]
    assert names[0] == "_IDENTITY_id" and names[1] == "_DELETE_ROW"
    assert "_IS_UNCHANGED_name" in names and "_IS_NULL_tags" in names


def test_jdbc_snapshot_options():
    from mammoth_spark.sources.jdbc import bounds_query, jdbc_snapshot_options

    opts = jdbc_snapshot_options(
        "jdbc:postgresql://db/app", "public.users", "id", 1, 1_000_000,
        num_partitions=64, snapshot_name="00000003-0000001B-1",
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"
    # every partition pins the exported snapshot (sync_service.go:176-185)
    assert "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'" in opts["sessionInitStatement"]
    assert bounds_query("public.users", "id") == "SELECT min(id), max(id) FROM public.users"


def test_jdbc_snapshot_options_validation():
    import pytest

    from mammoth_spark.sources.jdbc import jdbc_snapshot_options

    with pytest.raises(ValueError):
        jdbc_snapshot_options("u", "t", "id", 10, 1)
    with pytest.raises(ValueError):
        jdbc_snapshot_options("u", "t", "id", 1, 10, num_partitions=0)
