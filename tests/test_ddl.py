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
