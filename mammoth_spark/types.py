"""Type system: Postgres type → Spark DataType mapping + Relation model.

Mirrors the reference's only type table, ``getSfType``
(reference: target/snowflake/snowflake_target.go:675-714), which maps
Postgres OIDs to Snowflake types with a TEXT fallback ("Mammoth does not
reject any Postgres types… Unknown or custom Postgres types are replicated
as TEXT", reference README.md:225-227). We key by type *name* rather than
raw OID (the OID constants are pgtype wire details), keep the same
semantics: ints widen to 64-bit, numeric/decimal deliberately falls through
to string, json stays string (queried on demand via from_json), arrays wrap
their element type.

Relation mirrors sync/db/db.go:11-22 — a table is a StructType plus the
ordered list of identity (primary-key) columns; Spark has no PK concept so
identity membership is carried as metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# pg type name -> Spark type. Reference mapping (snowflake_target.go:675-714):
#   bool->BOOLEAN; int2/4/8->INT(64); float4->FLOAT4; float8->FLOAT8;
#   json/jsonb->VARIANT; date->DATE; timestamp->TIMESTAMP_NTZ;
#   timestamptz->TIMESTAMP_TZ; arrays->ARRAY; everything else->STRING.
_PG_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int2": T.LongType(),
    "smallint": T.LongType(),
    "int4": T.LongType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
    "float4": T.FloatType(),
    "real": T.FloatType(),
    "float8": T.DoubleType(),
    "double precision": T.DoubleType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
}

_STRING_FALLBACKS = frozenset(
    # explicit examples from the reference's fallthrough branch + README
    {"text", "varchar", "uuid", "numeric", "decimal", "name", "enum"}
)


def pg_type_to_spark(pg_type: str) -> T.DataType:
    """Map a Postgres type name to the engine's Spark type.

    Array types are written pg-style as ``<elem>[]`` (or ``_<elem>`` OID
    style); they map to ArrayType of the element mapping, matching the
    reference's IsArray -> ARRAY branch (snowflake_target.go:706-707).
    Unknown types fall through to StringType (snowflake_target.go:713).
    """
    name = pg_type.strip().lower()
    if name.endswith("[]"):
        return T.ArrayType(pg_type_to_spark(name[:-2]))
    if name.startswith("_"):
        return T.ArrayType(pg_type_to_spark(name[1:]))
    return _PG_TO_SPARK.get(name, T.StringType())


@dataclass(frozen=True)
class Column:
    """One column of a replicated relation (reference sync/db/db.go:17-22)."""

    name: str
    pg_type: str
    is_identity: bool = False

    @property
    def spark_type(self) -> T.DataType:
        return pg_type_to_spark(self.pg_type)

    @property
    def is_array(self) -> bool:
        n = self.pg_type.strip().lower()
        return n.endswith("[]") or n.startswith("_")


@dataclass(frozen=True)
class Relation:
    """A replicated table (reference sync/db/db.go:11-15).

    ``schema``/``name`` identify it; ``columns`` are ordered as in the
    source catalog (introspection orders by ordinal position,
    sync/service/sync_service.go:327-379).
    """

    schema: str
    name: str
    columns: tuple[Column, ...] = field(default_factory=tuple)

    @property
    def identity_columns(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.columns if c.is_identity)

    @property
    def column_names(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.columns)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, nullable=not c.is_identity) for c in self.columns]
        )

    def equal(self, other: "Relation") -> bool:
        """Schema-drift comparison (reference sync/db/db.go:53-67):
        same qualified name, same ordered (name, identity, type) triples."""
        return (
            self.schema == other.schema
            and self.name == other.name
            and len(self.columns) == len(other.columns)
            and all(
                a.name == b.name
                and a.is_identity == b.is_identity
                and a.spark_type == b.spark_type
                for a, b in zip(self.columns, other.columns)
            )
        )


class RelationChangedError(RuntimeError):
    """Raised when a relation's schema drifts mid-stream; the supervisor
    responds with a full re-sync (reference
    sync/stream/message_accumulator.go:118-122, supervisor/supervisor.go:73-76).

    ``additive`` + ``advertised`` classify the drift: an upstream
    ``ALTER TABLE ADD COLUMN`` (the advertised list EXTENDS the declared
    one) is recoverable without a re-sync — ``run_with_restart`` can
    evolve the catalog schema and resume from the same checkpoint.
    ``dropped`` classifies the other recoverable shape (round 13): an
    upstream ``DROP COLUMN`` — the advertised list is an
    order-preserving strict subsequence of the declared one — which
    ``run_with_restart`` can absorb by RETIRING the column(s)
    (``TxnCatalog.retire_column``, a projection-level metadata record)
    and resuming from the same checkpoint. Everything else
    (rename/reorder/type) stays a full re-sync. The lists are ALSO
    embedded in the message as parseable ``ADDITIVE_DRIFT:[...]`` /
    ``DROP_DRIFT:[...]`` markers because Structured Streaming may
    surface foreachBatch failures with only the message string intact
    (the supervisor falls back to parsing it)."""

    def __init__(
        self,
        message: str,
        advertised: list[str] | None = None,
        additive: bool = False,
        dropped: list[str] | None = None,
    ):
        import json

        if additive and advertised is not None:
            message = f"{message} ADDITIVE_DRIFT:{json.dumps(advertised)}"
        if dropped:
            message = f"{message} DROP_DRIFT:{json.dumps(dropped)}"
        super().__init__(message)
        self.advertised = advertised
        self.additive = additive
        self.dropped = dropped
