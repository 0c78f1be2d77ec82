"""Pipeline configuration — the reference's 19-parameter surface.

Mirrors the parameter list of the reference job (reference
``README.md:40-64``, loaded by ``Utils/ParameterToolLoader.java:15-27`` and
read in ``StreamingJob.java:66-89``) as frozen dataclasses, and keeps the
reference's two validations:

* unsupported sink operation ⇒ error (``IcebergSinkBuilder.java:41-42`` —
  the reference *rejects* anything that is not ``upsert``/``overwrite``,
  including ``append`` despite the README claiming it; we support all three
  and still reject unknown modes),
* partition fields must be a subset of the upsert equality fields when both
  are configured (``README.md:84``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Sink modes our engine supports. The reference supports upsert/overwrite
#: and *documents* append (README.md:64) while its code rejects it
#: (IcebergSinkBuilder.java:41-42); we implement all three.
SUPPORTED_OPERATIONS = ("upsert", "overwrite", "append")


class UnsupportedOperationError(ValueError):
    """Engine-level analogue of the reference's UnsupportedOperationException."""


@dataclass(frozen=True)
class SnowflakeSourceConfig:
    """The 13 Snowflake-side parameters (reference README.md:42-54).

    In this sandbox the "Snowflake" source is a parquet staging directory
    (``table`` is a path or fixture-table name); the JDBC path is kept
    behind ``sources.jdbc`` with the same parameter names.
    """

    user: str = ""
    password: str = ""
    schema: str = ""
    warehouse: str = ""
    db: str = ""
    account_id: str = ""          # SnowflakeID
    port: int = 443
    table: str = ""               # SnowflakeTable
    shard_column: str = ""        # SnowflakeShardColumn
    sort_column: str = ""         # SnowflakeSortColumn
    column_interval_ms: int = 60_000   # SnowflakeColumnInterval
    query_interval_ms: int = 10_000    # SnowflakeQueryInterval
    query_size: int = 1000             # SnowflakeQuerySize
    #: Non-Snowflake JDBC endpoint (tests use Spark's bundled embedded
    #: Derby); empty ⇒ the Snowflake URL/driver below.
    jdbc_url_override: str = ""
    jdbc_driver: str = ""

    def jdbc_url(self) -> str:
        """JDBC URL exactly as the reference assembles it
        (``StreamingJob.java:92-93``), unless an override endpoint is set."""
        if self.jdbc_url_override:
            return self.jdbc_url_override
        return (
            f"jdbc:snowflake://{self.account_id}.snowflakecomputing.com:"
            f"{self.port}/?warehouse={self.warehouse}&db={self.db}"
            f"&schema={self.schema}&user={self.user}&password={self.password}"
        )


@dataclass(frozen=True)
class IcebergSinkConfig:
    """The 6 Iceberg-side parameters (reference README.md:58-64)."""

    warehouse: str = ""
    db: str = "default"
    table_name: str = ""
    partition_fields: tuple[str, ...] = ()   # IcebergPartitionFields (csv)
    upsert_fields: tuple[str, ...] = ()      # IcebergUpsertFields (csv)
    operation: str = "upsert"                # IcebergOperation
    # engine extension (not in the reference's surface): keep per-commit
    # snapshots for read_as_of time travel (native epoch tags under an
    # Iceberg catalog, an epoch-partitioned history table on the fallback)
    snapshots: bool = False

    def __post_init__(self) -> None:
        if self.operation not in SUPPORTED_OPERATIONS:
            # IcebergSinkBuilder.java:41-42 — unknown mode is a hard error.
            raise UnsupportedOperationError(
                f"Iceberg operation {self.operation!r} not supported; "
                f"expected one of {SUPPORTED_OPERATIONS}"
            )
        if self.operation == "upsert" and self.partition_fields:
            # README.md:84 — partition fields must be included in the
            # upsert equality fields, otherwise equality deletes cannot
            # target the right partition.
            missing = set(self.partition_fields) - set(self.upsert_fields)
            if missing:
                raise ValueError(
                    "partition fields must be part of the upsert fields "
                    f"when operation='upsert'; missing: {sorted(missing)}"
                )


@dataclass(frozen=True)
class PipelineConfig:
    """Full job configuration (source + sink), as the reference's
    ``ParameterTool`` would carry it."""

    source: SnowflakeSourceConfig = field(default_factory=SnowflakeSourceConfig)
    sink: IcebergSinkConfig = field(default_factory=IcebergSinkConfig)

    @classmethod
    def from_dict(cls, params: dict[str, str]) -> "PipelineConfig":
        """Build from the reference's flat string parameter map
        (names per README.md:40-64)."""

        def csv(key: str) -> tuple[str, ...]:
            raw = params.get(key, "")
            return tuple(s for s in (p.strip() for p in raw.split(",")) if s)

        src = SnowflakeSourceConfig(
            user=params.get("SnowflakeUser", ""),
            password=params.get("SnowflakePassword", ""),
            schema=params.get("SnowflakeSchema", ""),
            warehouse=params.get("SnowflakeWarehouse", ""),
            db=params.get("SnowflakeDB", ""),
            account_id=params.get("SnowflakeID", ""),
            port=int(params.get("SnowflakePort", "443")),
            table=params.get("SnowflakeTable", ""),
            shard_column=params.get("SnowflakeShardColumn", ""),
            sort_column=params.get("SnowflakeSortColumn", ""),
            column_interval_ms=int(params.get("SnowflakeColumnInterval", "60000")),
            query_interval_ms=int(params.get("SnowflakeQueryInterval", "10000")),
            query_size=int(params.get("SnowflakeQuerySize", "1000")),
        )
        snk = IcebergSinkConfig(
            warehouse=params.get("IcebergWarehouse", ""),
            db=params.get("IcebergDB", "default"),
            table_name=params.get("IcebergTableName", ""),
            partition_fields=csv("IcebergPartitionFields"),
            upsert_fields=csv("IcebergUpsertFields"),
            operation=params.get("IcebergOperation", "upsert"),
            # extension parameter; absent from the reference's map
            snapshots=params.get("IcebergSnapshots", "false").lower() == "true",
        )
        return cls(source=src, sink=snk)
