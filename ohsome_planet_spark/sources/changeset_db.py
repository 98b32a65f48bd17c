"""Changeset metadata from PostgreSQL via spark.read.jdbc (S12).

The reference loads changeset metadata from a Postgres table with a
row-range query per batch (`/root/reference/ohsome-changesets/src/main/java/
org/heigit/ohsome/changesets/ChangesetDb.java:24-45`). Spark-side the same
source is one declarative `spark.read.jdbc` with range partitioning on the
changeset id — each executor pulls its own id slice in parallel, and the
result broadcasts into `with_changeset_metadata` (J3).

This sandbox ships no PostgreSQL server or JDBC driver jar, but Spark
bundles embedded Derby — `tests/test_jdbc_derby.py` exercises the REAL
round-trip (bounds probe, range-partitioned parallel scan, fetchsize,
changeset-metadata join) against an actual JDBC database through this exact
function; only the driver class and URL differ in production. The join
semantics are additionally oracle-verified through `changeset_join_default`;
sources.osm_xml.read_changeset_xml_bz2 is the file-based alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_changesets_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "osm_changeset",
    user: str | None = None,
    password: str | None = None,
    id_col: str = "id",
    min_id: int = 0,
    max_id: int | None = None,
    num_partitions: int = 64,
    fetch_size: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> DataFrame:
    """Partitioned JDBC scan of the changeset table.

    Range-partitions on the changeset id (the reference's
    `WHERE id >= ? AND id < ?` batching, ChangesetDb.java:33-38) so the
    scan parallelizes across `num_partitions` executor tasks; `fetchsize`
    keeps the Postgres cursor streaming instead of materializing.
    """
    if max_id is None:
        # one cheap bound query on the driver (reference does the same count
        # probe before batching, ChangesetDb.java:27-31)
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", f"SELECT max({id_col}) AS mx FROM {table}")
            .options(**_auth(user, password, driver))
            .load()
            .collect()
        )
        # positional: identifier case folding is dialect-specific (Derby
        # upper-cases unquoted aliases, Postgres lower-cases them)
        max_id = int(bounds[0][0] or 0) + 1
    opts = jdbc_scan_options(
        url, table, id_col, min_id, max_id, num_partitions, fetch_size
    )
    opts.update(_auth(user, password, driver))
    return spark.read.format("jdbc").options(**opts).load()


def jdbc_scan_options(
    url: str,
    table: str,
    id_col: str,
    min_id: int,
    max_id: int,
    num_partitions: int,
    fetch_size: int,
) -> dict[str, str]:
    """The partitioned-scan option set (unit-testable without a server)."""
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": id_col,
        "lowerBound": str(min_id),
        "upperBound": str(max_id),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def _auth(
    user: str | None, password: str | None,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    opts: dict[str, str] = {"driver": driver}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts
