"""REAL JDBC round-trip for the changeset source (S12).

The reference reads changeset metadata from PostgreSQL
(`ChangesetDb.java:24-45`). No Postgres server or driver ships in this
sandbox, but Spark bundles embedded Derby — so this suite drives the ACTUAL
`read_changesets_jdbc` code path (bounds probe via the `query` option,
range-partitioned parallel scan, fetchsize) against a live JDBC database;
production differs only in URL + driver class.
"""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.sources.changeset_db import read_changesets_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
N_ROWS = 137


def _have_derby(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _have_derby(spark):
        pytest.skip("embedded Derby not on the Spark classpath")
    db_dir = tmp_path_factory.mktemp("derby") / "csdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE osm_changeset ("
        "id BIGINT PRIMARY KEY, created_at TIMESTAMP, closed_at TIMESTAMP, "
        "num_changes INT, created_by VARCHAR(64), comment_str VARCHAR(256))"
    )
    ps = conn.prepareStatement(
        "INSERT INTO osm_changeset VALUES (?, ?, ?, ?, ?, ?)"
    )
    for c in range(N_ROWS):
        ps.setLong(1, c)
        ps.setTimestamp(2, jvm.java.sql.Timestamp(c * 1000))
        ps.setTimestamp(3, jvm.java.sql.Timestamp(c * 1000 + 500))
        ps.setInt(4, c * 2)
        ps.setString(5, f"ed{c % 5}")
        ps.setString(6, f"touchup #fix{c % 3}")
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return url


def test_jdbc_partitioned_scan_round_trip(spark, derby_url):
    df = read_changesets_jdbc(
        spark, derby_url, table="osm_changeset",
        num_partitions=8, fetch_size=50, driver=DERBY_DRIVER,
    )
    # range partitioning really split the scan into parallel tasks
    assert df.rdd.getNumPartitions() == 8
    rows = df.orderBy("ID").collect()
    assert len(rows) == N_ROWS
    assert [r["ID"] for r in rows[:5]] == [0, 1, 2, 3, 4]
    assert rows[10]["NUM_CHANGES"] == 20
    assert rows[10]["CREATED_BY"] == "ed0"
    # the bounds probe (max(id) query) ran against the live database:
    # no max_id was passed, yet every row landed in some partition
    assert df.count() == N_ROWS


def test_jdbc_scan_feeds_changeset_join(spark, derby_url):
    from ohsome_planet_spark.operators.history import with_changeset_metadata

    scanned = read_changesets_jdbc(
        spark, derby_url, table="osm_changeset",
        num_partitions=4, driver=DERBY_DRIVER,
    )
    # adapt the relational row to the changesets contract (Postgres side
    # would project hstore→map the same way)
    changesets = scanned.select(
        F.col("ID").alias("id"),
        F.col("CREATED_AT").cast("timestamp_ntz").alias("created_at"),
        F.col("CLOSED_AT").cast("timestamp_ntz").alias("closed_at"),
        F.col("NUM_CHANGES").alias("num_changes"),
        F.create_map(
            F.lit("created_by"), F.col("CREATED_BY"),
            F.lit("comment"), F.col("COMMENT_STR"),
        ).alias("tags"),
    )
    contribs = spark.createDataFrame(
        [(1, 10), (2, 136), (3, 999_999)],
        "osm_id long, changeset long",
    )
    joined = with_changeset_metadata(contribs, changesets).orderBy("osm_id").collect()
    assert joined[0]["changeset_editor"] == "ed0"
    assert joined[1]["changeset_editor"] == "ed1"
    assert joined[0]["changeset_hashtags"] == ["fix1"]
    # miss → the reference's default record (empty tags → null editor)
    assert joined[2]["changeset_editor"] is None
