"""Composed corpus-pipeline manifest check: curate_corpus stage counts vs a
DuckDB replay of each stage boundary (the driver oracle row
`corpus_curation_e2e` value-checks the survivors; this pins the MANIFEST —
where documents were dropped — stage by stage)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixture_sql(sf_dir):
    import __spark_entry__ as entry

    return entry._CORPUS_E2E_ORACLE_SQL.replace(
        "FROM documents", f"FROM '{sf_dir}/documents.parquet'"
    )


def test_corpus_stage_counts(spark, sf_dir, fixture_sql):
    import __spark_entry__ as entry
    from ohsome_planet_spark.plans.corpus import curate_corpus

    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text", "source")
    )
    d = F.col("doc_id")
    corpus = (
        base
        .unionByName(base.where(d % 2 == 0).select(
            (d + 100000).alias("doc_id"), "text", "source"))
        .unionByName(base.where(d % 3 == 0).select(
            (d + 200000).alias("doc_id"),
            F.concat("text", F.lit(" zq")).alias("text"), "source"))
        .unionByName(base.where(d % 5 == 0).select(
            (d + 300000).alias("doc_id"),
            F.concat(F.lit("!!! ??? "), d.cast("string")).alias("text"),
            "source"))
        .unionByName(base.where(d % 7 == 0).select(
            (d + 400000).alias("doc_id"),
            F.concat_ws("\n", F.substring("text", 1, 30),
                        F.substring("text", 1, 30),
                        F.substring("text", 1, 30)).alias("text"),
            "source"))
    )
    bench = base.where(d % 37 == 0).select("text")
    clean, counts = curate_corpus(
        corpus, benchmark=bench, contamination_n=3, with_manifest=True
    )
    survivors = clean.count()

    # DuckDB replay: count each stage CTE of the oracle SQL
    con = duckdb.connect()
    body = fixture_sql.rsplit("SELECT doc_id, source, md5(text)", 1)[0]

    def stage_count(cte: str) -> int:
        return con.sql(f"{body} SELECT count(*) FROM {cte}").fetchone()[0]

    assert counts["input"] == stage_count("corpus")
    assert counts["after_exact_dedup"] == stage_count("s1")
    assert counts["after_near_dedup"] == stage_count("s2")
    assert counts["after_quality"] == stage_count("s3")
    expect_final = con.sql(fixture_sql).df().shape[0]
    assert counts["after_decontamination"] == expect_final == survivors
    # every stage must actually drop something on this fixture, or the
    # manifest proves nothing
    assert counts["input"] > counts["after_exact_dedup"]
    assert counts["after_exact_dedup"] > counts["after_near_dedup"]
    assert counts["after_near_dedup"] > counts["after_quality"]
    assert counts["after_quality"] > counts["after_decontamination"]
