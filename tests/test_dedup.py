

def test_shingles_regex_equals_hof_twin(spark):
    """The regex-lookahead shingles must equal the HOF formulation on the
    documents table plus whitespace/edge strings, for n in {2,3,5,13}."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.dedup import shingles_col, shingles_col_hof

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "one"), (900004, "one two"),
         (900005, "a b c"), (900006, "a  b\tc\n d  "), (900007, "x!@ #$ %^& *()"),
         (900008, None)],
        "doc_id long, text string")
    allofit = docs.unionByName(edge)
    for n in (2, 3, 5, 13):
        bad = allofit.select(
            shingles_col(F.col("text"), n).alias("a"),
            shingles_col_hof(F.col("text"), n).alias("b"),
        ).where(~F.col("a").eqNullSafe(F.col("b"))).count()
        assert bad == 0, n


def test_with_simhash_matches_column_twin(spark):
    """Staged explode+sum SimHash == the one-expression simhash_col, both
    hash modes, including empty/null/whitespace-only texts."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.dedup import simhash_col, with_simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "one"), (900004, None),
         (900005, "a b a b a"), (900006, "x\t\ny z")],
        "doc_id long, text string")
    allofit = docs.unionByName(edge)
    for mode in ("xxhash64", "md5"):
        ref = allofit.select(
            F.col("doc_id").alias("_id"),
            simhash_col(F.col("text"), hash_mode=mode).alias("_ref"))
        got = with_simhash(allofit, hash_mode=mode)
        bad = got.join(ref, "_id").where(F.col("_sig") != F.col("_ref")).count()
        assert bad == 0, mode
