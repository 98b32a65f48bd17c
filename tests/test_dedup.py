

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


def test_star_components_match_label_propagation(spark):
    """dedup_clusters_star == dedup_clusters on every graph shape the
    label-propagation engine is tested on, plus a hash-random graph."""
    import hashlib

    from ohsome_planet_spark.operators.dedup import (
        dedup_clusters, dedup_clusters_star)

    def h(i):
        return int(hashlib.md5(f"e{i}".encode()).hexdigest()[:8], 16)

    shapes = {
        "chain": [(i, i + 1) for i in range(30)],
        "star": [(0, i) for i in range(1, 20)],
        "two_cliques_bridge": (
            [(a, b) for a in range(5) for b in range(a + 1, 5)]
            + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
            + [(4, 10)]
        ),
        "random": [(h(i) % 50, (h(i) // 7) % 50) for i in range(120)
                   if h(i) % 50 != (h(i) // 7) % 50],
        "single_pair": [(99, 7)],
    }
    for name, edges in shapes.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {(r["node"], r["cluster_id"])
                for r in dedup_clusters(df, driver_threshold=0).collect()}
        got = {(r["node"], r["cluster_id"])
               for r in dedup_clusters_star(df).collect()}
        assert got == want, f"shape {name}: {got ^ want}"


def test_star_components_empty_input(spark):
    from ohsome_planet_spark.operators.dedup import dedup_clusters_star

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters_star(df).count() == 0


def test_incremental_minhash_matches_batch(spark, sf_dir):
    """incremental(new=B, old=A-index) must equal: pairs(A∪B) minus the
    pure old×old pairs — and with an empty old side, equal the plain
    batch operator exactly."""
    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.dedup import (
        banded_signatures, minhash_lsh_pairs, minhash_lsh_pairs_incremental)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").where(F.col("doc_id") < 120)
    )
    # plant cross-generation dups: generation B = 40 fresh docs + copies
    # of 10 generation-A docs under new ids
    old = docs.where("doc_id < 60")
    fresh = docs.where("doc_id >= 60 AND doc_id < 100").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text")
    copies = docs.where("doc_id < 10").select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text")
    new = fresh.unionByName(copies)

    both = old.unionByName(new)
    want_all = {(r["id_a"], r["id_b"], r["jaccard"])
                for r in minhash_lsh_pairs(both).collect()}
    want_old_only = {(r["id_a"], r["id_b"], r["jaccard"])
                     for r in minhash_lsh_pairs(old).collect()}

    old_bands = banded_signatures(old)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in minhash_lsh_pairs_incremental(
               new, old_bands, old).collect()}
    assert got == want_all - want_old_only
    # the planted copies all pair with their generation-A originals
    assert all((i, i + 2000) in {(a, b) for a, b, _ in got}
               for i in range(10))

    empty = old.where("doc_id < 0")
    got_empty_old = {(r["id_a"], r["id_b"], r["jaccard"])
                     for r in minhash_lsh_pairs_incremental(
                         new, banded_signatures(empty), empty).collect()}
    want_new_only = {(r["id_a"], r["id_b"], r["jaccard"])
                     for r in minhash_lsh_pairs(new).collect()}
    assert got_empty_old == want_new_only


def test_star_components_self_pairs_survive(spark):
    from ohsome_planet_spark.operators.dedup import (
        dedup_clusters, dedup_clusters_star)

    df = spark.createDataFrame(
        [(5, 5), (7, 8)], "id_a long, id_b long")
    want = {(r["node"], r["cluster_id"])
            for r in dedup_clusters(df, driver_threshold=0).collect()}
    got = {(r["node"], r["cluster_id"])
           for r in dedup_clusters_star(df).collect()}
    # dedup_clusters' iterative path also derives nodes from non-self
    # edges only; the CONTRACT both engines share is the union-find one:
    # every id mentioned in pairs gets a row
    assert (5, 5) in got and (7, 7) in got and (8, 7) in got
