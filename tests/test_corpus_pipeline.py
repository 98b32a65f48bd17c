"""One-call corpus curation plan: stage composition + manifest."""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.plans.corpus import curate_corpus


def test_curate_corpus_stages(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # benchmark: a small slice; contamination at 3-grams bites on the
    # synthetic small-vocab texts
    bench = docs.where(F.col("doc_id") % 97 == 0)
    clean, counts = curate_corpus(
        docs,
        benchmark=bench,
        contamination_n=3,
        mixture_weights={"src0": 0.5, "src1": 0.5},
        jaccard_threshold=0.8,
        min_tokens=3,
    )
    # monotone shrinkage through the stages, in order
    order = ["input", "after_exact_dedup", "after_near_dedup",
             "after_quality", "after_decontamination", "after_mixture"]
    assert list(counts) == order
    vals = [counts[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[0] == docs.count()
    # benchmark docs cannot survive decontamination
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    out_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert bench_ids.isdisjoint(out_ids)
    assert len(out_ids) == counts["after_mixture"]
    # only the mixture strata remain
    srcs = {r["source"] for r in clean.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"}
    # determinism end to end
    clean2, counts2 = curate_corpus(
        docs, benchmark=bench, contamination_n=3,
        mixture_weights={"src0": 0.5, "src1": 0.5},
        jaccard_threshold=0.8, min_tokens=3,
    )
    assert counts2 == counts
    assert {r["doc_id"] for r in clean2.select("doc_id").collect()} == out_ids
