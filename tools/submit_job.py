"""spark-submit entry point: the flagship enrichment as a packaged job.

North-rule deployment shape: `spark-submit --py-files ohsome_planet_spark.zip
tools/submit_job.py <pages_dir> <out_dir>` — the package ships as a zip, the
driver script only wires arguments. Build the zip with:

    cd /root/repo && python tools/submit_job.py --build-zip

which writes dist/ohsome_planet_spark.zip.
"""

from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path


def build_zip() -> Path:
    repo = Path(__file__).resolve().parent.parent
    dist = repo / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "ohsome_planet_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((repo / "ohsome_planet_spark").rglob("*.py")):
            zf.write(p, p.relative_to(repo))
    return out


def main() -> None:
    if "--build-zip" in sys.argv:
        print(build_zip())
        return

    from pyspark.sql import SparkSession

    if "--contributions" in sys.argv:
        # the reference's main job: PBF → status-partitioned GeoParquet
        # (Contributions2Parquet.call analog), with the reference's own
        # option names (`Contributions2Parquet.java:67-88`). Usage:
        #   submit_job.py --contributions --pbf <osm.pbf> --output <dir>
        #       [--overwrite] [--parallel N] [--country-file countries.csv]
        #       [--changeset-db jdbc:...] [--include-tags k1,k2] [--debug]
        #       [--keep-untagged]          (engine extension: skip the
        #                                   hasNoTags drop for full-history)
        # Legacy positional form (<pbf> <out> [countries.csv]) still works.
        import argparse
        import shutil
        from pathlib import Path as _P

        argv = [a for a in sys.argv[1:] if a != "--contributions"]
        ap = argparse.ArgumentParser(prog="submit_job.py --contributions")
        ap.add_argument("positional", nargs="*")
        ap.add_argument("--pbf")
        ap.add_argument("--output")
        ap.add_argument("--overwrite", action="store_true")
        ap.add_argument("--parallel", type=int, default=0,
                        help="shuffle/output parallelism (reference: thread "
                             "and file count)")
        ap.add_argument("--country-file")
        ap.add_argument("--changeset-db",
                        help="full jdbc:url to a changesetmd database")
        ap.add_argument("--include-tags", default="",
                        help="OSM keys of relations that should be built")
        ap.add_argument("--debug", action="store_true")
        ap.add_argument("--keep-untagged", action="store_true")
        ns = ap.parse_args(argv)
        pbf_path = ns.pbf or (ns.positional[0] if ns.positional else None)
        out_dir = ns.output or (ns.positional[1] if len(ns.positional) > 1 else None)
        country_file = ns.country_file or (
            ns.positional[2] if len(ns.positional) > 2 else None)
        if not pbf_path or not out_dir:
            ap.error("--pbf and --output (or positional <pbf> <out>) required")
        if _P(out_dir).exists():
            if ns.overwrite:
                shutil.rmtree(out_dir)
            else:
                # reference behavior: refuse quietly without --overwrite
                print("Directory already exists. To overwrite use --overwrite")
                return

        builder = SparkSession.builder.appName("ohsome-planet-spark-contributions")
        if ns.parallel > 0:
            builder = builder.config("spark.sql.shuffle.partitions", str(ns.parallel))
        spark = builder.getOrCreate()
        from ohsome_planet_spark.plans.contributions import contributions_to_parquet
        from ohsome_planet_spark.sources.countries import read_countries_csv

        features = read_countries_csv(country_file) if country_file else None
        changesets = None
        if ns.changeset_db:
            from ohsome_planet_spark.sources.changeset_db import read_changesets_jdbc

            changesets = read_changesets_jdbc(spark, ns.changeset_db)
        keys = [k for k in ns.include_tags.split(",") if k] or None
        if ns.debug:
            from ohsome_planet_spark.sources.pbf import scan_blob_headers

            for h in scan_blob_headers(pbf_path):
                print(f"blob type={h['type']} offset={h['offset']} "
                      f"size={h['size']}")
        counts = contributions_to_parquet(
            spark, pbf_path, out_dir,
            changesets=changesets,
            country_features=features,
            include_tag_keys=keys,
            keep_untagged=ns.keep_untagged,
        )
        print(" ".join(f"{k}={v}" for k, v in sorted(counts.items())))
        spark.stop()
        return

    if "--curate" in sys.argv:
        # corpus curation job: documents parquet → cleaned corpus + manifest.
        # Usage: submit_job.py --curate --input <docs.parquet> --output <dir>
        #   [--benchmark <bench.parquet>] [--weights src0=0.5,src1=0.5]
        #   [--jaccard 0.8] [--min-tokens 5] [--ngram 13]
        import argparse
        import json as _json
        from pathlib import Path as _P

        argv = [a for a in sys.argv[1:] if a != "--curate"]
        ap = argparse.ArgumentParser(prog="submit_job.py --curate")
        ap.add_argument("--input", required=True)
        ap.add_argument("--output", required=True)
        ap.add_argument("--benchmark")
        ap.add_argument("--weights", default="")
        ap.add_argument("--jaccard", type=float, default=0.8)
        ap.add_argument("--min-tokens", type=int, default=5)
        ap.add_argument("--ngram", type=int, default=13)
        ns = ap.parse_args(argv)
        spark = SparkSession.builder.appName("ohsome-planet-spark-curate").getOrCreate()
        from ohsome_planet_spark.plans.corpus import curate_corpus

        docs = spark.read.parquet(ns.input)
        bench = spark.read.parquet(ns.benchmark) if ns.benchmark else None
        weights = None
        if ns.weights:
            weights = {}
            for pair in ns.weights.split(","):
                pair = pair.strip()
                if not pair:
                    continue  # tolerate trailing commas
                if "=" not in pair:
                    ap.error(f"--weights entry without '=': {pair!r}")
                k, v = pair.split("=", 1)
                weights[k] = float(v)
        clean, counts = curate_corpus(
            docs,
            benchmark=bench,
            contamination_n=ns.ngram,
            mixture_weights=weights,
            jaccard_threshold=ns.jaccard,
            min_tokens=ns.min_tokens,
        )
        out = _P(ns.output)
        clean.write.mode("overwrite").parquet(str(out / "documents"))
        out.mkdir(parents=True, exist_ok=True)
        (out / "_counts.json").write_text(_json.dumps(counts, indent=1))
        print(" ".join(f"{k}={v}" for k, v in counts.items()))
        spark.stop()
        return

    if "--linkgraph" in sys.argv:
        # domain authority job: WARC archives → degrees + PageRank parquet.
        # Usage: submit_job.py --linkgraph --input <warc-glob> --output <dir>
        #   [--iterations 2] [--damping 0.85]
        import argparse

        argv = [a for a in sys.argv[1:] if a != "--linkgraph"]
        ap = argparse.ArgumentParser(prog="submit_job.py --linkgraph")
        ap.add_argument("--input", required=True)
        ap.add_argument("--output", required=True)
        ap.add_argument("--iterations", type=int, default=2)
        ap.add_argument("--damping", type=float, default=0.85)
        ns = ap.parse_args(argv)
        spark = SparkSession.builder.appName(
            "ohsome-planet-spark-linkgraph").getOrCreate()
        from ohsome_planet_spark.plans.webtext import crawl_link_graph

        out = crawl_link_graph(spark, ns.input, iterations=ns.iterations,
                               damping=ns.damping)
        out.write.mode("overwrite").parquet(ns.output)
        print(f"domains={spark.read.parquet(ns.output).count()}")
        spark.stop()
        return

    pages_dir = sys.argv[1]
    out_dir = sys.argv[2]
    n_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    spark = SparkSession.builder.appName("ohsome-planet-spark-enrich").getOrCreate()
    from ohsome_planet_spark.plans.checkpointed import run_checkpointed
    from ohsome_planet_spark.sources.pages import pages_df

    if n_pages > 0:
        pages = pages_df(spark, n_pages)
        pages.write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    result = run_checkpointed(spark, pages, out_dir)
    print(
        f"snapshot={result['snapshot_id']} written={len(result['written'])} "
        f"skipped={len(result['skipped'])}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
