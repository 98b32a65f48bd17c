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
        # (Contributions2Parquet.call analog). Usage:
        #   submit_job.py --contributions <osm.pbf> <out_dir> [countries.csv]
        args = [a for a in sys.argv[1:] if a != "--contributions"]
        pbf_path, out_dir = args[0], args[1]
        spark = SparkSession.builder.appName("ohsome-planet-spark-contributions").getOrCreate()
        from ohsome_planet_spark.plans.contributions import contributions_to_parquet
        from ohsome_planet_spark.sources.countries import read_countries_csv

        features = read_countries_csv(args[2]) if len(args) > 2 else None
        counts = contributions_to_parquet(
            spark, pbf_path, out_dir, country_features=features
        )
        print(" ".join(f"{k}={v}" for k, v in sorted(counts.items())))
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
