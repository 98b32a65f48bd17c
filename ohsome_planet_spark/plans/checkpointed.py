"""Checkpointed enrichment: cell-range partitions, snapshot commits, resume.

The north-rule execution shape: the enriched output is bucketed by a
space-filling-curve range (coarse zxy prefix of the finest cell — the
H3-range analog), each bucket is written + committed as a snapshot partition
with lineage, and a failed/killed run resumes by writing ONLY the buckets
missing from the last committed snapshot. Per-stage metrics and the
text-byte-identity fingerprint land next to the manifests.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.snapshots import SnapshotTable
from ..operators.metrics import StageMetrics
from .enrich import enrich_pages


def cell_range_bucket(cell_col: str = "zxy_cell", buckets_bits: int = 4) -> F.Column:
    """Coarse range key from the packed zxy cell: the top `buckets_bits` bits
    of the x-index — contiguous in space, so buckets are range partitions of
    the curve (the reference's Hilbert-sorted packing analog,
    `GridIndex.sortItems:307-315`)."""
    ix = F.shiftright(F.col(cell_col), 29).bitwiseAND(F.lit((1 << 29) - 1))
    z = F.shiftright(F.col(cell_col), 58)
    # dynamic shift (z varies per row in principle): integer divide by 2^(z-b)
    divisor = F.pow(F.lit(2.0), (z - F.lit(buckets_bits)).cast("double"))
    return F.when(F.col(cell_col).isNull(), F.lit(-1)).otherwise(
        F.floor(ix / divisor).cast("int")
    )


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    table_root: str | Path,
    fail_partitions: set | None = None,
    metrics: StageMetrics | None = None,
) -> dict:
    """Enrich pages → snapshot-committed, cell-range-partitioned output.

    Returns the snapshot result dict ({snapshot_id, written, skipped}).
    Re-invoking after a failure resumes: committed buckets are skipped.
    """
    metrics = metrics if metrics is not None else StageMetrics()
    table = SnapshotTable(table_root)

    with metrics.time_stage("enrich"):
        enriched = enrich_pages(spark, pages, with_geometry=True)
        enriched = enriched.withColumn("cell_bucket", cell_range_bucket())

    with metrics.time_stage("fingerprint_in"):
        fp_in = metrics.text_fingerprint(pages)

    with metrics.time_stage("snapshot_write"):
        to_write = (
            enriched.drop("countries_set") if "countries_set" in enriched.columns else enriched
        )
        # observed row count rides the write action — no extra pass
        to_write = metrics.observe("enriched_rows", to_write)
        result = table.write_partitions(
            to_write,
            "cell_bucket",
            only_missing=True,
            fail_partitions=fail_partitions,
        )
        metrics.harvest()

    with metrics.time_stage("fingerprint_out"):
        # invariant: the url→text mapping reachable from the committed output
        # must fingerprint identically to the input subset it covers
        out = table.read(spark).select("url").distinct().join(pages, "url")
        fp_out = metrics.text_fingerprint(out)

    metrics.stages.append({"stage": "invariants", "fp_in": fp_in, "fp_out_subset": fp_out})
    metrics.write(Path(table_root) / "manifests" / f"metrics-{result['snapshot_id']}.json")
    result["metrics"] = metrics.stages
    return result
