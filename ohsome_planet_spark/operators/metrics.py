"""Per-stage metrics + lineage sink (the reference's debug log sink, S16,
`Writer.java:48-64`, grown into the north rule's 'partition-lineage +
per-stage metrics' requirement).

StageMetrics wraps pipeline stages: each stage records wall time, input/
output row counts (computed lazily with Spark accumulators-free counts), and
an invariant fingerprint (e.g. sha256 of the text column) so byte-identity
per url is auditable per run. Metrics are written as a JSON file alongside
the snapshot manifests and as a small DataFrame for SQL inspection.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageMetrics:
    def __init__(self):
        self.stages: list[dict] = []

    def record(self, name: str, df: DataFrame | None = None, **extra) -> DataFrame | None:
        """Opt-in diagnostics: one extra `count()` action per stage. For
        zero-extra-action row counts on the hot path, use `observe` below."""
        t0 = time.time()
        rows = df.count() if df is not None else None
        self.stages.append(
            {
                "stage": name,
                "rows": rows,
                "count_secs": round(time.time() - t0, 4),
                **extra,
            }
        )
        return df

    def observe(self, name: str, df: DataFrame) -> DataFrame:
        """Free row counts: piggyback a named `Observation` on the stage —
        the count materializes as a side effect of whatever action the
        caller already runs (no extra pass over the DAG). `harvest()` after
        the action to pull the numbers into the stage log."""
        from pyspark.sql import Observation

        obs = Observation(name)
        out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        self._observations = getattr(self, "_observations", [])
        self._observations.append((name, obs))
        return out

    def harvest(self) -> None:
        """Collect all pending observation results (call after the action)."""
        for name, obs in getattr(self, "_observations", []):
            try:
                self.stages.append({"stage": name, "rows": obs.get["rows"]})
            except Exception:  # action never ran — nothing observed
                self.stages.append({"stage": name, "rows": None})
        self._observations = []

    def time_stage(self, name: str):
        """Context manager: with metrics.time_stage('pip_join'): ..."""
        return _Timer(self, name)

    def text_fingerprint(self, df: DataFrame, url_col: str = "url", text_col: str = "text") -> str:
        """Order-insensitive fingerprint of (url, sha256(text)) pairs — equal
        across stages iff text stayed byte-identical per url."""
        agg = df.select(
            F.sum(
                F.conv(F.substring(F.sha2(F.concat_ws("\x00", url_col, text_col), 256), 1, 15), 16, 10).cast(
                    "decimal(38,0)"
                )
            ).alias("fp")
        ).collect()[0][0]
        return str(agg)

    def to_json(self) -> str:
        return json.dumps({"stages": self.stages}, indent=1)

    def write(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(self.to_json())

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (s["stage"], s.get("rows"), float(s.get("secs", s.get("count_secs", 0.0))))
            for s in self.stages
        ]
        return spark.createDataFrame(rows, "stage string, rows long, secs double")


class _Timer:
    def __init__(self, metrics: StageMetrics, name: str):
        self.metrics = metrics
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.metrics.stages.append(
            {"stage": self.name, "secs": round(time.time() - self.t0, 4), "failed": exc[0] is not None}
        )
        return False
