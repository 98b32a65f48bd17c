"""A/B the _t input-parallelism floor per query (r6, verdict item 1).

For every __spark_entry__.queries() entry, time a noop-write materialization
at the given SF dir with the floor forced ON (SPARK_GRAFT_T_FLOOR=always)
and OFF (=never): the floor is one round-robin exchange of the raw scanned
rows, which rescues scan-adjacent compute-heavy stages from the small-SF
single-row-group 1-partition scan but taxes cheap queries ~0.3-0.6 s. The
printed table is the evidence for each call site's floor=True/False choice
in __spark_entry__._t callers.

Usage: python tools/floor_ab.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from ohsome_planet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="floor_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # VM page warm-up (see bench.py): Firecracker first-touch faults
    warm_mb = int(os.environ.get("SPARK_GRAFT_WARM_MB", "256"))
    if warm_mb:
        import pandas as _pd

        def _touch(it):
            import numpy as _np
            _np.ones((warm_mb, 1024, 128), dtype=_np.int64).sum()
            for b in it:
                yield b

        spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(
            _touch, "id long").count()

    qs = entrymod.queries()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row = {}
        for mode in ("never", "always"):
            os.environ["SPARK_GRAFT_T_FLOOR"] = mode
            times = []
            try:
                for i in range(3):
                    t0 = time.time()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    times.append(time.time() - t0)
                # drop the first (warm) run
                row[mode] = round(statistics.median(times[1:]), 3)
            except Exception as e:  # noqa: BLE001 — survey harness
                row[mode] = f"ERR {type(e).__name__}"
        results[name] = row
        a, b = row.get("never"), row.get("always")
        verdict = ""
        if isinstance(a, float) and isinstance(b, float):
            if b < a * 0.8 and a - b > 0.2:
                verdict = "FLOOR WINS"
            elif a < b * 0.8 and b - a > 0.2:
                verdict = "floor taxes"
        print(f"{name:28s} off={a!s:>8} on={b!s:>8}  {verdict}", flush=True)
    os.environ.pop("SPARK_GRAFT_T_FLOOR", None)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
