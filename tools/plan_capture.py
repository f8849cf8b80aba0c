"""Capture .explain("formatted") + isolated noop timings for named queries.

Usage: python tools/plan_capture.py <suffix> <query> [<query> ...]
Writes plans/r19/<query>_<suffix>.txt (the optimization-round evidence
files) and prints one timing line per query (3 noop reps + steal).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(__file__).resolve().parents[1] / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r20")

_CLK = float(os.sysconf("SC_CLK_TCK"))


def _steal() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) if parts and parts[0] == "cpu" else 0


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    from hive_scripts_spark.plans.registry import QUERIES
    from hive_scripts_spark.session import get_spark

    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    # same warmup as bench.py (uncounted)
    QUERIES["a1_count_star"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT_DIR / f"{name}_{suffix}.txt").write_text(plan)
        reps = []
        steals = []
        for _ in range(3):
            s0 = _steal()
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
            steals.append(round((_steal() - s0) / _CLK, 2))
        print(
            f"{name}: reps={reps} best={min(reps)} steal={steals}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
