"""Full-registry timing sweep: run EVERY registered query at a given
sf_dir and report per-query wall time, slowest-first — the round-over-
round perf audit that caught the r6 scale-killers (quantized-IVF dequant
inlining: 22 s, repetition-gate pushdown: 24 s; both now plan-locked in
tests).

Usage: python tools/sweep.py [sf_dir] [--top N] [--json]

Unlike bench.py (the driver-facing headline contract, byte-comparable
across rounds), this sweeps the whole registry and is free to grow with
it. Queries run through the noop sink (full computation, no driver
transfer); errors are isolated per query.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=15, help="slowest N to print")
    ap.add_argument("--json", action="store_true", help="dump all timings")
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="executions per query; >1 reports the MIN (warm) time — "
        "cold first-execution noise is 1-2 s/query on this box (it "
        "manufactured a phantom 31%% bench regression in r6 and two "
        "false sweep leads in r7: 11.5 s cold vs 5.2 s idle for the "
        "portable minhash, 6.5 s vs 1.3 s warm for the curation "
        "pipeline). Rank with --reps 2 before chasing anything.",
    )
    args = ap.parse_args()

    from hive_scripts_spark.plans.registry import QUERIES
    from hive_scripts_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + parquet footers + Python worker pool (not counted)
    QUERIES["a1_count_star"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # whole-sweep CPU-steal total (r10): this box's hypervisor steals
    # CPU in multi-second bursts; min-of-reps already deflects most of
    # it, but the artifact should say how contested the run was.
    def _steal_ticks() -> int:
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            return int(parts[8]) if parts and parts[0] == "cpu" else 0
        except Exception:  # noqa: BLE001 — telemetry only
            return 0

    import os as _os

    _clk = float(_os.sysconf("SC_CLK_TCK")) if hasattr(_os, "sysconf") else 100.0
    steal0 = _steal_ticks()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        best = None
        try:
            for _ in range(max(1, args.reps)):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 2)
        except Exception as exc:  # noqa: BLE001 — isolate, report, go on
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    steal_total_s = round((_steal_ticks() - steal0) / _clk, 1)
    if args.json:
        print(
            json.dumps(
                {
                    "sf_dir": args.sf_dir,
                    "times": times,
                    "errors": errors,
                    "steal_total_s": steal_total_s,
                }
            )
        )
    else:
        for name, err in errors.items():
            print(f"ERR   {name}: {err}")
        for name, t in sorted(times.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"{t:8.2f}  {name}")
        print(
            f"total {round(sum(times.values()), 1)} s over {len(times)} queries"
            + (f", {len(errors)} errors" if errors else "")
            + f", {steal_total_s} CPU-s stolen by hypervisor"
        )
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    main()
