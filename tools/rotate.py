"""Print the generated grading window (VERDICT r7 item 4).

The window is computed at registry import time by
:mod:`hive_scripts_spark.plans.rotation` from the committed
``CORRECTNESS_r*.json`` artifacts; this CLI shows what the driver will
grade next round and why each query got its slot.

Usage: python tools/rotate.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from hive_scripts_spark.plans import rotation
    from hive_scripts_spark.plans.registry import FRONT_ORDER, ORACLES

    last_green, latest = rotation.load_green_history(rotation.repo_root())
    print(f"# latest artifact round: r{latest}; window {len(FRONT_ORDER)}")
    for i, name in enumerate(FRONT_ORDER):
        lg = last_green.get(name)
        if lg is None:
            why = "FIRST ROW (never graded)"
        elif lg < latest - 1:
            why = f"stale (last green r{lg})"
        else:
            why = f"refresh (last green r{lg})"
        print(f"{i:3d} {name:40s} {why}")
    behind = [n for n in ORACLES if n not in set(FRONT_ORDER)]
    floor = min((last_green.get(n, 0) for n in behind), default=None)
    print(f"# {len(behind)} oracled queries behind the window", end="")
    if floor is not None:
        print(f"; oldest green among them: r{floor}")
    else:
        print()


if __name__ == "__main__":
    main()
