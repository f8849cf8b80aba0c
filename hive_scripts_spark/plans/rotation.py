"""Automatic grading-window rotation (VERDICT r7 item 4).

The external correctness gate grades only the FIRST ``WINDOW`` (50)
registry entries per round, so registration order IS the grading
window. Through r7 the window (``FRONT_ORDER``) was a hand-edited list
with a 70-line history comment — and hand-editing is exactly how 34
oracled queries silently drifted to two-plus rounds past their last
green row (the r7 staleness-guard failure). This module replaces the
hand list with a deterministic function of the committed
``CORRECTNESS_r*.json`` artifacts:

1. **never-graded queries first** (new operators get their first
   driver row the round they land), in registry insertion order;
2. **stale queries** — last green row older than ``latest_round - 1``
   — ordered oldest-green first (ties by name);
3. **freshness re-grades** fill the remaining slots, oldest green
   first (ties by name).

"Green" means rows+schema+hash for oracled queries and rows_match for
the declared ``no_oracle`` rows (the driver's weaker check is still a
row). The same history feeds the staleness guard in
``tests/test_entry.py``, so the guard is green by construction: every
stale query is in groups 1-2 and the group-1+2 overflow case (more
stale+new queries than window slots) raises loudly here instead of
failing silently downstream.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

#: queries graded per round by the external driver.
WINDOW = 50


def load_green_history(root: Path) -> tuple[dict[str, int], int]:
    """Scan ``CORRECTNESS_r*.json`` under ``root``.

    Returns ``(last_green, latest_round)`` where ``last_green`` maps
    query name -> most recent round with a green row (full green when
    the row carries a hash verdict, rows-only green for declared
    no-oracle rows), and ``latest_round`` is the newest artifact's
    round number (0 when no artifacts exist — fresh checkout).
    """
    last_green: dict[str, int] = {}
    latest = 0
    for rnd, rows in _artifact_rows(root):
        latest = max(latest, rnd)
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                # declared-no-oracle rows get the driver's weaker
                # rows-only check: "green" = the query ran and its
                # row count was recorded.
                green = row.get("spark_rows") is not None
            else:
                green = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, latest


def _artifact_rows(root: Path):
    """THE artifact-discovery loop (glob, stem filter, parse,
    skip-on-damage) — yields ``(round, rows)`` per readable
    ``CORRECTNESS_r*.json``. Both public loaders build on this one
    generator so their views of the history cannot drift."""
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        yield int(m.group(1)), rows


def load_graded_names(root: Path) -> set[str]:
    """Every query name that has a row — green OR red — in ANY
    committed ``CORRECTNESS_r*.json``. Built on the same
    :func:`_artifact_rows` discovery as :func:`load_green_history`,
    so consumers like the shortlist guard's mid-swap detection cannot
    drift from the green history's view."""
    graded: set[str] = set()
    for _, rows in _artifact_rows(root):
        graded.update(rows.keys())
    return graded


def compute_front_order(
    names: list[str],
    last_green: dict[str, int],
    latest_round: int,
    window: int = WINDOW,
    strict: bool = True,
) -> list[str]:
    """Compute the next grading window for ``names`` (registry order).

    Pure function of its inputs; see module docstring for the
    priority order. With no history (``latest_round == 0``) the
    natural registry order already IS the window, so returns ``[]``
    (no reordering).

    ``strict`` governs the overflow case (more never-graded + stale
    queries than window slots): ``True`` raises — the right behavior
    for the staleness test and ``tools/rotate.py``, where a human is
    looking. The registry import uses ``strict=False``: the window
    still fills deterministically (never-graded first, then stale
    oldest-first, truncated) and the DATA commands keep working — a
    grading-bookkeeping problem must not brick ``ann-build`` or
    ``curate``; the strict guard in ``tests/test_rotation.py`` is
    where the overflow fails loudly.
    """
    if latest_round == 0:
        return []
    never = [n for n in names if n not in last_green]
    stale_bar = latest_round - 1
    stale = sorted(
        (n for n in names if 0 < last_green.get(n, 0) < stale_bar),
        key=lambda n: (last_green[n], n),
    )
    if strict and len(never) + len(stale) > window:
        raise ValueError(
            f"rotation overflow: {len(never)} never-graded + "
            f"{len(stale)} stale queries exceed the {window}-slot "
            "window; the driver cannot clear the staleness debt in "
            "one round — grade backlog must shrink (split new-op "
            "registration across rounds)"
        )
    head = (never + stale)[:window]
    taken = set(head)
    fill = sorted(
        (n for n in names if n not in taken),
        key=lambda n: (last_green.get(n, 0), n),
    )
    return head + fill[: window - len(head)]


def repo_root() -> Path:
    """Repo root (two levels above this package)."""
    return Path(__file__).resolve().parents[2]
