"""Driver-artifact tracking guard (VERDICT r11 item 1).

Three consecutive rounds left the driver's freshly-written
``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json`` on disk but out of git,
which breaks the rotation math for the NEXT round (the grading window
is a pure function of the committed correctness history — an untracked
artifact means the next checkout computes a window one round behind).
This test turns that silent bookkeeping gap into a red test: any
on-disk grading artifact that git does not track fails the suite, so
the standard "keep tests green, commit as you go" loop can never end a
round with artifacts stranded.

Only UNTRACKED files fail — tracked-but-modified is the normal mid-
round working state (PROGRESS.jsonl, VERDICT.md churn every round).
"""

import shutil
import subprocess

import pytest

from hive_scripts_spark.plans.rotation import repo_root

#: the artifact families the rotation/grading math depends on.
ARTIFACT_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "LEAKCHECK.json",
    "COPYCHECK.json",
    "VERDICT.md",
    "ADVICE.md",
]


def test_driver_artifacts_are_git_tracked():
    root = repo_root()
    if shutil.which("git") is None or not (root / ".git").exists():
        pytest.skip("not a git checkout")
    out = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "--"]
        + ARTIFACT_GLOBS,
        cwd=root,
        capture_output=True,
        text=True,
        check=True,
    )
    untracked = [l for l in out.stdout.splitlines() if l.strip()]
    assert not untracked, (
        "driver grading artifacts exist on disk but are NOT tracked by "
        f"git: {untracked} — `git add` them now; the next round's "
        "grading window is computed from the COMMITTED correctness "
        "history, so stranded artifacts silently stale the rotation"
    )
