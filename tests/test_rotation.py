"""Unit tests for the generated grading window (rotation.py).

The window is the driver's grading contract, so its generator gets
pure-function tests on synthetic history plus an integration check
against the real committed artifacts.
"""

from hive_scripts_spark.plans.rotation import (
    WINDOW,
    compute_front_order,
    load_green_history,
    repo_root,
)


def test_priority_order_never_then_stale_then_oldest_fill():
    names = [f"q{i:02d}" for i in range(8)]
    # latest round 7 -> stale bar is r6
    last_green = {
        "q00": 7,  # fresh
        "q01": 3,  # stale
        "q02": 6,  # fresh
        "q03": 2,  # stale (older than q01)
        # q04 never graded
        "q05": 5,  # stale
        "q06": 4,  # fresh enough? no: 4 < 6 -> stale
        "q07": 6,  # fresh
    }
    out = compute_front_order(names, last_green, 7, window=6)
    # never-graded first, then stale oldest-first, then oldest fill
    assert out == ["q04", "q03", "q01", "q06", "q05", "q02"]


def test_no_history_keeps_natural_order():
    assert compute_front_order(["a", "b"], {}, 0) == []


def test_overflow_raises():
    names = [f"q{i}" for i in range(5)]
    try:
        compute_front_order(names, {n: 1 for n in names}, 9, window=3)
    except ValueError as e:
        assert "overflow" in str(e)
    else:
        raise AssertionError("expected rotation overflow to raise")


def test_stale_ties_break_by_name():
    names = ["b", "a", "c"]
    out = compute_front_order(names, {"a": 2, "b": 2, "c": 9}, 9, window=3)
    assert out == ["a", "b", "c"]


def test_real_artifacts_parse_and_window_covers_all_stale():
    last_green, latest = load_green_history(repo_root())
    if latest == 0:
        return  # fresh checkout, nothing to check
    from hive_scripts_spark.plans.registry import ORACLES

    window = compute_front_order(
        [n for n in ORACLES], last_green, latest, window=WINDOW
    )
    stale = {
        n for n in ORACLES if 0 < last_green.get(n, 0) < latest - 1
    }
    assert stale <= set(window)


def test_non_strict_overflow_truncates_deterministically():
    """Registry import must never crash on overflow (strict=False):
    the window still fills never-first then oldest-stale, truncated."""
    names = [f"q{i}" for i in range(5)]
    out = compute_front_order(
        names, {n: 1 for n in names}, 9, window=3, strict=False
    )
    assert out == ["q0", "q1", "q2"]


def test_load_graded_names_sees_red_rows_and_filters_stems(tmp_path):
    """graded-ever must include RED rows (a red-graded query is not
    'pending') and skip files whose stem carries no round number —
    the same discovery rules as load_green_history."""
    import json

    from hive_scripts_spark.plans.rotation import load_graded_names

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({
            "green_q": {"rows_match": True, "schema_match": True,
                        "hash_match": True},
            "red_q": {"rows_match": False, "schema_match": True,
                      "hash_match": False},
        })
    )
    (tmp_path / "CORRECTNESS_rX.json").write_text(
        json.dumps({"phantom": {}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    assert load_graded_names(tmp_path) == {"green_q", "red_q"}


def test_shortlist_not_rotted():
    """The r13 VERDICT failure mode: COVERAGE.md's "next swap"
    retirement shortlist was correct when written and silently wrong
    after the very grading run it was written for (its candidates
    re-greened and retiring one would overflow strict rotation). The
    first guard here (r14) checked literal invariants — last-green ==
    latest-1, not in FRONT_ORDER — and had the INVERSE state bug (the
    r14 VERDICT finding): those literals only hold mid-round before
    the round's own artifact lands; read after, they reject a CORRECT
    shortlist and prescribe retirees that overflow.

    So this guard now runs the definition itself: a shortlist is valid
    iff executing its swap — registry names minus the candidates plus
    one never-graded dummy per candidate (swaps are N-for-N) — passes
    ``compute_front_order(strict=True)``. A fresh-green candidate
    leaves the full stale set intact while the dummies still enter, so
    it overflows; a genuinely stale candidate shrinks the stale set
    one-for-one with the dummies. No literal round arithmetic, so the
    check is artifact-timing-independent, with one projection: when
    the registry holds never-graded entries (this round's swap already
    executed, its artifact not yet written), the shortlist is for the
    NEXT round's swap, which executes only after the pending run
    grades the current window — so project that run (every FRONT_ORDER
    query greens at latest+1) before simulating. A pending
    registration named as a candidate also fails: projected fresh, it
    cannot offset its dummy."""
    import re
    from pathlib import Path

    text = (Path(repo_root()) / "COVERAGE.md").read_text()
    m = re.search(
        r"Remaining retirement shortlist for the NEXT swap.*?\n\n(.*?)\n\nSwap mechanics",
        text,
        re.S,
    )
    assert m, "COVERAGE.md shortlist block or its anchors went missing"
    names = re.findall(r"^- `(\w+)`", m.group(1), re.M)
    assert names, "shortlist block lists no candidates"

    last_green, latest = load_green_history(repo_root())
    from hive_scripts_spark.plans.registry import FRONT_ORDER, ORACLES

    for n in names:
        assert n in ORACLES, f"shortlist names unknown/retired query {n}"

    oracled = list(ORACLES)
    # mid-swap means never-GRADED (no row in ANY artifact), not
    # never-GREEN: a query that was graded RED stays out of
    # last_green forever, and treating it as "pending" would keep
    # this test projecting a fabricated one-round-ahead history after
    # the artifact landed — the silent-wrong-state mode this rewrite
    # exists to kill. A red-graded query instead flows into the
    # un-projected simulation as a never-green window claimant, where
    # an overflow fails loudly (the shortlist must then account for
    # it).
    from hive_scripts_spark.plans.rotation import load_graded_names

    graded_ever = load_graded_names(repo_root())
    if any(n not in graded_ever for n in oracled):
        # mid-swap: this round's registrations await their first row,
        # so the shortlist targets the round after the pending grading
        # run — simulate against that run's projected history.
        last_green = dict(last_green)
        latest += 1
        for n in FRONT_ORDER:
            last_green[n] = latest

    sim = [n for n in oracled if n not in set(names)]
    sim += [f"__queued_dummy_{i}" for i in range(len(names))]
    try:
        compute_front_order(sim, last_green, latest, window=WINDOW)
    except ValueError as e:
        raise AssertionError(
            f"shortlist {names} is not strict-rotation-safe "
            f"(simulated swap overflows: {e}); the shortlist has "
            "rotted — recompute with tools/rotate.py"
        ) from e
