"""Rotation audit: derive per-key driver-verdict ages from the
CORRECTNESS_r*.json artifacts (the ground truth — no hand-maintained
ledger) and check the current ``queries()`` window against them.

Checks:
  1. every never-driver-checked key sits INSIDE the first-50 window
     (a new key must not be born unverified for a round);
  2. the out-of-window keys are at least as fresh as the window's
     stalest cohort would suggest (staleness inversions are listed —
     they are legitimate only when the displaced key's module is
     untouched and documented, so they WARN rather than fail);
  3. prints the suggested next-round front: never-checked keys first,
     then keys by ascending last-verdict round.

Usage: PYTHONPATH=/root/repo python scripts/rotation_audit.py
Exit 1 on check (1) — the invariant the round owns completely.
Exit 2 when a CORRECTNESS artifact is unreadable: the artifacts are the
ground truth, so a corrupt one means every derived age (and therefore
the verdict and the suggested front) is suspect — do not trust this
run's output.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

WINDOW = 50


def verdict_ages(repo: str) -> tuple[dict[str, int], list[str]]:
    """key -> latest round with a driver verdict (any row counts as a
    verdict; the driver writes a row per checked key), plus the list of
    unreadable artifacts — a skipped artifact distorts every derived
    age, so the caller must surface it in the exit code, not just a
    warning a CI log can swallow."""
    ages: dict[str, int] = {}
    bad: list[str] = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError) as exc:
            print(
                f"WARNING: unreadable {os.path.basename(path)}: {exc}",
                file=sys.stderr,
            )
            bad.append(os.path.basename(path))
            continue
        for key in data:
            ages[key] = max(ages.get(key, 0), rnd)
    return ages, bad


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ages, bad = verdict_ages(repo)
    keys = list(entrymod.queries())
    window, rest = keys[:WINDOW], keys[WINDOW:]

    never = [k for k in keys if k not in ages]
    never_out = [k for k in never if k in rest]

    print(f"registry: {len(keys)} keys; window: first {WINDOW}")
    print(f"never driver-checked: {len(never)}")
    for k in never:
        mark = "  IN-WINDOW" if k in window else "  **OUT-OF-WINDOW**"
        print(f"  {k}{mark}")

    # staleness inversions: an out-of-window key older than the STALEST
    # in-window verdict — those keys had strictly higher claim on a slot
    # (informational — module-change re-checks legitimately jump the
    # queue). Comparing against min, not max: after a round's verdicts
    # land, every queued-but-fresh key would otherwise read as an
    # "inversion" and bury the genuine displaced-key signal.
    in_ages = [ages[k] for k in window if k in ages]
    if in_ages:
        stalest_in = min(in_ages)
        inversions = [
            (k, ages[k]) for k in rest if k in ages and ages[k] < stalest_in
        ]
        stale_out = sorted(inversions, key=lambda kv: kv[1])[:10]
        if stale_out:
            print(
                f"note: {len(inversions)} out-of-window keys older than the "
                f"stalest in-window verdict (r{stalest_in}); oldest:"
            )
            for k, r in stale_out:
                print(f"  {k} (r{r})")

    print("\nsuggested next-round front (never-checked, then oldest):")
    order = never + sorted(
        (k for k in keys if k in ages), key=lambda k: (ages[k], keys.index(k))
    )
    for k in order[:WINDOW]:
        print(f"  {k} ({'never' if k not in ages else f'r{ages[k]}'})")

    if bad:
        print(
            f"\nFAIL: {len(bad)} unreadable CORRECTNESS artifacts ({', '.join(bad)})"
            " — every age above is suspect; fix the artifacts and re-run"
        )
        return 2
    if never_out:
        print(f"\nFAIL: {len(never_out)} never-checked keys are out-of-window")
        return 1
    print("\nOK: every never-checked key is inside the window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
