"""Mechanical enforcement of the TPU-smoke-gate rule (VERDICT r4 item 5).

CLAUDE.md: "Any new/changed Pallas kernel must be added to tpu_smoke.py and
the gate re-run before committing the kernel as done."  Round 4 shipped three
kernel-affecting commits AFTER its last recorded gate — the exact r2 failure
pattern the rule was written for (interpret-mode tests check numerics, not
Mosaic lowering constraints).  This test makes the rule self-checking: the
newest TPUSMOKE_r*.json artifact's utc stamp must postdate the newest commit
touching mgtpu/ops/pallas/ (or tools/tpu_smoke.py itself).
"""
import calendar
import glob
import json
import os
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_kernel_commit_ts():
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--",
             "mgtpu/ops/pallas", "tools/tpu_smoke.py"],
            cwd=REPO, capture_output=True, text=True, timeout=30)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0 or not out.stdout.strip():
        return None
    return int(out.stdout.strip())


def test_tpusmoke_postdates_last_kernel_commit():
    arts = sorted(glob.glob(os.path.join(REPO, "TPUSMOKE_r*.json")))
    if not arts:
        pytest.skip("no TPUSMOKE artifact present")
    ts_commit = _newest_kernel_commit_ts()
    if ts_commit is None:
        pytest.skip("git history unavailable")
    newest = None
    for a in arts:
        try:
            utc = json.load(open(a)).get("utc")
            # calendar.timegm treats the struct_time as UTC — mktime-plus-
            # static-offset is wrong by an hour across DST phases
            t = calendar.timegm(time.strptime(utc, "%Y-%m-%dT%H:%M:%SZ"))
            if newest is None or t > newest[0]:
                newest = (t, a, utc, json.load(open(a)).get("ok"))
        except Exception:                          # noqa: BLE001
            continue
    assert newest is not None, "no parsable TPUSMOKE artifact"
    t_art, path, utc, ok = newest
    assert ok is True, f"{os.path.basename(path)} records ok={ok}"
    assert t_art >= ts_commit, (
        f"{os.path.basename(path)} ({utc}) predates the newest commit "
        f"touching mgtpu/ops/pallas/ (epoch {ts_commit}) — re-run "
        f"`python tools/tpu_smoke.py --json TPUSMOKE_rNN.json` on the real "
        f"chip (CLAUDE.md mandatory gate)")
