#!/usr/bin/env python
"""Probe-bracketed headline measurement: loop until a run lands inside
a verified-quiet window (probe <= threshold BEFORE and AFTER), so the
datapoint is interpretable regardless of when the host's steal bursts
arrive. Prints one JSON line per attempt; 'accepted' marks clean
brackets. Usage:
    python scripts/quiet_bench.py [num_cpus] [max_minutes] [n_accept]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import multicore_probe_seconds, probe_seconds  # noqa: E402

FLOOR_OK = 0.35  # ~2x the 0.163 quiet floor
# multicore gate (round-4): the single-thread probe sits at the floor
# while concurrent processes starve 20-50x when the hypervisor is
# oversubscribed; the 2-rep workload's single-proc floor is ~0.32 s,
# so max_proc above ~3x means a scaling leg would measure the HOST.
MC_FLOOR_OK = 1.0


def run_leg(ncpu: int, sf: str) -> dict | None:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf,
               GRAFT_N_DOCS=os.environ.get("GRAFT_N_DOCS", "200000"))
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"), "--headline-only"],
        env=env, capture_output=True, text=True,
    ).stdout
    try:
        return json.loads(out.strip().splitlines()[-1])
    except Exception:
        print(json.dumps({"error": out[-200:]}), flush=True)
        return None


def main():
    # usage: quiet_bench.py [cpus[,cpus2,...]] [max_minutes] [n_accept_each]
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "32").split(",")]
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_accept = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    deadline = time.time() + max_minutes * 60
    acc: dict[int, list[float]] = {n: [] for n in levels}
    while time.time() < deadline and any(len(v) < n_accept for v in acc.values()):
        # next level still needing accepted runs (round-robin by need)
        ncpu = min((n for n in levels if len(acc[n]) < n_accept),
                   key=lambda n: len(acc[n]))
        p1 = probe_seconds()
        if p1 > FLOOR_OK:
            time.sleep(45)
            continue
        mc1 = multicore_probe_seconds()
        if mc1["per_proc_max"] > MC_FLOOR_OK:
            print(json.dumps({"skip": "multicore_contended", "mc": mc1}),
                  flush=True)
            time.sleep(45)
            continue
        r = run_leg(ncpu, sf)
        if r is None:
            continue
        p2 = probe_seconds()
        mc2 = multicore_probe_seconds()
        ok = p2 <= FLOOR_OK and mc2["per_proc_max"] <= MC_FLOOR_OK
        if ok:
            acc[ncpu].append(r["value"])
        print(json.dumps({"num_cpus": ncpu, "probe_before": p1,
                          "mc_before": mc1["per_proc_max"],
                          "value": r["value"], "docs_per_sec": r["docs_per_sec"],
                          "probe_after": p2,
                          "mc_after": mc2["per_proc_max"],
                          "accepted": ok}), flush=True)
    summary = {"done": True,
               "accepted": {str(n): sorted(v) for n, v in acc.items()}}
    done = sorted(n for n in levels if acc[n])
    if len(done) >= 2:
        lo, hi = done[0], done[-1]
        eff = (min(acc[lo]) / min(acc[hi])) / (hi / lo)
        summary["scaling_pair"] = [lo, hi]
        summary["scaling_efficiency"] = round(eff, 3)
    print(json.dumps(summary))


main()
