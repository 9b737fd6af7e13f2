#!/usr/bin/env python
"""Shared-host CPU-steal probe for bench hygiene.

Times a FIXED single-thread workload (numpy elementwise + md5 churn) —
THE SAME workload bench.py embeds in its JSON (`bench.probe_seconds`,
imported here so the two can never drift apart). The absolute number is
meaningless across machines; the RATIO across runs on this host is the
interference measurement. Round-3 observations on this VM: identical
invocations returned 2.4 s to 12.7 s within one minute (5.3x), and
BASELINE.md §4b's per-op "bands" exist because of exactly this.
Protocol: record the probe value next to every bench datapoint; only
compare bench numbers whose probe values are within ~1.5x of each
other, and treat min-of-N as the capability estimator. Quiet floor on
this host: ~0.16 s.

Usage: python scripts/noise_probe.py [repeats]
Prints one line per repeat: seconds for the fixed workload.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import probe_seconds  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
for _ in range(reps):
    print(probe_seconds())
