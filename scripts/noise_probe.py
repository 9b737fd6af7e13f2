#!/usr/bin/env python
"""Shared-host CPU-steal probe for bench hygiene.

Times a FIXED single-thread workload (numpy elementwise + md5 churn).
The absolute number is meaningless across machines; the RATIO across
runs on this host is the interference measurement. Round-3 observations
on this VM: identical invocations returned 2.4 s to 12.7 s within one
minute (5.3x), and BASELINE.md §4b's per-op "bands" exist because of
exactly this. Protocol: record the probe value next to every bench
datapoint; only compare bench numbers whose probe values are within
~1.5x of each other, and treat min-of-N as the capability estimator.

Usage: python scripts/noise_probe.py [repeats]
Prints one line per repeat: seconds for the fixed workload.
"""
import hashlib
import sys
import time

import numpy as np

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
a = np.arange(8_000_000, dtype=np.float64)
for _ in range(reps):
    t0 = time.perf_counter()
    for _ in range(5):
        b = a * 1.0000001 + 3.0
        hashlib.md5(b"x" * 4_000_000).hexdigest()
    print(round(time.perf_counter() - t0, 3))
