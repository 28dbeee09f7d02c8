"""Multi-process memory-bandwidth probe — evidence for the scaling story.

The sandbox throttles memory bandwidth PER PROCESS. This probe launches K
concurrent single-core-pinned processes, each timing a 0.5 GB memcpy
(min of 3), and reports per-process and aggregate GB/s for K=1,2,4,8.

Findings (2026-08-17 session, clean window): per-process ~2.9 GB/s at any
K up to 4, aggregate ~linear in K (1->8 processes: 3.0 -> 15.8 GB/s,
per-process ~2.9 -> ~1.9). Implication: a single local-mode JVM is capped
at ONE process quota for bandwidth-bound stages no matter how many task
threads it runs, while N separate executor JVMs get ~N quotas — which is
why `run_scaling.py --standalone` (N vs 4N executor JVMs) is the honest
multi-executor analog on this host, and why local[8]->local[32]
efficiency understates a real cluster for bandwidth-bound stages.

Usage: python scripts/bw_probe.py  (prints one JSON line per K)
"""

import json
import subprocess
import sys

WORKER = r'''
import time, numpy as np
a = np.ones(62_500_000, dtype=np.float64)  # 0.5 GB
best = None
for _ in range(3):
    t0 = time.perf_counter(); b = a.copy(); dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(0.5 / best)
'''


def run_k(k: int) -> dict:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(k)
    ]
    rates = [float(p.communicate()[0].strip()) for p in procs]
    return {
        "k": k,
        "per_proc_GBps": [round(r, 3) for r in rates],
        "aggregate_GBps": round(sum(rates), 3),
    }


if __name__ == "__main__":
    for k in (1, 2, 4, 8):
        print(json.dumps(run_k(k)), flush=True)
