"""Merge a bench run's per-query minima into BENCH_BASELINE.json.

Usage: python scripts/merge_baselines.py /path/to/bench_output.json

Policy (the regression gate reads this file as "best reproducible minima
on record"):
- a query with no recorded baseline gets this run's minimum;
- an existing baseline is LOWERED when this run beat it (a faster
  reproducible reading tightens the gate) — only when the run's canary
  was clean, so a lucky-phase reading can still only tighten, never
  loosen;
- baselines are never raised here: slowdowns are what the gate exists to
  flag, not to absorb.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    run_path = sys.argv[1]
    with open(run_path) as f:
        run = json.loads(f.read().strip().splitlines()[-1])
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(base_path) as f:
        base = json.load(f)

    sf1 = run.get("sf1") or {}
    # each section gates on ITS OWN canary (the host phase drifts mid-run:
    # bench.py's sf1 gate exists for exactly this reason)
    sections = (
        ("queries", run.get("queries", {}), bool(run.get("canary_clean"))),
        ("sf1_queries", sf1.get("queries", {}), bool(sf1.get("canary_clean"))),
    )
    added, lowered = [], []
    for section, times, clean in sections:
        tgt = base.setdefault(section, {})
        for q, t in times.items():
            if q not in tgt:
                if clean:
                    tgt[q] = t
                    added.append(f"{section}/{q}={t}")
                else:
                    print(f"SKIP new baseline {section}/{q}={t}: dirty canary")
            elif clean and t < tgt[q]:
                lowered.append(f"{section}/{q} {tgt[q]} -> {t}")
                tgt[q] = t

    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"added {len(added)}: {added}")
    print(f"lowered {len(lowered)}: {lowered}")


if __name__ == "__main__":
    main()
