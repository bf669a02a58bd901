"""Pool multiple `bench.py --scaling` result files into one honest summary.

Applies the same cleanliness rule as bench.run_scaling, but with the
session-best lo/hi build times computed over the WHOLE pool (batches run
hours apart see different machine weather; the pool best is the fairest
"unpolluted speed" reference):

    clean(run) = cal_before <= gate and cal_after <= gate
                 and best_lo(run) <= slack * pool_best_lo
                 and best_hi(run) <= slack * pool_best_hi

Prints full-pool and clean-pool medians plus the per-run table that
BENCH/BASELINE.md records.  Usage:

    python tools/pool_scaling.py /tmp/r3_scaling_*.json
"""

from __future__ import annotations

import json
import sys


def main(paths: list[str], gate: float = 1.25, slack: float = 1.25) -> None:
    runs = []
    for p in paths:
        try:
            d = json.load(open(p))
        except (OSError, json.JSONDecodeError):
            continue
        for r in d["runs"]:
            runs.append(
                {
                    "batch": p.rsplit("/", 1)[-1],
                    "eff": r["eff"],
                    "lo": min(r["build_sec_lo_all"]),
                    "hi": min(r["build_sec_hi_all"]),
                    "cal_b": r["cal_ratio_before"],
                    "cal_a": r["cal_ratio_after"],
                }
            )
    if not runs:
        print("no runs found")
        return
    best_lo = min(r["lo"] for r in runs)
    best_hi = min(r["hi"] for r in runs)
    for r in runs:
        r["clean"] = (
            r["cal_b"] <= gate
            and r["cal_a"] <= gate
            and r["lo"] <= slack * best_lo
            and r["hi"] <= slack * best_hi
        )

    def med(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    effs = [r["eff"] for r in runs]
    clean = [r["eff"] for r in runs if r["clean"]]
    print(f"pool: {len(runs)} runs, best lo {best_lo:.2f}s best hi {best_hi:.2f}s "
          f"(best-pair eff {best_lo / (4 * best_hi):.3f})")
    for r in runs:
        mark = "CLEAN" if r["clean"] else "     "
        print(f"  {mark} eff {r['eff']:.3f} lo {r['lo']:6.2f} hi {r['hi']:6.2f} "
              f"cal {r['cal_b']:.3f}/{r['cal_a']:.3f}  [{r['batch']}]")
    print(f"full-pool median {med(effs):.3f} (n={len(effs)}, mean {sum(effs)/len(effs):.3f}, "
          f"best {max(effs):.3f})")
    if clean:
        print(f"clean-pool median {med(clean):.3f} (n={len(clean)})")
    else:
        print("clean-pool: no clean runs")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--gate="):
            kw["gate"] = float(a.split("=", 1)[1])
        if a.startswith("--slack="):
            kw["slack"] = float(a.split("=", 1)[1])
    main(args, **kw)
