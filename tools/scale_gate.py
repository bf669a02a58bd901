"""Standing 10×-scale regression gate (VERDICT r4 item 5).

Runs a fixed lane of the ~30 heaviest driver queries at sf0.1 (100k docs /
600k lineitem rows — 10× the driver's correctness scale) with the SAME
oracle comparison as tools/driver_check.py, in fresh-subprocess chunks
(one Ray session per chunk — the ray-2.49 long-session guard), and prints
ONE JSON line: per-query wall seconds + pass/fail.  Intended cadence: once
per round after the feature batch, recorded in BASELINE.md.

Usage: python tools/scale_gate.py [sf_dir] [--cpus N] [--chunk N]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

# the heavy lane: shuffle-bound dedup/ANN, the language layers, the ML
# family, the event folds, and the serve/search paths — everything whose
# cost profile only shows at 10× scale
LANE = [
    "bm25_topk",
    "search_api",
    "search_api_aggs",
    "query_string",
    "fuzzy_match",
    "phrase_topk",
    "intervals_algebra",
    "more_like_this",
    "sig_terms",
    "terms_agg",
    "percentiles",
    "date_histogram",
    "sessionize",
    "tsds_downsample",
    "bulk_apply",
    "histogram_field_stats",
    "exact_dedup",
    "jaccard_dups",
    "minhash_dups",
    "duplicate_spans",
    "dedup_keep_best",
    "sem_dedup",
    "decontaminate",
    "knn_graph",
    "outlier_scores",
    "esql_stats",
    "esql_inlinestats",
    "esql_match",
    "eql_sequence",
    "nb_train",
    "nb_predict",
    "ols_predict",
    "pack_sequences",
    "shuffle_order",
    "tfidf_top_terms",
    "perplexity_buckets",
]

LINE = re.compile(r"^(OK|rows|FAIL)\s+([a-z0-9_]+):.*?(?:\[(\d+\.\d+)s\])?$")


def main() -> int:
    argv = sys.argv[1:]
    cpus = "16"
    chunk = 6
    if "--cpus" in argv:
        i = argv.index("--cpus")
        cpus = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--chunk" in argv:
        i = argv.index("--chunk")
        chunk = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.abspath(__file__))
    results: dict[str, dict] = {}
    failures = 0
    t_start = time.monotonic()
    for lo in range(0, len(LANE), chunk):
        sel = LANE[lo: lo + chunk]
        env = dict(
            os.environ,
            DRIVER_CHECK_ONLY=",".join(sel),
            DRIVER_CHECK_CPUS=cpus,
        )
        r = subprocess.run(
            [sys.executable, os.path.join(here, "driver_check.py"), sf_dir],
            env=env,
            capture_output=True,
            text=True,
        )
        for line in r.stdout.splitlines():
            m = LINE.match(line.strip())
            if not m:
                continue
            status, name, secs = m.groups()
            if name not in LANE:
                continue
            ok = status in ("OK", "rows")
            results[name] = {
                "ok": ok,
                "oracle": status == "OK",
                "sec": float(secs) if secs else None,
            }
            if not ok:
                failures += 1
                print(f"FAIL  {name}", file=sys.stderr)
        if r.returncode and not any(
            n in results and not results[n]["ok"] for n in sel
        ):
            # the chunk subprocess died before reporting (e.g. Ray crash)
            for n in sel:
                if n not in results:
                    results[n] = {"ok": False, "oracle": False, "sec": None}
                    failures += 1
            print(f"CHUNK DIED: {sel}\n{r.stderr[-2000:]}", file=sys.stderr)
    missing = [n for n in LANE if n not in results]
    for n in missing:
        results[n] = {"ok": False, "oracle": False, "sec": None}
        failures += 1
    print(
        json.dumps(
            {
                "metric": "scale_gate",
                "sf_dir": sf_dir,
                "num_cpus": int(cpus),
                "lane": len(LANE),
                "failures": failures,
                "total_sec": round(time.monotonic() - t_start, 1),
                "queries": {
                    n: results[n]["sec"]
                    for n in LANE
                    if results[n]["sec"] is not None
                },
                "ok": failures == 0,
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
