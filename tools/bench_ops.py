"""Timing sweep over the round-3 operator additions at a given sf dir.

Prints one JSON line: {op: seconds} — wall time of each driver query
(index build cached/excluded after the first).  Usage:

    python tools/bench_ops.py [sf_dir] [num_cpus]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    ops = [
        "delete_query_topk",
        "update_lang_counts",
        "function_score_topk",
        "explain",
        "collapse_topk",
        "term_suggest",
        "sig_terms",
        "percentiles",
        "distinct_counts",
        "cardinality_hll",
        "date_histogram",
        "composite_page2",
        "bm25_topk_federated",
        "rescore",
        "phrase_slop",
        # session-3 additions: the heavier new pipelines
        "combined_fields",
        "intervals",
        "duplicate_spans",
        "dup_clusters",
        "max_passage",
        "hybrid_linear",
        "eql_funnel",
        "bigram_logprob",
        "knn_int8",
        "string_stats",
        "geohash_grid",
        "hopping_window",
    ]
    # warm the index caches so timings measure the operator, not the build
    qs["lang_counts"](sf_dir)
    out: dict[str, float] = {}
    for op in ops:
        t0 = time.monotonic()
        res = qs[op](sf_dir)
        out[op] = round(time.monotonic() - t0, 3)
        n = res.num_rows if hasattr(res, "num_rows") else len(res)
        out[f"{op}_rows"] = int(n)
    print(json.dumps({"sf": sf_dir, "num_cpus": num_cpus, "ops": out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
