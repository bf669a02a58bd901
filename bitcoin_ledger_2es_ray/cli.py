"""Command-line entry points — the reference's CLI surface, re-expressed.

The reference (``wenweih/bitcoin-ledger-2es``, SURVEY.md §0.1) is a Go CLI
that syncs a ledger into Elasticsearch and leaves querying to ES.  The graft
exposes the equivalent operations over its own engine:

    python -m bitcoin_ledger_2es_ray.cli build  --corpus DIR_OR_FILE --out IDX [--positions]
    python -m bitcoin_ledger_2es_ray.cli resume --corpus ...        --out IDX
    python -m bitcoin_ledger_2es_ray.cli query  --index IDX --q "text" [-k 10]
    python -m bitcoin_ledger_2es_ray.cli match  --index IDX --q "a b" --mode phrase|phrase-topk|prefix|wildcard
    python -m bitcoin_ledger_2es_ray.cli serve-bench --index IDX --queries Q.parquet
    python -m bitcoin_ledger_2es_ray.cli esql 'FROM t | STATS ...' --sf-dir DIR [--csv]

``build`` and ``resume`` are the same operation (the build is always
incremental from the manifest — the reference's "resume from last indexed
height" generalized to per-partition lineage); both names exist for
familiarity.  The CLI owns the Ray session (the ONLY library-adjacent code
allowed to call ray.init, guarded for pre-initialised drivers).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def cmd_build(args: argparse.Namespace) -> int:
    from .pipelines.build import BuildConfig, build_index

    _ensure_ray(args.num_cpus)
    cfg = BuildConfig(
        corpus=args.corpus,
        out_dir=args.out,
        num_partitions=args.partitions,
        tag_lang=args.tag_lang,
        head_df_ratio=args.head_df_ratio,
        n_salt=args.n_salt,
        shuffle=args.shuffle,
        with_positions=args.positions,
    )
    res = build_index(cfg)
    print(
        json.dumps(
            {
                "out_dir": res.out_dir,
                "n_docs": res.n_docs,
                "n_terms": res.n_terms,
                "units": res.n_units,
                "skipped_units": res.skipped_units,
                "skipped_shards": res.skipped_shards,
                "head_terms": len(res.head_terms),
            }
        )
    )
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .pipelines.query import SegmentStore, attach_doc_meta, score_query
    import pyarrow as pa

    store = SegmentStore(args.index)
    top = score_query(store, args.q, args.k)
    results = pa.table(
        {
            "query_id": pa.array([0] * len(top), type=pa.uint64()),
            "rank": pa.array(range(1, len(top) + 1), type=pa.uint32()),
            "doc_id": pa.array([d for d, _ in top], type=pa.uint64()),
            "score": pa.array([s for _, s in top], type=pa.float64()),
        }
    )
    joined = attach_doc_meta(results, args.index)
    for row in joined.to_pylist():
        print(
            f"{row['rank']:3d}  {row['score']:10.4f}  doc {row['doc_id']}  "
            f"{row['repo']}:{row['path']}@{row['commit'][:8]}"
        )
    return 0


def cmd_query_batch(args: argparse.Namespace) -> int:
    """Batch query set → partitioned parquet results (the scale sink:
    scoring, metadata join and write all stream — nothing lands on the
    driver)."""
    from .pipelines.query import run_queries_to_parquet
    from .sources.queries import read_queries

    _ensure_ray(args.num_cpus)
    out = run_queries_to_parquet(
        args.index,
        read_queries(args.queries),
        args.out,
        concurrency=args.concurrency,
        with_meta=not args.no_meta,
    )
    print(json.dumps({"out": out}))
    return 0


def cmd_match(args: argparse.Namespace) -> int:
    """Phrase / prefix / wildcard query over a built index (ES
    match_phrase / prefix / wildcard analogs; phrase needs an index built
    with --positions)."""
    from .pipelines.phrase import (
        phrase_match,
        phrase_topk,
        prefix_match,
        wildcard_match,
    )
    from .pipelines.query import SegmentStore

    store = SegmentStore(args.index)
    if args.mode == "phrase-topk":
        top = phrase_topk(store, args.q, args.k)
        for r, (d, s) in enumerate(top, start=1):
            print(f"{r:3d}  {s:10.4f}  doc {d}")
        return 0
    if args.mode == "phrase-slop":
        from .pipelines.phrase import phrase_match_slop

        docs = phrase_match_slop(store, args.q, slop=args.slop)
    else:
        from .pipelines.phrase import fuzzy_match, regexp_match

        fn = {
            "phrase": phrase_match,
            "prefix": prefix_match,
            "wildcard": wildcard_match,
            "regexp": regexp_match,
            "fuzzy": fuzzy_match,
        }[args.mode]
        docs = fn(store, args.q)
    print(json.dumps({"n": int(len(docs)), "doc_ids": docs[: args.k].tolist()}))
    return 0


def cmd_serve_bench(args: argparse.Namespace) -> int:
    import pyarrow.parquet as pq

    from .pipelines.serve import latency_benchmark

    _ensure_ray(args.num_cpus)
    texts = pq.read_table(args.queries, columns=["text"])["text"].to_pylist()
    print(
        json.dumps(
            latency_benchmark(
                args.index, texts, k=args.k, num_actors=args.actors, mode=args.mode
            )
        )
    )
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Composed curation pipeline → partitioned parquet (streamed)."""
    from .pipelines.curate import curate_corpus_to_parquet

    _ensure_ray(args.num_cpus)
    out = curate_corpus_to_parquet(
        args.sf_dir,
        args.out,
        min_tokens=args.min_tokens,
        max_mean_tok_len=args.max_mean_tok_len,
        langs=tuple(args.langs.split(",")),
    )
    print(json.dumps({"out": out}))
    return 0


def cmd_suggest(args: argparse.Namespace) -> int:
    """Term suggester: top-k corrections for a (misspelled) token."""
    from .pipelines.phrase import term_suggest
    from .pipelines.query import SegmentStore

    store = SegmentStore(args.index)
    out = term_suggest(store, args.q, k=args.k, max_dist=args.max_dist)
    print(json.dumps([{"term": t, "distance": d, "df": f} for t, d, f in out]))
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Per-term BM25 breakdown of one doc's score for one query."""
    from .pipelines.query import SegmentStore, explain_score

    store = SegmentStore(args.index)
    parts = explain_score(store, args.q, args.doc)
    print(
        json.dumps(
            {
                "doc_id": args.doc,
                "score": sum(c for _, _, _, c in parts),
                "terms": [
                    {"term": t, "idf": w, "tf": tf, "contribution": c}
                    for t, w, tf, c in parts
                ],
            }
        )
    )
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    from .pipelines.lifecycle import index_stats

    print(json.dumps(index_stats(args.index)))
    return 0


def cmd_alias(args: argparse.Namespace) -> int:
    from .pipelines.lifecycle import resolve_alias, update_aliases

    if args.set:
        out = update_aliases(args.registry, [("add", args.alias, args.set)])
    elif args.remove:
        out = update_aliases(args.registry, [("remove", args.alias, None)])
    else:
        out = {args.alias: resolve_alias(args.registry, args.alias)}
    print(json.dumps(out, sort_keys=True))
    return 0


def cmd_snapshot(args: argparse.Namespace) -> int:
    from .pipelines.lifecycle import restore_index, snapshot_index

    if args.restore:
        print(json.dumps({"files": restore_index(args.index, args.out)}))
    else:
        print(json.dumps(snapshot_index(args.index, args.out)))
    return 0


def cmd_cat(args: argparse.Namespace) -> int:
    """_cat/indices over the alias registry: per-index docs/deletes/bytes
    and a green/red artifact-health status."""
    from .pipelines.lifecycle import cat_indices

    for row in cat_indices(args.registry).to_pylist():
        print(json.dumps(row, sort_keys=True))
    return 0


def cmd_repo(args: argparse.Namespace) -> int:
    """Incremental snapshot repository (ES _snapshot analog): create
    dedupes against the content-addressed blob store, delete GCs blobs no
    other snapshot references."""
    from .pipelines.lifecycle import (
        snapshot_create,
        snapshot_delete,
        snapshot_restore,
    )

    if args.action == "create":
        print(json.dumps(snapshot_create(args.index, args.repo, args.name)))
    elif args.action == "restore":
        print(json.dumps({"files": snapshot_restore(args.repo, args.name, args.out)}))
    else:
        print(json.dumps(snapshot_delete(args.repo, args.name)))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    """ES ``_search``: a JSON query-DSL body against a built index."""
    from .pipelines.query import SegmentStore
    from .pipelines.search_api import run_search

    body = json.loads(args.body)
    t = run_search(SegmentStore(args.index), body)
    for rank, doc, score in zip(
        t["rank"].to_pylist(), t["doc_id"].to_pylist(), t["score"].to_pylist()
    ):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": score}))
    return 0


def cmd_ccr(args: argparse.Namespace) -> int:
    """Cross-cluster replication (ES x-pack CCR): one incremental follow
    sync — only new/changed leader files ship to the follower."""
    from .pipelines.lifecycle import ccr_follow

    print(json.dumps(ccr_follow(args.leader, args.follower)))
    return 0


def cmd_delete(args: argparse.Namespace) -> int:
    """Soft-delete by forward-map predicate (ES delete_by_query analog):
    tombstones the matching doc_ids; queries mask them immediately, space
    comes back at the next `compact`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pipelines.lifecycle import delete_by_query

    expr = pc.field(args.field).isin(pa.array(args.value))
    total = delete_by_query(args.index, expr)
    print(json.dumps({"tombstones_total": total}))
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    """update_by_query over forward-map metadata: --set col=value applied
    where --field matches --value (streamed rewrite + dir swap)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pipelines.lifecycle import update_by_query

    _ensure_ray(args.num_cpus)
    expr = pc.field(args.field).isin(pa.array(args.value))
    sets = dict(kv.split("=", 1) for kv in args.set)
    n = update_by_query(args.index, expr, sets)
    print(json.dumps({"updated": n}))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Merge tombstones away into a fresh index dir (Lucene segment-merge
    analog): parallel per-shard rewrite + exact stats recompute."""
    from .pipelines.lifecycle import compact_index

    _ensure_ray(args.num_cpus)
    res = compact_index(args.index, args.out, concurrency=args.concurrency)
    print(
        json.dumps(
            {
                "out": res.out_dir,
                "n_docs": res.n_docs,
                "n_deleted": res.n_deleted,
                "n_terms": res.n_terms,
            }
        )
    )
    return 0


def cmd_reshard(args: argparse.Namespace) -> int:
    """ES _split/_shrink: change the shard count without re-tokenizing —
    byte-identical to a fresh build at the new partition count."""
    from .pipelines.lifecycle import reshard_index

    _ensure_ray(args.num_cpus)
    res = reshard_index(args.index, args.out, new_partitions=args.partitions)
    print(
        json.dumps(
            {
                "out": res.out_dir,
                "old_partitions": res.old_partitions,
                "new_partitions": res.new_partitions,
                "n_terms": res.n_terms,
                "n_postings": res.n_postings,
            }
        )
    )
    return 0


def cmd_esql(args: argparse.Namespace) -> int:
    """Run one ES|QL pipe over a directory of parquet tables and print
    the result as JSON lines (or CSV with --csv)."""
    from .pipelines.esql import run_esql

    _ensure_ray(args.num_cpus)
    res = run_esql(args.pipe, args.sf_dir)
    if args.csv:
        import io

        import pyarrow as pa
        import pyarrow.csv as pacsv

        # Arrow CSV has no nested-type support: JSON-encode list columns
        for i, f in enumerate(res.schema):
            if pa.types.is_nested(f.type):
                res = res.set_column(
                    i, f.name,
                    pa.array(
                        [json.dumps(v, default=str) for v in res.column(i).to_pylist()],
                        type=pa.string(),
                    ),
                )
        buf = io.BytesIO()
        pacsv.write_csv(res, buf)
        sys.stdout.write(buf.getvalue().decode())
    else:
        for row in res.to_pylist():
            print(json.dumps(row, default=str))
    return 0


def cmd_eql(args: argparse.Namespace) -> int:
    """Run one EQL query over the events table and print JSON lines."""
    from .pipelines.eql import run_eql

    _ensure_ray(args.num_cpus)
    for row in run_eql(args.query, args.sf_dir).to_pylist():
        print(json.dumps(row, default=str))
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    """Lucene CheckIndex analog: verify segment/dictionary/stats
    invariants; exit 1 on any issue."""
    from .pipelines.lifecycle import check_index

    _ensure_ray(args.num_cpus)
    rep = check_index(args.index)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bitcoin_ledger_2es_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("build", "resume"):
        b = sub.add_parser(name, help="build (or incrementally resume) the index")
        b.add_argument("--corpus", required=True, help="corpus parquet file or directory")
        b.add_argument("--out", required=True, help="index output directory")
        b.add_argument("--partitions", type=int, default=32)
        b.add_argument("--n-salt", type=int, default=4)
        b.add_argument("--head-df-ratio", type=float, default=0.10)
        b.add_argument("--tag-lang", action="store_true")
        b.add_argument(
            "--positions",
            action="store_true",
            help="build a positional index (enables phrase queries)",
        )
        b.add_argument("--shuffle", choices=("fs", "raydata"), default="fs")
        b.add_argument("--num-cpus", type=int, default=None)
        b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True, help="query text")
    q.add_argument("-k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    m = sub.add_parser(
        "match", help="phrase / prefix / wildcard match (phrase needs --positions index)"
    )
    m.add_argument("--index", required=True)
    m.add_argument("--q", required=True, help="phrase text / prefix / glob pattern")
    m.add_argument(
        "--mode",
        choices=("phrase", "phrase-topk", "prefix", "wildcard", "phrase-slop", "regexp", "fuzzy"),
        default="phrase",
    )
    m.add_argument("--slop", type=int, default=0, help="phrase-slop: max extra gap")
    m.add_argument("-k", type=int, default=10, help="docs to print (phrase-topk: top-k)")
    m.set_defaults(fn=cmd_match)

    qb = sub.add_parser(
        "query-batch", help="batch query set → partitioned parquet results (streamed)"
    )
    qb.add_argument("--index", required=True)
    qb.add_argument("--queries", required=True, help="queries parquet (QUERIES schema)")
    qb.add_argument("--out", required=True, help="results output directory")
    qb.add_argument("--concurrency", type=int, default=8)
    qb.add_argument("--no-meta", action="store_true", help="skip the doc-meta join")
    qb.add_argument("--num-cpus", type=int, default=None)
    qb.set_defaults(fn=cmd_query_batch)

    s = sub.add_parser("serve-bench", help="p50/p99 latency over warm serving actors")
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True, help="queries parquet (text column)")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--actors", type=int, default=4)
    s.add_argument(
        "--mode", choices=("taat", "wand", "routed", "auto"), default="auto"
    )
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_serve_bench)

    c = sub.add_parser(
        "curate", help="quality+lang+dedup-rep curation → partitioned parquet"
    )
    c.add_argument("--sf-dir", required=True, help="directory with documents.parquet")
    c.add_argument("--out", required=True, help="output directory")
    c.add_argument("--min-tokens", type=int, default=20)
    c.add_argument("--max-mean-tok-len", type=float, default=8.0)
    c.add_argument("--langs", default="en,fr", help="comma-separated lang allowlist")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_curate)

    sg = sub.add_parser("suggest", help="term suggester: top-k corrections")
    sg.add_argument("--index", required=True)
    sg.add_argument("--q", required=True, help="(misspelled) token")
    sg.add_argument("-k", type=int, default=3)
    sg.add_argument("--max-dist", type=int, default=2)
    sg.set_defaults(fn=cmd_suggest)

    ex = sub.add_parser("explain", help="per-term BM25 breakdown for one doc")
    ex.add_argument("--index", required=True)
    ex.add_argument("--q", required=True, help="query text")
    ex.add_argument("--doc", required=True, type=int, help="doc_id to explain")
    ex.set_defaults(fn=cmd_explain)

    st = sub.add_parser("stats", help="index stats: sizes, counts, tombstones")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    sn = sub.add_parser(
        "snapshot", help="checksum-manifested snapshot (--restore to restore)"
    )
    sn.add_argument("--index", required=True, help="index dir (or snapshot dir with --restore)")
    sn.add_argument("--out", required=True)
    sn.add_argument("--restore", action="store_true")
    sn.set_defaults(fn=cmd_snapshot)

    ct = sub.add_parser(
        "cat", help="_cat/indices: one JSON line per aliased index"
    )
    ct.add_argument("--registry", required=True, help="alias registry dir")
    ct.set_defaults(fn=cmd_cat)

    rp = sub.add_parser(
        "repo", help="incremental snapshot repository: create/restore/delete"
    )
    rp.add_argument("action", choices=["create", "restore", "delete"])
    rp.add_argument("--repo", required=True, help="repository dir")
    rp.add_argument("--name", required=True, help="snapshot name")
    rp.add_argument("--index", help="index dir (create)")
    rp.add_argument("--out", help="destination dir (restore)")
    rp.set_defaults(fn=cmd_repo)

    se = sub.add_parser(
        "search", help="_search: JSON query-DSL body against an index"
    )
    se.add_argument("--index", required=True, help="index dir")
    se.add_argument("--body", required=True, help="JSON _search body")
    se.set_defaults(fn=cmd_search)

    cc = sub.add_parser(
        "ccr", help="cross-cluster replication: incremental follow sync"
    )
    cc.add_argument("--leader", required=True, help="leader index dir")
    cc.add_argument("--follower", required=True, help="follower index dir")
    cc.set_defaults(fn=cmd_ccr)

    d = sub.add_parser(
        "delete", help="soft-delete docs whose forward-map field matches a value"
    )
    d.add_argument("--index", required=True)
    d.add_argument("--field", required=True, help="forward-map column (e.g. lang, repo)")
    d.add_argument(
        "--value", required=True, action="append", help="match value (repeatable → IN)"
    )
    d.set_defaults(fn=cmd_delete)

    u = sub.add_parser(
        "update", help="update forward-map metadata fields where a field matches"
    )
    u.add_argument("--index", required=True)
    u.add_argument("--field", required=True, help="forward-map match column")
    u.add_argument(
        "--value", required=True, action="append", help="match value (repeatable → IN)"
    )
    u.add_argument(
        "--set", required=True, action="append", help="col=value to apply (repeatable)"
    )
    u.add_argument("--num-cpus", type=int, default=None)
    u.set_defaults(fn=cmd_update)

    k = sub.add_parser(
        "compact", help="merge tombstones away into a fresh index directory"
    )
    k.add_argument("--index", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--concurrency", type=int, default=8)
    k.add_argument("--num-cpus", type=int, default=None)
    k.set_defaults(fn=cmd_compact)

    ck = sub.add_parser(
        "check", help="verify index integrity (CheckIndex analog)"
    )
    ck.add_argument("--index", required=True)
    ck.add_argument("--num-cpus", type=int, default=None)
    ck.set_defaults(fn=cmd_check)

    rs = sub.add_parser(
        "reshard", help="split/shrink: change shard count without re-tokenizing"
    )
    rs.add_argument("--index", required=True)
    rs.add_argument("--out", required=True)
    rs.add_argument("--partitions", type=int, required=True)
    rs.add_argument("--num-cpus", type=int, default=None)
    rs.set_defaults(fn=cmd_reshard)

    al = sub.add_parser(
        "alias", help="resolve / atomically repoint / remove an index alias"
    )
    al.add_argument("--registry", required=True, help="alias registry dir")
    al.add_argument("--alias", required=True)
    al.add_argument("--set", default=None, help="index dir to point the alias at")
    al.add_argument("--remove", action="store_true")
    al.set_defaults(fn=cmd_alias)

    eq = sub.add_parser(
        "esql", help="run one ES|QL pipe over a directory of parquet tables"
    )
    eq.add_argument("pipe", help='e.g. \'FROM events | STATS n = COUNT(*) BY user_id | SORT user_id\'')
    eq.add_argument("--sf-dir", required=True, help="directory of <table>.parquet files")
    eq.add_argument("--csv", action="store_true", help="CSV instead of JSON lines")
    eq.add_argument("--num-cpus", type=int, default=None)
    eq.set_defaults(fn=cmd_esql)

    el = sub.add_parser(
        "eql", help="run one EQL query (event/sequence/sample) over events"
    )
    el.add_argument("query", help="e.g. 'sequence by user_id [a where true] [b where true]'")
    el.add_argument("--sf-dir", required=True)
    el.add_argument("--num-cpus", type=int, default=None)
    el.set_defaults(fn=cmd_eql)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
