"""Partition-routed BM25 serving (SURVEY.md §3.2, §2.3 T4, §2.4 G6/G7).

Low-latency path for interactive top-k: an actor pool where each
``SegmentActor`` pins a subset of the term-partitioned segment shards in
memory and serves *compressed posting rows* for its terms.  The router
holds only the (small) term dictionary + stats, looks up which partitions
own a query's terms (G6 — driver-side routing table, no shuffle), fetches
the compressed rows concurrently from the owning actors, and runs
block-max WAND locally (G7's heap merge degenerates to one heap because
posting transfer, not score merging, is the distribution unit — partial
BM25 scores of one doc would otherwise have to be SUMMED across term
partitions, which a naive per-partition-top-k merge gets wrong).

Scale notes: shipping compressed rows bounds transfer by the query terms'
total compressed size; head terms stay chunked in doc-disjoint salt slices
(bounded rows).  Raw ``@ray.remote`` actors are justified here — a serving
pool is shared mutable state that the Dataset API cannot express
(instructions §custom-operators (c)).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from ..functions.bm25 import B, K1, idf, tf_norm
from ..functions.codecs import decode_postings
from ..functions.tokenize import tokenize_query
from ..functions.wand import Cursor, wand_topk
from .query import merge_contribs, taat_topk


def _segment_actor_cls():
    import ray

    @ray.remote(num_cpus=1)
    class SegmentActor:
        """Holds a set of segment shard files; serves compressed rows."""

        def __init__(self, index_dir: str, shard_ids: list[int]):
            self.tables = {}
            for sid in shard_ids:
                path = os.path.join(index_dir, "segments", f"shard-{sid:05d}.parquet")
                if os.path.exists(path):
                    self.tables[sid] = pq.read_table(path)

        def fetch(self, wants: list[tuple[int, int]]) -> list[dict]:
            """[(shard, row)] → compressed posting rows."""
            out = []
            for sid, row in wants:
                t = self.tables[sid]
                out.append(
                    {
                        "doc_ids": t["doc_ids"][row].as_py(),
                        "tfs": t["tfs"][row].as_py(),
                        "dls": t["dls"][row].as_py(),
                        "block_meta": t["block_meta"][row].as_py(),
                    }
                )
            return out

        def score_rows(
            self, wants: list[tuple[int, int, float]], avgdl: float, k1: float, b: float
        ) -> list[tuple]:
            """[(shard, row, idf_w)] → (doc_ids, idf·tf_norm) per row —
            routed mode: partial BM25 contributions computed AT the owning
            actor (safe: a (term, salt) slice lives in exactly one shard, so
            per-doc partials from different rows never overlap within a row
            and simply SUM at the router).  Decode parallelizes across
            actors and the router stops decoding postings entirely."""
            out = []
            for sid, row, w in wants:
                t = self.tables[sid]
                d, tf, dl = decode_postings(
                    t["doc_ids"][row].as_py(), t["tfs"][row].as_py(), t["dls"][row].as_py()
                )
                out.append((d, w * tf_norm(tf, dl, avgdl, k1, b)))
            return out

    return SegmentActor


def create_segment_pool(
    index_dir: str, num_actors: int, shards: list[int] | None = None
) -> tuple[list, dict[int, int]]:
    """Spawn the SegmentActor pool once → (actors, shard → actor index).

    Separated from TopKService so MULTIPLE routers (ServingMesh) can share
    one pool — segment bytes load once however many routers front them."""
    import ray

    if shards is None:
        from ..state.termdict import TermDict

        shards = TermDict(os.path.join(index_dir, "term_dict.parquet")).partitions()
    num_actors = max(1, min(num_actors, len(shards) or 1))
    cls = _segment_actor_cls()
    assignment: list[list[int]] = [shards[i::num_actors] for i in range(num_actors)]
    actor_of_shard: dict[int, int] = {}
    actors = []
    for ai, owned in enumerate(assignment):
        actors.append(cls.remote(index_dir, owned))
        for sid in owned:
            actor_of_shard[sid] = ai
    ray.get([a.__ray_ready__.remote() for a in actors])
    return actors, actor_of_shard


class TopKService:
    """Router + segment actor pool.  Create once, query many times.

    Pass ``pool=(actors, actor_of_shard)`` (from ``create_segment_pool``) to
    front an EXISTING pool — the service then shares it and ``shutdown``
    leaves it running (ServingMesh owns the lifecycle)."""

    def __init__(
        self,
        index_dir: str,
        num_actors: int = 4,
        k1: float = K1,
        b: float = B,
        eager_vocab_max: int = 1 << 19,
        pool: tuple[list, dict[int, int]] | None = None,
    ):
        self.k1, self.b = k1, b
        st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
        self.n_docs = int(st["n_docs"][0].as_py())
        self.avgdl = float(st["avgdl"][0].as_py())
        # router state: TermDict (eager dicts for small vocabs; row-group-
        # pruned binary search over the sorted parquet for large ones, so the
        # router's memory stays bounded regardless of vocabulary size)
        from ..state.termdict import TermDict

        self.td = TermDict(
            os.path.join(index_dir, "term_dict.parquet"), eager_max_rows=eager_vocab_max
        )
        # G6 routing: shard → owning actor (round-robin over sorted shards)
        if pool is not None:
            self.actors, self.actor_of_shard = pool
            self._owns_pool = False
        else:
            self.actors, self.actor_of_shard = create_segment_pool(
                index_dir, num_actors, self.td.partitions()
            )
            self._owns_pool = True
        # small router-side cache of fetched compressed rows: query streams
        # hit the same (head) terms repeatedly; compressed rows are tiny
        # relative to the index, so a few thousand terms is cheap
        self._row_cache: dict[str, list[dict]] = {}
        self._row_cache_cap = 4096
        # routed mode's cache holds DECODED (docs, contrib) arrays per term
        # (idf is df-fixed, so contributions are query-independent)
        self._scored_cache: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}

    def query(
        self,
        text: str,
        k: int = 10,
        mode: str = "taat",
        round_decimals: int | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) — rank-identical across both modes.

        ``taat`` (default): decode the fetched lists fully and score with the
        vectorized term-at-a-time kernel — fastest in a numpy world.
        ``wand``: block-max WAND document-at-a-time with block skipping —
        the scale path's algorithmic shape (per-block decode + skip), kept
        rank-identical and exercised by tests; a compiled DAAT would make
        it the latency winner on high-df corpora.
        ``routed``: owning actors decode AND score their slices
        (``score_rows``); the router only sums partial contributions — the
        high-df decode work parallelizes across the pool (VERDICT r2 §6).
        ``auto``: per-query TAAT/WAND planner (VERDICT r2 §7) — WAND only
        pays when a selective term anchors the pivot so head blocks skip;
        all-head queries decode everything anyway, where vectorized TAAT
        wins.  All modes are rank-identical, so planning is pure latency.
        """
        import ray

        if mode == "auto":
            mode = self.plan_mode(text)
        if mode == "routed":
            return self._query_routed(text, k, round_decimals)

        terms = sorted(set(tokenize_query(text)))
        plan: dict[int, list[tuple[int, int]]] = defaultdict(list)  # actor → wants
        meta: list[tuple[int, float, int, str, int]] = []
        raws: list[tuple[int, float, dict] | None] = []
        for order, term in enumerate(terms):
            rows = self.td.rows_of(term)
            if not rows:
                continue
            w = float(idf(self.n_docs, self.td.df_of(term)))
            cached = self._row_cache.get(term)
            for slice_i, (part, row) in enumerate(rows):
                if cached is not None:
                    raws.append((order, w, cached[slice_i]))
                    continue
                ai = self.actor_of_shard[part]
                plan[ai].append((part, row))
                meta.append((order, w, ai, term, slice_i))
                raws.append(None)
        if not raws:
            return []
        if plan:
            # concurrent fetch of the cache misses from owning actors
            futures = {ai: self.actors[ai].fetch.remote(wants) for ai, wants in plan.items()}
            fetched = {ai: ray.get(f) for ai, f in futures.items()}
            taken = {ai: 0 for ai in fetched}
            miss_i = 0
            new_rows: dict[str, dict[int, dict]] = defaultdict(dict)
            for i, r in enumerate(raws):
                if r is not None:
                    continue
                order, w, ai, term, slice_i = meta[miss_i]
                miss_i += 1
                raw = fetched[ai][taken[ai]]
                taken[ai] += 1
                raws[i] = (order, w, raw)
                new_rows[term][slice_i] = raw
            if len(self._row_cache) < self._row_cache_cap:
                for term, slices in new_rows.items():
                    self._row_cache[term] = [slices[j] for j in sorted(slices)]

        if mode == "wand":
            cursors = [
                Cursor.from_raw(order, w, raw, self.avgdl, self.k1, self.b)
                for order, w, raw in raws
            ]
            return wand_topk(cursors, k)

        lists = [
            (w, *decode_postings(raw["doc_ids"], raw["tfs"], raw["dls"]))
            for order, w, raw in raws  # meta order == sorted term order
        ]
        return taat_topk(lists, self.avgdl, k, self.k1, self.b, round_decimals)

    def plan_mode(self, text: str, selective_ratio: float = 0.1) -> str:
        """TAAT/WAND planner (VERDICT r2 §7): pick by df profile.

        WAND's block skipping needs a selective anchor term — its pivot
        stays past the head lists' current docs only when some term's upper
        bound is small AND rare.  Measured on this corpus (BENCH/BASELINE.md):
        WAND wins mixed/selective queries (selective term present), TAAT
        wins all-head queries (everything decodes anyway, and the vectorized
        full-list kernel beats per-block cursor stepping).  Single-term
        queries have nothing to skip → TAAT.
        """
        dfs = [
            self.td.df_of(t) for t in set(tokenize_query(text)) if self.td.df_of(t) > 0
        ]
        if len(dfs) <= 1:
            return "taat"
        return "wand" if min(dfs) <= selective_ratio * self.n_docs else "taat"

    def _query_routed(
        self, text: str, k: int, round_decimals: int | None = None
    ) -> list[tuple[int, float]]:
        """Routed scoring: ship (doc, contribution) partials, not postings.

        Bit-identical to taat: each posting contributes exactly one float64
        ``idf·tf_norm`` addition, and ``merge_contribs`` applies them in the
        same sorted-(term, slice) order as the taat path's np.add.at.
        """
        import ray

        terms = sorted(set(tokenize_query(text)))
        plan: dict[int, list[tuple[int, int, float]]] = defaultdict(list)
        entries: list[tuple[str, int, tuple | None]] = []  # (term, slice_i, cached)
        for term in terms:
            rows = self.td.rows_of(term)
            if not rows:
                continue
            w = float(idf(self.n_docs, self.td.df_of(term)))
            cached = self._scored_cache.get(term)
            for slice_i, (part, row) in enumerate(rows):
                if cached is not None:
                    entries.append((term, slice_i, cached[slice_i]))
                else:
                    plan[self.actor_of_shard[part]].append((part, row, w))
                    entries.append((term, slice_i, None))
        if not entries:
            return []
        if plan:
            futures = {
                ai: self.actors[ai].score_rows.remote(wants, self.avgdl, self.k1, self.b)
                for ai, wants in plan.items()
            }
            fetched = {ai: ray.get(f) for ai, f in futures.items()}
            taken = {ai: 0 for ai in fetched}
            new_rows: dict[str, dict[int, tuple]] = defaultdict(dict)
            filled = []
            for term, slice_i, cached in entries:
                if cached is None:
                    ai = self.actor_of_shard[self.td.rows_of(term)[slice_i][0]]
                    cached = fetched[ai][taken[ai]]
                    taken[ai] += 1
                    new_rows[term][slice_i] = cached
                filled.append((term, slice_i, cached))
            entries = filled
            if len(self._scored_cache) < self._row_cache_cap:
                for term, slices in new_rows.items():
                    self._scored_cache[term] = [slices[j] for j in sorted(slices)]
        return merge_contribs(
            [e[2][0] for e in entries], [e[2][1] for e in entries], k, round_decimals
        )

    def query_batch(
        self, texts: list[str], k: int = 10, mode: str = "taat"
    ) -> list[list[tuple[int, float]]]:
        return [self.query(t, k, mode=mode) for t in texts]

    def shutdown(self) -> None:
        import ray

        if getattr(self, "_owns_pool", True):
            for a in self.actors:
                ray.kill(a)
        self.actors = []


def _router_actor_cls():
    import ray

    @ray.remote(num_cpus=1)
    class RouterActor:
        """One replicated router: its own TermDict + caches, fronting the
        SHARED segment pool (handles passed in).  Queries are served
        entirely inside the actor — the driver only relays futures."""

        def __init__(self, index_dir: str, pool, actor_of_shard, k1, b, eager_vocab_max):
            self.svc = TopKService(
                index_dir,
                k1=k1,
                b=b,
                eager_vocab_max=eager_vocab_max,
                pool=(pool, actor_of_shard),
            )

        def query(self, text, k=10, mode="taat", round_decimals=None):
            return self.svc.query(text, k, mode=mode, round_decimals=round_decimals)

        def query_batch(self, texts, k=10, mode="taat", round_decimals=None):
            return [
                self.svc.query(t, k, mode=mode, round_decimals=round_decimals)
                for t in texts
            ]

    return RouterActor


class ServingMesh:
    """Replicated routers over one shared segment pool (round 3).

    The r2 design's single driver-side router serializes dictionary lookups,
    cache updates and result merging for EVERY query — at cluster scale that
    one process caps throughput regardless of pool size.  The mesh spawns
    ``num_routers`` RouterActors, each with its own TermDict + row caches,
    all fetching from the SAME SegmentActor pool (segment bytes stay loaded
    once).  Queries round-robin across routers; ``query_many`` keeps all
    routers busy concurrently and returns results in input order.

    Routers are stateless w.r.t. each other (caches are per-router and
    idf/df are read-only), so every router is rank-identical to a
    single-router TopKService — asserted in tests/test_wand.py.
    """

    def __init__(
        self,
        index_dir: str,
        num_routers: int = 2,
        num_segment_actors: int = 4,
        k1: float = K1,
        b: float = B,
        eager_vocab_max: int = 1 << 19,
        router_num_cpus: float = 1.0,
    ):
        import ray

        self.pool, self.actor_of_shard = create_segment_pool(
            index_dir, num_segment_actors
        )
        # router CPU reservation is tunable (fractional is fine): a router's
        # own compute is brief (dict lookups + contribution merge) relative
        # to the pool's decode work, and a small test cluster must be able
        # to co-schedule routers + pool without deadlocking on logical CPUs
        cls = _router_actor_cls().options(num_cpus=router_num_cpus)
        self.routers = [
            cls.remote(index_dir, self.pool, self.actor_of_shard, k1, b, eager_vocab_max)
            for _ in range(max(1, num_routers))
        ]
        ray.get([r.__ray_ready__.remote() for r in self.routers])
        self._rr = 0

    def _next(self):
        r = self.routers[self._rr % len(self.routers)]
        self._rr += 1
        return r

    def query(
        self, text: str, k: int = 10, mode: str = "taat", round_decimals: int | None = None
    ) -> list[tuple[int, float]]:
        import ray

        return ray.get(self._next().query.remote(text, k, mode, round_decimals))

    def query_many(
        self,
        texts: list[str],
        k: int = 10,
        mode: str = "taat",
        round_decimals: int | None = None,
    ) -> list[list[tuple[int, float]]]:
        """All routers work concurrently; results return in input order."""
        import ray

        futures = [
            self._next().query.remote(t, k, mode, round_decimals) for t in texts
        ]
        return ray.get(futures)

    def shutdown(self) -> None:
        import ray

        for r in self.routers:
            ray.kill(r)
        for a in self.pool:
            ray.kill(a)
        self.routers, self.pool = [], []


def latency_benchmark(
    index_dir: str, queries: list[str], k: int = 10, num_actors: int = 4, mode: str = "taat"
) -> dict:
    """p50/p99 per-query latency over warm actors (BASELINE.md metric)."""
    import time

    svc = TopKService(index_dir, num_actors=num_actors)
    try:
        svc.query(queries[0], k, mode=mode)  # warm
        lat = []
        for q in queries:
            t0 = time.monotonic()
            svc.query(q, k, mode=mode)
            lat.append(time.monotonic() - t0)
        lat = np.array(lat)
        return {
            "n": len(lat),
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            "mean_ms": float(lat.mean() * 1e3),
        }
    finally:
        svc.shutdown()


class AsyncSearch:
    """ES ``_async_search`` analog over the serving pool.

    ``submit`` returns an id immediately; ``status`` reports per-actor
    progress plus a PARTIAL ranking over the shard responses that have
    already arrived (exactly what ES streams back while shards trickle
    in); ``get`` blocks for the final ranking, which is bit-identical to
    the synchronous routed/taat result (same merge_contribs entry order).

    Ray-native: the per-owning-actor ``score_rows`` futures ARE the async
    state — ``ray.wait(timeout=0)`` is the poll, no bookkeeping actor, no
    scroll context; an abandoned search is garbage-collected with its
    futures.
    """

    def __init__(self, service: TopKService):
        self.svc = service
        self._jobs: dict[str, dict] = {}
        self._next_id = 0

    def submit(self, text: str, k: int = 10, round_decimals: int | None = None) -> str:
        import ray

        svc = self.svc
        terms = sorted(set(tokenize_query(text)))
        plan: dict[int, list[tuple[int, int, float]]] = defaultdict(list)
        entries: list[tuple[str, int, int]] = []  # (term, slice_i, actor)
        for term in terms:
            rows = svc.td.rows_of(term)
            if not rows:
                continue
            w = float(idf(svc.n_docs, svc.td.df_of(term)))
            for slice_i, (part, row) in enumerate(rows):
                ai = svc.actor_of_shard[part]
                plan[ai].append((part, row, w))
                entries.append((term, slice_i, ai))
        futures = {
            ai: svc.actors[ai].score_rows.remote(wants, svc.avgdl, svc.k1, svc.b)
            for ai, wants in plan.items()
        }
        job_id = f"async-{self._next_id}"
        self._next_id += 1
        self._jobs[job_id] = {
            "k": k,
            "round_decimals": round_decimals,
            "entries": entries,
            "futures": futures,
            "done": {},
        }
        return job_id

    def _drain(self, job: dict, timeout: float | None) -> None:
        import ray

        pending = {ai: f for ai, f in job["futures"].items() if ai not in job["done"]}
        if not pending:
            return
        if timeout is None:
            for ai, f in pending.items():
                job["done"][ai] = ray.get(f)
            return
        ready, _ = ray.wait(list(pending.values()), num_returns=len(pending), timeout=timeout)
        ready_set = set(ready)
        for ai, f in pending.items():
            if f in ready_set:
                job["done"][ai] = ray.get(f)

    def _merge(self, job: dict, actors: set[int]) -> list[tuple[int, float]]:
        taken = {ai: 0 for ai in actors}
        docs_l, contrib_l = [], []
        for term, slice_i, ai in job["entries"]:
            if ai not in actors:
                continue
            d, c = job["done"][ai][taken[ai]]
            taken[ai] += 1
            docs_l.append(d)
            contrib_l.append(c)
        return merge_contribs(docs_l, contrib_l, job["k"], job["round_decimals"])

    def status(self, job_id: str) -> dict:
        job = self._jobs[job_id]
        self._drain(job, timeout=0)
        done = set(job["done"])
        return {
            "is_running": len(done) < len(job["futures"]),
            "total_shards": len(job["futures"]),
            "done_shards": len(done),
            "partial": self._merge(job, done),
        }

    def get(self, job_id: str) -> list[tuple[int, float]]:
        job = self._jobs.pop(job_id)
        self._drain(job, timeout=None)
        return self._merge(job, set(job["futures"]))
