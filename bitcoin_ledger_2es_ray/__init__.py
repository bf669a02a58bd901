"""Ray-Data-native inverted-index build + BM25 query engine.

Capability graft of ``wenweih/bitcoin-ledger-2es`` (a Go ledger→Elasticsearch
ETL whose query capability is delegated to Lucene/BM25).  This package replaces
the Elasticsearch dependency with its own posting-list machinery, built
Ray-Data-first: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, ``groupby().map_groups`` for the term shuffle, and
actor pools for stateful scoring stages.

The reference checkout at /root/reference is empty (verified in SURVEY.md §0),
so parity targets are cited against BASELINE.json (authoritative north star)
rather than reference file:line.

Layout
------
- ``schemas``    fixed pyarrow schemas for every inter-stage table (SURVEY §1.2)
- ``functions``  pure, vectorized kernels: tokenizer, codecs, BM25 math, WAND
- ``sources``    corpus readers / synthetic corpus derivation / query sets
- ``stages``     map_batches / map_groups stage bodies (verify, explode, segment)
- ``pipelines``  end-to-end build / query / resume entry points
- ``state``      checkpoint manifest (per-partition lineage + metrics)

No module in this package calls ``ray.init()`` — the driver owns the session.
"""

__version__ = "0.1.0"


def _register_with_cloudpickle() -> None:
    """Ship this package's code by value inside Ray task/actor closures.

    The package is imported from a repo checkout, not site-packages, so Ray
    worker processes (whose sys.path may not include the checkout when the
    driver added it at runtime) would otherwise fail to unpickle our stage
    classes with ModuleNotFoundError.  cloudpickle's by-value registration
    covers the package and all submodules; payload cost is a few KB per
    task.  Best-effort: harmless if ray is absent.
    """
    try:
        import sys

        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_with_cloudpickle()
