"""Cross-query state-reset contract (session.reset_query_state).

The bench/sweep harnesses call ``reset_query_state`` between queries to
drop ALL persisted RDD blocks (including localCheckpoint blocks).  Any
module-level cache holding DataFrames across query invocations must be
registered via ``session.register_frame_cache`` so the reset also clears
the cache — otherwise the next cache hit returns either

- a lineage-truncated checkpointed frame whose blocks are gone
  (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) — the retrieval token cache, or
- a silently-unpersisted frame that re-derives its input per use —
  the graph edge cache.

These tests pin the contract for the two caches ADVICE r11 found
unregistered, and the registry-wide invariant that every module-level
DataFrame-holding cache is registered.
"""

from __future__ import annotations

from pyspark import StorageLevel

from spark_streaming_test_spark import session as sess
from spark_streaming_test_spark.llm import retrieval
from spark_streaming_test_spark.operators import graph


def test_prf_token_cache_survives_reset(spark, sf_dir):
    """Two _cached_tokens consumers with a reset in between: the second
    must rebuild (fresh checkpoint), not serve the dead one."""
    first = retrieval._cached_tokens(spark, sf_dir)
    n1 = first.count()
    assert retrieval._PRF_TOKS_CACHE, "cache should be populated"
    sess.reset_query_state(spark)
    assert not retrieval._PRF_TOKS_CACHE, (
        "reset must clear the registered PRF token cache"
    )
    second = retrieval._cached_tokens(spark, sf_dir)
    # The old frame's checkpoint blocks are gone; this count would throw
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND if the stale frame were served.
    assert second.count() == n1


def test_edge_cache_repersists_after_reset(spark, sf_dir):
    """After a reset, the edge cache must miss and re-materialize — not
    hand out frames whose checkpoint blocks the reset dropped. (r13:
    the cache switched persist() -> eager localCheckpoint, so the
    materialization invariant is a truncated LogicalRDD plan, not a
    SQL-cache storage level.)"""

    def _is_checkpointed(df):
        head = (
            df._jdf.queryExecution().logical().toString().strip()
            .splitlines()[0]
        )
        return head.startswith("LogicalRDD")

    edges, deg, n_nodes = graph._edge_index(spark, sf_dir)
    assert _is_checkpointed(edges) and _is_checkpointed(deg)
    assert n_nodes > 0
    sess.reset_query_state(spark)
    assert not graph._EDGE_CACHE, "reset must clear the edge cache"
    edges2, deg2, n_nodes2 = graph._edge_index(spark, sf_dir)
    assert _is_checkpointed(edges2), "rebuilt edges must be materialized"
    assert _is_checkpointed(deg2), "rebuilt degree frame must be materialized"
    # and they are usable: these counts would throw
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND if a stale frame were served.
    assert edges2.count() > 0 and deg2.count() == n_nodes2 > 0


def test_all_dataframe_caches_are_registered():
    """Registry-wide invariant: any module-level dict cache whose values
    can hold DataFrames (name ends in _CACHE) in operator/llm modules is
    registered with session.register_frame_cache.  Catches the next
    unregistered cache before ADVICE does."""
    import importlib
    import pkgutil

    import spark_streaming_test_spark.llm as llm_pkg
    import spark_streaming_test_spark.operators as ops_pkg

    # Import ALL modules before snapshotting the registry — importing a
    # module during the scan registers its caches, so a pre-scan
    # snapshot would miss any module first imported by the scan itself.
    mods = [
        importlib.import_module(f"{pkg.__name__}.{info.name}")
        for pkg in (ops_pkg, llm_pkg)
        for info in pkgutil.iter_modules(pkg.__path__)
    ]
    registered = {id(c) for c in sess._CROSS_QUERY_FRAME_CACHES}
    unregistered = []
    for mod in mods:
        for name, val in vars(mod).items():
            if not name.endswith("_CACHE") or not isinstance(val, dict):
                continue
            # Plain-value caches (seed lists, centroid arrays) hold
            # no Spark state and opt out via _PLAIN_CACHES.
            plain = getattr(mod, "_PLAIN_CACHES", ())
            if name in plain:
                continue
            if id(val) not in registered:
                unregistered.append(f"{mod.__name__}.{name}")
    assert not unregistered, (
        f"module-level frame caches not registered for reset: {unregistered}"
    )
