"""Physical-plan assertions: the properties that make a plan survive
100 TB are checkable strings in ``df.explain('formatted')`` output.

These helpers let tests (and operators' own sanity checks) pin the
optimizer behavior the engine relies on:

  * filter pushdown     — predicates reach the parquet scan
                          (``PushedFilters: [...]``), so row groups are
                          skipped at the source instead of scanned
  * column pruning      — ``ReadSchema`` only lists referenced columns,
                          so a 2-column projection never reads 11 columns
  * broadcast joins     — small dims hash-broadcast instead of shuffling
                          the fact table (``BroadcastHashJoin``)
  * top-k fusion        — sort+limit fuses to ``TakeOrderedAndProject``
                          (no global sort materialization)
  * window group limit  — rank-filter pushdown keeps k rows per group
                          per task (``WindowGroupLimit``)
  * whole-stage codegen — hot expressions stay JVM-side in fused codegen
                          spans (``WholeStageCodegen``)

A regression in any of these is invisible at sf0.01 correctness but
catastrophic at scale — which is why they are asserted, not assumed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-Catalyst, pre-AQE-reoptimize)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every file scan in the plan."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some scan's PushedFilters mentions ``fragment``."""
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"no pushed filter contains {fragment!r}; pushed: {filters}"
    )


def assert_columns_pruned(df: DataFrame, table_cols: int, max_read: int) -> None:
    """Assert every scan reads at most ``max_read`` of ``table_cols``."""
    for schema in read_schemas(df):
        n = schema.count(":")
        assert n <= max_read, (
            f"scan reads {n}/{table_cols} columns — pruning failed: {schema}"
        )


def assert_operator(df: DataFrame, op: str, present: bool = True) -> None:
    """Assert a physical operator appears (or not) in the plan."""
    plan = formatted_plan(df)
    found = op in plan
    assert found == present, (
        f"operator {op!r} {'missing from' if present else 'unexpectedly in'} plan:\n"
        + plan[:4000]
    )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """Assert at least ``min_count`` broadcast hash joins in the plan."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} BroadcastHashJoin, found {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct / BroadcastNestedLoopJoin snuck in.

    Intentional theta-joins (as-of, range) use nested-loop by design —
    this check is for equi-join pipelines where a cartesian means a
    dropped join key."""
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "CartesianProduct in plan"


def single_partition_funnels(plan: str) -> list[dict]:
    """Every ``Exchange SinglePartition`` in a formatted plan, with its
    child operator classified for boundedness.

    A SinglePartition exchange funnels its entire input through ONE
    task — the shape that cannot survive 100 TB unless the input is
    provably small. Two shapes are bounded by construction and
    auto-approved by the registry-wide audit
    (tests/test_global_window_audit.py):

    * child is a KEYLESS partial aggregate (``Keys: []``) — the merge
      step of a global scalar aggregate, O(running tasks) rows;
    * child is ``TakeOrderedAndProject`` / a limit — O(k) rows.

    Anything else (keyed aggregates, projections, joins) is returned
    with ``bounded=False``: its cardinality depends on data grain the
    plan cannot prove, so the query must carry a documented bound.

    Returns one dict per funnel: ``{"child_op", "child_id",
    "bounded", "reason"}``.
    """
    # Node details sections: "(N) OpName\n..." separated by blank lines.
    details: dict[str, str] = {}
    ops: dict[str, str] = {}
    for sec in re.split(r"\n\n+", plan):
        m = re.match(r"\((\d+)\) ([A-Za-z0-9_]+)", sec)
        if m:
            details[m.group(1)] = sec
            ops[m.group(1)] = m.group(2)
    sp_ids = [
        nid
        for nid, sec in details.items()
        if ops[nid] == "Exchange" and "Arguments: SinglePartition" in sec
    ]
    out: list[dict] = []
    lines = plan.splitlines()
    for nid in sp_ids:
        child_line = None
        for i, ln in enumerate(lines):
            # tree lines reference nodes as "OpName (N)"
            if re.search(rf"\bExchange \({nid}\)", ln):
                child_line = lines[i + 1] if i + 1 < len(lines) else ""
                break
        cm = re.search(r"([A-Za-z0-9_]+) \((\d+)\)", child_line or "")
        if not cm:
            out.append(
                {"child_op": "?", "child_id": None, "bounded": False,
                 "reason": f"unparseable child of Exchange({nid})"}
            )
            continue
        cop, cid = cm.group(1), cm.group(2)
        csec = details.get(cid, "")
        if cop in ("TakeOrderedAndProject", "GlobalLimit", "LocalLimit"):
            bounded, reason = True, "limit-bounded"
        elif (
            cop in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
            and "Keys: []" in csec
        ):
            bounded, reason = True, "keyless partial aggregate (O(tasks) rows)"
        else:
            bounded, reason = False, "cardinality not provable from plan"
        out.append(
            {"child_op": cop, "child_id": cid, "bounded": bounded,
             "reason": reason}
        )
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider fused spans = fewer).

    Executes the query first: under AQE the final physical plan (and its
    codegen fusion) only exists after runtime re-optimization, so an
    unexecuted plan always reports 0 subtrees."""
    df.foreach(lambda _: None)  # force execution without driver collect
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
