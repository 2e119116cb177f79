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


def plan_tree(plan: str):
    """Parse a formatted plan into (ops, children, details).

    ``ops``: node id -> operator name; ``children``: node id -> child
    ids in tree order; ``details``: node id -> the node's detail
    section; ``tree_lines``: node id -> the node's TREE line (which
    carries flags like BuildRight that the detail section omits). The
    tree section indents each level by 3 columns with ``:-``/``+-``
    connectors, so parent/child structure is recoverable from the
    node-name column alone.
    """
    ops: dict[str, str] = {}
    details: dict[str, str] = {}
    for sec in re.split(r"\n\n+", plan):
        m = re.match(r"\((\d+)\) ([A-Za-z0-9_]+)", sec)
        if m:
            details[m.group(1)] = sec
            ops.setdefault(m.group(1), m.group(2))
    children: dict[str, list[str]] = {}
    tree_lines: dict[str, str] = {}
    node_re = re.compile(
        r"^(?P<prefix>[\s:+|-]*)(?P<op>[A-Za-z][A-Za-z0-9_]*)"
        r"[^(\n]*\((?P<id>\d+)\)\s*$"
    )
    stack: list[tuple[int, str]] = []  # (depth, node id)
    tree = plan.split("\n\n", 1)[0]
    for ln in tree.splitlines():
        m = node_re.match(ln)
        if not m:
            continue
        depth, nid = len(m.group("prefix")), m.group("id")
        ops.setdefault(nid, m.group("op"))
        children.setdefault(nid, [])
        tree_lines[nid] = ln
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            children[stack[-1][1]].append(nid)
        stack.append((depth, nid))
    return ops, children, details, tree_lines


# Unary operators that don't change an input's cardinality class —
# boundedness walks straight through them to the node below.
_CARDINALITY_TRANSPARENT = {
    "Project", "Filter", "BroadcastExchange", "Exchange", "Sort",
    "AQEShuffleRead", "InputAdapter", "ColumnarToRow", "Coalesce",
    "ReusedExchange", "WholeStageCodegen", "Window", "WindowGroupLimit",
    # scalar Python UDF nodes map rows 1:1 (unlike MapInPandas/Generate)
    "ArrowEvalPython", "BatchEvalPython",
}


_JOIN_OPS = {
    "BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
}


def _bounded_build(
    nid: str, ops: dict, children: dict, details: dict, _depth: int = 0
) -> tuple[bool, str]:
    """Is the subtree under ``nid`` provably O(1)/O(k) rows?

    Bounded by construction (recursively): a KEYLESS aggregate (one
    row), a limit/top-k, a LocalTableScan (driver-literal rows) — plus
    closure rules: any aggregate's output is at most its input (keyed
    agg over a bounded frame stays bounded), a join of two bounded
    sides emits at most K*M rows, and a union of bounded sides is
    bounded. A file scan, a checkpointed-RDD scan, or a keyed
    aggregate/join over unbounded input has data-dependent cardinality
    the plan cannot prove — the query must document its bound in the
    audit allowlist.
    """
    if _depth > 200:
        return False, "plan tree too deep"
    op, sec = ops.get(nid, "?"), details.get(nid, "")
    kids = children.get(nid, [])
    if op in ("TakeOrderedAndProject", "GlobalLimit", "LocalLimit"):
        return True, f"limit-bounded ({op})"
    if op in ("HashAggregate", "SortAggregate", "ObjectHashAggregate"):
        if "Keys: []" in sec:
            return True, "keyless aggregate (1 row)"
        if len(kids) == 1:  # keyed: |output| <= |input|
            ok, why = _bounded_build(kids[0], ops, children, details, _depth + 1)
            return (ok, f"keyed aggregate over bounded input ({why})" if ok
                    else why)
    if op == "LocalTableScan":
        return True, "driver-literal rows"
    if op == "Range":
        # spark.range(...) — cardinality is a plan-time literal
        m = re.search(r"Range \((-?\d+), (-?\d+), step=(-?\d+)", sec)
        if m:
            lo, hi, step = map(int, m.groups())
            n = max(0, (hi - lo + (step - (1 if step > 0 else -1))) // step)
            if 0 <= n <= 65536:
                return True, f"literal Range ({n} rows)"
            return False, f"literal Range too large ({n} rows)"
    if op in _CARDINALITY_TRANSPARENT and len(kids) == 1:
        return _bounded_build(kids[0], ops, children, details, _depth + 1)
    if op in _JOIN_OPS and len(kids) == 2:
        okl, wl = _bounded_build(kids[0], ops, children, details, _depth + 1)
        okr, wr = _bounded_build(kids[1], ops, children, details, _depth + 1)
        if okl and okr:
            return True, f"join of bounded sides ({wl}; {wr})"
        return False, wl if not okl else wr
    if op == "Union" and kids:
        whys = []
        for k in kids:
            ok, why = _bounded_build(k, ops, children, details, _depth + 1)
            if not ok:
                return False, why
            whys.append(why)
        return True, f"union of bounded sides ({'; '.join(whys)})"
    return False, f"cardinality of {op} not provable from plan"


def nested_loop_joins(plan: str) -> list[dict]:
    """Every CartesianProduct / BroadcastNestedLoopJoin in a formatted
    plan, with its build side classified for boundedness.

    A nested-loop join re-scans its build side for every streamed row —
    survivable at 100 TB only when the build side is provably tiny
    (the broadcast-scalar crossJoin pattern). ``bounded=True`` when the
    BNLJ's build side (or, for CartesianProduct, either side) bottoms
    out in a keyless aggregate / limit / literal local table through
    cardinality-transparent unary nodes; anything else must carry a
    documented entry in the registry-wide audit
    (tests/test_plan_audits.py), same exact-both-ways convention as the
    SinglePartition funnel audit.
    """
    ops, children, details, tree_lines = plan_tree(plan)
    out: list[dict] = []
    for nid, op in ops.items():
        if op not in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            continue
        kids = children.get(nid, [])
        if len(kids) != 2:
            out.append(
                {"op": op, "id": nid, "bounded": False,
                 "reason": f"could not locate both children of {op}({nid})"}
            )
            continue
        if op == "BroadcastNestedLoopJoin":
            # BuildLeft/BuildRight only appears on the TREE line
            build = kids[0] if "BuildLeft" in tree_lines.get(nid, "") else kids[1]
            bounded, reason = _bounded_build(build, ops, children, details)
        else:
            bl, rl = _bounded_build(kids[0], ops, children, details)
            br, rr = _bounded_build(kids[1], ops, children, details)
            bounded, reason = (bl or br), (rl if bl else rr if br else rl)
        out.append({"op": op, "id": nid, "bounded": bounded, "reason": reason})
    return out


# Python-evaluation operators: rows leave the JVM for the Python worker.
PYTHON_EVAL_OPS = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
    "PythonMapInArrow", "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInPandasWithState", "TransformWithStateInPandas",
    "AggregateInPandas", "WindowInPandas", "BatchEvalPythonUDTF",
    "ArrowEvalPythonUDTF", "PythonUDTF",
)


def python_eval_nodes(plan: str) -> list[str]:
    """Sorted distinct Python-eval operator names in a formatted plan.

    Python evaluation is the slow path — acceptable only where built-in
    JVM expressions genuinely can't express the work (byte-level
    codecs, vectorized numpy kernels, the deliberate UDF-surface
    demos). The registry-wide audit (tests/test_plan_audits.py) holds
    every registered query to a documented allowlist of these nodes.
    """
    return sorted({op for op in PYTHON_EVAL_OPS if re.search(rf"\b{op}\b", plan)})


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
