"""Per-node scale-killer detection over a physical plan.

The round-3/4 guard matched `CartesianProduct` / `BroadcastNestedLoopJoin`
in the plan STRING and exempted the whole query when any key-free
aggregate appeared anywhere in the plan. That gate was plan-wide: a
genuine data-sized cartesian in a query that also computes a global
scalar passed silently (r04 advisor finding, tools/plan_guard.py:98).

This module walks the actual SparkPlan tree through py4j and judges each
join node on its OWN input sides:

- ``CartesianProduct`` is bounded iff at least one side is provably
  one-row (a key-free aggregate) or a literal driver-side table
  (``LocalTableScan`` — its rows are plan constants, they cannot grow
  with the data), making the product linear in the other side.
- ``BroadcastNestedLoopJoin`` is bounded iff its BUILD side (the side
  that gets broadcast) is such a bounded subtree; a one-row *stream*
  side does not help — the broadcast itself would OOM at scale.

Everything else is a scale-killer flag for the caller to compare against
its sanctioned-by-contract list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: single-child wrappers we descend through when probing a side for a
#: scalar aggregate; anything NOT in this set that isn't an aggregate or
#: leaf stops the walk conservatively (treated as data-sized)
_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _children(node) -> list:
    """Child plan nodes, unwrapping the leaf-like wrappers the SparkPlan
    ``children()`` API hides a subtree behind: AdaptiveSparkPlanExec
    (``executedPlan()`` = its current physical plan — the initial plan
    when nothing ran yet), QueryStageExec (``plan()``), and
    ReusedExchangeExec (``child()`` — the exchange it aliases)."""
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        return [node.executedPlan()]
    if "QueryStage" in name:
        return [node.plan()]
    if name.startswith("ReusedExchange"):
        try:
            return [node.child()]
        except Exception:
            return []
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _is_keyfree_aggregate(node) -> bool:
    if not any(node.nodeName().startswith(a) for a in _AGG_NODES):
        return False
    try:
        return node.groupingExpressions().isEmpty()
    except Exception:
        # fallback: the simple string renders grouping keys first
        return "keys=[]" in node.simpleString(2)


def _is_driver_literal_rdd_scan(node) -> bool:
    """True only for ``Scan ExistingRDD`` leaves whose RDD lineage
    bottoms out in a ``ParallelCollectionRDD`` — i.e. the rows crossed
    the py4j bridge from the driver (``spark.createDataFrame``), so the
    side is bounded by driver memory, never by table data volume.

    Checkpointed / localCheckpointed DataFrames (the repo's
    ``cut_lineage``, routinely applied to data-sized frames) compile to
    the SAME ``Scan ExistingRDD`` nodeName but originate from
    ``LocalCheckpointRDD`` / ``ReliableCheckpointRDD`` — those must NOT
    be treated as bounded (r05 advisor finding). Any probe failure is
    conservatively unbounded."""
    if not node.nodeName().startswith("Scan ExistingRDD"):
        return False
    try:
        cur = node.rdd()
        for _ in range(32):
            deps = cur.dependencies()
            if deps.isEmpty():
                break
            cur = deps.head().rdd()
        return cur.getClass().getName().endswith("ParallelCollectionRDD")
    except Exception:
        return False


def _is_literal_leaf(node) -> bool:
    return node.nodeName().startswith(
        ("LocalTableScan", "EmptyRelation")
    ) or _is_driver_literal_rdd_scan(node)


def _is_bounded_side(node) -> bool:
    """True when the subtree rooted at ``node`` provably yields a
    data-independent number of rows.

    Recursive: a key-free (global) aggregate bounds its subtree to one
    row no matter what feeds it; literal leaves (LocalTableScan, and
    ``Scan ExistingRDD`` proven to wrap a driver-side collection — see
    :func:`_is_driver_literal_rdd_scan`) are plan constants; and any
    other node is bounded iff ALL its inputs are — a join/union/project
    over one-row sides stays one-row-ish (e.g. the common
    ``scalarA.crossJoin(scalarB)`` constants frame), while a node with
    zero children that isn't a literal leaf (FileScan, checkpoint scan,
    ReusedExchange we can't resolve) is data-sized.

    Row-MULTIPLYING nodes break the all-children rule: a
    ``Generate``/``explode`` or ``Expand`` over a one-row key-free
    ``collect_list`` aggregate has a bounded child yet data-sized output
    (r05 advisor finding — the aggregate packed table data into an array
    the Generate unpacks right back out). Those nodes are bounded only
    when their subtree never touches a data-sized leaf at all (exploding
    a plan constant stays a plan constant)."""
    name = node.nodeName()
    if name.startswith(("Generate", "Expand")):
        return _all_leaves_literal(node)
    if _is_keyfree_aggregate(node):
        return True
    if _is_literal_leaf(node):
        return True
    kids = _children(node)
    if not kids:
        return False
    return all(_is_bounded_side(k) for k in kids)


def _all_leaves_literal(node) -> bool:
    """True iff every leaf under ``node`` is a plan-constant literal —
    the subtree's cardinality then cannot depend on table data volume,
    whatever aggregates/generates sit in between."""
    stack = [node]
    while stack:
        n = stack.pop()
        kids = _children(n)
        if not kids:
            if not _is_literal_leaf(n):
                return False
        else:
            stack.extend(kids)
    return True


def _build_side_child(node) -> object | None:
    kids = _children(node)
    if len(kids) != 2:
        return None
    try:
        side = node.buildSide().toString()
    except Exception:
        side = "BuildRight"
    return kids[0] if "Left" in side else kids[1]


def scale_killer_flags(df: DataFrame) -> list[str]:
    """Flags for every CartesianProduct / BroadcastNestedLoopJoin node in
    ``df``'s executed physical plan whose input sides are NOT bounded by
    construction (see module docstring). Empty list = plan is clean."""
    root = df._jdf.queryExecution().executedPlan()
    flags: list[str] = []
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        kids = _children(node)
        if name.startswith("CartesianProduct"):
            if not any(_is_bounded_side(k) for k in kids):
                flags.append("CartesianProduct")
        elif name.startswith("BroadcastNestedLoopJoin"):
            build = _build_side_child(node)
            if build is None or not _is_bounded_side(build):
                flags.append("BroadcastNestedLoopJoin(non-scalar-build)")
        stack.extend(kids)
    return flags
