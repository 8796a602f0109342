"""Physical-plan lint helpers: unpartitioned-window detection.

An unpartitioned window (``Window.partitionBy().orderBy(...)`` or a
whole-frame aggregate window) funnels its entire input through ONE
task — the canonical scale killer when the frame grows with data.  The
repo's discipline is:

* data-proportional frames must use ``orderBy().limit(k)``
  (TakeOrderedAndProject) or the two-phase scan primitives in
  ``operators/prefix_sum.py`` — never a global window;
* a global window is legitimate only over a PROVABLY BOUNDED frame:
  either bounded in-plan (the window's input chain passes through a
  ``GlobalLimit`` / ``TakeOrderedAndProject`` / ``WindowGroupLimit``,
  so at most k rows ever reach the single partition — detected here
  automatically), or bounded by the data model (calendar-grain frames,
  event-type marginals, |classes|-row aggregates — enumerated in the
  explicit allowlist in tests/test_plan_lint.py).

Detection reads Spark's *formatted* explain output:

* a Window detail section's ``Arguments:`` line carries up to three
  top-level bracket groups ``[exprs], [partition], [order]``; with two
  groups the second is an order spec (recognizable by its
  ``NULLS FIRST/LAST`` tags — unpartitioned) or a partition spec
  (partition-only window — fine); one group means a whole-frame
  aggregate window (unpartitioned);
* the plan tree (``+- Window (13)`` art) gives each node's input
  chain; the chain is followed through single-child pass-through
  nodes until a bounding node or anything else (join, scan, union,
  aggregate) is reached.
"""

from __future__ import annotations

import re

#: nodes that pass rows through 1:1 (or fewer) without changing the
#: bounded/unbounded character of the stream
_PASS_THROUGH = {
    "Sort",
    "Exchange",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "AQEShuffleRead",
    "Project",
    "Filter",
    "ColumnarToRow",
    "InputAdapter",
    "Coalesce",
    "WholeStageCodegen",
    "ReusedExchange",
    "InMemoryTableScan",  # cached frame: bounded iff its plan was; the
    # cached plan is linted separately via the detail sections
}

#: nodes that cap the row count flowing upward at a constant k.
#: LocalLimit is deliberately ABSENT: it only caps rows per partition
#: (k × numPartitions, which grows with input splits), so a bare
#: LocalLimit between a Window and its source is NOT a bound.  Catalyst
#: always pairs LocalLimit with a GlobalLimit / CollectLimit /
#: TakeOrderedAndProject in the shapes we emit, and those are the
#: entries that clear the window.  (Round-6 ADVICE low.)
_BOUNDING = {
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "WindowGroupLimit",
}


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _top_level_groups(args: str) -> list[str]:
    groups: list[str] = []
    paren = bracket = 0
    start = None
    for i, ch in enumerate(args):
        if ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif ch == "[":
            if paren == 0 and bracket == 0:
                start = i
            bracket += 1
        elif ch == "]":
            bracket -= 1
            if paren == 0 and bracket == 0 and start is not None:
                groups.append(args[start + 1 : i])
                start = None
    return groups


def _unpartitioned_window_ids(plan: str) -> dict[int, str]:
    """node id -> Arguments text, for Window nodes with an empty
    partition spec (see module docstring for the group heuristics)."""
    out: dict[int, str] = {}
    sections = re.split(r"\n\((\d+)\) ", plan)
    for i in range(1, len(sections) - 1, 2):
        node_id = int(sections[i])
        body = sections[i + 1]
        header = body.splitlines()[0].strip()
        if header not in ("Window", "WindowInPandas"):
            continue
        m = re.search(r"^Arguments: (.*)$", body, re.M)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and "NULLS" not in groups[1]:
            continue  # partition-only window
        out[node_id] = m.group(1)
    return out


_TREE_NODE = re.compile(r"^([\s:+|-]*)\*?\(?\d*\)?\s*([A-Za-z][A-Za-z0-9]*)[^(]*\((\d+)\)\s*$")


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """(depth, name, id) per tree line, in pre-order, across all tree
    blocks (main plan + subqueries).  Depth is indentation//3."""
    nodes = []
    for line in plan.splitlines():
        if line.startswith("== ") or not line.strip():
            continue
        m = _TREE_NODE.match(line)
        if not m:
            continue
        indent, name, node_id = m.groups()
        nodes.append((len(indent) // 3, name, int(node_id)))
    return nodes


def _chain_is_bounded(nodes: list[tuple[int, str, int]], node_id: int) -> bool:
    """Follow ``node_id``'s single-child input chain through
    pass-through nodes; True iff it reaches a bounding node."""
    idx = next((i for i, (_, _, nid) in enumerate(nodes) if nid == node_id), None)
    if idx is None:
        return False
    depth = nodes[idx][0]
    want = depth + 1
    for d, name, _ in nodes[idx + 1 :]:
        if d <= depth:
            return False  # left the subtree
        if d != want:
            continue  # deeper levels under an already-visited child
        if name in _BOUNDING:
            return True
        if name in _PASS_THROUGH:
            want = d + 1
            continue
        return False  # join / scan / aggregate / union: unbounded input
    return False


def global_window_findings(plan: str) -> list[str]:
    """Human-readable findings for unpartitioned windows whose input is
    NOT provably bounded in-plan.  Empty list == lint-clean."""
    flagged = _unpartitioned_window_ids(plan)
    if not flagged:
        return []
    nodes = _parse_tree(plan)
    return [
        f"Window({nid}): {args[:200]}"
        for nid, args in sorted(flagged.items())
        if not _chain_is_bounded(nodes, nid)
    ]
