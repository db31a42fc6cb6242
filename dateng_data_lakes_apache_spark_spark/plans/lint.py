"""Structural scale-lint over physical plan trees.

The one plan shape that silently kills a 100 TB run is an
``Exchange SinglePartition`` funneling DATA-SCALE rows through one
task (global window, coalesce(1), ...). It is fine when the funneled
input is provably reduced first — an aggregate (per-partition counts,
global sums) or a limit bounds the row count before the funnel.

``single_partition_violations`` parses a FORMATTED plan (tree section
+ per-node detail section — the details are needed to tell a
checkpointed data-scale ``Scan ExistingRDD`` from a bounded
``createDataFrame`` literal, which print identically in tree form) and
returns every SinglePartition exchange whose subtree reaches a
data-scale scan WITHOUT passing through a row-reducing node on that
branch. Dimension-table scans never count: a global window over
nation/region/customer/part/supplier is dim-scale by catalog contract.

Used registry-wide by tests/test_plan_lint.py (VERDICT r6 item 6) with
an explicit allowlist for the documented dim-only operators.
"""

from __future__ import annotations

import re

#: Catalog tables that are data-scale at the target deployment; a scan
#: of one of these below an un-reduced SinglePartition exchange is the
#: 100 TB killer the lint exists to catch.
FACT_TABLES = ("events", "lineitem", "orders", "documents", "embeddings")

#: Node kinds that bound the row count of everything above them.
_REDUCERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "LocalLimit",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
)

_NODE_ID = re.compile(r"\((\d+)\)")
_DETAIL_HEADER = re.compile(r"^\((\d+)\) (.+?)\s*$")


def _node_depth(line: str) -> int:
    """Depth = column where the node text starts in the tree drawing."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _parse_formatted(plan: str):
    """(tree_lines, {node_id: detail_text}) from a formatted plan."""
    lines = plan.splitlines()
    tree: list[str] = []
    i = 0
    while i < len(lines) and not _DETAIL_HEADER.match(lines[i]):
        tree.append(lines[i])
        i += 1
    details: dict[int, list[str]] = {}
    cur = None
    for ln in lines[i:]:
        m = _DETAIL_HEADER.match(ln)
        if m:
            cur = int(m.group(1))
            details[cur] = [ln]
        elif cur is not None:
            details[cur].append(ln)
    return tree, {k: "\n".join(v) for k, v in details.items()}


def _is_data_scale_scan(detail: str) -> bool:
    header = detail.splitlines()[0]
    if "InMemoryTableScan" in header:
        # persisted derivative — provenance unknown to the plan, assume
        # data-scale (callers aggregating it first are covered anyway)
        return True
    if "Scan ExistingRDD" in header:
        # checkpointed RDDs are data-scale; createDataFrame literals
        # (applySchemaToPythonRDD call-site) are driver-bounded
        return "checkpoint" in detail.lower()
    if "Scan parquet" in header or "FileScan" in header:
        return any(t in detail for t in FACT_TABLES)
    return False


def single_partition_violations(formatted: str) -> list[str]:
    """Offending ``Exchange SinglePartition`` nodes in a formatted plan.

    A SinglePartition exchange is a violation when some branch of its
    subtree reaches a data-scale scan without an intervening
    row-reducing node (aggregate / limit) on that branch. Returns the
    offending nodes' detail headers (e.g. ``(21) Exchange``).
    """
    tree, details = _parse_formatted(formatted)
    depths = [_node_depth(ln) for ln in tree]

    def node_id(line: str):
        m = _NODE_ID.search(line)
        return int(m.group(1)) if m else None

    violations = []
    for i, ln in enumerate(tree):
        nid = node_id(ln)
        if nid is None:
            continue
        detail = details.get(nid, "")
        header = detail.splitlines()[0] if detail else ""
        if "Exchange" not in header or "SinglePartition" not in detail:
            continue
        if "ReusedExchange" in header:
            continue  # its source exchange is checked where defined
        d = depths[i]
        # walk the subtree (deeper lines until depth falls back ≤ d),
        # tracking reducer-ancestor depths on the current DFS path —
        # a scan is covered iff a reducer sits above it in its branch
        reducer_depths: list[int] = []
        bad = False
        for j in range(i + 1, len(tree)):
            dj = depths[j]
            if tree[j].strip() and dj <= d:
                break
            cid = node_id(tree[j])
            if cid is None:
                continue
            cdetail = details.get(cid, "")
            cheader = cdetail.splitlines()[0] if cdetail else ""
            reducer_depths = [r for r in reducer_depths if r < dj]
            if any(r in cheader for r in _REDUCERS):
                reducer_depths.append(dj)
            elif _is_data_scale_scan(cdetail) and not reducer_depths:
                bad = True
                break
        if bad:
            violations.append(header)
    return violations
