"""Physical-plan introspection as a user API.

The repo's scale discipline lives in tests/test_plans.py as regression
pins; this module exposes the same checks to USERS — "will this query
shuffle more than I think before I pay for it on the cluster" is a
pre-flight question, not a post-mortem one. Everything here reads the
already-planned physical tree (no execution).

Typical gate in a production job::

    audit = plan_audit(df)
    assert audit["shuffles"] <= 2 and not audit["cartesian"]
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import DataFrame

# serializes the session-global maxMetadataStringLength mutate/restore
# in physical_plan (see its docstring)
_PLAN_STR_LOCK = threading.Lock()

# join operators as they print in executedPlan().toString()
_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _split_top_level(schema: str) -> list[str]:
    """Split a struct body on commas OUTSIDE angle brackets, so nested
    column types (array<string>, struct<a:int,b:int>) stay attached to
    their column."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def physical_plan(df: DataFrame) -> str:
    """The final (post-AQE-initial) physical plan string.

    Stringified under a raised spark.sql.maxMetadataStringLength:
    the default (100) truncates each metadata value — including the
    FileScan Location — at ~97 chars + '...', so on any realistically
    deep warehouse path the table filename is cut off and
    _fact_scan_fanout would return {} (a VACUOUSLY passing gate —
    code-review r12, reproduced live). 4096 covers any sane path;
    the conf is restored afterwards. The mutate/stringify/restore is
    serialized under a module lock: the conf is session-global, so an
    unguarded concurrent audit could stringify under the default
    limit (reintroducing the truncation) or leak 4096 permanently.

    CAVEAT (ADVICE r12 #1): FileSourceScanExec builds its metadata
    map — including the possibly-truncated Location — LAZILY on first
    stringification and caches it on the operator. A frame that was
    already explained/collected before this call returns the STALE
    truncated string no matter what the conf says now, so audits must
    run on freshly constructed DataFrames. _fact_scan_fanout detects
    the stale-truncation case defensively and raises instead of
    returning a vacuous fanout map."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    with _PLAN_STR_LOCK:
        old = spark.conf.get(key, None)
        spark.conf.set(key, "4096")
        try:
            return df._jdf.queryExecution().executedPlan().toString()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def plan_audit(df: DataFrame) -> dict:
    """One dict with the scale-relevant facts of a plan:

    * ``shuffles`` — hash/range/single-partition exchanges (the only
      ones that move data by key; round-robin repartitions are counted
      separately as ``rebalances``),
    * ``joins`` — count per join-operator type,
    * ``cartesian`` — True if any unconditioned join survived
      (CartesianProduct or BroadcastNestedLoopJoin; the 1-row
      readout-join idiom trips this flag deliberately — the caller
      decides if it's the known-tiny case),
    * ``top_k`` — True when a sort+limit compiled to
      TakeOrderedAndProject (per-partition heaps) instead of a global
      Sort,
    * ``codegen_spans`` — number of WholeStageCodegen regions (wider
      spans = more of the query fused into JVM loops; NOTE under AQE
      the pre-execution plan carries no codegen markers yet, so this
      reads 0 until the query has run — audit an executed frame to
      see it),
    * ``scan_columns`` — columns actually read per parquet/orc scan
      (projection pushdown evidence),
    * ``pushed_filters`` — filters that reached each scan,
    * ``global_windows`` — window expressions with an EMPTY partition
      spec (the whole input flows through ONE task: the classic
      silent scale-killer this repo's round-2 vocab builder hit).
      Legitimate on provably tiny frames (e.g. a pct-of-total over an
      aggregated series — the reference's own W1 pattern); fatal on
      anything data-sized, where the fix is the range-partitioned
      two-phase rank/cumsum (extras.text.py vocab,
      queries_ext.q69_concurrent_sessions).
    """
    plan = physical_plan(df)
    joins = {
        node: plan.count(node)
        for node in _JOIN_NODES
        if plan.count(node)
    }
    # greedy-to-end-of-line so nested types (array<...>, struct<...>)
    # don't truncate the schema at their first '>'
    read_schemas = re.findall(r"ReadSchema: struct<(.*)>", plan)
    scan_columns = [
        [c.split(":")[0] for c in _split_top_level(s) if c]
        for s in read_schemas
    ]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "shuffles": (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        ),
        "rebalances": plan.count("Exchange RoundRobinPartitioning"),
        "joins": joins,
        "cartesian": (
            "CartesianProduct" in plan
            or "BroadcastNestedLoopJoin" in plan
        ),
        "top_k": "TakeOrderedAndProject" in plan,
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scan_columns": scan_columns,
        "pushed_filters": [p for p in pushed if p],
        "global_windows": _global_windows(df),
        "fact_scan_fanout": _fact_scan_fanout(plan),
        # cached subtrees print InMemoryTableScan INSTEAD of their
        # FileScans, so for a self-caching query fact_scan_fanout is
        # a LOWER bound (ADVICE r12 #2); non-zero here says "this
        # plan hides subtrees behind a cache boundary"
        "cached_scans": plan.count("InMemoryTableScan"),
    }


# the data-sized tables; dims (region/nation/customer/supplier/part)
# are broadcast-cheap to re-scan, facts are not
FACT_TABLES = ("orders", "lineitem", "events", "documents", "embeddings")

# every table the engine reads — a FileScan whose (possibly
# truncated) Location matches none of these is either a user table
# (fine when untruncated) or evidence of stale truncated metadata
_KNOWN_TABLES = FACT_TABLES + (
    "region", "nation", "customer", "supplier", "part",
)


def _fact_scan_fanout(plan: str) -> dict:
    """How many times each FACT table's FileScan appears in the plan —
    the duplicated-subtree detector (the r12 q92_value_gini_binned
    lesson: a frame consumed by N aliased branches is PLANNED N times;
    static exchange reuse does not bridge re-aliased aggregates, so
    the claimed 'two fact passes' can silently be four). A count of 2
    is the normal shape for bounds-then-use patterns; >= 3 means the
    query either genuinely needs multiple passes (pair joins rejoin
    the corpus per side, funnels stage passes) or is recomputing a
    subtree it should restructure/checkpoint — the fleet gate in
    tests/test_plans.py keeps the >= 3 set explicit and annotated.
    Cached subtrees print InMemoryTableScan, not FileScan, so a warm
    artifact cache legitimately lowers the count (plan_audit reports
    ``cached_scans`` alongside so the lower-bound case is visible).

    Truncation defense (ADVICE r12 #1): a FileScan stringified before
    physical_plan raised maxMetadataStringLength carries a STALE
    Location cut at ~97 chars + '...' — usually before the table
    filename — which would make this map silently empty (a vacuous
    fanout gate). Any FileScan line whose Location is truncated AND
    names no known table raises instead."""
    for line in plan.splitlines():
        if "FileScan" not in line or "Location:" not in line:
            continue
        loc_head = line.split("Location:", 1)[1].split("]", 1)[0]
        if "..." in loc_head and not any(
            f"{t}.parquet" in line for t in _KNOWN_TABLES
        ):
            raise ValueError(
                "truncated FileScan Location in a pre-stringified "
                "plan — FileSourceScanExec caches its metadata on "
                "first toString, so plan_audit must run on a freshly "
                f"constructed DataFrame; offending line: {line.strip()[:200]}"
            )
    return {
        t: n
        for t in FACT_TABLES
        if (n := len(re.findall(
            rf"FileScan [^\n]*\b{t}\.parquet", plan
        ))) >= 1
    }


def _global_windows(df: DataFrame) -> int:
    """Count window expressions whose partition spec is EMPTY.

    Read from the OPTIMIZED LOGICAL plan, where every window expr
    prints as ``windowspecdefinition(<partition cols,> <order cols,>
    frame)``: partition columns (if any) come first WITHOUT a sort
    direction, order columns carry ``ASC``/``DESC``, and the frame
    spec comes last. So the window is global when its FIRST argument
    is an order column (has a sort direction) or is already the frame
    itself (no partition AND no order — e.g. a pct-of-total
    ``SUM(x) OVER ()``)."""
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    n = 0
    for spec in re.findall(r"windowspecdefinition\(([^()]*)", lp):
        first = spec.split(",", 1)[0].strip()
        if (
            " ASC" in first
            or " DESC" in first
            or first == "specifiedwindowframe"
        ):
            n += 1
    return n
