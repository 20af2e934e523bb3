"""Plan linter: mechanical detection of the scale anti-patterns that have
actually bitten this engine.

Every round's plan audit has been the same checklist run by hand — global
windows that funnel a table through one task (the tpch_q11/q15 defect
class), cartesian products, Python eval in a hot path, single-partition
exchanges. This module turns the checklist into code so tests (and users)
can assert `lint_plan(df) == []` instead of grepping explain output.

Rules are judgment-free detectors: a finding is a FACT about the plan
("this Window has an empty partition spec"), with severity reflecting how
often the pattern is a real defect. Bounded-grain exceptions (a window
over a |sources|-row aggregate is fine) are the caller's call — suppress
by rule id via `allow`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _scala_seq(seq) -> list:
    return [seq.apply(i) for i in range(seq.length())]


def _walk_logical(node):
    yield node
    for child in _scala_seq(node.children()):
        yield from _walk_logical(child)


def lint_plan(
    df: DataFrame, allow: set[str] | frozenset[str] = frozenset()
) -> list[dict[str, Any]]:
    """Findings for the physical+optimized plan of `df` (empty = clean).

    Rules:
    - `global-window` (error): a Window operator with an EMPTY partition
      spec — Spark moves every row into ONE task to evaluate it; at any
      real scale this is the serialization point. (Fine only over frames
      already reduced to bounded grain — suppress explicitly if so.)
    - `cartesian-product` (error): CartesianProductExec — |left|×|right|
      rows materialize.
    - `python-eval` (warn): BatchEvalPython (row-at-a-time Python) in the
      plan; Arrow-batched pandas eval is reported as `arrow-eval` (info)
      since it is the sanctioned escape hatch.
    - `single-partition-exchange` (warn): Exchange SinglePartition — all
      data to one task (global sorts/limits on unbounded frames).
    - `unfiltered-bnlj` (warn): BroadcastNestedLoopJoin without a join
      condition that isn't an intended crossJoin of a 1-row frame is
      usually an accidental theta join.
    """
    qe = df._jdf.queryExecution()
    findings: list[dict[str, Any]] = []

    def add(rule: str, severity: str, detail: str) -> None:
        if rule not in allow:
            findings.append(
                {"rule": rule, "severity": severity, "detail": detail}
            )

    # logical tree: windows with empty partition specs (robust — no text
    # parsing; the same node the WindowExec warning fires on)
    for node in _walk_logical(qe.optimizedPlan()):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            add(
                "global-window",
                "error",
                "Window with empty partitionSpec: every row funnels "
                "through ONE task; partition it or reduce the frame to "
                "bounded grain first",
            )

    text = qe.executedPlan().toString()
    if "CartesianProduct" in text:
        add("cartesian-product", "error", "CartesianProductExec in plan")
    if "BatchEvalPython" in text:
        add(
            "python-eval",
            "warn",
            "row-at-a-time Python UDF in plan; prefer built-ins or "
            "Arrow-batched pandas UDFs on hot paths",
        )
    if "ArrowEvalPython" in text or "MapInPandas" in text:
        add("arrow-eval", "info", "Arrow-batched Python stage in plan")
    if "Exchange SinglePartition" in text:
        add(
            "single-partition-exchange",
            "warn",
            "Exchange SinglePartition: all rows to one task (global "
            "sort/limit/aggregate on an unreduced frame?)",
        )
    if "BroadcastNestedLoopJoin" in text and "BuildRight, Cross" in text:
        add(
            "bnlj-cross",
            "info",
            "broadcast cross join (fine for 1-row/`k`-row frames; "
            "verify the build side is bounded)",
        )
    return findings


def assert_scale_clean(
    df: DataFrame, allow: set[str] | frozenset[str] = frozenset({"arrow-eval", "bnlj-cross"})
) -> None:
    """Raise if the plan carries error-severity findings (test helper)."""
    bad = [f for f in lint_plan(df, allow=allow) if f["severity"] == "error"]
    if bad:
        raise AssertionError(f"scale lint failures: {bad}")
