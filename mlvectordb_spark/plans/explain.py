"""Q16 explain (declared in the reference README:311-319 as
`POST /query/explain` returning `{execution_plan: {steps: [...]}}` — never
implemented there). Catalyst gives us real plans for free; this module
shapes them into the declared response format and exposes the plan
properties worth asserting on (pushed filters, broadcast joins, codegen)."""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def explain_query(df: DataFrame, mode: str = "formatted") -> dict[str, Any]:
    """The declared explain response shape, backed by the real optimizer.

    steps = physical operators in execution order (leaves first), each with
    its interesting attributes (pushed filters, join strategy, codegen id).
    """
    text = _formatted_plan(df)
    # detail blocks look like: "(1) Scan parquet [codegen id : 1]\nOutput…";
    # numbering is bottom-up (1 = leaf), so ascending order = execution order
    steps: list[dict[str, Any]] = []
    for m in re.finditer(r"^\((\d+)\)\s+([^\n]+)$", text, flags=re.MULTILINE):
        op = m.group(2).strip()
        codegen = "[codegen id" in op
        steps.append(
            {
                "step_id": int(m.group(1)),
                "operator": re.sub(r"\s*\[codegen id : \d+\]", "", op),
                "codegen": codegen,
            }
        )
    steps.sort(key=lambda s: s["step_id"])
    return {
        "execution_plan": {"steps": steps},
        "pushed_filters": re.findall(r"PushedFilters: \[(.*?)\]", text),
        "read_schemas": re.findall(r"ReadSchema: (.*)", text),
        "uses_broadcast": "BroadcastHashJoin" in text or "BroadcastExchange" in text,
        "wholestage_codegen_stages": len(set(re.findall(r"codegen id : (\d+)", text))),
        "raw": text,
    }
