"""Physical-plan inspection utilities.

`capture_plans()` renders `.explain(formatted)` for the headline queries and
asserts the structural properties the 100TB design depends on:
  - the per-turn pipeline has NO Exchange (shuffle) between scan and sink
  - parquet scans show pushed filters / pruned schemas where expected
  - exactly one ArrowEvalPython (Python) stage in the pipeline plan
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> dict[str, int]:
    """Count physical operators from the formatted plan's numbered op list
    (the detail section repeats names, so count `(N) OpName` lines only)."""
    import re

    plan = formatted_plan(df)
    ops = re.findall(r"^\s*\(\d+\)\s+([A-Za-z]+)", plan, re.M)
    def n(name): return sum(1 for o in ops if name in o)
    return {
        "exchanges": n("Exchange"),
        "python_stages": n("ArrowEvalPython") + n("MapInPandas"),
        "codegen_ids": plan.count("[codegen id"),
        "broadcast_joins": n("BroadcastHashJoin"),
        "sortmerge_joins": n("SortMergeJoin"),
    }
