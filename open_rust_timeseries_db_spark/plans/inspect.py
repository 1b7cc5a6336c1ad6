"""Parse `explain` output into checkable facts.

Everything works on the string form of the physical plan (the same text
`df.explain("formatted")` prints), so the helpers hold across Spark
minor versions without touching JVM internals.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what .explain(mode) prints)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan (column pruning)."""
    plan = plan_string(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.

    Counts `Exchange hashpartitioning/rangepartitioning/...` nodes;
    BroadcastExchange is deliberately excluded (broadcasts are the
    cheap alternative being asserted FOR).
    """
    plan = plan_string(df, mode="simple")
    # \bExchange\b does not match inside BroadcastExchange or
    # ReusedExchange (no word boundary there).
    return len(re.findall(r"\bExchange\b", plan))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, mode="simple")


def has_wholestage_codegen(df: DataFrame) -> bool:
    """True if at least one whole-stage-codegen subtree compiles.

    Uses explain mode="codegen": with AQE enabled the simple plan is
    `isFinalPlan=false` and carries no WholeStageCodegen markers until
    executed, but codegen mode compiles the current plan directly.
    """
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees", plan_string(df, mode="codegen")
    )
    return bool(m) and int(m.group(1)) > 0


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan contains any Python-side evaluation operator
    (BatchEvalPython = row-at-a-time UDF, ArrowEvalPython = pandas UDF,
    FlatMapGroupsInPandas/MapInPandas = grouped/map UDFs)."""
    plan = plan_string(df, mode="simple")
    return bool(
        re.search(r"BatchEvalPython|ArrowEvalPython|InPandas", plan)
    )
