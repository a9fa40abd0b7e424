"""Physical-plan inspection helpers.

The 100 TB posture is only real if the plans prove it: filters reaching the
parquet scan (PushedFilters), projections narrowing ReadSchema, dimension
joins broadcasting, shuffle counts bounded. These helpers let tests assert
those properties instead of trusting the code's intent (SURVEY.md §4).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`.explain("formatted")` as a string (captured from the Python-side
    print — version-stable across Spark 3.x/4.x py4j internals)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded). Formatted mode names nodes as ``(N) Exchange``
    detail blocks."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE))


def codegen_spans(df: DataFrame) -> int:
    """Whole-stage-codegen span count, from the *executed* plan (under AQE
    the pre-execution explain hides ``*(id)`` markers). Triggers one
    execution of the frame."""
    df.collect()  # finalize THIS frame's QueryExecution under AQE
    executed = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", executed)))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns in the first scan's ReadSchema — proves column pruning."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
