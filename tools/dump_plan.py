"""Dump ``explain("formatted")`` for named declared queries into
``plans/<round>/<query>_<tag>.txt`` — the before/after plan evidence the
optimization round commits next to OPTIMIZATION_<round>.md.
``SPARK_GRAFT_PLAN_ROUND`` picks the round directory (default r11).

Usage: python tools/dump_plan.py <tag> <query> [<query> ...]
       python tools/dump_plan.py before docs_substring_dedup ml_price_model

Plans are built (not executed) at the given fixture (default sf0.001 so
construction-time work — index builds, codebook collects — stays cheap;
plan SHAPE is identical across sfs, only AQE's runtime stats differ).
SPARK_GRAFT_PLAN_SF_DIR overrides.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

_OUT = os.path.join(
    "/root/repo/plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")
)


def main() -> int:
    import __spark_entry__ as mod
    from jobanalytics_bigdataproject_spark.plans import inspect
    from jobanalytics_bigdataproject_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("dump-plan")
    os.makedirs(_OUT, exist_ok=True)
    qs = mod.queries()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = inspect.formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED to build plan: {e}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(_OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
