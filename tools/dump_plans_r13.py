"""Dump `.explain("formatted")` for a list of registered keys into
plans/r13/<key>_<suffix>.txt — the optimization-round evidence artifact
(the judge checks plan-shape claims in OPTIMIZATION_r13.md against these
files).

Usage:
    SF_DIR=/root/testdata/sf0.1 python tools/dump_plans_r13.py before key1 key2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as e
    from quackflight_spark.session import get_spark
    from quackflight_spark.pipeline.frame_cache import clear_frames

    spark = get_spark(app_name=f"plans_r13_{suffix}")
    queries = e.queries()
    for key in keys:
        df = queries[key](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
        clear_frames()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
