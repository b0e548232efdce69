"""Print operator histograms + pushed filters for every queries() entry.

Usage: python tools/plan_summary.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, ".")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from marie_ai_spark.session import get_spark

    spark = get_spark("plan-summary", master="local[8]")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:
            print(f"--- {name}: ERROR {str(ex)[:120]}")
            continue
        ops = Counter(re.findall(r"^\(\d+\) (\S+)", plan, re.M))
        pushed = [
            p[:90]
            for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if p
        ]
        print(f"--- {name}")
        print("    ops:", dict(sorted(ops.items())))
        for p in pushed:
            print("    pushed:", p)
    spark.stop()


if __name__ == "__main__":
    main()
