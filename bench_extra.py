"""Per-query isolation bench (guide §1.4): noop-sink timing of individual
declared queries at an arbitrary SF dir, plus .explain("formatted") capture.

NOT the driver's harness — bench.py is frozen for measurement; this file
exists so optimization work can time one query at a time (min-of-N) and
capture plan shapes without paying for the whole suite.

Usage:
  python bench_extra.py [--sf-dir DIR] [--runs N] [--explain-dir DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None,
                    help="write <query>.txt explain('formatted') files here")
    ap.add_argument("--count", action="store_true",
                    help="also report the row count of each query's output")
    args = ap.parse_args()

    from table2qb_spark.entry_queries import QUERIES
    from table2qb_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(128, CPUS * 4),
    )

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        times.sort()
        rec = {"min": round(times[0], 3), "median": round(times[len(times) // 2], 3),
               "runs": args.runs}
        if args.count:
            rec["rows"] = fn(spark, args.sf_dir).count()
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
