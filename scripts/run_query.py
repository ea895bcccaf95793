#!/usr/bin/env python3
"""Run any named operator analog from __spark_entry__.queries() — the
user surface for the 40 oracle-checked queries.

    python scripts/run_query.py --name cosine_topk [--sf-dir DIR]
        [--show N | --output PATH] [--explain]

``--explain`` prints the formatted physical plan instead of rows (the
same artifact scripts/explain_plans.py commits for the headline set).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry_mod

    names = sorted(entry_mod.queries())
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True, choices=names, metavar="QUERY",
                    help=f"one of: {', '.join(names)}")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--output", default=None, help="write result parquet here")
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from ocr_corrector_spark.session import get_spark

    spark = get_spark(app_name=f"query-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = entry_mod.queries()[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {df.count()} rows to {args.output}")
    else:
        df.show(args.show, truncate=False)
        print(f"({args.name}: {df.count()} rows total)")
    spark.stop()


if __name__ == "__main__":
    main()
