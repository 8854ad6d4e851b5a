#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Used to produce the committed plan evidence for optimization rounds
(``plans/r{N}/<query>_{before,after}.txt``). Run it twice — once from a
worktree checked out at the pre-optimization commit (--suffix before),
once from HEAD (--suffix after) — with the same --out dir.

    python tools/explain_dump.py --names q1,q2 --out plans/r08 --suffix after

The registry import resolves against PYTHONPATH/cwd, so the "before"
run is just:  cd <worktree@r7> && python <repo>/tools/explain_dump.py ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", required=True, help="comma list of registry names")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from whiterrabbit_spark.queries import build_registry
    from whiterrabbit_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name=f"explain-dump-{args.suffix}", cpus=args.cpus)
    queries, _ = build_registry()
    names = args.names.split(",")
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown registry queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    failed = []
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record and keep dumping
            plan = f"ERROR building {name}: {e}"
            failed.append(name)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
