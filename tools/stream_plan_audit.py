#!/usr/bin/env python
"""Streaming micro-batch plan audit (VERDICT r6 #6): the 11
``streaming_*`` registry queries run a REAL stream to completion at
construction, so the batch plan auditor records them as skip lines.
This tool runs each one at sf0.001, captures the EXECUTED micro-batch
physical plan from the drained StreamingQuery (see
``streaming._LAST_STREAM_PLANS``), and emits one JSON line per query
with streaming-aware counters — state-store operator placement is
exactly where a scale-killer could hide unaudited:

* ``state_ops`` — StateStoreSave/Restore, SessionWindowStateStore*,
  StreamingDeduplicate, StreamingSymmetricHashJoin, FlatMapGroupsWith
  State nodes (name -> count). Every stateful op keys the state store
  by the grouping/window columns; a missing partial-agg in front of it
  or a state op keyed on a row-unique column is the red flag.
* ``exchanges`` / ``required_by_stateful`` — shuffle count and how many
  exist solely to co-locate state (REQUIRED_BY_STATEFUL_OPERATOR).
* ``partial_before_state`` — True when a partial_/merge_ HashAggregate
  stack precedes StateStoreRestore (map-side combine engaged: per-batch
  rows collapse BEFORE touching state, the 100 TB requirement).
* ``scans`` — micro-batch source scans (file-stream readers).

Usage: python tools/stream_plan_audit.py [--sf DIR] [--merge]
  --merge rewrites PLAN_AUDIT.jsonl, replacing each streaming query's
  ``{"skipped": "streaming"}`` line with its real audited line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STATE_NODES = (
    "StateStoreSave",
    "StateStoreRestore",
    "SessionWindowStateStoreSave",
    "SessionWindowStateStoreRestore",
    "StreamingDeduplicate",
    "StreamingSymmetricHashJoin",
    "FlatMapGroupsWithState",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
    "EventTimeWatermark",
)


def audit_stream_plan(plan: str) -> dict:
    """Counters over an ``explainInternal`` tree-format physical plan
    (streaming plans don't offer the numbered 'formatted' mode)."""
    state_ops: dict[str, int] = {}
    for node in STATE_NODES:
        n = len(re.findall(rf"\b{node}\b", plan))
        if n:
            state_ops[node] = n
    exchanges = len(re.findall(r"\bExchange ", plan))
    req_stateful = plan.count("REQUIRED_BY_STATEFUL_OPERATOR")
    scans = len(
        re.findall(r"\b(?:FileScan|BatchScan|MicroBatchScan|Scan) ", plan)
    )
    # partial agg upstream of state restore: in tree order the restore
    # line appears ABOVE its child partial aggregate, so check that a
    # partial_ HashAggregate exists after the LAST StateStoreRestore
    # (physical children print below their parents).
    partial_ok = None
    restores = [
        m.start()
        for m in re.finditer(
            r"StateStoreRestore|SessionWindowStateStoreRestore", plan
        )
    ]
    if restores:
        tail = plan[restores[-1]:]
        partial_ok = bool(
            re.search(r"HashAggregate\(keys=.*functions=\[partial_", tail)
        )
    return {
        "state_ops": state_ops,
        "exchanges": exchanges,
        "required_by_stateful": req_stateful,
        "scans": scans,
        "partial_before_state": partial_ok,
        "watermarked": "EventTimeWatermark" in plan
        or "-T" in plan.split("\n")[1 if "\n" in plan else 0],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--merge", action="store_true")
    args = ap.parse_args()

    from whiterrabbit_spark.extensions import streaming as st
    from whiterrabbit_spark.queries import build_registry
    from whiterrabbit_spark.session import get_spark

    spark = get_spark(app_name="stream-plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_registry()
    names = [n for n in queries if n.startswith("streaming_")]
    lines = []
    n_errors = 0
    for name in names:
        st._LAST_STREAM_PLANS.clear()
        try:
            df = queries[name](spark, args.sf)
            df.collect()  # finishing pass executes batch-side
            plans = list(st._LAST_STREAM_PLANS)
            if not plans:
                out = {"query": name, "error": "no plan captured"}
                n_errors += 1
            else:
                # one query may drain >1 stream (stream-stream joins
                # land both sides in one query); audit each drained plan
                out = {
                    "query": name,
                    "n_streams": len(plans),
                    **audit_stream_plan(plans[-1][1]),
                }
                if len(plans) > 1:
                    out["earlier_streams"] = [
                        audit_stream_plan(p) for _, p in plans[:-1]
                    ]
        except Exception as e:
            out = {"query": name, "error": str(e)[:200]}
            n_errors += 1
        lines.append(out)
        print(json.dumps(out))
    spark.stop()

    if args.merge and not n_errors:
        path = os.path.join(REPO, "PLAN_AUDIT.jsonl")
        by_name = {r["query"]: r for r in lines}
        rewritten = []
        with open(path) as fh:
            for raw in fh:
                rec = json.loads(raw)
                if rec.get("skipped") == "streaming" and rec[
                    "query"
                ] in by_name:
                    rec = {
                        **by_name.pop(rec["query"]),
                        "source": "stream_plan_audit",
                    }
                rewritten.append(rec)
        for rec in by_name.values():  # any not present as skip lines
            rewritten.append({**rec, "source": "stream_plan_audit"})
        with open(path, "w") as fh:
            for rec in rewritten:
                fh.write(json.dumps(rec) + "\n")
        print(f"merged {len(lines)} streaming lines into {path}")
    sys.exit(1 if n_errors else 0)


if __name__ == "__main__":
    main()
