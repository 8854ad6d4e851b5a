#!/usr/bin/env python
"""Mechanical physical-plan audit of every registry query.

Emits one JSON line per query: parquet scan count, Exchange count (data
shuffles), broadcast count, and the load-bearing node names (WindowGroupLimit,
TakeOrderedAndProject, SortMergeJoin, mapInPandas, ...). This regenerates the
evidence behind PLANS.md instead of hand-counting — run after any operator
change and diff the output.

    python tools/plan_audit.py [--sf DIR] [--names q1,q2,...]

Streaming-sink queries (the `streaming_*` family) and index-building queries
execute real jobs when constructed, so they are skipped by default; pass
--include-effectful to audit them too.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# runnable as `python tools/plan_audit.py` from the repo root or anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose *construction* runs real jobs (model fits, index builds,
# collect-at-build scale probes) — auditing their plan would execute them
EFFECTFUL_PREFIXES = ("streaming_", "ann_ivf_index", "bpe_learn",
                      "bucket_join",
                      "pack_sequences", "quality_classifier",
                      "semantic_dedup", "keep_best_dedup", "dedup_clusters",
                      "edit_distance_pairs", "corpus_report",
                      # collect-at-construction round-3 builders: the
                      # per-dim stats fold and the partial-Gram passes
                      "quantize_error", "embedding_pca",
                      "whiten_embeddings",
                      # node-count job at construction + 10 chained
                      # iterations make the printed plan meaningless
                      "pagerank",
                      # localCheckpoint + driver prefix-max offsets run
                      # the range shuffle at construction
                      "lateness_profile",
                      # pack_shards machinery: localCheckpoint + driver
                      # offsets at construction (pack_manifest already
                      # finishes with collect-free reporting)
                      "pack_manifest", "pack_shards",
                      # split counts + calibration-order-statistic
                      # selection run real jobs at construction
                      "conformal")
# Builders with a SMALL construction-time probe (one agg job at audit
# scale: the approx-distinct guards behind ecdf_attach/spearman/
# mannwhitney, line_dedup's 1% hot-digest sample, equi_depth's row
# count) are NOT listed — at sf0.001 those cost milliseconds and
# skipping them would hide the plans the audit exists to check.


def audit_plan(plan: str) -> dict:
    def n(pattern: str) -> int:
        return len(re.findall(pattern, plan))

    nodes = sorted(
        {
            m
            for m in re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
            if m
            in {
                "WindowGroupLimit", "TakeOrderedAndProject", "SortMergeJoin",
                "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                "Window", "Generate", "Expand", "MapInPandas", "FlatMapGroupsInPandas",
                "ObjectHashAggregate", "SortAggregate",
            }
        }
    )
    return {
        "parquet_scans": n(r"\(\d+\) (?:Batch)?Scan parquet"),
        "exchanges": n(r"\(\d+\) Exchange"),
        "broadcasts": n(r"\(\d+\) BroadcastExchange"),
        "key_nodes": nodes,
        # v1 scans print PushedFilters, DSv2 BatchScans print DataFilters
        # — either non-empty means the predicate reached the reader
        "pushed_filters": bool(
            re.search(r"(?:Pushed|Data)Filters: \[[^\]]", plan)
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", default=None, help="comma list; default all")
    ap.add_argument("--include-effectful", action="store_true")
    args = ap.parse_args()

    from whiterrabbit_spark.queries import build_registry
    from whiterrabbit_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cpus=8)
    queries, _ = build_registry()
    names = args.names.split(",") if args.names else list(queries)
    for name in names:
        if not args.include_effectful and name.startswith(EFFECTFUL_PREFIXES):
            continue
        try:
            df = queries[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = {"query": name, **audit_plan(plan)}
        except Exception as e:  # audit must cover every query, even broken ones
            out = {"query": name, "error": str(e)[:200]}
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
