"""User-facing plan & footprint introspection — the engine's observability
surface, mirroring the reference's only observability ops (PrintMemUsage,
hnsw.cc:370-433, and the SizeTest footprint phases, hnsw.cc:435-483) in
Spark terms: what did this query's physical plan do (shuffles, joins,
pushdown, codegen), and what do the cached index artifacts occupy.

``plan_summary`` is the single source of truth for plan facts —
tools/gen_plans.py renders PLANS.md from it, and tests assert against it,
so the evidence file and the library can never diverge.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def plan_summary(df: DataFrame) -> dict:
    """Load-bearing facts of the EXECUTED physical plan (AQE-final when
    available): exchange counts, join strategies, top-k operator, codegen
    spans, Python stages, bucket pruning, pushed filters, read schemas."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
              if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    sel = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    return {
        "shuffle_exchanges": len(re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "join_strategies": sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct)", plan))),
        "take_ordered_topk": "TakeOrderedAndProject" in plan,
        "grouping_sets_expand": "Expand" in plan,
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_stages": bool(re.search(r"Python|InPandas", plan)),
        "bucket_pruning": (f"{sel.group(1)}/{sel.group(2)}" if sel else None),
        "pushed_filters": sorted(set(pushed)),
        "columns_read": sorted({s.split(":")[0]
                                for sch in schemas for s in sch.split(",")}),
    }


def cache_footprint(spark: SparkSession) -> dict:
    """Bytes held by materialized cache blocks across the JVM, per RDD —
    the in-memory half of SizeTest's phase-by-phase printout (bench.py
    records the same number as index_mem_bytes_* deltas per build)."""
    infos = spark._jsc.sc().getRDDStorageInfo()
    per = {info.name(): int(info.memSize()) for info in infos}
    return {"total_bytes": sum(per.values()), "per_rdd": per}
