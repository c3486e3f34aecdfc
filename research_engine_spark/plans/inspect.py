"""Physical-plan inspection and guardrails (SURVEY.md §4).

The reference has no optimizer of its own (everything lives in Lucene);
here Catalyst is the optimizer and the *plan shape* is the scale contract:
scans must prune partitions and push filters, small sides must broadcast,
top-k must compile to TakeOrderedAndProject. These helpers make those
properties assertable in tests and inspectable by users.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (explain() only prints)."""
    jdf = df._jdf  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return jdf.queryExecution().explainString(mode)


@dataclass
class PlanFacts:
    has_partition_filters: bool
    pushed_filters: bool
    broadcast_joins: int
    sort_merge_joins: int
    exchanges: int
    take_ordered: bool
    whole_stage_codegen: bool


def plan_facts(df: DataFrame) -> PlanFacts:
    p = formatted_plan(df)
    return PlanFacts(
        has_partition_filters="PartitionFilters: [" in p
        and "PartitionFilters: []" not in p,
        pushed_filters="PushedFilters: [" in p
        and "PushedFilters: []" not in p,
        broadcast_joins=p.count("BroadcastHashJoin"),
        sort_merge_joins=p.count("SortMergeJoin"),
        exchanges=p.count("Exchange"),
        take_ordered="TakeOrderedAndProject" in p,
        whole_stage_codegen="WholeStageCodegen" in p,
    )


def assert_scan_efficient(df: DataFrame, require_partition_pruning: bool = False,
                          require_pushdown: bool = True) -> PlanFacts:
    """Raise if the plan reads more than it should."""
    facts = plan_facts(df)
    if require_partition_pruning and not facts.has_partition_filters:
        raise AssertionError("no partition pruning in plan:\n"
                             + formatted_plan(df)[:2000])
    if require_pushdown and not facts.pushed_filters:
        raise AssertionError("no pushed filters in plan:\n"
                             + formatted_plan(df)[:2000])
    return facts
