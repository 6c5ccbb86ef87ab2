"""Parse Spark physical plans into assertable facts.

Works on the *initial* physical plan (pre-execution, ``isFinalPlan=false``)
— that's the right surface for CI: it captures the optimizer's static
decisions (pushdown, pruning, join strategy, exchange placement) without
running the job.  AQE may improve the plan further at runtime (coalesce
partitions, convert to broadcast, split skew); it never un-does these
static properties.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_EXCHANGE = re.compile(r"^\s*(?:\+-|:-|\|)?\s*\(?\d*\)?\s*Exchange\b", re.M)
_JOIN = re.compile(r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b")
_CODEGEN_ID = re.compile(r"\[codegen id : (\d+)\]")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string (explain() only prints)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


formatted_plan = explain_str


def pushed_filters(df: DataFrame) -> dict[str, list[str]]:
    """{parquet-path-basename: [pushed filter strings]} per scan node."""
    text = explain_str(df, "formatted")
    out: dict[str, list[str]] = {}
    loc, blocks = None, text.split("\n\n")
    for block in blocks:
        if "Scan parquet" not in block:
            continue
        mloc = re.search(r"InMemoryFileIndex \[[^\]]*?([\w.]+)\.parquet\]?", block)
        name = mloc.group(1) if mloc else f"scan{len(out)}"
        mpf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        filters = [f.strip() for f in mpf.group(1).split(",")] if mpf and mpf.group(1) else []
        # re-join split function args like GreaterThan(a, 3)
        merged: list[str] = []
        for f in filters:
            if merged and merged[-1].count("(") > merged[-1].count(")"):
                merged[-1] += "," + f
            else:
                merged.append(f)
        out[name] = merged
    return out


def read_schemas(df: DataFrame) -> dict[str, list[str]]:
    """{parquet-path-basename: [column names actually read]} per scan —
    the column-pruning audit: a scan reading columns the query never
    touches is a plan bug at any scale."""
    text = explain_str(df, "formatted")
    out: dict[str, list[str]] = {}
    for block in text.split("\n\n"):
        if "Scan parquet" not in block:
            continue
        mloc = re.search(r"InMemoryFileIndex \[[^\]]*?([\w.]+)\.parquet\]?", block)
        name = mloc.group(1) if mloc else f"scan{len(out)}"
        mrs = re.search(r"ReadSchema: struct<(.*)>", block)
        cols = re.findall(r"(\w+):", mrs.group(1)) if mrs else []
        out[name] = cols
    return out


def count_exchanges(df: DataFrame) -> int:
    """Shuffle Exchange nodes in the initial plan (BroadcastExchange
    excluded — it ships a small table, not the data).  Every one is a full
    network round at scale — the first number in any plan review."""
    text = explain_str(df, "simple")
    return len(re.findall(r"(?<![A-Za-z])Exchange\b", text))


def broadcast_exchanges(df: DataFrame) -> int:
    return len(re.findall(r"\bBroadcastExchange\b", explain_str(df, "simple")))


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in plan order."""
    return _JOIN.findall(explain_str(df, "simple"))


def codegen_span_count(df: DataFrame, execute: bool = False) -> int:
    """Distinct WholeStageCodegen spans (0 = nothing codegen'd, suspect a
    Python/RDD boundary in the hot path).  Under AQE the subtrees only
    exist once the final plan is chosen — pass ``execute=True`` to run the
    query (``collect``; ``count()`` would finalize a *different* plan) and
    audit the executed one."""
    if execute:
        df.collect()
    text = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else len(set(_CODEGEN_ID.findall(explain_str(df, "formatted"))))


@dataclass
class PlanFacts:
    """One-call scale audit of a DataFrame's physical plan."""

    exchanges: int
    joins: list[str] = field(default_factory=list)
    pushed: dict[str, list[str]] = field(default_factory=dict)
    columns_read: dict[str, list[str]] = field(default_factory=dict)
    codegen_spans: int = 0

    @property
    def broadcast_joins(self) -> int:
        return sum(1 for j in self.joins if j.startswith("Broadcast"))

    @property
    def shuffle_joins(self) -> int:
        return sum(1 for j in self.joins if j in ("SortMergeJoin", "ShuffledHashJoin"))


def plan_facts(df: DataFrame) -> PlanFacts:
    return PlanFacts(
        exchanges=count_exchanges(df),
        joins=join_strategies(df),
        pushed=pushed_filters(df),
        columns_read=read_schemas(df),
        codegen_spans=codegen_span_count(df),
    )
