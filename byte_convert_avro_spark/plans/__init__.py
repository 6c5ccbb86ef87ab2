"""Physical-plan introspection — the engine's scale audit tooling.

The reference has no optimizer to inspect (SURVEY.md §4: a straight-line
interpreted map).  On Spark the optimizer IS the engine, so this package
makes its decisions testable: parse ``df.explain("formatted")`` output into
facts — pushed filters, scanned columns, exchange count, join strategies,
whole-stage-codegen spans — and assert them in CI.  A plan regression
(lost pushdown, a broadcast that silently became a shuffle join, an extra
exchange) fails tests long before it becomes a 100-TB incident.
"""

from byte_convert_avro_spark.plans.inspect import (
    PlanFacts,
    codegen_span_count,
    count_exchanges,
    formatted_plan,
    join_strategies,
    plan_facts,
    pushed_filters,
    read_schemas,
)
from byte_convert_avro_spark.plans.stats_reset import reset_plan_stats

__all__ = [
    "PlanFacts",
    "formatted_plan",
    "plan_facts",
    "pushed_filters",
    "read_schemas",
    "count_exchanges",
    "join_strategies",
    "codegen_span_count",
    "reset_plan_stats",
]
