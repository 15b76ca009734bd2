from .explain import (
    codegen_span_count,
    executed_plan,
    final_executed_plan,
    has_pushed_filter,
    optimized_plan,
    shuffle_count,
)

__all__ = [
    "codegen_span_count",
    "executed_plan",
    "final_executed_plan",
    "has_pushed_filter",
    "optimized_plan",
    "shuffle_count",
]
