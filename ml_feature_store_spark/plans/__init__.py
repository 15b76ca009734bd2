from .explain import executed_plan, has_pushed_filter, shuffle_count, codegen_span_count

__all__ = ["executed_plan", "has_pushed_filter", "shuffle_count", "codegen_span_count"]
