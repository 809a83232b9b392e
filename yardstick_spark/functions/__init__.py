from .compat import normalize_expr_to_spark

__all__ = ["normalize_expr_to_spark"]
