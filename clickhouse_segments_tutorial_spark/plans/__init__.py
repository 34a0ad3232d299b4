from .registry import QuerySpec, all_queries

__all__ = ["QuerySpec", "all_queries"]
