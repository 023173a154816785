from .registry import QueryDef, all_queries, get_query, register

__all__ = ["QueryDef", "all_queries", "get_query", "register"]
