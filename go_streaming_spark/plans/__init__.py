from go_streaming_spark.plans.builder import ContinuousQuery, QueryBuilder

__all__ = ["ContinuousQuery", "QueryBuilder"]
