from parquet_near_storage_compute_spark.functions.grammar import (
    parse_aggregation,
    parse_aggregations,
    parse_predicate,
)

__all__ = ["parse_predicate", "parse_aggregation", "parse_aggregations"]
