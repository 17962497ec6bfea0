"""Table resolution: a "table" is a directory (or file) of Parquet.

Mirrors the reference's data model — tables are paths, schema comes from the
Parquet footer, no catalog (``v1/src/main.rs:119-131``, ``v2/src/main.rs:101-113``,
glob sources in ``datasets/snowset/query_selectivity_distribution.sql:10``).
``spark.read.parquet`` handles directories, globs and multi-file layouts
natively and reads footers at planning time (SURVEY.md §2.1 S1-S3, S7-S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Every table the driver materializes (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Footer-driven scan of one table (schema inferred, S1/S2 automatic)."""
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all tables as temp views (for the spark.sql surface)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
