"""End-to-end training-data pipeline (the north-star composite).

The flow a 100 TB pre-training corpus actually runs, as ONE declarative
DataFrame chain:

  quality gate → exact dedup (content hash) → near-dup removal
  (MinHash+LSH candidates, Jaccard-verified, drop the higher doc_id)
  → per-(lang, source) token accounting

Every stage is one of this engine's tested operators (textops/dedup), so the
composite inherits their shuffle budgets: quality gate is a narrow map, the
two dedups shuffle on 16-byte hashes / LSH buckets, the accounting is a tiny
group-by. Nothing is quadratic outside LSH buckets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.dedup import (
    _SHINGLE_CTE,
    _lsh_candidates,
    _minhash_signatures,
    shingles,
)
from parquet_near_storage_compute_spark.functions.text import words
from parquet_near_storage_compute_spark.tables import fan_out, load_table


def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate (narrow map)
    ws = words("text")
    quality = docs.filter((F.length("text") >= 100) & (F.size(ws) >= 20))

    # 2. exact dedup: canonical doc per content hash
    canonical = (
        quality.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_deduped = quality.join(canonical, "doc_id", "left_semi")

    # 3. near-dup removal: LSH candidates → Jaccard ≥ 0.5 → drop doc_b
    cand = _lsh_candidates(_minhash_signatures(fan_out(exact_deduped)))
    sets = fan_out(exact_deduped).select(
        "doc_id", F.array_distinct(shingles(words("text"), 3)).alias("sset")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sset").alias("set_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sset").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = F.size(F.array_union("set_a", "set_b")).cast("double")
    near_dups = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter((inter / union) >= 0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = exact_deduped.join(near_dups, "doc_id", "left_anti")

    # 4. accounting per (lang, source)
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words("text")).cast("long")).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipeline_training_data": training_data_pipeline,
}

ORACLE_SQL: dict[str, str] = {
    "pipeline_training_data": f"""
        WITH quality AS (
          SELECT * FROM documents
          WHERE length(text) >= 100 AND len(string_split(text, ' ')) >= 20
        ),
        canonical AS (
          SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)
        ),
        exact_deduped AS (
          SELECT q.* FROM quality q
          WHERE q.doc_id IN (SELECT doc_id FROM canonical)
        ),
        documents_view AS (SELECT doc_id, text FROM exact_deduped),
        {_SHINGLE_CTE.replace("FROM documents)", "FROM documents_view)")},
        sets AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   CASE WHEN len(ws) >= 3 THEN range(len(ws)-2) ELSE [] END,
                   i -> array_to_string(ws[i+1:i+3], ' '))) AS sset
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents_view)
        ),
        near_dups AS (
          SELECT DISTINCT c.doc_b AS doc_id
          FROM cand c
          JOIN sets a ON c.doc_a = a.doc_id
          JOIN sets b ON c.doc_b = b.doc_id
          WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sset, b.sset))) >= 0.5
        ),
        kept AS (
          SELECT * FROM exact_deduped
          WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
        )
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM kept GROUP BY lang, source
    """,
}
