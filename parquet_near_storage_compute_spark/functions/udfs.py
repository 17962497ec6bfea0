"""UDF surface (SURVEY.md §2.10).

The reference has no user extension point — its ``Aggregator`` trait is an
internal physical-operator interface. This module is the engine-completeness
layer: Arrow-vectorized pandas UDFs (the only sanctioned Python hot path —
~10-100× over row-at-a-time UDFs), SQL registration so ``spark.sql`` users
can call them, and one demonstration query with a DuckDB oracle.

Rule of thumb enforced across this repo: built-ins first (stay inside
whole-stage codegen); pandas UDFs only where built-ins can't express the
kernel (numpy matmul scoring, external-library decodes); row-at-a-time UDFs
never in a hot path.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from parquet_near_storage_compute_spark.tables import load_table


def _readability_kernel(text: pd.Series) -> pd.Series:
    """Vectorized kernel: a toy readability score (chars-per-word;
    deterministic arithmetic → oracle-expressible)."""
    n_chars = text.str.len().astype("float64")
    n_words = text.str.split(" ").str.len().astype("float64")
    return n_chars / n_words


def _vowel_kernel(text: pd.Series) -> pd.Series:
    """Vectorized string kernel: total vowels per document."""
    return text.str.count("[aeiou]").astype("int64")


_cache: dict[str, object] = {}


def readability_score():
    """Arrow-vectorized pandas UDF (built lazily: the decorator resolves its
    DDL return type against the active SparkSession)."""
    if "readability" not in _cache:
        _cache["readability"] = pandas_udf("double")(_readability_kernel)
    return _cache["readability"]


def vowel_count():
    if "vowel" not in _cache:
        _cache["vowel"] = pandas_udf("long")(_vowel_kernel)
    return _cache["vowel"]


def register_udfs(spark: SparkSession) -> None:
    """Expose the UDFs to the SQL surface (spark.sql / temp views)."""
    spark.udf.register("readability_score", readability_score())
    spark.udf.register("vowel_count", vowel_count())


def udf_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF demonstration query: per-language readability stats.
    The UDF runs Arrow-batched; the surrounding agg stays JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        readability_score()(F.col("text")).alias("score"),
        vowel_count()(F.col("text")).alias("vowels"),
    )
    return scored.groupBy("lang").agg(
        F.avg("score").alias("avg_readability"),
        F.sum("vowels").alias("total_vowels"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def udf_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same kernels through the SQL registration path."""
    register_udfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT lang,
               AVG(readability_score(text)) AS avg_readability,
               SUM(vowel_count(text)) AS total_vowels,
               COUNT(*) AS n_docs
        FROM documents GROUP BY lang
        """
    )


_UDF_ORACLE = """
    SELECT lang,
           CAST(AVG(CAST(length(text) AS DOUBLE)
                    / len(string_split(text, ' '))) AS DOUBLE)
             AS avg_readability,
           CAST(SUM(len(regexp_extract_all(text, '[aeiou]'))) AS BIGINT)
             AS total_vowels,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
"""

def _geomean_kernel(v: pd.Series) -> float:
    """Grouped-aggregate kernel: geometric mean (UDAF surface).

    Engine-exactness discipline: values are SORTED before the log-sum (so
    the result is independent of Arrow batch / partition arrival order —
    double addition is order-dependent) and the fold is sequential
    (``cumsum``'s last element is the left fold; numpy's plain ``sum`` is
    pairwise), mirroring the oracle's ``list_reduce`` over a sorted list.
    log/exp are not correctly-rounded across libms, so the residual
    cross-engine drift (~1e-15 relative) is absorbed by rounding to cents
    at source on both sides."""
    import numpy as np

    vals = np.sort(v[v > 0].to_numpy())
    logs = np.log(vals)
    mean = logs.cumsum()[-1] / len(logs)
    return round(float(np.exp(mean)), 2)


def geomean():
    """Grouped-agg pandas UDF — Spark's UDAF surface: partial batches per
    group are fed as one Series; result is one scalar per group."""
    if "geomean" not in _cache:
        _cache["geomean"] = pandas_udf("double")(_geomean_kernel)
    return _cache["geomean"]


def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF demonstration: geometric-mean order value per status via a
    grouped-aggregate pandas UDF (oracle: exp(avg(ln)))."""
    orders = load_table(spark, sf_dir, "orders")
    # a grouped-agg pandas UDF cannot share an .agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — join the two tiny results
    gm = orders.groupBy("o_orderstatus").agg(
        geomean()(F.col("o_totalprice")).alias("geomean_price")
    )
    counts = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return gm.join(counts, "o_orderstatus")


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: per-user z-score of event values (sample std;
    NULL when the group has no variance, matching SQL semantics).

    Engine-exactness discipline: rows are sorted by event_id and mean /
    sum-of-squared-deviations computed as sequential left folds
    (``cumsum``'s last element), bit-identical to the oracle's
    ``list_reduce`` over event_id-ordered lists — pandas ``mean``/``std``
    use different summation orders than any SQL engine and drifted
    ~1e-12, the same magnitude that flaked join_outer_full. sqrt and the
    per-element (x−mean)/std are single IEEE ops, identical everywhere."""
    import math

    import numpy as np

    pdf = pdf.sort_values("event_id")
    vals = pdf["value"].to_numpy(dtype="float64")
    n = len(vals)
    out = pdf[["event_id", "user_id"]].copy()
    if n < 2:
        out["zscore"] = None
        return out
    mean = vals.cumsum()[-1] / n
    dev = vals - mean
    var = (dev * dev).cumsum()[-1] / (n - 1)
    if var <= 0:
        out["zscore"] = None
        return out
    std = math.sqrt(var)
    out["zscore"] = dev / std
    return out


def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): whole-group normalization — each user's
    events arrive as one pandas frame, vectorized numpy math, Arrow both
    ways. The grouped-map API surface (GroupedData.applyInPandas)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(
        _zscore_group, "event_id bigint, user_id bigint, zscore double"
    )


def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (round 4; completes the §2.10 UDF/UDAF/UDTF triple): a
    table function exploding a document into (pos, token, token_len) rows,
    applied per outer row via LATERAL — the UDTF API surface
    (``@udtf`` + ``spark.udtf.register`` + lateral table reference).
    Restricted to a doc_id slice because a row-at-a-time Python UDTF is
    the SLOW path by design — the production form of this exact operation
    is the builtin posexplode(split(...)) (text_token_counts and friends);
    the contract exists to prove the API, not to recommend it at 100 TB.
    The oracle replays it with list_transform + unnest."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("pnsc_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM documents d, LATERAL pnsc_tokenize(d.text) t
        WHERE d.doc_id < 20
        ORDER BY d.doc_id, t.pos
        """
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "udf_readability": udf_readability,
    "udf_sql_surface": udf_sql_surface,
    "udaf_geomean": udaf_geomean,
    "udf_grouped_map_zscore": grouped_map_zscore,
    "udtf_tokenize": udtf_tokenize,
}

ORACLE_SQL: dict[str, str] = {
    "udtf_tokenize": """
        SELECT doc_id,
               CAST(t.pos AS INT) AS pos,
               t.token,
               CAST(length(t.token) AS INT) AS token_len
        FROM (
          SELECT doc_id,
                 unnest(list_transform(string_split(text, ' '),
                        (tok, i) -> struct_pack(pos := i - 1, token := tok)))
                   AS t
          FROM documents WHERE doc_id < 20
        )
        ORDER BY doc_id, pos
    """,
    "udf_readability": _UDF_ORACLE,
    "udf_sql_surface": _UDF_ORACLE,
    # sequential fold over value-sorted logs + round-to-cents, mirroring
    # the kernel's sorted cumsum (see _geomean_kernel's exactness note)
    "udaf_geomean": """
        WITH g AS (
          SELECT o_orderstatus,
                 list(ln(o_totalprice) ORDER BY o_totalprice) AS ls,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders WHERE o_totalprice > 0
          GROUP BY o_orderstatus
        )
        SELECT o_orderstatus,
               CAST(round(exp(list_reduce(ls, (a, b) -> a + b) / len(ls)), 2)
                    AS DOUBLE) AS geomean_price,
               n_orders
        FROM g
    """,
    # sequential folds over event_id-ordered lists, mirroring the kernel's
    # sorted cumsum (see _zscore_group's exactness note)
    "udf_grouped_map_zscore": """
        WITH g AS (
          SELECT user_id,
                 list(event_id ORDER BY event_id) AS ids,
                 list(value ORDER BY event_id) AS vs
          FROM events GROUP BY user_id
        ),
        st AS (
          SELECT user_id, ids, vs,
                 list_reduce(vs, (a, b) -> a + b) / len(vs) AS mean
          FROM g
        ),
        sd AS (
          SELECT user_id, ids, vs, mean,
                 CASE WHEN len(vs) >= 2 THEN
                   sqrt(list_reduce(
                          list_transform(vs, x -> (x - mean) * (x - mean)),
                          (a, b) -> a + b) / (len(vs) - 1))
                 END AS std
          FROM st
        )
        SELECT unnest(ids) AS event_id, user_id,
               CAST(CASE WHEN std > 0 THEN (unnest(vs) - mean) / std END
                    AS DOUBLE) AS zscore
        FROM sd
    """,
}
