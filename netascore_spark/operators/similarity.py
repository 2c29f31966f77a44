"""Similarity search over embedding columns (``embeddings`` table).

- ``cosine_topk``      — brute-force exact top-k (baseline; native
  ``zip_with``/``aggregate`` expressions, no UDF)
- ``lsh_ann_topk``     — random-hyperplane LSH bucketing (the 100 TB scale
  path: candidates only probe matching buckets)

Scale: brute force is O(|queries| x |corpus|) — fine when queries are small
(broadcast) but not corpus x corpus; LSH buckets cut the candidate set by
~2^bits per table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, rank per query."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(tables, bits, dim))


def lsh_bucket_udf(dim: int, bits: int = 12, tables: int = 4, seed: int = 42):
    planes = _hyperplanes(dim, bits, tables, seed)
    powers = 1 << np.arange(bits)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            sigs = []
            for t in range(tables):
                bitsarr = (planes[t] @ x) > 0
                sigs.append(int((t << 48) | int((bitsarr * powers).sum())))
            out.append(sigs)
        return pd.Series(out)

    return _buckets


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with the
    query are scored.  Recall grows with ``tables``; verified vs brute force
    in tests."""
    budf = lsh_bucket_udf(dim, bits, tables, seed)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn("bucket", F.explode(budf(F.col("cvec"))))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("bucket", F.explode(budf(F.col("qvec"))))
    cand = c.join(F.broadcast(q), "bucket").dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
