"""Deterministic, scalable global id assignment (W1-W4 in SURVEY §2.5).

The reference assigns identity with ``row_number() OVER (ORDER BY ...)``
(osm_network.sql.j2:133,268,312,342).  A naive Spark ``Window.orderBy``
without partitioning funnels everything through ONE task — fatal at 100 TB.

``assign_ids`` is the scale path: range-repartition by the order key, sort
within partitions, count rows per partition (one light aggregate), then add
``offset + local_index`` per partition via ``mapInPandas``.  The result is
identical to a global row_number as long as the order key is a total order
(ties across partition boundaries would otherwise make ids depend on
sampling); callers must pass a tie-free key, matching the SURVEY W3 note
that edge identity needs a defined total order (osm_id, seg_seq).

NOT ``monotonically_increasing_id`` — that is partitioning-dependent and
non-reproducible across runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = deterministic 1-based rank of ``order_cols``."""
    cols = [F.col(c) for c in order_cols]
    if not num_partitions:
        # explicit width: without it AQE coalesces the range exchange by
        # BYTES, and the per-partition sort + id pass lands on 1-2 tasks
        # for slim-row tables regardless of core count
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    parted = df.repartitionByRange(num_partitions, *cols)
    parted = parted.sortWithinPartitions(*cols)
    parted = parted.withColumn("__pid", F.spark_partition_id())
    parted.persist()
    sizes = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(parted.schema.fields) + [T.StructField(id_col, T.LongType())]
    )

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{id_col: pd.Series([], dtype="int64")})
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[id_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    out = parted.mapInPandas(add_ids, schema=schema_out).drop("__pid")
    return out


def row_number_small(df: DataFrame, order_cols: list[str], id_col: str = "id") -> DataFrame:
    """Single-window variant for provably small inputs (fixtures, tests).

    The global window collapses to ONE partition; repartition the result so
    downstream joins/UDFs don't inherit single-task parallelism (streamed
    join sides keep their partitioning — a 1-partition edge table serializes
    every downstream spatial join).
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    out = df.withColumn(id_col, F.row_number().over(w).cast("long"))
    return out.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
