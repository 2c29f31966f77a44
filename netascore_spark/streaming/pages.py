"""Incremental (streaming) page ingestion.

The reference pipeline is batch-only; at the north rule's 10^12-document
scale the pages table is never static — new WARC drops land continuously.
This module runs the SAME page operators (``pipeline/pages.py``: fused
Arrow extraction, codegen PIP containment, cell-ring kNN) incrementally
with Structured Streaming:

- ``read_page_stream``: file-source stream over a parquet directory with
  the (url, warc_ts, html, text, lang) input schema.  The source's own
  offset log (under ``checkpointLocation``) makes file discovery
  exactly-once across restarts.
- ``incremental_pages``: ``foreachBatch`` — the idiomatic Spark pattern
  for reusing complex batch logic (multi-join + aggregation chains that
  append-mode streaming cannot express) per micro-batch.  Each epoch's
  output lands in its own ``epoch=N`` partition directory written with
  overwrite, so a replayed batch after a crash is IDEMPOTENT: the rerun
  overwrites the same directory instead of duplicating rows.  Per-epoch
  row counts + timings append to a lineage log next to the sink — the
  streaming analogue of the Checkpointer's per-snapshot metrics.
- ``windowed_cell_counts``: a native streaming aggregation (watermark +
  tumbling event-time window on ``warc_ts``) for cell-level page-rate
  monitoring, where append-mode semantics DO fit: late pages beyond the
  watermark are dropped, closed windows emit exactly once.

Scale notes: the per-batch work is the batch pipeline's plan, so the
partitioning / broadcast / skew handling documented there applies
unchanged; ``maxFilesPerTrigger`` bounds the per-epoch working set, which
is the knob that keeps executor memory flat no matter how large the
backlog grows.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import grid
from ..pipeline.pages import extract_pages, join_polygons, nearest_edges

# input_hint shape: (url, warc_ts, html, text, lang)
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_page_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = PAGE_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of page parquet files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _score_batch(
    batch: DataFrame,
    polygons: DataFrame,
    edges: DataFrame,
    k: int,
    radius: float,
    cell_size: float,
) -> DataFrame:
    """The batch-pipeline chain for one micro-batch: extract -> PIP
    containment counts -> kNN nearest edge, one row per page."""
    pg = extract_pages(batch, cell_size=cell_size)
    pip = (
        join_polygons(pg, polygons, cell_size=cell_size)
        .groupBy("url")
        .agg(F.count("*").alias("n_polygons"))
    )
    knn = nearest_edges(pg, edges, k=k, radius=radius).select(
        "url", "edge_id", "dist"
    )
    return (
        pg.select(
            "url", "warc_ts", "lang",
            F.col("extracted_text").eqNullSafe(F.col("text")).alias(
                "byte_identical"
            ),
            "cell",
        )
        .join(pip, "url", "left")
        .join(knn, "url", "left")
    )


def incremental_pages(
    spark: SparkSession,
    stream: DataFrame,
    polygons: DataFrame,
    edges: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 1,
    radius: float = 500.0,
    cell_size: float = grid.DEFAULT_CELL_SIZE,
    available_now: bool = True,
    on_epoch: Callable[[dict], None] | None = None,
):
    """Run the scoring chain per micro-batch; idempotent epoch sink.

    Returns the started StreamingQuery (already awaited when
    ``available_now`` — the default — so callers read ``out_dir``
    immediately after).  Restarting with the same ``checkpoint_dir``
    processes only files the offset log has not seen.
    """
    lineage_path = os.path.join(out_dir, "_lineage.jsonl")

    def handle(batch: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        scored = _score_batch(batch, polygons, edges, k, radius, cell_size)
        target = os.path.join(out_dir, f"epoch={epoch_id}")
        # overwrite per epoch: a post-crash replay of the same epoch
        # rewrites the directory -> exactly-once output, no dedup pass
        scored.write.mode("overwrite").parquet(target)
        n = spark.read.parquet(target).count()
        rec = {
            "epoch": epoch_id,
            "rows": n,
            "sec": round(time.time() - t0, 3),
            "ts": time.time(),
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(lineage_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if on_epoch is not None:
            on_epoch(rec)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def windowed_cell_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    cell_size: float = grid.DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Watermarked tumbling-window page counts per cell — a native
    streaming aggregation (no foreachBatch): append mode emits each
    (window, cell) exactly once, when the watermark passes the window
    end; pages later than ``watermark`` are dropped as late data."""
    pg = extract_pages(stream, cell_size=cell_size)
    return (
        pg.filter(F.col("cell").isNotNull())
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell",
            "n_pages",
        )
    )
