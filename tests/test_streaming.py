"""Structured Streaming surface (streaming/pages.py): the incremental
foreachBatch pipeline must (a) match the batch operators row-for-row on
the same input, (b) be exactly-once across a restart with the same
checkpoint dir, and (c) the native windowed aggregation must respect
watermark/append semantics (closed windows emit, open ones don't)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from netascore_spark.sources import fixtures
from netascore_spark.streaming import (
    incremental_pages,
    read_page_stream,
    windowed_cell_counts,
)
from netascore_spark.streaming.pages import _score_batch


@pytest.fixture(scope="module")
def static_inputs(spark):
    polygons = fixtures.admin_polygons(spark)
    from netascore_spark.pipeline import network as N

    osm = fixtures.osm_lines(spark, scale=2)
    edges, _ = N.build_network(osm)
    edges = edges.persist()
    edges.count()
    return polygons, edges


def _write_chunks(spark, path, chunks, start=0):
    for j, n in enumerate(chunks):
        pdf = fixtures.pages_pandas(n, seed=7 + j, start=start)
        start += n
        spark.createDataFrame(pdf, fixtures._PAGES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(path)
    return start


def test_incremental_matches_batch_and_is_exactly_once(
    spark, tmp_path, static_inputs
):
    polygons, edges = static_inputs
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    next_start = _write_chunks(spark, in_dir, [120, 90, 90])
    stream = read_page_stream(spark, in_dir, max_files_per_trigger=1)
    epochs = []
    incremental_pages(
        spark, stream, polygons, edges, out_dir, ck_dir,
        on_epoch=lambda rec: epochs.append(rec),
    )
    assert len(epochs) == 3  # maxFilesPerTrigger=1 -> one epoch per file

    got = spark.read.parquet(out_dir).drop("epoch")
    want = _score_batch(
        spark.read.parquet(in_dir), polygons, edges, 1, 500.0, 200.0
    )
    assert got.count() == want.count() == 300
    # row-identical to the batch chain on the same input
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # north-rule invariant holds through the stream
    assert got.filter(~F.col("byte_identical")).count() == 0

    # restart with the SAME checkpoint: only the new file is processed
    epochs.clear()
    _write_chunks(spark, in_dir, [50], start=next_start)
    stream2 = read_page_stream(spark, in_dir, max_files_per_trigger=1)
    incremental_pages(
        spark, stream2, polygons, edges, out_dir, ck_dir,
        on_epoch=lambda rec: epochs.append(rec),
    )
    assert len(epochs) == 1 and epochs[0]["rows"] == 50
    total = spark.read.parquet(out_dir)
    assert total.count() == 350  # no reprocessing, no duplicates
    assert total.select("url").distinct().count() == 350

    # lineage log: one record per epoch, counts match
    lineage = open(os.path.join(out_dir, "_lineage.jsonl")).read().splitlines()
    assert len(lineage) == 4


def test_windowed_cell_counts_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    # file 1: day-1 events; file 2: day-2 events.  With one file per
    # trigger the day-2 batch carries a watermark past every day-1
    # window end -> day-1 windows emit; day-2 windows stay open.
    d1 = dt.datetime(2026, 1, 1, 10, 0, 0)
    d2 = dt.datetime(2026, 1, 2, 10, 0, 0)

    def mk(ts, urls):
        rows = [
            (f"u{u}", ts, b"<html><head><meta name=\"geo.position\" "
             b"content=\"47.0;13.0\"></head><body><main id=\"content\">x"
             b"</main></body></html>", "x", "de")
            for u in urls
        ]
        return spark.createDataFrame(rows, fixtures._PAGES_SCHEMA)

    mk(d1, range(5)).coalesce(1).write.mode("append").parquet(in_dir)
    mk(d2, range(5, 8)).coalesce(1).write.mode("append").parquet(in_dir)

    stream = read_page_stream(spark, in_dir, max_files_per_trigger=1)
    counts = windowed_cell_counts(stream, window="10 minutes",
                                  watermark="30 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("cell_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM cell_counts").collect()
    # exactly the closed day-1 window, with all 5 pages in one cell
    assert len(out) == 1
    assert out[0]["n_pages"] == 5
    assert out[0]["window_start"] == d1


def test_streaming_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: one emission per distinct
    text across micro-batches, deterministic within-batch canonical pick,
    and state survives a query restart (no re-emission)."""
    import pandas as pd

    from netascore_spark.streaming import read_page_stream, streaming_exact_dedup

    in_dir = str(tmp_path / "sin")
    ck_dir = str(tmp_path / "sck")

    def mk(rows):
        return pd.DataFrame(
            [
                {
                    "url": u,
                    "warc_ts": dt.datetime(2026, 1, 1, 0, 0, s),
                    "html": b"<html/>",
                    "text": t,
                    "lang": "en",
                }
                for u, s, t in rows
            ]
        )

    # file 1: A + same-batch dup A2 (later ts) + B; file 2: cross-batch
    # dup A3 + new D
    f1 = mk([("u/a", 0, "xx"), ("u/a2", 5, "xx"), ("u/b", 1, "yy")])
    f2 = mk([("u/a3", 9, "xx"), ("u/d", 2, "zz")])
    for pdf in [f1, f2]:
        spark.createDataFrame(pdf, fixtures._PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can —
        # collect each micro-batch's emissions on the driver
        out = []
        stream = read_page_stream(spark, in_dir, max_files_per_trigger=1)
        q = (
            streaming_exact_dedup(stream)
            .writeStream.foreachBatch(
                lambda b, eid: out.extend(b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["digest"]: r["url"] for r in out}

    got = run()
    # three distinct texts -> three emissions; canonical for "xx" is the
    # earliest-ts row u/a, even though u/a2 shared its micro-batch
    assert len(got) == 3
    assert set(got.values()) == {"u/a", "u/b", "u/d"}

    # third drop: another dup of "xx" plus genuinely new "ww"; restart
    # with the same checkpoint -> state recovered, only "ww" emits
    f3 = mk([("u/a4", 20, "xx"), ("u/e", 3, "ww")])
    spark.createDataFrame(f3, fixtures._PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = run()
    assert set(got2.values()) == {"u/e"}
