"""Per-stage snapshot checkpointing with per-partition lineage metrics.

Re-realizes the reference's resume mechanism — ``on_existing ∈ {skip,
delete, abort}`` artifact gating (toolbox/dbhelper.py:270-289) and the
``--skip`` stage flags (generate_index.py:20-21) — as snapshot-on-parquet
(Iceberg-shaped: the directory layout and metrics sidecar map 1:1 onto an
Iceberg table + snapshot summary when an Iceberg catalog is configured; this
container has no Iceberg runtime, so the parquet writer is the bundled
backend).

Each materialized stage records a lineage sidecar
``<base>/_lineage/<name>.json``:
- row count, schema, upstream stage names (lineage),
- per-partition row counts (skew evidence — the north rule's
  "per-partition lineage + row-count metrics"),
- wall-clock duration.

``resume=skip`` (default) makes re-runs read the snapshot instead of
recomputing — resume-from-checkpoint mid-pipeline.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        on_existing: str = "skip",  # skip | delete | abort
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.on_existing = on_existing
        os.makedirs(os.path.join(base_dir, "_lineage"), exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "_lineage", f"{name}.json")

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def materialize(
        self,
        df: DataFrame,
        name: str,
        upstream: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Write (or reuse) the snapshot for ``name`` and return a reader."""
        if self.exists(name):
            if self.on_existing == "skip":
                return self.spark.read.parquet(self._path(name))
            if self.on_existing == "abort":
                raise RuntimeError(
                    f"output '{name}' exists and on_existing=abort "
                    "(dbhelper.py:270-289 semantics)"
                )
            # delete: fall through and overwrite

        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))
        out = self.spark.read.parquet(self._path(name))

        part_counts = [
            r["cnt"]
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("cnt"))
            .orderBy("pid")
            .collect()
        ]
        meta = {
            "name": name,
            "rows": int(sum(part_counts)),
            "partitions": len(part_counts),
            "partition_rows": part_counts,
            "max_partition_skew": (
                max(part_counts) / (sum(part_counts) / len(part_counts))
                if part_counts and sum(part_counts) > 0
                else None
            ),
            "schema": out.schema.simpleString(),
            "upstream": upstream or [],
            "duration_sec": round(time.time() - t0, 3),
            "written_at_epoch": int(t0),
        }
        with open(self._meta_path(name), "w") as fh:
            json.dump(meta, fh, indent=2)
        return out

    def read(self, name: str) -> DataFrame:
        """Reader for an existing snapshot (resume path for ``--skip``)."""
        if not self.exists(name):
            raise RuntimeError(
                f"checkpoint '{name}' not found under {self.base_dir}; "
                "cannot skip a stage whose snapshot was never materialized"
            )
        return self.spark.read.parquet(self._path(name))

    def lineage(self, name: str) -> dict:
        with open(self._meta_path(name)) as fh:
            return json.load(fh)
