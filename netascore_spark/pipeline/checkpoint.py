"""Per-stage versioned snapshot checkpointing with lineage metrics.

Re-realizes the reference's resume mechanism — ``on_existing ∈ {skip,
delete, abort}`` artifact gating (toolbox/dbhelper.py:270-289) and the
``--skip`` stage flags (generate_index.py:20-21) — as snapshot-on-parquet
with Iceberg-style semantics (this container has no Iceberg runtime, so the
layout below is the bundled backend; it maps 1:1 onto an Iceberg table when
a catalog is configured):

- every materialization writes a NEW immutable version directory
  ``<base>/<name>/v<NNN>/`` (never in-place overwrite: readers of an older
  snapshot are never disturbed — snapshot isolation);
- a manifest ``<base>/_lineage/<name>.versions.json`` lists all snapshots
  (version, commit epoch, rows, schema, upstream lineage) and the current
  pointer — the Iceberg metadata-file analog;
- :meth:`read` accepts ``version=`` or ``as_of=`` (epoch seconds) — time
  travel;
- :meth:`expire_snapshots` prunes old version dirs (Iceberg
  ``expireSnapshots``).

Each snapshot also records per-partition row counts (skew evidence — the
north rule's "per-partition lineage + row-count metrics") and wall-clock
duration.  ``on_existing=skip`` (default) makes re-runs read the current
snapshot instead of recomputing — resume-from-checkpoint mid-pipeline;
``delete`` appends a new version (old ones stay time-travelable).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        on_existing: str = "skip",  # skip | delete | abort
        catalog: str | None = "auto",
    ):
        """``catalog``: Iceberg catalog selection is CONFIG-ONLY — "auto"
        (default) uses the first ``spark.sql.catalog.<name>`` the session
        has configured (none configured -> the parquet+manifest emulation);
        an explicit name pins that catalog; ``None``/"" forces parquet.
        Users with a real Iceberg catalog get Iceberg tables without any
        code change; this sandbox (no Iceberg runtime) exercises the
        selection logic and the emulation."""
        self.spark = spark
        self.base_dir = base_dir
        self.on_existing = on_existing
        if catalog == "auto":
            catalog = self._detect_catalog()
        self.catalog = catalog or None
        os.makedirs(os.path.join(base_dir, "_lineage"), exist_ok=True)

    @property
    def backend(self) -> str:
        return "iceberg" if self.catalog else "parquet"

    def _detect_catalog(self) -> str | None:
        """First configured ``spark.sql.catalog.<name>`` (sorted), else None
        — pure config inspection, no Iceberg classes touched."""
        try:
            rows = self.spark.sql("SET").collect()
        except Exception:  # pragma: no cover - defensive
            return None
        names = set()
        for r in rows:
            key = r["key"]
            if key.startswith("spark.sql.catalog."):
                rest = key[len("spark.sql.catalog."):]
                names.add(rest.split(".", 1)[0])
        return sorted(names)[0] if names else None

    def _iceberg_table(self, name: str) -> str:
        return f"{self.catalog}.netascore.{name}"

    # -- paths -------------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _version_dir(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v{version:03d}")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "_lineage", f"{name}.versions.json")

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.base_dir, "_lineage", f"{name}.json")

    # -- manifest ----------------------------------------------------------

    def _manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _write_manifest(self, name: str, manifest: dict) -> None:
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, self._manifest_path(name))  # atomic pointer swap

    def snapshots(self, name: str) -> list[dict]:
        """All committed snapshots, oldest first (Iceberg .snapshots)."""
        m = self._manifest(name)
        return list(m["snapshots"]) if m else []

    # -- existence / resolve ----------------------------------------------

    def exists(self, name: str) -> bool:
        if self.backend == "iceberg":
            try:
                return self.spark.catalog.tableExists(self._iceberg_table(name))
            except Exception:
                return False
        m = self._manifest(name)
        if m is not None:
            cur = self._version_dir(name, m["current"])
            return os.path.exists(os.path.join(cur, "_SUCCESS"))
        # legacy layout (pre-versioning): data directly under <base>/<name>
        return os.path.exists(os.path.join(self._table_dir(name), "_SUCCESS"))

    def _resolve(self, name: str, version: int | None, as_of: float | None) -> str:
        m = self._manifest(name)
        if m is None:
            legacy = self._table_dir(name)
            if os.path.exists(os.path.join(legacy, "_SUCCESS")):
                if version is not None or as_of is not None:
                    raise RuntimeError(
                        f"checkpoint '{name}' is a legacy single-version "
                        "snapshot; no time travel available"
                    )
                return legacy
            raise RuntimeError(
                f"checkpoint '{name}' not found under {self.base_dir}; "
                "cannot skip a stage whose snapshot was never materialized"
            )
        if version is None and as_of is not None:
            eligible = [s for s in m["snapshots"] if s["committed_at_epoch"] <= as_of]
            if not eligible:
                raise RuntimeError(
                    f"no snapshot of '{name}' committed at or before {as_of}"
                )
            version = eligible[-1]["version"]
        if version is None:
            version = m["current"]
        if not any(s["version"] == version for s in m["snapshots"]):
            raise RuntimeError(f"snapshot v{version} of '{name}' does not exist")
        return self._version_dir(name, version)

    # -- write / read ------------------------------------------------------

    def materialize(
        self,
        df: DataFrame,
        name: str,
        upstream: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Commit a snapshot for ``name`` and return a reader.

        ``on_existing=skip``: reuse the current snapshot.  ``delete``:
        commit a NEW version (old versions stay readable via time travel).
        ``abort``: refuse if any version exists."""
        if self.exists(name):
            if self.on_existing == "skip":
                return self.read(name)
            if self.on_existing == "abort":
                raise RuntimeError(
                    f"output '{name}' exists and on_existing=abort "
                    "(dbhelper.py:270-289 semantics)"
                )
            # delete: fall through and commit the next version

        if self.backend == "iceberg":
            try:
                return self._materialize_iceberg(df, name, partition_by)
            except Exception as exc:
                import warnings

                warnings.warn(
                    f"iceberg catalog '{self.catalog}' unusable ({exc}); "
                    "falling back to the parquet snapshot emulation"
                )
                self.catalog = None

        m = self._manifest(name)
        if m is None:
            m = {"current": 0, "snapshots": []}
            legacy = self._table_dir(name)
            if os.path.exists(os.path.join(legacy, "_SUCCESS")):
                # first versioned commit over a pre-versioning layout: move
                # the legacy part files into v000 so they never mix with new
                # snapshots under the table dir (raw recursive reads of
                # <base>/<name> would otherwise see old+new data)
                v0 = self._version_dir(name, 0)
                os.makedirs(v0, exist_ok=True)
                for entry in os.listdir(legacy):
                    if not re.fullmatch(r"v\d{3}", entry):
                        shutil.move(
                            os.path.join(legacy, entry), os.path.join(v0, entry)
                        )
                m["snapshots"].append(
                    {
                        "name": name,
                        "version": 0,
                        "migrated_legacy": True,
                        "committed_at_epoch": time.time(),
                    }
                )
                m["current"] = 0
        version = (
            max((s["version"] for s in m["snapshots"]), default=0) + 1
            if m["snapshots"]
            else 1
        )

        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        path = self._version_dir(name, version)
        writer.parquet(path)
        out = self.spark.read.parquet(path)

        part_counts = [
            r["cnt"]
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("cnt"))
            .orderBy("pid")
            .collect()
        ]
        meta = {
            "name": name,
            "version": version,
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
            "committed_at_epoch": time.time(),
        }
        m["snapshots"].append(meta)
        m["current"] = version
        self._write_manifest(name, m)
        # per-name lineage sidecar mirrors the CURRENT snapshot (back-compat)
        with open(self._meta_path(name), "w") as fh:
            json.dump(meta, fh, indent=2)
        return out

    def _materialize_iceberg(
        self, df: DataFrame, name: str, partition_by: list[str] | None
    ) -> DataFrame:
        """Real Iceberg commit: createOrReplace = a new snapshot; Iceberg's
        own metadata supplies the versioning/time-travel the parquet
        emulation reimplements."""
        tbl = self._iceberg_table(name)
        writer = df.writeTo(tbl).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return self.spark.table(tbl)

    def read(
        self, name: str, version: int | None = None, as_of: float | None = None
    ) -> DataFrame:
        """Reader for a snapshot: current (default), a specific ``version``,
        or the latest committed at-or-before ``as_of`` epoch seconds."""
        if self.backend == "iceberg":
            tbl = self._iceberg_table(name)
            if version is not None:
                return self.spark.sql(f"SELECT * FROM {tbl} VERSION AS OF {version}")
            if as_of is not None:
                return self.spark.sql(
                    f"SELECT * FROM {tbl} FOR SYSTEM_TIME AS OF "
                    f"to_timestamp({as_of})"
                )
            return self.spark.table(tbl)
        return self.spark.read.parquet(self._resolve(name, version, as_of))

    def expire_snapshots(self, name: str, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions; returns dropped
        version numbers (Iceberg expireSnapshots semantics — the current
        pointer is never dropped)."""
        m = self._manifest(name)
        if m is None:
            return []
        snaps = sorted(m["snapshots"], key=lambda s: s["version"])
        keep = {s["version"] for s in snaps[-max(keep_last, 1):]} | {m["current"]}
        dropped = []
        for s in snaps:
            v = s["version"]
            if v not in keep:
                shutil.rmtree(self._version_dir(name, v), ignore_errors=True)
                dropped.append(v)
        m["snapshots"] = [s for s in snaps if s["version"] not in set(dropped)]
        self._write_manifest(name, m)
        return dropped

    def lineage(self, name: str) -> dict:
        with open(self._meta_path(name)) as fh:
            return json.load(fh)
