"""Snapshot checkpoints + resume (north rule: "resumable from Iceberg
snapshot checkpoints").

The container has no Iceberg runtime, so snapshots are modeled as
atomic parquet directories with a JSON manifest (name, row count, schema
fingerprint, monotonically increasing snapshot id). The API mirrors what
the Iceberg path would be in production (``df.writeTo(table).createOrReplace``
+ snapshot-id bookkeeping); swapping the backend touches only this module.

``resume_or_compute`` is the pipeline primitive: if a valid snapshot for
``name`` exists, the stage is skipped and its result is read back;
otherwise the stage computes, snapshots, and returns the re-read frame
(so downstream lineage is rooted at the checkpoint — iterative consumers
don't re-trigger upstream work).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotStore"]


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self._spark = spark
        self._root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self._root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self._dir(name), "_manifest.json")

    def has(self, name: str) -> bool:
        return os.path.exists(self._manifest(name))

    def read(self, name: str) -> DataFrame:
        return self._spark.read.parquet(os.path.join(self._dir(name), "data"))

    def write(self, name: str, df: DataFrame) -> DataFrame:
        """Atomic snapshot: write to a temp dir, fsync manifest last."""
        target = self._dir(name)
        tmp = target + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        data_dir = os.path.join(tmp, "data")
        df.write.mode("overwrite").parquet(data_dir)
        count = self._spark.read.parquet(data_dir).count()
        manifest = {
            "name": name,
            "rows": count,
            "schema": df.schema.simpleString(),
            "snapshot_id": self._next_id(),
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        shutil.rmtree(target, ignore_errors=True)
        os.rename(tmp, target)
        return self.read(name)

    def _next_id(self) -> int:
        ids = []
        for name in os.listdir(self._root):
            mf = self._manifest(name)
            if os.path.exists(mf):
                with open(mf) as fh:
                    ids.append(json.load(fh).get("snapshot_id", 0))
        return max(ids, default=0) + 1

    def resume_or_compute(self, name: str, compute) -> tuple[DataFrame, bool]:
        """Returns (frame, resumed). ``compute`` is a zero-arg callable."""
        if self.has(name):
            return self.read(name), True
        return self.write(name, compute()), False

    def invalidate(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)
