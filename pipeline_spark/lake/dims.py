"""Atomically-swapped dimension snapshots with validation bounds (K6).

The reference refreshes its fingerprint dimension by loading the new copy
into a side table, validating the row count against sanity bounds, and
atomically exchanging it with the live table
(``af/fastpath/fastpath/fingerprints_updater.py:46-142``, EXCHANGE TABLES).

Spark/posix-native form: each publish writes a full parquet snapshot under
``versions/v<N>/`` and repoints a ``current`` symlink with ``os.rename``
(atomic on POSIX) — a reader that resolved the symlink keeps reading its
consistent snapshot; the next reader sees the new one; no reader ever sees
a partial dimension. Failed validation leaves ``current`` untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class DimValidationError(Exception):
    pass


class DimSwap:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "versions"), exist_ok=True)

    def _current_link(self) -> str:
        return os.path.join(self.path, "current")

    def current_version(self) -> int | None:
        link = self._current_link()
        if not os.path.lexists(link):
            return None
        return int(os.path.basename(os.readlink(link))[1:])

    def current(self) -> DataFrame:
        link = self._current_link()
        if not os.path.lexists(link):
            raise FileNotFoundError(f"no published dimension at {self.path}")
        # resolve BEFORE reading so a concurrent swap can't split the scan
        return self.spark.read.parquet(os.path.realpath(link))

    def publish(
        self,
        df: DataFrame,
        min_rows: int = 1,
        max_growth: float = 3.0,
    ) -> dict:
        """Write a new snapshot, validate, atomically swap the pointer.

        Bounds mirror the reference's sanity checks: at least ``min_rows``
        rows, and within [1/max_growth, max_growth]× the current snapshot
        (a wild swing usually means a broken upstream export)."""
        v = (self.current_version() or 0) + 1
        dest = os.path.join(self.path, "versions", f"v{v}")
        df.write.mode("overwrite").parquet(dest)
        n = self.spark.read.parquet(dest).count()
        old_n = None
        if self.current_version() is not None:
            old_n = self.current().count()
        if n < min_rows or (old_n and not (old_n / max_growth <= n <= old_n * max_growth)):
            import shutil

            shutil.rmtree(dest)
            raise DimValidationError(f"new dim has {n} rows (current {old_n}, min {min_rows})")
        tmp = self._current_link() + ".tmp"
        if os.path.lexists(tmp):
            os.unlink(tmp)
        # absolute target: a relative `dest` would resolve relative to the
        # symlink's own directory and point at a non-existent doubled path
        os.symlink(os.path.abspath(dest), tmp)
        os.rename(tmp, self._current_link())  # atomic swap
        return {"version": v, "rows": n, "previous_rows": old_n}
