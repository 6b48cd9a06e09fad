"""MERGE-capable parquet table: bucket-partitioned copy-on-write upsert.

The container ships no Delta/Iceberg jars, so ``MERGE INTO`` is not
available as a table-format primitive. This module implements the same
contract the way those formats do under the hood -- copy-on-write
scoped to affected files -- using only Spark built-ins:

- the table is a parquet dir hash-partitioned on a stable key bucket
  (``__bucket = pmod(xxhash64(key), n_buckets)``);
- a merge computes the affected bucket set from the updates (bounded by
  ``n_buckets``, metadata-sized), reads ONLY those partitions
  (partition-pruned scan), applies the merge logic, and rewrites ONLY
  those partitions via dynamic partition overwrite.

Cost per merge is proportional to the touched buckets, not the table --
the property that makes upsert viable on a 100 TB history table. At
1000-executor scale ``n_buckets`` grows to keep per-bucket rewrite
units in the hundreds of MB; the dataflow is unchanged. Swapping this
for a real Delta table is a sink substitution, not a redesign
(docstring parity: Delta's MERGE also rewrites whole affected files).

The reference has no persistent-table surface (its output is an
in-memory vector, MapReduceFramework.cpp:381-403); this is charter
scope (SURVEY.md section 2, training-pipeline sinks).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

DEFAULT_N_BUCKETS = 64


class MergeTable:
    """A parquet-backed table supporting bucket-scoped MERGE.

    ``keys`` identify a row; ``n_buckets`` fixes the hash layout at
    creation (changing it means a rewrite, as with any bucketed store).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        n_buckets: int = DEFAULT_N_BUCKETS,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.n_buckets = n_buckets

    def _bucket(self, df: DataFrame) -> DataFrame:
        # repartition on the bucket column so each bucket is one task's
        # contiguous write (without it: tasks x buckets small files) --
        # shared by every write path, same as the SnapshotMergeTable
        # sibling
        return df.withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*self.keys), F.lit(self.n_buckets)).cast("int"),
        ).repartition(self.n_buckets, F.col("__bucket"))

    def _schema_file(self) -> str:
        return os.path.join(self.path, "_schema.json")

    def _save_schema(self, bucketed: DataFrame) -> None:
        """Persist the bucketed schema as table metadata (the role a
        format's log plays). Without it an EMPTY table -- zero bucket
        dirs, just _SUCCESS -- is unreadable (parquet schema inference
        has no files) and exists() would misread it as absent. The
        underscore prefix keeps Spark's file listing from treating it
        as data."""
        tmp = self._schema_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(bucketed.schema.jsonValue(), f)
        os.replace(tmp, self._schema_file())

    def _stored_schema(self) -> StructType | None:
        try:
            with open(self._schema_file()) as f:
                return StructType.fromJson(json.load(f))
        except OSError:
            return None

    def _read_raw(self) -> DataFrame:
        """The table WITH its layout column, schema-explicit when the
        metadata exists (pre-metadata tables fall back to inference)."""
        schema = self._stored_schema()
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path)

    def exists(self) -> bool:
        if os.path.exists(self._schema_file()):
            return True
        # ONLY path-absent (AnalysisException) means "no table": a
        # transient read failure must propagate, or merge() would
        # misread it as first-write and overwrite() the whole table
        # with one update batch
        try:
            self.spark.read.parquet(self.path)
            return True
        except AnalysisException:
            return False

    def read(self) -> DataFrame:
        """The table as a DataFrame (layout column dropped)."""
        return self._read_raw().drop("__bucket")

    def overwrite(self, df: DataFrame) -> None:
        """(Re)create the table from scratch."""
        bucketed = self._bucket(df)
        bucketed.write.mode("overwrite").partitionBy("__bucket").parquet(self.path)
        self._save_schema(bucketed)

    def merge(
        self,
        updates: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    ) -> None:
        """MERGE ``updates`` into the table, rewriting only affected buckets.

        ``merge_fn(existing_affected, updates) -> new_affected`` defines
        the merge semantics over the affected-bucket slice; the default
        is upsert (WHEN MATCHED THEN UPDATE ALL / WHEN NOT MATCHED THEN
        INSERT): an update row replaces the existing row with its key.

        The affected-bucket set is collected driver-side -- it is
        bounded by ``n_buckets`` (layout metadata, like a format's
        file-listing), never by data volume.
        """
        if not self.exists():
            if merge_fn is not None:
                # a custom merge_fn is written against the TABLE schema;
                # handing it the updates frame as `existing` would break
                # any merge_fn whose output schema differs from the
                # updates schema (e.g. SCD2's state/valid_from columns).
                # First-write is the caller's decision: seed via
                # overwrite() with a frame already in table schema.
                raise ValueError(
                    f"MergeTable at {self.path} does not exist; seed it "
                    "with overwrite() before merging with a custom "
                    "merge_fn (its contract is merge_fn(existing_affected"
                    " [table schema], updates))"
                )
            self.overwrite(updates)
            return
        if merge_fn is None:
            merge_fn = self._upsert
        # materialize the bucketed updates ONCE: the affected-bucket
        # collect and the rewrite must see the SAME rows, or a
        # non-deterministic updates frame (rand keys, a directory that
        # gains files between actions) lets dynamic overwrite truncate
        # a bucket the collect never flagged
        bucketed_updates = self._bucket(updates).localCheckpoint(eager=True)
        buckets = [
            r["__bucket"]
            for r in bucketed_updates.select("__bucket").distinct().collect()
        ]
        existing = (
            self._read_raw()
            .filter(F.col("__bucket").isin(buckets))  # partition-pruned
            .drop("__bucket")
        )
        merged = merge_fn(existing, bucketed_updates.drop("__bucket"))
        self._rewrite_buckets(merged, buckets)

    def _upsert(self, existing: DataFrame, updates: DataFrame) -> DataFrame:
        return existing.join(updates, self.keys, "left_anti").unionByName(updates)

    def delete(self, predicate) -> None:
        """Delete rows matching ``predicate`` (a Column), rewriting only
        the buckets that contain matches."""
        if not self.exists():
            return
        full = self._read_raw()
        buckets = [
            r["__bucket"]
            for r in full.filter(predicate).select("__bucket").distinct().collect()
        ]
        if not buckets:
            return
        # SQL DELETE semantics: remove rows where predicate IS TRUE;
        # rows where it evaluates NULL are KEPT (plain ~predicate is
        # NULL for them, which filter drops -- silent data loss)
        kept = (
            full.filter(F.col("__bucket").isin(buckets))
            .filter(~F.coalesce(predicate, F.lit(False)))
            .drop("__bucket")
        )
        self._rewrite_buckets(kept, buckets)

    def _rewrite_buckets(self, new_slice: DataFrame, affected: list[int]) -> None:
        """Replace exactly the ``affected`` partitions with ``new_slice``.

        localCheckpoint materializes the (affected-slice-sized) result
        before overwriting the partitions its plan reads -- a real
        format gets this for free from write-new-files-then-commit.
        Dynamic overwrite only replaces partitions PRESENT in the
        written data, so an affected bucket the merge emptied must have
        its directory removed explicitly (the delete-commit a format
        encodes in its log)."""
        bucketed = self._bucket(new_slice).localCheckpoint(eager=True)
        (
            bucketed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(self.path)
        )
        self._save_schema(bucketed)  # a custom merge_fn may evolve it
        survivors = {
            r["__bucket"] for r in bucketed.select("__bucket").distinct().collect()
        }
        for b in set(affected) - survivors:
            shutil.rmtree(os.path.join(self.path, f"__bucket={b}"), ignore_errors=True)
