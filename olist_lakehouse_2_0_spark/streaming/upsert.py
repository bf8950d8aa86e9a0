"""Streaming MERGE upsert: the Delta `foreachBatch + MERGE INTO`
pattern (the standard streaming-upsert sink on the reference's
platform) over this repo's versioned tables.

Each micro-batch is first reduced to its latest row per key (same-batch
multiple versions collapse before the merge — the CDC engine's
discipline, operators/cdc.py), then merged into the versioned target
with a sequence guard: WHEN MATCHED AND s.seq > t.seq THEN UPDATE /
WHEN NOT MATCHED THEN INSERT. Out-of-order rows ACROSS batches are
no-ops by the guard, so replaying a checkpointed batch is idempotent —
exactly-once table state from at-least-once batch delivery.

Scale notes: the per-batch merge is O(target + batch) copy-on-write
(docs/SCALE.md merge row); the per-batch dedup shuffles only the batch.
The CAS promote serializes concurrent writers; a conflicting committer
(e.g. a parallel maintenance job) triggers merge_into's
recompute-and-retry rather than a lost update.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_lakehouse_2_0_spark.catalog import Catalog


@dataclass
class VersionedMergeSink:
    """foreachBatch sink: upsert each micro-batch into a versioned
    table, keyed on ``keys`` with monotonicity enforced by
    ``sequence_col``. Plug into
    :func:`~olist_lakehouse_2_0_spark.streaming.ingest.run_foreach_batch`.
    """

    catalog: Catalog
    name: str
    keys: tuple[str, ...]
    sequence_col: str
    layer: str | None = None
    keep: int = 2

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.sequence_col).desc()
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        spark = batch_df.sparkSession
        if self.catalog.latest_version_number(spark, self.name, self.layer) == 0:
            self.catalog.write_versioned(
                latest, spark, self.name, layer=self.layer, keep=self.keep
            )
            return
        self.catalog.merge_into(
            spark,
            latest,
            self.name,
            list(self.keys),
            layer=self.layer,
            keep=self.keep,
            matched_update_condition=F.col(f"s.{self.sequence_col}")
            > F.col(f"t.{self.sequence_col}"),
            # The window above just collapsed the batch to one row per
            # key — skip merge_into's duplicate-source validation pass.
            validate_unique_source=False,
        )
