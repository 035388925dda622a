"""Incremental index refresh via Structured Streaming (SURVEY.md §2.11).

The reference is strictly batch; the streaming-adjacent need is index
FRESHNESS: new crawl pages should become searchable without a full
rebuild. Design:

- a file-source stream watches the pages directory (at real scale:
  Kafka / Iceberg CDC);
- foreachBatch tokenizes each micro-batch with the same fused doc_terms
  pass and APPENDS url-keyed posting rows to a delta area — either plain
  epoch-partition dirs, or (pass a SnapshotCatalog) versioned append
  snapshots with manifest-planned reads and time travel over index
  freshness states;
- queries see base + delta via DataFrame union (delta doclen/df slightly
  stale global stats is the standard trade; `compact()` folds the delta
  into a fresh full build when it grows past a threshold).

doc ids for delta docs use the hash strategy (dense rank would need a
global resort — exactly what incrementality avoids); base ids stay
stable, so results remain reproducible between compactions.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.index.build import build_index_from_docs, doc_terms


class StreamingIndexRefresher:
    def __init__(self, spark: SparkSession, delta_dir: str, catalog=None):
        """`catalog` (optional SnapshotCatalog): when given, each
        micro-batch is committed as an APPEND snapshot instead of an
        epoch partition dir — the "Kafka/Iceberg CDC" shape: versioned
        freshness (time travel over index states), manifest-planned
        reads, and idempotent redelivery via the recorded epoch id."""
        self.spark = spark
        self.delta_dir = delta_dir
        self.catalog = catalog
        os.makedirs(delta_dir, exist_ok=True)

    def start(self, pages_path: str, schema, checkpoint: Optional[str] = None):
        """Watch pages_path for new parquet files; append tokenized
        doc_terms per micro-batch. Returns the StreamingQuery."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(pages_path)
        )

        def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
            # foreachBatch is at-least-once: a retried micro-batch must
            # not re-append. Plain-dir mode: each epoch OVERWRITES its own
            # partition dir (epoch=<id>/). Catalog mode: skip epochs whose
            # id is already committed (epoch ids are stable under the
            # stream's checkpoint — the standard foreachBatch exactly-once
            # recipe); a half-written crashed attempt is invisible anyway
            # because readers plan from published manifests.
            docs = batch_df.select(
                F.xxhash64("url").alias("doc_id"), "url", "text"
            )
            terms = doc_terms(docs)
            urls = docs.select("doc_id", "url")
            if self.catalog is not None:
                done = {
                    s["properties"].get("epoch") for s in self.catalog.history()
                }
                if epoch_id in done:
                    return
                self.catalog.append(
                    {"doc_terms": terms, "docs": urls},
                    properties={"epoch": epoch_id},
                )
                return
            terms.write.mode("overwrite").parquet(
                os.path.join(self.delta_dir, "doc_terms", f"epoch={epoch_id}")
            )
            urls.write.mode("overwrite").parquet(
                os.path.join(self.delta_dir, "docs", f"epoch={epoch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(per_batch)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.delta_dir, "_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
        return q

    def _read_epoched(self, name: str) -> Optional[DataFrame]:
        if self.catalog is not None:
            try:
                return self.catalog.read(name)
            except ValueError:  # nothing committed yet
                return None
        p = os.path.join(self.delta_dir, name)
        if not os.path.isdir(p) or not any(
            d.startswith("epoch=") for d in os.listdir(p)
        ):
            return None
        # epoch=<id> partition dirs; drop the inferred partition column
        return self.spark.read.parquet(p).drop("epoch")

    def delta_doc_terms(self) -> Optional[DataFrame]:
        return self._read_epoched("doc_terms")

    def delta_docs(self) -> Optional[DataFrame]:
        return self._read_epoched("docs")

    def compact(self, base_pages: DataFrame, delta_pages: DataFrame):
        """Fold the delta into a fresh full build (periodic compaction):
        base ∪ delta pages -> build_index. Returns the new index."""
        all_pages = base_pages.select("url", "text").unionByName(
            delta_pages.select("url", "text")
        )
        docs = all_pages.withColumn("doc_id", F.xxhash64("url"))
        return build_index_from_docs(self.spark, docs, build_blocks=False)
