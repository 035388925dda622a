"""Streaming exact dedup of the crawl stream — the training-data
pipeline's "don't store the same page twice" stage, run incrementally.

Within each micro-batch the first copy per content digest survives
(ordered by (warc_ts, url) — a total order, so the choice is
deterministic); across batches an anti-join against the accumulated
digest LEDGER drops content any earlier epoch already admitted. Both
the surviving docs and the ledger shard append per epoch with the same
epoch-dir-overwrite idempotence recipe as streaming/alerts.py: an
at-least-once foreachBatch replay of epoch N rewrites epoch=N
deterministically, and the ledger read EXCLUDES the replaying epoch's
own shard, so the anti-join sees the same world on retry.

Scale shape: the ledger holds (digest) only — 16 bytes/doc, never the
text; the cross-batch anti-join shuffles batch-sized digests against
the digest-partitioned ledger (bucket it by digest at real scale so
the exchange is one-sided). State never re-reads the corpus: dedup of
a 100 TB crawl carries a digest table, not the pages.

Relation to the rest of the suite: extras/dedup.py is the BATCH dedup
family (exact/MinHash/SimHash); plans/latest.py collapses re-crawls of
the SAME url; this module drops DIFFERENT urls carrying identical
content as they arrive.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEDUP_OUT_SCHEMA = "url string, warc_ts timestamp, text string, digest string"


class StreamingDeduper:
    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        self.ledger_dir = os.path.join(out_dir, "digests")
        os.makedirs(self.docs_dir, exist_ok=True)
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- state ----------------------------------------------------------
    def _epoch_dirs(self, base: str, exclude_epoch: Optional[int] = None):
        out = []
        for d in os.listdir(base):
            if not d.startswith("epoch="):
                continue
            if exclude_epoch is not None and d == f"epoch={exclude_epoch}":
                continue
            out.append(os.path.join(base, d))
        return out

    def ledger(self, exclude_epoch: Optional[int] = None) -> DataFrame:
        dirs = self._epoch_dirs(self.ledger_dir, exclude_epoch)
        if not dirs:
            return self.spark.createDataFrame([], "digest string")
        return self.spark.read.parquet(*dirs)

    def docs(self) -> DataFrame:
        """Every surviving (url, warc_ts, text, digest) so far."""
        dirs = self._epoch_dirs(self.docs_dir)
        if not dirs:
            return self.spark.createDataFrame([], DEDUP_OUT_SCHEMA)
        return self.spark.read.parquet(*dirs)

    # -- processing ------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Idempotent per-epoch dedup step (foreachBatch target).

        Epochs are processed sequentially by the single stream, so the
        ledger visible to epoch N is exactly epochs < N — no writer
        fencing needed; a REPLAY of N excludes its own half-written
        shard from the read, recomputes the identical survivors, and
        overwrites."""
        epoch_id = int(epoch_id)
        docs = batch_df.select("url", "warc_ts", "text").withColumn(
            "digest", F.md5("text")
        )
        w = Window.partitionBy("digest").orderBy("warc_ts", "url")
        firsts = (
            docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        fresh = firsts.join(
            self.ledger(exclude_epoch=epoch_id), "digest", "left_anti"
        ).persist()
        fresh.write.mode("overwrite").parquet(
            os.path.join(self.docs_dir, f"epoch={epoch_id}")
        )
        fresh.select("digest").write.mode("overwrite").parquet(
            os.path.join(self.ledger_dir, f"epoch={epoch_id}")
        )
        fresh.unpersist()

    def start(self, pages_path: str, schema, checkpoint: Optional[str] = None):
        """Watch `pages_path` for (url, warc_ts, text[, ...]) parquet and
        drain it with availableNow (drop the trigger for a resident
        deduper)."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(pages_path)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.out_dir, "_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
