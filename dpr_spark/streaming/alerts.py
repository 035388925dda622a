"""Streaming percolator — standing-query ALERTING over a crawl stream
(the ES percolator in watcher mode; Lucene's Monitor/Luwak): queries
register once, every micro-batch of incoming pages is matched against
them, and (url, pqid) alerts append exactly-once per epoch.

This is the reverse-search dual of streaming/refresh.py: refresh makes
new docs searchable by queries-to-come; alerts notify queries-already-
registered about docs-just-crawled. Both ride the same file-source →
foreachBatch shape (Kafka/CDC at real scale) and the same
epoch-overwrite idempotence recipe.

Scale shape: the registered-query table is (queries × terms)-sized and
broadcasts into the per-batch doc-term join (query/percolate.py); each
micro-batch tokenizes once through the fused Arrow kernel; no state
grows with the stream except the alert log itself.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.query.percolate import PercolatorQuery, percolate, register_queries


class StreamingPercolator:
    def __init__(
        self,
        spark: SparkSession,
        queries: Sequence[PercolatorQuery],
        out_dir: str,
        analyzer=None,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.analyzer = analyzer
        self.registered = register_queries(spark, queries, analyzer=analyzer)
        self.registered = self.registered.persist()
        self.registered.count()
        os.makedirs(out_dir, exist_ok=True)

    def start(self, pages_path: str, schema, checkpoint: Optional[str] = None):
        """Watch `pages_path` (url, text[, warc_ts]) and append alerts
        (url, pqid, epoch). availableNow trigger — drains what exists,
        then stops (the test/batch-drain mode; drop the trigger for a
        resident watcher)."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(pages_path)
        )

        def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
            docs = batch_df.select(
                F.xxhash64("url").alias("doc_id"), "url", "text"
            )
            hits = percolate(
                docs.select("doc_id", "text"), self.registered,
                analyzer=self.analyzer,
            )
            alerts = (
                hits.join(docs.select("doc_id", "url"), "doc_id")
                .select("url", "pqid", F.lit(int(epoch_id)).alias("epoch"))
            )
            # at-least-once foreachBatch -> exactly-once alerts: each
            # epoch overwrites its own partition dir
            alerts.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"epoch={epoch_id}")
            )

        return (
            stream.writeStream.foreachBatch(per_batch)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.out_dir, "_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )

    def alerts(self) -> DataFrame:
        """(url, pqid, epoch) matched so far; empty DataFrame if none."""
        dirs = [
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("epoch=")
        ]
        if not dirs:
            return self.spark.createDataFrame(
                [], "url string, pqid long, epoch long"
            )
        return self.spark.read.parquet(*dirs)
