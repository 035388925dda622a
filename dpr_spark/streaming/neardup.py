"""Streaming NEAR-dup dedup of the crawl stream — MinHash + LSH run
incrementally, the companion of streaming/dedup.py's exact stage (which
only catches byte-identical content; boilerplate-shifted or
lightly-edited re-posts need similarity).

Per micro-batch:

1. signatures: one MinHash signature per page (extras/dedup.py's
   `minhash_signatures` — affine permutations over hashed shingles).
2. within-batch: LSH candidate pairs ≥ threshold → connected
   components → every cluster keeps its canonical member (minimum url,
   the same cluster-min contract as extras/dedup.py::dedup_clusters).
3. cross-batch: survivors' band keys probe the accumulated band-bucket
   LEDGER; colliding (new, old) pairs verify against the old doc's
   stored signature (estimated Jaccard = matching slot fraction) and
   ≥ threshold drops the new doc.
4. state append: per epoch, survivors' docs, signatures and band keys
   are written to epoch dirs; `dups/` records every dropped url with
   its dup_of and scope ('batch' | 'ledger') for audit.

Idempotence: the same epoch-dir-overwrite recipe as streaming/dedup.py
and streaming/alerts.py — an at-least-once replay of epoch N excludes
epoch N's own half-written shards from every ledger read, recomputes
the identical survivors, and overwrites.

Admission is ORDER-DEPENDENT by design (as in any incremental dedup —
an admitted doc cannot be un-admitted when a "better" representative
arrives later); the deterministic contract is: a doc survives iff it is
its within-batch cluster's minimum url AND it verifies < threshold
against every earlier-epoch survivor sharing an LSH band.

Scale shape: state per admitted doc = one signature row (num_perm
longs) + `bands` 16-byte bucket rows — never the text; the cross-batch
probe shuffles batch-sized band keys against the bucket-partitioned
ledger, and signature verification joins only the colliding pairs.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.extras.dedup import (
    band_keys,
    connected_components,
    minhash_signatures,
    sig_match_frac,
)

NEARDUP_OUT_SCHEMA = "url string, warc_ts timestamp, text string"


class StreamingNearDeduper:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        threshold: float = 0.7,
        num_perm: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
    ):
        if num_perm % bands:
            raise ValueError("num_perm must be divisible by bands")
        self.spark = spark
        self.out_dir = out_dir
        self.threshold = threshold
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.docs_dir = os.path.join(out_dir, "docs")
        self.sigs_dir = os.path.join(out_dir, "sigs")
        self.buckets_dir = os.path.join(out_dir, "buckets")
        self.dups_dir = os.path.join(out_dir, "dups")
        for d in (self.docs_dir, self.sigs_dir, self.buckets_dir, self.dups_dir):
            os.makedirs(d, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _epoch_dirs(self, base: str, exclude_epoch: Optional[int] = None):
        out = []
        for d in os.listdir(base):
            if not d.startswith("epoch="):
                continue
            if exclude_epoch is not None and d == f"epoch={exclude_epoch}":
                continue
            out.append(os.path.join(base, d))
        return out

    def _read(self, base: str, schema: str, exclude_epoch: Optional[int] = None):
        dirs = self._epoch_dirs(base, exclude_epoch)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*dirs)

    def docs(self) -> DataFrame:
        """Every surviving (url, warc_ts, text) so far."""
        return self._read(self.docs_dir, NEARDUP_OUT_SCHEMA)

    def dups(self) -> DataFrame:
        """Audit trail: (url, dup_of, est_jaccard, scope) per dropped doc."""
        return self._read(
            self.dups_dir, "url string, dup_of string, est_jaccard double, scope string"
        )

    def _bucket_ledger(self, exclude_epoch: int) -> DataFrame:
        return self._read(
            self.buckets_dir,
            "band int, key long, url string",
            exclude_epoch=exclude_epoch,
        )

    def _sig_ledger(self, exclude_epoch: int) -> DataFrame:
        return self._read(
            self.sigs_dir, "url string, sig array<long>", exclude_epoch=exclude_epoch
        )

    # -- processing ---------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Idempotent per-epoch near-dup step (foreachBatch target)."""
        epoch_id = int(epoch_id)
        docs = batch_df.select("url", "warc_ts", "text").dropDuplicates(["url"])
        sigs = minhash_signatures(
            docs, text_col="text", id_col="url",
            num_perm=self.num_perm, shingle_n=self.shingle_n,
        ).withColumnRenamed("doc", "url").persist()

        # within-batch: candidate pairs -> components -> cluster-min url
        banded = band_keys(
            sigs.withColumnRenamed("url", "doc"), self.bands, self.rows_per_band
        ).withColumnRenamed("doc", "url").persist()
        x, y = banded.alias("x"), banded.alias("y")
        pairs = (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.url") < F.col("y.url")),
            )
            .select(
                F.col("x.url").alias("a"),
                F.col("y.url").alias("b"),
                sig_match_frac(F.col("x.sig"), F.col("y.sig")).alias("est_jaccard"),
            )
            .dropDuplicates(["a", "b"])
            .filter(F.col("est_jaccard") >= self.threshold)
        ).persist()
        comps = connected_components(pairs, "a", "b")
        batch_dups = (
            comps.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias("url"),
                F.col("component").alias("dup_of"),
                F.lit("batch").alias("scope"),
            )
            # est_jaccard vs the canonical member when the pair was direct;
            # transitive members record the component edge that pulled them in
            .join(
                pairs.select(
                    F.col("b").alias("url"),
                    F.col("a").alias("dup_of"),
                    "est_jaccard",
                ),
                ["url", "dup_of"],
                "left",
            )
        )
        keep = docs.join(
            batch_dups.select("url"), "url", "left_anti"
        )

        # cross-batch: probe the band ledger, verify vs stored signatures
        led_buckets = self._bucket_ledger(exclude_epoch=epoch_id)
        led_sigs = self._sig_ledger(exclude_epoch=epoch_id)
        cand = (
            banded.join(keep.select("url"), "url", "left_semi")
            .join(
                led_buckets.withColumnRenamed("url", "old_url"),
                ["band", "key"],
            )
            .select("url", "sig", "old_url")
            .dropDuplicates(["url", "old_url"])
        )
        ledger_hits = (
            cand.join(led_sigs.withColumnRenamed("url", "old_url")
                      .withColumnRenamed("sig", "old_sig"), "old_url")
            .withColumn("est_jaccard", sig_match_frac(F.col("sig"), F.col("old_sig")))
            .filter(F.col("est_jaccard") >= self.threshold)
        )
        # deterministic audit row: the smallest old_url that verified
        ledger_dups = ledger_hits.groupBy("url").agg(
            F.min_by(
                F.struct(F.col("old_url").alias("dup_of"), "est_jaccard"), "old_url"
            ).alias("m")
        ).select(
            "url",
            F.col("m.dup_of").alias("dup_of"),
            F.col("m.est_jaccard").alias("est_jaccard"),
            F.lit("ledger").alias("scope"),
        )
        fresh = keep.join(ledger_dups.select("url"), "url", "left_anti").persist()

        # epoch-overwrite state appends (idempotent on replay)
        fresh.select("url", "warc_ts", "text").write.mode("overwrite").parquet(
            os.path.join(self.docs_dir, f"epoch={epoch_id}")
        )
        sigs.join(fresh.select("url"), "url", "left_semi").write.mode(
            "overwrite"
        ).parquet(os.path.join(self.sigs_dir, f"epoch={epoch_id}"))
        banded.select("band", "key", "url").join(
            fresh.select("url"), "url", "left_semi"
        ).write.mode("overwrite").parquet(
            os.path.join(self.buckets_dir, f"epoch={epoch_id}")
        )
        batch_dups.select("url", "dup_of", "est_jaccard", F.col("scope")).unionByName(
            ledger_dups.select("url", "dup_of", "est_jaccard", "scope")
        ).write.mode("overwrite").parquet(
            os.path.join(self.dups_dir, f"epoch={epoch_id}")
        )
        for df in (sigs, banded, pairs, fresh):
            df.unpersist()

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
