"""Resumable, manifest-checkpointed index build (SURVEY.md S8/D6;
north_rule "resumable from checkpoint with per-partition lineage +
metrics").

The reference's resumability story is "run generate_dense_embeddings.py
again with the shard ids that failed" (`/root/reference/README.md:182-186`)
plus serialized FAISS files guarded by index_exists()
(`dpr/indexer/faiss_indexers.py:41-79`). Here the corpus is split into
deterministic url-hash shards; each shard's tokenize+tf output is an
independent parquet write recorded in a manifest table

    build_manifest(partition_id, status, rows, bytes, wall_ms)

(FIXTURES.md §3). A re-run after a crash processes ONLY shards not
marked done — the expensive Arrow tokenization pass is never repeated.
Manifest updates are atomic (tmp + rename), emulating Iceberg snapshot
commits with plain parquet + JSON (SURVEY.md §7 fallback: the Iceberg
runtime jar is absent in this sandbox; the table API is kept thin so the
writeTo()/snapshot calls drop in unchanged).

Final assembly (dense ids, dictionary, stats, postings, blocks) reads
the union of shard outputs — cheap relative to the scan, and itself a
pure recomputation (safe to redo on every resume).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.index.build import InvertedIndex, IndexStats, _encode_blocks


@dataclass
class ShardRecord:
    partition_id: int
    status: str
    rows: int
    bytes: int
    wall_ms: int


class ResumableIndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        n_shards: int = 16,
        lang: Optional[str] = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.n_shards = n_shards
        self.lang = lang
        os.makedirs(workdir, exist_ok=True)

    # ------------------------------------------------------------- manifest

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.workdir, "build_manifest.json")

    def read_manifest(self) -> dict[int, ShardRecord]:
        if not os.path.exists(self._manifest_path):
            return {}
        with open(self._manifest_path) as f:
            raw = json.load(f)
        return {int(k): ShardRecord(**v) for k, v in raw.items()}

    def _commit_manifest(self, records: dict[int, ShardRecord]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: vars(v) for k, v in records.items()}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic snapshot commit

    def manifest_df(self) -> DataFrame:
        """build_manifest as a DataFrame (per-partition lineage+metrics)."""
        recs = [vars(r) for r in self.read_manifest().values()]
        return self.spark.createDataFrame(
            recs or [],
            "partition_id int, status string, rows long, bytes long, wall_ms long",
        )

    # ----------------------------------------------------------- shard pass

    def _shard_dir(self, pid: int) -> str:
        return os.path.join(self.workdir, "doc_terms", f"shard={pid}")

    def run_shards(self, pages: DataFrame, fail_after: Optional[int] = None) -> int:
        """Process all not-yet-done shards; returns how many were processed
        this run. `fail_after` aborts after N shards (for resume tests)."""
        manifest = self.read_manifest()
        processed = 0
        src = pages
        if self.lang is not None:
            src = src.filter(F.col("lang") == self.lang)
        src = src.select("url", "text").withColumn(
            "_shard", F.pmod(F.xxhash64("url"), F.lit(self.n_shards)).cast("int")
        )
        for pid in range(self.n_shards):
            rec = manifest.get(pid)
            if rec is not None and rec.status == "done":
                continue
            t0 = time.perf_counter()
            shard = src.filter(F.col("_shard") == pid).drop("_shard")
            # url-keyed doc_terms; dense doc ids are assigned globally at
            # assembly time (they need the full url set)
            shard_out = self._shard_doc_terms(shard)
            path = self._shard_dir(pid)
            shard_out.write.mode("overwrite").parquet(path)
            rows = self.spark.read.parquet(path).count()
            nbytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            manifest[pid] = ShardRecord(
                pid, "done", rows, nbytes, int((time.perf_counter() - t0) * 1000)
            )
            self._commit_manifest(manifest)
            processed += 1
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} shards")
        return processed

    def _shard_doc_terms(self, shard: DataFrame) -> DataFrame:
        """(url, doclen, term, tf) for one shard — url-keyed doc_terms,
        same fused/vectorized kernel as the single-pass build
        (build.py::tf_batch; no per-row Python per input_hint)."""
        import numpy as np
        import pandas as pd
        from typing import Iterator

        from dpr_spark.functions.tokenizer import _compiled_fast
        from dpr_spark.index.build import tf_batch

        def run(it: Iterator[pd.DataFrame]):
            pat = _compiled_fast()
            for pdf in it:
                out = tf_batch(pdf["text"], pat)
                if out is None:
                    continue
                u_doc, lens, terms, tfs = out
                urls = pdf["url"].to_numpy(object)
                yield pd.DataFrame(
                    {
                        "url": urls[u_doc],
                        "doclen": lens[u_doc].astype(np.int32),
                        "term": terms,
                        "tf": tfs,
                    }
                )

        return shard.select("url", "text").mapInPandas(
            run, "url string, doclen int, term string, tf long"
        )

    # ------------------------------------------------------------- assembly

    def assemble(
        self,
        pages: DataFrame,
        build_blocks: bool = True,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> InvertedIndex:
        manifest = self.read_manifest()
        missing = [p for p in range(self.n_shards) if p not in manifest or manifest[p].status != "done"]
        if missing:
            raise ValueError(f"shards not built yet: {missing}")
        from dpr_spark.plans.ids import assign_dense_ids

        ut = self.spark.read.parquet(os.path.join(self.workdir, "doc_terms"))
        src = pages
        if self.lang is not None:
            src = src.filter(F.col("lang") == self.lang)
        ids = assign_dense_ids(src.select("url"), "url", "doc_id")
        tf = ut.join(ids, "url").select("doc_id", "doclen", "term", "tf").persist()

        doclens = tf.groupBy("doc_id").agg(F.first("doclen").alias("doclen"))
        docstats = (
            ids.join(doclens, "doc_id", "left")
            .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
            .select("doc_id", "url", "doclen")
            .persist()
        )
        row = docstats.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
        stats = IndexStats(int(row["n"]), float(row["avgdl"]))

        df_by_term = tf.groupBy("term").agg(F.count("*").alias("df"))
        dictionary = (
            assign_dense_ids(df_by_term, "term", "term_id")
            .withColumn(
                "idf",
                F.log(
                    (F.lit(float(stats.n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
            )
            .select("term", F.reverse("term").alias("rterm"), "term_id", "df", "idf")
        )
        postings = tf.join(
            F.broadcast(dictionary.select("term", "term_id", "idf")), "term"
        ).select("term_id", "doc_id", "tf", "doclen", "idf")
        par = self.spark.sparkContext.defaultParallelism
        blocks = (
            _encode_blocks(postings, stats.avgdl, k1=k1, b=b, num_partitions=2 * par)
            if build_blocks
            else None
        )
        return InvertedIndex(
            docstats, dictionary, postings.drop("idf"), blocks, stats,
            cached=[tf, docstats],
            id_strategy="dense_rank",
        )
