"""Resident serving mode — the analog of the reference's RPC retriever
(`/root/reference/dense_retriever.py:183-298` DenseRPCRetriever: load the
index once, then answer query batches from a long-lived process).

The per-invocation CLI pays JVM start + index load on every run; real
query throughput comes from amortizing those once. make_searcher loads
the engine's serving tables a single time (persisted, or read from the
bucketed at-rest layout) and returns a batch-search closure; serve_loop
drives it over query-batch files appearing in a directory until a STOP
sentinel — each batch reports its own q/s, and the loop reports
steady-state q/s excluding the first (warm-up) batch, which is the
number a resident deployment sees.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from dpr_spark import DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex


def _reject_cursors(queries: DataFrame, engine: str) -> None:
    """Paged batches must fail loudly, not silently return page 1."""
    if "after_score" in queries.columns:
        raise ValueError(
            f"engine={engine!r} does not support search_after cursors "
            "(use engine='segments')"
        )


def make_searcher(
    spark: SparkSession,
    idx: InvertedIndex,
    engine: str = "segments",
    index_dir: Optional[str] = None,
    k: int = DEFAULT_TOP_K,
    positions: Optional[DataFrame] = None,
    deletes: Optional[DataFrame] = None,
) -> Tuple[Callable[[DataFrame], DataFrame], Callable[[], None]]:
    """(search_fn, close_fn): search_fn(queries_df) -> results_df with the
    serving tables resident. Resident state: the dictionary (query-term
    resolution runs per batch) plus the engine's postings form — impact
    segments / compressed blocks persisted in memory, or the bucketed
    storage layout when the index directory carries one (then nothing is
    cached; the bucketed scan serves straight from storage)."""
    persisted = []
    if deletes is not None and engine not in ("segments", "exact"):
        # silently serving tombstoned docs would be a data bug; blockmax
        # and phrase serve the purged index (purge_deletes / compaction)
        raise ValueError(
            f"engine={engine!r} does not apply live tombstones — "
            "purge_deletes the index first, or use segments/exact"
        )
    if positions is None:
        positions = getattr(idx, "positions", None)

    def hold(df: DataFrame) -> DataFrame:
        df = df.persist()
        df.count()
        persisted.append(df)
        return df

    # term resolution touches the dictionary every batch — keep it warm
    idx = InvertedIndex(
        docstats=idx.docstats,
        dictionary=hold(idx.dictionary),
        postings=idx.postings,
        blocks=idx.blocks,
        stats=idx.stats,
    )

    if engine == "segments":
        from pyspark.sql import functions as F

        from dpr_spark.query.wand import build_impact_segments, search_segments

        seg_path = index_dir and os.path.join(index_dir, "segments")
        if seg_path and os.path.isdir(seg_path):
            seg = hold(spark.read.parquet(seg_path))
        else:
            seg = hold(build_impact_segments(idx))

        # tombstones collect ONCE at searcher build (the resident
        # liveDocs array), not per batch
        del_arr = None
        if deletes is not None:
            from dpr_spark.index.deletes import deletes_array

            del_arr = deletes_array(deletes)

        def fn(queries: DataFrame, k: int = k) -> DataFrame:
            # search_after: a batch may page by echoing its previous
            # page's last row per qid as (after_score, after_doc). The
            # cursor map is client-held state, O(queries) — collected on
            # the driver like the rest of the batch bookkeeping.
            cursors = None
            if "after_score" in queries.columns:
                rows = (
                    queries.filter(F.col("after_score").isNotNull())
                    .select("qid", "after_score", "after_doc")
                    .collect()
                )
                cursors = {
                    int(r.qid): (float(r.after_score), int(r.after_doc)) for r in rows
                } or None
                queries = queries.select("qid", "question")
            return search_segments(
                spark, queries, idx, seg, k=k, cursors=cursors, deletes=del_arr
            )

    elif engine == "blockmax":
        from dpr_spark.query.blockmax import (
            build_block_segments,
            load_serving_layout,
            search_blocks,
        )

        meta = index_dir and os.path.join(index_dir, "serving_meta.json")
        if meta and os.path.isfile(meta):
            blocks, norms = load_serving_layout(spark, index_dir)
        else:
            bb, nn = build_block_segments(idx)
            blocks, norms = hold(bb), hold(nn)

        def fn(queries: DataFrame, k: int = k) -> DataFrame:
            _reject_cursors(queries, engine)
            return search_blocks(spark, queries, idx, blocks, norms, k=k)

    elif engine == "exact":
        from dpr_spark.query.scorer import search

        hold(idx.postings)

        def fn(queries: DataFrame, k: int = k) -> DataFrame:
            _reject_cursors(queries, engine)
            return search(queries, idx, k=k, deletes=deletes)

    elif engine == "phrase":
        from dpr_spark.query.phrase import phrase_search_index

        pos_path = index_dir and os.path.join(index_dir, "positions")
        if positions is not None:
            pos = hold(positions)
        elif pos_path and os.path.isdir(pos_path):
            pos = hold(spark.read.parquet(pos_path))
        else:
            raise ValueError(
                "engine='phrase' needs positional postings "
                "(build_index.py --positional)"
            )

        def fn(queries: DataFrame, k: int = k) -> DataFrame:
            _reject_cursors(queries, engine)
            # phrase strings ride to the driver — the same per-wave
            # boundary as the term-resolution payload (~bytes/query)
            phrases = [
                (r.qid, r.question)
                for r in queries.select("qid", "question").collect()
            ]
            return phrase_search_index(spark, idx, pos, phrases, k=k)

    else:
        raise ValueError(engine)

    def close() -> None:
        for df in persisted:
            try:
                df.unpersist(True)
            except Exception:
                pass

    return fn, close


def _read_batch(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".tsv"):
        from dpr_spark.sources.readers import read_qa_tsv

        return read_qa_tsv(spark, path)
    return spark.read.parquet(path)


def serve_loop(
    spark: SparkSession,
    searcher: Callable[[DataFrame], DataFrame],
    in_dir: str,
    out_dir: str,
    poll_sec: float = 0.5,
    max_batches: Optional[int] = None,
    stop_file: str = "STOP",
    log=print,
    dedupe_questions: bool = False,
) -> dict:
    """Process query-batch files (*.tsv / *.parquet) landing in in_dir in
    name order; results go to out_dir/<stem>/ as parquet.

    All batches pending at one poll are COALESCED into a single searcher
    wave (r3 VERDICT next-round #7): each Spark job has a fixed cost
    (~2s of job scheduling + python-worker fan-out on this box) that
    dominated per-200-query batches, so a backlog is re-keyed
    (qid' = batch_index·2^32 + qid — queries are independent, so wave
    composition cannot change any result), searched once, and the
    results split back per batch file. Requires 0 <= qid < 2^32 within a
    batch; a batch violating that falls back to its own wave. Stops when
    in_dir/STOP exists and every pending batch is drained (or after
    max_batches). Returns {batches: [{name, n_queries, wall_sec, qps,
    wave}], steady_qps} — per-batch wall is its share of the wave wall
    (proportional to query count); steady_qps excludes wave 0 (JVM
    codegen + python-worker warm-up), the resident steady state; the
    same summary is written to out_dir/serve_stats.json."""
    from pyspark.sql import functions as F

    _BASE = 1 << 32
    os.makedirs(out_dir, exist_ok=True)
    done = set()
    batches = []
    wave_idx = 0

    def run_wave(entries) -> None:
        # entries: [(name, cached queries df, n_queries)] — each batch file
        # was read ONCE at poll time (count + qid bounds in the same agg)
        nonlocal wave_idx
        names = [e[0] for e in entries]
        counts = [e[2] for e in entries]
        # cursor columns (search_after) ride through the re-keying; a
        # cursor's after_doc is a GLOBAL doc_id, so only qid is re-keyed.
        has_cursor = any("after_score" in e[1].columns for e in entries)
        qdfs = []
        for i, (_name, q, _n) in enumerate(entries):
            cols = [
                (F.lit(i).cast("long") * _BASE + F.col("qid")).alias("qid"),
                "question",
            ]
            if has_cursor:
                if "after_score" in q.columns:
                    cols += [
                        F.col("after_score").cast("double").alias("after_score"),
                        F.col("after_doc").cast("long").alias("after_doc"),
                    ]
                else:
                    cols += [
                        F.lit(None).cast("double").alias("after_score"),
                        F.lit(None).cast("long").alias("after_doc"),
                    ]
            qdfs.append(q.select(*cols))
        wave = qdfs[0]
        for q in qdfs[1:]:
            wave = wave.unionByName(q)
        t0 = time.perf_counter()
        if dedupe_questions and not has_cursor:
            # ES-request-cache analog for a wave: many clients asking the
            # SAME question (hot queries under load) are searched once —
            # the searcher sees one representative qid per distinct
            # question and a tiny (qid -> rep) join fans results back
            # out. Off by default: on all-distinct waves it only adds
            # the distinct + join. Cursor waves skip it (a cursor makes
            # two identical questions different searches).
            wave = wave.persist()
            reps = wave.groupBy("question").agg(
                F.min("qid").alias("_rep")
            )
            qmap = wave.join(F.broadcast(reps), "question").select(
                "qid", "_rep"
            )
            rep_wave = (
                wave.join(
                    F.broadcast(reps.select(F.col("_rep").alias("qid"))),
                    "qid",
                    "left_semi",
                )
            )
            rep_results = searcher(rep_wave).withColumnRenamed("qid", "_rep")
            results = qmap.join(F.broadcast(rep_results), "_rep").drop("_rep")
            cached_wave = wave
        else:
            cached_wave = None
            results = searcher(wave)
        if len(names) > 1:
            results = results.persist()
        for i, name in enumerate(names):
            stem = name.rsplit(".", 1)[0]
            part = results.filter(
                (F.col("qid") >= i * _BASE) & (F.col("qid") < (i + 1) * _BASE)
            ).withColumn("qid", F.col("qid") - F.lit(i).cast("long") * _BASE)
            part.write.mode("overwrite").parquet(os.path.join(out_dir, stem))
        wall = time.perf_counter() - t0
        if cached_wave is not None:
            cached_wave.unpersist()
        if len(names) > 1:
            results.unpersist()
        for _name, q, _n in entries:
            try:
                q.unpersist()
            except Exception:
                pass
        tot = sum(counts) or 1
        for name, n_q in zip(names, counts):
            share = wall * n_q / tot
            batches.append(
                {
                    "name": name,
                    "n_queries": n_q,
                    "wall_sec": round(share, 3),
                    "qps": round(n_q / share, 1) if share > 0 else None,
                    "wave": wave_idx,
                }
            )
            done.add(name)
        log(
            f"wave {wave_idx}: {len(names)} batch(es), {tot} queries in "
            f"{wall:.2f}s = {tot / wall:.1f} q/s"
        )
        wave_idx += 1

    while True:
        pending = sorted(
            f
            for f in os.listdir(in_dir)
            if f not in done
            and f != stop_file
            and (f.endswith(".tsv") or f.endswith(".parquet"))
        )
        if max_batches is not None:
            pending = pending[: max_batches - len(batches)]
        # coalesce the whole backlog into one wave; batches whose qids
        # can't be re-keyed run alone, preserving order. Each batch file
        # is read ONCE: cached here, bounds+count in one agg, the same
        # DataFrame reused by run_wave (ADVICE r4: the old two-reads +
        # per-batch min/max job re-introduced N fixed job costs).
        group = []
        for name in pending:
            q = _read_batch(spark, os.path.join(in_dir, name)).persist()
            r = q.agg(
                F.count("*").alias("n"),
                F.min("qid").alias("lo"),
                F.max("qid").alias("hi"),
            ).first()
            ok = r.lo is not None and r.lo >= 0 and r.hi < _BASE
            if ok:
                group.append((name, q, int(r.n)))
            else:
                if group:
                    run_wave(group)
                    group = []
                run_wave([(name, q, int(r.n))])
        if group:
            run_wave(group)
        stop = os.path.exists(os.path.join(in_dir, stop_file))
        if (max_batches is not None and len(batches) >= max_batches) or (
            stop and not pending
        ):
            break
        if not pending:
            time.sleep(poll_sec)

    steady = [b for b in batches if b["wave"] > 0] or batches
    tot_q = sum(b["n_queries"] for b in steady)
    tot_w = sum(b["wall_sec"] for b in steady)
    out = {
        "batches": batches,
        "steady_qps": round(tot_q / tot_w, 1) if tot_w > 0 else None,
    }
    with open(os.path.join(out_dir, "serve_stats.json"), "w") as f:
        json.dump(out, f)
    if out["steady_qps"] is not None:
        log(f"steady-state: {out['steady_qps']} q/s over {len(steady)} batches")
    return out
