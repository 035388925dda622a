"""Block-max BM25 search over the COMPRESSED posting blocks — the
north-star serving path ("delta-gap + varint-compressed postings with
per-block max-score metadata, and Okapi BM25 top-k scoring via block-max
WAND intersection").

Index layout (built once, written bucketed to storage at real scale):

- blocks(bucket, term_id, block_id, n, doc_ids binary, tfs binary,
  block_max_score): delta-gap varint blocks of BLOCK_SIZE postings,
  bucketed by pmod(xxhash64(doc_id), B) so every document's postings live
  in exactly ONE bucket — a bucket's local top-k is exact for its docs
  and the global top-k is the k-best of the union (the Lucene/ES sharded
  search design, one Spark stage).
- norms(bucket, doc_id, doclen): the per-bucket doc-length sidecar (the
  "norms file") needed to reconstruct exact float64 impacts from tf.

Query path: the (tiny) query term_ids + idfs are resolved driver-side and
broadcast; `blocks.filter(term_id.isin(...))` prunes the scan to query
terms only (a parquet pushdown at scale — postings for non-query terms
are never read). Per bucket:

1. ESSENTIAL terms (descending max-impact, MaxScore suffix bound): blocks
   are decoded and scatter-added — except blocks whose
   block_max + suffix-bound can't create a viable NEW candidate AND that
   contain no existing candidate: those are skipped undecoded (the
   block-max skip).
2. Remaining terms are PROBED per candidate: candidates whose
   score + its-block-max + suffix upper bound can't reach the running
   kth-best are dropped; only blocks still holding a live candidate are
   decoded.
3. Survivors are re-folded exactly in ascending term order (the oracle's
   float-add order), so results stay bit-identical to
   query/scorer.py::search (asserted in tests/test_blockmax.py).

Upper bounds are conservative: block_max_score is stored float32
(rounded-to-nearest), so bounds inflate it by (1 + 2^-22) and comparisons
carry an absolute 1e-9 slack — pruning can only under-prune, never break
rank identity.

Reference analog: faiss_indexers.py search_knn over in-RAM shards
(`/root/reference/dpr/indexer/faiss_indexers.py:107-112`); the sparse
engine replaces the FAISS matrix with compressed blocks it decodes
selectively.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.functions.normalize import normalize_question
from dpr_spark.functions.tokenizer import tokenize
from dpr_spark.index.build import InvertedIndex, impact_expr
from dpr_spark.index.codec import decode_blocks_batch
from dpr_spark.query.wand import (
    RESULT_SCHEMA,
    _at_least_top,
    _final_topk,
    _values_filter,
)

BUCKETED_BLOCK_SCHEMA = (
    "bucket int, term_id long, block_id long, n int, "
    "doc_ids binary, tfs binary, block_max_score float"
)
NORMS_SCHEMA = "bucket int, doc_id long, doclen int"

# float32 block maxes are inflated by this factor (> 2^-23 relative f32
# rounding) and bound comparisons carry _SLACK absolute margin: bounds
# stay true upper bounds despite storage rounding + float64 add rounding.
_F32_INFLATE = 1.0 + 2.0 ** -22
_SLACK = 1e-9

# packed encode auto-gate: the postings plan's Catalyst size estimate
# must be at least this for the packed flow's vocab-sized idf pull (one
# extra driver job) to repay itself; tiny entry-scale builds keep the
# join flow and its job count.
_PACK_EST_MIN = int(
    os.environ.get("DPR_SPARK_BLOCK_PACK_EST_MIN", str(4 * 1024 * 1024))
)


def build_block_segments(
    index: InvertedIndex,
    num_buckets: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    pack: Optional[bool] = None,
) -> Tuple[DataFrame, DataFrame]:
    """(blocks, norms) in the doc-bucketed serving layout. One shuffle on
    bucket, one vectorized encode pass per partition; at real scale both
    are written to storage partitioned by bucket and this runs once per
    index build. num_buckets sizes per-task memory: a bucket holds
    n_docs/B norms + its share of postings — raise B with corpus size.

    pack: True/False forces the packed/unpacked encode input; None (the
    default) packs automatically when the index's doc-id bounds prove
    doc_id fits 31 bits, the vocab idf fits a broadcast numpy array, and
    Catalyst's size estimate says the postings side is big enough to
    repay the vocab-sized idf pull (env DPR_SPARK_BLOCK_PACK_EST_MIN).
    Packed: (bucket, term_id<<32|doc_id, doclen<<32|tf) cross the bucket
    shuffle and the Python boundary — 20 B/posting instead of 32+ and
    3 cells instead of 5 — and the kernel recomputes the float64 impact
    with impact_expr's exact operation order from the broadcast idf, so
    blocks are bit-identical to the unpacked flow (the same argument as
    the index build's packed encode shuffle; asserted in
    tests/test_blockmax.py)."""
    from dpr_spark.index.build import (
        IDF_BCAST_MAX,
        _encode_arrays,
        _plan_size_bytes,
    )

    avgdl = index.stats.avgdl
    norms = index.docstats.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int").alias("bucket"),
        "doc_id",
        F.col("doclen").cast("int").alias("doclen"),
    )

    use_pack = pack
    if use_pack is None:
        bounds = getattr(index, "doc_id_bounds", None)
        est = _plan_size_bytes(index.postings)
        use_pack = (
            bounds is not None
            and bounds[0] >= 0
            and bounds[1] < (1 << 31)
            and est is not None
            and est >= _PACK_EST_MIN
        )
    if use_pack:
        idf_pdf = index.dictionary.select("term_id", "idf").toPandas()
        n_ids = int(idf_pdf["term_id"].max()) + 1 if len(idf_pdf) else 0
        if not (0 < n_ids <= (1 << 31) and n_ids <= IDF_BCAST_MAX):
            use_pack = False
    if use_pack:
        idf_arr = np.zeros(n_ids, dtype=np.float64)
        idf_arr[idf_pdf["term_id"].to_numpy(np.int64)] = idf_pdf["idf"].to_numpy(
            np.float64
        )
        sc = index.postings.sparkSession.sparkContext
        idf_bc = sc.broadcast(idf_arr)
        packed = index.postings.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int").alias("bucket"),
            (F.shiftleft(F.col("term_id"), 32).bitwiseOR(F.col("doc_id"))).alias("td"),
            (
                F.shiftleft(F.col("doclen").cast("long"), 32).bitwiseOR(F.col("tf"))
            ).alias("dt"),
        )
        k1p1 = k1 + 1.0
        one_minus_b = 1.0 - b

        def encode_packed(it):
            bks, tds, dts = [], [], []
            for p in it:
                if len(p):
                    bks.append(p["bucket"].to_numpy(np.int64))
                    tds.append(p["td"].to_numpy(np.int64))
                    dts.append(p["dt"].to_numpy(np.int64))
            if not tds:
                return
            cat = lambda xs: np.concatenate(xs) if len(xs) > 1 else xs[0]
            bkt, td, dt = cat(bks), cat(tds), cat(dts)
            t = td >> np.int64(32)
            d = td & np.int64(0xFFFFFFFF)
            dl = (dt >> np.int64(32)).astype(np.float64)
            f = dt & np.int64(0xFFFFFFFF)
            # impact_expr's exact float64 op order (same kernel as the
            # index build's packed encode — bit-identical block maxes)
            tf_f = f.astype(np.float64)
            s = ((idf_bc.value[t] * tf_f) * k1p1) / (
                tf_f + k1 * (one_minus_b + (b * dl) / avgdl)
            )
            order = np.lexsort((d, t, bkt))
            out = _encode_arrays(
                t.take(order), d.take(order), f.take(order), s.take(order),
                buckets=bkt.take(order),
            )
            if out is not None:
                yield out

        blocks = packed.repartition(num_buckets, "bucket").mapInPandas(
            encode_packed, BUCKETED_BLOCK_SCHEMA
        )
        return blocks, norms

    slim = (
        index.postings.join(
            F.broadcast(index.dictionary.select("term_id", "idf")), "term_id"
        ).select(
            F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int").alias("bucket"),
            "term_id",
            "doc_id",
            F.col("tf").cast("int").alias("tf"),
            impact_expr(avgdl, k1, b).alias("score"),
        )
    )

    def encode(it):
        bks, ts, ds, fs, ss = [], [], [], [], []
        for p in it:
            if len(p):
                bks.append(p["bucket"].to_numpy(np.int64))
                ts.append(p["term_id"].to_numpy(np.int64))
                ds.append(p["doc_id"].to_numpy(np.int64))
                fs.append(p["tf"].to_numpy(np.int64))
                ss.append(p["score"].to_numpy(np.float64))
        if not ts:
            return
        cat = lambda xs: np.concatenate(xs) if len(xs) > 1 else xs[0]
        bkt, t, d, f, s = cat(bks), cat(ts), cat(ds), cat(fs), cat(ss)
        order = np.lexsort((d, t, bkt))
        out = _encode_arrays(
            t.take(order), d.take(order), f.take(order), s.take(order),
            buckets=bkt.take(order),
        )
        if out is not None:
            yield out

    blocks = slim.repartition(num_buckets, "bucket").mapInPandas(
        encode, BUCKETED_BLOCK_SCHEMA
    )
    return blocks, norms


def save_serving_layout(
    spark: SparkSession,
    blocks: DataFrame,
    norms: DataFrame,
    path: str,
    num_buckets: int,
    write_options: Optional[dict] = None,
) -> Tuple[str, str]:
    """Write blocks+norms as Spark BUCKETED tables (CLUSTERED BY bucket),
    blocks sorted by (term_id, block_id) inside each bucket file. This is
    the at-rest form the docstring above promises: a from-storage query
    cogroups on bucket with NO exchange (both scans report the matching
    hash partitioning), and the per-file term_id sort gives parquet row
    groups tight min/max stats so the query-term filter actually skips
    row groups (asserted in tests/test_plans.py). Metadata needed to
    re-register the tables in a fresh session (bucket count) goes to
    serving_meta.json next to the data."""
    import json
    import os

    bt, nt = _layout_tables(path)
    spark.sql(f"DROP TABLE IF EXISTS {bt}")
    spark.sql(f"DROP TABLE IF EXISTS {nt}")
    os.makedirs(path, exist_ok=True)
    bw = blocks.write.bucketBy(num_buckets, "bucket").sortBy("term_id", "block_id")
    nw = norms.write.bucketBy(num_buckets, "bucket").sortBy("doc_id")
    for k, v in (write_options or {}).items():
        bw = bw.option(k, v)
        nw = nw.option(k, v)
    bw.option("path", os.path.join(path, "block_segments")).mode(
        "overwrite"
    ).saveAsTable(bt)
    nw.option("path", os.path.join(path, "block_norms")).mode("overwrite").saveAsTable(nt)
    with open(os.path.join(path, "serving_meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)
    return bt, nt


def load_serving_layout(spark: SparkSession, path: str) -> Tuple[DataFrame, DataFrame]:
    """(blocks, norms) from a save_serving_layout directory. In a fresh
    session the bucketed-table metadata is re-registered as EXTERNAL
    tables over the existing files (bucketBy wrote bucket ids into the
    file names, so Spark can trust the declared clustering) — the query
    plan then shows bucketed scans and no exchange on bucket."""
    import json
    import os

    with open(os.path.join(path, "serving_meta.json")) as f:
        n = json.load(f)["num_buckets"]
    bt, nt = _layout_tables(path)
    specs = [
        (bt, "block_segments", BUCKETED_BLOCK_SCHEMA, "term_id, block_id"),
        (nt, "block_norms", NORMS_SCHEMA, "doc_id"),
    ]
    for name, sub, schema, sort in specs:
        if not spark.catalog.tableExists(name):
            loc = os.path.abspath(os.path.join(path, sub))
            spark.sql(
                f"CREATE TABLE {name} ({schema}) USING PARQUET "
                f"CLUSTERED BY (bucket) SORTED BY ({sort}) INTO {n} BUCKETS "
                f"LOCATION '{loc}'"
            )
    return spark.table(bt), spark.table(nt)


def _layout_tables(path: str) -> Tuple[str, str]:
    """Deterministic per-path table names, so any session pointed at the
    same directory resolves the same catalog entries."""
    import hashlib
    import os

    h = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
    return f"dpr_block_segments_{h}", f"dpr_block_norms_{h}"


def _driver_query_terms_idf(
    spark: SparkSession, queries: DataFrame, index: InvertedIndex
) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    """TEST TWIN (not on the production path since round 4): collect-
    based [(qid, term_ids asc, idfs aligned)] resolution; the production
    `search_blocks` streams waves from wand.py::iter_query_term_waves,
    asserted identical in tests/test_query_resolution.py."""
    from dpr_spark.functions.analysis import analyze_query

    qrows = queries.select("qid", "question").collect()
    qterms = {
        int(r.qid): analyze_query(r.question, getattr(index, "analyzer", None))
        for r in qrows
    }
    needed = sorted({t for ts in qterms.values() for t in ts})
    if not needed:
        return []
    tmap = {
        r.term: (int(r.term_id), float(r.idf))
        for r in _values_filter(index.dictionary, "term", needed)
        .select("term", "term_id", "idf")
        .collect()
    }
    out = []
    for qid, ts in qterms.items():
        pairs = sorted(tmap[t] for t in ts if t in tmap)
        out.append(
            (
                qid,
                np.array([p[0] for p in pairs], dtype=np.int64),
                np.array([p[1] for p in pairs], dtype=np.float64),
            )
        )
    return out


def _search_bucket(
    blocks_pdf: pd.DataFrame,
    norms_pdf: pd.DataFrame,
    qterms: List[Tuple[int, np.ndarray, np.ndarray]],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    stats: Optional[dict] = None,
) -> pd.DataFrame:
    """Local block-max top-k for one bucket. Exact float64 impacts are
    reconstructed on decode (same op order as oracle/bm25.py::score_one);
    survivors are re-folded in ascending term order for bit-identity."""
    empty = pd.DataFrame({"qid": [], "doc_id": [], "score": []}).astype(
        {"qid": np.int64, "doc_id": np.int64, "score": np.float64}
    )
    if len(blocks_pdf) == 0 or len(norms_pdf) == 0 or not qterms:
        return empty

    nd = norms_pdf["doc_id"].to_numpy(np.int64)
    ndl = norms_pdf["doclen"].to_numpy(np.int64)
    nsort = np.argsort(nd, kind="stable")
    nd, ndl = nd[nsort], ndl[nsort]
    n_docs = len(nd)

    bt = blocks_pdf["term_id"].to_numpy(np.int64)
    order = np.lexsort((blocks_pdf["block_id"].to_numpy(np.int64), bt))
    bt = bt[order]
    bid = blocks_pdf["block_id"].to_numpy(np.int64)[order]
    bn = blocks_pdf["n"].to_numpy(np.int64)[order]
    bdi = blocks_pdf["doc_ids"].to_numpy()[order]
    btf = blocks_pdf["tfs"].to_numpy()[order]
    bmax = blocks_pdf["block_max_score"].to_numpy(np.float64)[order] * _F32_INFLATE

    uterms, t_starts = np.unique(bt, return_index=True)
    t_ends = np.r_[t_starts[1:], len(bt)]
    # per-term upper bound = max of (inflated) block maxes
    tmax = np.maximum.reduceat(bmax, t_starts)

    if stats is not None:
        stats.setdefault("blocks_total", 0)
        stats.setdefault("blocks_decoded", 0)
        stats.setdefault("postings_decoded", 0)
        stats.setdefault("score_writes", 0)
        stats.setdefault("cand_peak", 0)

    cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    idf_by_tid: Dict[int, float] = {}
    for _, tids, idfs in qterms:
        for tid, idf in zip(tids, idfs):
            idf_by_tid[int(tid)] = float(idf)

    def dec_many(rs) -> None:
        """Batch-decode every uncached block in rs with ONE varint/cumsum/
        searchsorted/impact pipeline (decode_blocks_batch) — elementwise
        float64 arithmetic, so per-entry results are bit-identical to the
        per-block path while numpy call overhead is paid once per batch
        instead of once per 128-posting block."""
        need = [int(r) for r in rs if int(r) not in cache]
        if not need:
            return
        narr = np.asarray(need, dtype=np.int64)
        counts = bn[narr]
        docs, tfs, starts = decode_blocks_batch(
            [bdi[r] for r in need], [btf[r] for r in need], counts
        )
        lidx_all = np.searchsorted(nd, docs)
        dls = ndl[lidx_all].astype(np.float64)
        tfsf = tfs.astype(np.float64)
        idfs = np.repeat(
            np.array([idf_by_tid[int(bt[r])] for r in need], dtype=np.float64),
            counts,
        )
        # exact oracle op order: ((idf*tf)*(k1+1)) / (tf + k1*((1-b)+(b*dl)/avgdl))
        imp_all = idfs * tfsf * (k1 + 1.0) / (tfsf + k1 * ((1.0 - b) + (b * dls) / avgdl))
        ends = np.concatenate([starts[1:], [len(docs)]])
        for i, r in enumerate(need):
            cache[r] = (lidx_all[starts[i] : ends[i]], imp_all[starts[i] : ends[i]])
        if stats is not None:
            stats["blocks_decoded"] += len(need)
            stats["postings_decoded"] += int(counts.sum())

    def _concat(rows) -> Tuple[np.ndarray, np.ndarray]:
        dec_many(rows)
        if len(rows) == 1:
            return cache[int(rows[0])]
        got = [cache[int(r)] for r in rows]
        return (
            np.concatenate([g[0] for g in got]),
            np.concatenate([g[1] for g in got]),
        )

    tcache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def gather(p, rows, bs, be) -> Tuple[np.ndarray, np.ndarray]:
        """Concatenated (lidx, imp) for the given block rows of term slot
        p, ascending block order. Blocks of a term are doc-disjoint
        ranges, so the concatenation is sorted by lidx and every doc
        appears at most once — one scatter-add / searchsorted probe per
        TERM is arithmetic-identical to one per 128-posting block (the
        per-call numpy overhead of the per-block loops was ~45% of kernel
        wall at 200-query waves). Full-range gathers (rows unique in
        [bs, be), so count equality means full coverage) are memoized per
        term: hot stopword terms repeat across the wave's queries."""
        if len(rows) == be - bs:
            got = tcache.get(p)
            if got is None:
                got = _concat(rows)
                tcache[p] = got
            return got
        return _concat(rows)

    out_q, out_d, out_s = [], [], []
    # SPARSE per-query accumulation via generation stamping: `scores` and
    # `gen` are allocated ONCE per bucket; a slot is live for query qi iff
    # gen[slot] == qi, so there is no O(bucket_docs) zero-fill per query —
    # per-query work scales with postings DECODED (+ candidates), which is
    # what block-max skipping is for (asserted via the score_writes /
    # cand_peak counters in tests/test_blockmax.py).
    scores = np.zeros(n_docs, dtype=np.float64)
    gen = np.full(n_docs, -1, dtype=np.int64)
    sentinel = np.int64(nd[-1] + 1) if n_docs else np.int64(0)

    for qi, (qid, q_tids, _) in enumerate(qterms):
        pos = np.searchsorted(uterms, q_tids)
        valid = (pos < len(uterms)) & (uterms[np.minimum(pos, len(uterms) - 1)] == q_tids)
        hit = pos[valid]
        if len(hit) == 0:
            continue
        if stats is not None:
            stats["blocks_total"] += int((t_ends[hit] - t_starts[hit]).sum())

        cand_chunks: List[np.ndarray] = []  # first-touch slots — disjoint
        ncand = 0

        def add(lidx: np.ndarray, imp: np.ndarray) -> None:
            nonlocal ncand
            new = gen[lidx] != qi
            scores[lidx] = np.where(new, imp, scores[lidx] + imp)
            gen[lidx] = qi
            if new.any():
                fresh = lidx[new]
                cand_chunks.append(fresh)
                ncand += len(fresh)
            if stats is not None:
                stats["score_writes"] += len(lidx)

        desc_order = np.argsort(-tmax[hit], kind="stable")
        desc = hit[desc_order]
        suffix = np.concatenate([np.cumsum(tmax[desc][::-1])[::-1], [0.0]])
        probed_from = len(desc)
        for i, p in enumerate(desc):
            kth = -np.inf
            if i > 0 and ncand >= k:
                cand_now = np.concatenate(cand_chunks)
                kth = np.partition(scores[cand_now], ncand - k)[ncand - k]
                if suffix[i] < kth - _SLACK:  # no new doc can reach top-k
                    probed_from = i
                    break
            bs, be = int(t_starts[p]), int(t_ends[p])
            rows = np.arange(bs, be)
            if np.isfinite(kth):
                # block-max skip within an essential term: a block whose
                # max + later-terms bound misses kth can only matter for
                # docs that are ALREADY candidates — decode only those.
                viable = bmax[bs:be] + suffix[i + 1] >= kth - _SLACK
                if not viable.all():
                    cdocs = nd[np.sort(cand_now)]
                    los = bid[bs:be]
                    his = np.r_[los[1:], sentinel]
                    at = np.searchsorted(cdocs, los)
                    has_cand = (at < len(cdocs)) & (
                        np.where(at < len(cdocs), cdocs[np.minimum(at, len(cdocs) - 1)], sentinel)
                        < his
                    )
                    rows = rows[viable | has_cand]
            if len(rows):
                lidx, imp = gather(int(p), rows, bs, be)
                add(lidx, imp)

        if stats is not None:
            stats["cand_peak"] = max(stats["cand_peak"], ncand)
        cand = np.sort(np.concatenate(cand_chunks)) if cand_chunks else np.empty(0, np.int64)

        # ---- probe phase: per-candidate block-max pruning
        for i in range(probed_from, len(desc)):
            p = desc[i]
            if len(cand) == 0:
                break
            theta = -np.inf
            if len(cand) >= k:
                theta = np.partition(scores[cand], len(cand) - k)[len(cand) - k]
            bs, be = int(t_starts[p]), int(t_ends[p])
            cdocs = nd[cand]
            bpos = np.searchsorted(bid[bs:be], cdocs, side="right") - 1
            inblk = bpos >= 0
            bound = scores[cand] + suffix[i + 1] + np.where(
                inblk, bmax[bs + np.maximum(bpos, 0)], 0.0
            )
            drop = bound < theta - _SLACK
            live = ~drop & inblk
            keep, kbpos = cand[live], bpos[live]
            rows = bs + np.unique(kbpos)
            if len(rows):
                # keep's postings live each in its assigned (decoded)
                # block; blocks are doc-disjoint, so one probe against the
                # term's concatenated arrays finds exactly the same hits
                lidx, imp = gather(int(p), rows, bs, be)
                ppos = np.searchsorted(lidx, keep)
                ok = (ppos < len(lidx)) & (lidx[np.minimum(ppos, len(lidx) - 1)] == keep)
                scores[keep[ok]] += imp[ppos[ok]]
                if stats is not None:
                    stats["score_writes"] += int(ok.sum())
            cand = cand[~drop]

        if len(cand) == 0:
            continue
        keep = _at_least_top(scores[cand], min(len(cand), k + 16))
        top = cand[keep]
        # exact re-fold, ascending term order (bit-identical floats)
        exact = np.zeros(len(top), dtype=np.float64)
        srt = np.argsort(top, kind="stable")
        sdocs_local = top[srt]
        sdocs = nd[sdocs_local]
        for p in hit:  # ascending term order
            bs, be = int(t_starts[p]), int(t_ends[p])
            bpos = np.searchsorted(bid[bs:be], sdocs, side="right") - 1
            rows = bs + np.unique(bpos[bpos >= 0])
            if not len(rows):
                continue
            # one probe per term over the concatenated decoded blocks: a
            # survivor scores in at most one (doc-disjoint) block, and a
            # bpos==-1 doc (before the term's first block) matches nothing
            lidx, imp = gather(int(p), rows, bs, be)
            ppos = np.searchsorted(lidx, sdocs_local)
            ok = (ppos < len(lidx)) & (
                lidx[np.minimum(ppos, len(lidx) - 1)] == sdocs_local
            )
            exact[srt[ok]] += imp[ppos[ok]]
        top, top_scores = _final_topk(top, exact, nd, k)
        out_q.append(np.full(len(top), qid, dtype=np.int64))
        out_d.append(nd[top])
        out_s.append(top_scores)

    if not out_q:
        return empty
    return pd.DataFrame(
        {
            "qid": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
    )


def search_blocks(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    blocks: DataFrame,
    norms: DataFrame,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    batch_size: int = None,
    resolve: str = "auto",
) -> DataFrame:
    """results(qid, rank, doc_id, score) from the compressed blocks —
    bit-identical to query/scorer.py::search. Queries ship in BROADCAST
    waves of batch_size (task size stays O(1) in query count; queries are
    independent so wave splits cannot change any result — asserted in
    tests/test_blockmax.py). Each wave's term_id filter prunes the block
    scan to that wave's query terms (parquet pushdown for small term
    sets, broadcast semi-join beyond _values_filter's pushdown_limit);
    the cogroup keys both sides on bucket so norms never shuffle per
    query when pre-bucketed on storage."""
    from dpr_spark.query.wand import (
        DEFAULT_QUERY_BATCH,
        _values_filter,
        iter_query_term_waves,
    )

    if batch_size is None:
        batch_size = DEFAULT_QUERY_BATCH
    avgdl = index.stats.avgdl

    def make_fn(bc):
        def fn(bpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
            return _search_bucket(bpdf, npdf, bc.value, k, avgdl, k1, b)

        return fn

    local = None
    # tokenization + dictionary resolution run as a Spark job (see
    # wand.py::_resolve_query_terms); the driver only streams resolved
    # (qid, term_ids, idfs) rows one wave at a time — O(wave) memory.
    for wave in iter_query_term_waves(
        spark, queries, index, batch_size, with_idf=True, resolve=resolve
    ):
        wave_tids = sorted({int(t) for _, tids, _ in wave for t in tids})
        bsel = _values_filter(blocks, "term_id", wave_tids)
        bc = spark.sparkContext.broadcast(wave)
        part = (
            bsel.groupby("bucket")
            .cogroup(norms.groupby("bucket"))
            .applyInPandas(make_fn(bc), RESULT_SCHEMA)
        )
        local = part if local is None else local.unionByName(part)
    if local is None:
        return spark.createDataFrame([], "qid long, rank int, doc_id long, score double")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
