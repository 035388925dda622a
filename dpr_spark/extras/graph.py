"""Link-graph analytics for a web corpus: edge derivation + fixed-point
PageRank as pure DataFrame plans.

On a real Common-Crawl-style table the edge list comes from href
extraction over the ``html`` column; the driver's documents table
carries no hyperlinks, so the *content link graph* stands in — a
directed edge ``src -> dst`` between consecutive docs (ascending id)
that share a rare n-token shingle, the same signal a near-dup miner
reads as quotation/syndication. The derivation is deterministic pure
column math, so a DuckDB oracle can replay it exactly.

PageRank here runs in FIXED-POINT int64 arithmetic: ranks are scaled by
``SCALE`` (1e12) and every contribution split / damping step is integer
division. Integer addition is associative and commutative, so the
result is bit-identical regardless of partitioning, task order, AQE
re-plans, or engine — the run-to-run reproducibility that float
PageRank cannot give on a 1000-executor cluster (float reduce order
varies with the shuffle). Precision loss is <= 1/SCALE per edge per
iteration — nine significant digits survive five iterations. At
10^12-doc scale the identical plan runs with doubles when last-bit
reproducibility isn't required; the *shape* is what matters:

- per iteration: one (ranks ⋈ edges) shuffle keyed on src, a groupBy
  (dst) sum with map-side partial aggregation, and a broadcast-able
  scalar for the dangling mass — no driver-side graph state;
- ``localCheckpoint`` after each iteration truncates lineage so the
  plan doesn't grow with n_iter (an iterative-algorithm requirement
  Catalyst doesn't handle by itself);
- out-degrees are computed once and cached; the edge table is reused
  every iteration, so a production run persists it partitioned by src.

Reference context: DPR ranks purely by BM25/dense scores; a web-scale
deployment of the same retriever folds in a query-independent authority
prior exactly like this (score * f(pagerank) via funcscore.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import tokenize_col

SCALE = 10**12

# fixed-point-loop small-graph gate (same pattern as dedup's local
# union-find): a graph whose materialized edge count is at most this
# runs its whole integer fixed-point in ONE task's numpy instead of one
# Spark job per iteration; integer arithmetic makes the scores
# bit-identical by construction. Larger graphs keep the iterative plan.
LOCAL_GRAPH_EDGES_MAX = int(
    os.environ.get("DPR_SPARK_LOCAL_GRAPH_EDGES_MAX", str(4_000_000))
)


def _integral(df: DataFrame, col: str) -> bool:
    return df.schema[col].dataType.simpleString() in ("bigint", "int", "smallint")


def _local_graph_kernel(base: DataFrame, edges: DataFrame, fn, out_schema: str):
    """Run `fn(node_ids, src, dst) -> pandas.DataFrame` in one task with
    both the node and edge tables delivered via a dummy-key cogroup (no
    driver-side data). Caller gates on the materialized edge count."""
    k = F.lit(0).alias("_k")
    return (
        base.select(k, "node")
        .groupby("_k")
        .cogroup(edges.select(k, "src", "dst").groupby("_k"))
        .applyInPandas(
            lambda npdf, epdf: fn(
                npdf["node"].to_numpy(),
                epdf["src"].to_numpy(),
                epdf["dst"].to_numpy(),
            ),
            out_schema,
        )
    )


def shingle_edges(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 2,
    max_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Directed content-link edges ``(src, dst, anchor)``: for every
    exact n-token shingle with document frequency in [min_df, max_df],
    link each doc to the next doc (ascending id) containing the same
    shingle; ``anchor`` is the shingle itself (the web analog: the
    anchor text of the href). Distinct per (anchor, src, dst).

    Scale shape: shingles explode to (doc, shingle) rows but the df
    filter keeps only the rare tail before the window; the per-shingle
    window is tiny (<= max_df rows) so no skewed partition forms —
    exactly the hot-shingle discipline dedup.py uses.
    """
    # vectorized Arrow n-gram kernel (functions/ngrams_fast.py): same
    # (doc_id, anchor) rows as explode(array_distinct(transform(...)))
    # without per-element interpreted HOF eval
    from dpr_spark.functions.ngrams_fast import ngram_rows

    sh = ngram_rows(
        docs, n, id_col=id_col, text_col=text_col,
        lowercase_first=True, mode="full", distinct=True,
        out_id="doc_id", out_gram="anchor",
    )
    dfreq = (
        sh.groupBy("anchor")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .select("anchor")
    )
    rare = sh.join(dfreq, "anchor")
    w = Window.partitionBy("anchor").orderBy("doc_id")
    return (
        rare.withColumn("src", F.lag("doc_id").over(w))
        .filter(F.col("src").isNotNull())
        .select("src", F.col("doc_id").alias("dst"), "anchor")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-point PageRank: returns ``(node, pr)`` with ``pr`` the
    int64 rank scaled by ``scale`` (mean rank == scale by construction).

    Update rule per node v (all integer arithmetic)::

        pr'(v) = (scale*(den-num)) div den
               + (num * (sum_{u->v} pr(u) div outdeg(u) + D div N)) div den

    where D is the summed rank of dangling nodes (no out-edges),
    redistributed uniformly. ``div`` truncates; every operand is
    non-negative so truncation == floor in Spark, DuckDB, and Python
    alike — the cross-engine determinism the oracle twin relies on.
    """
    node_col = nodes.columns[0]
    base = nodes.select(F.col(node_col).alias("node")).distinct()
    n = base.count()
    if n == 0:
        raise ValueError("pagerank: empty node set")
    teleport = (scale * (damping_den - damping_num)) // damping_den

    # all three reused across iterations (outdeg by the dangling scan,
    # edges_od by the contribution join; edges feeds both derivations) —
    # persist or the ENTIRE edge-derivation lineage re-runs per
    # iteration per consumer
    edges = edges.select("src", "dst").persist()
    n_e = edges.count()
    # small-graph fast path: the whole integer fixed-point runs in ONE
    # task's numpy (int64 sums/floor-divides on non-negative operands ==
    # Spark's long arithmetic term for term, so ranks are bit-identical
    # — asserted against the iterative path in tests/test_graph.py).
    # The damping multiply bounds the node count: num*(n+1)*scale must
    # stay inside int64 exactly like the Spark plan's long math.
    if (
        n_e <= LOCAL_GRAPH_EDGES_MAX
        and n <= LOCAL_GRAPH_EDGES_MAX
        and damping_num * (n + 1) * scale < (1 << 62)
        and _integral(base, "node")
        and _integral(edges, "src")
        and _integral(edges, "dst")
    ):
        import numpy as np
        import pandas as pd

        def pr_kernel(node_ids, src, dst):
            node_ids = node_ids.astype(np.int64)
            src = src.astype(np.int64)
            dst = dst.astype(np.int64)
            snodes = np.sort(node_ids, kind="stable")

            def member(vals):
                pos = np.searchsorted(snodes, vals)
                ok = (pos < len(snodes)) & (
                    snodes[np.minimum(pos, max(len(snodes) - 1, 0))] == vals
                )
                return pos, ok

            # out-degree per src over ALL edges (the groupBy counts every
            # edge row, including ones into non-base dst)
            usrc, od_u = np.unique(src, return_counts=True)
            od_edge = od_u[np.searchsorted(usrc, src)] if len(src) else src
            bpos = np.searchsorted(usrc, snodes)
            has_out = (bpos < len(usrc)) & (
                usrc[np.minimum(bpos, max(len(usrc) - 1, 0))] == snodes
            ) if len(usrc) else np.zeros(len(snodes), dtype=bool)
            spos, s_ok = member(src)
            dpos, d_ok = member(dst)
            # only edges whose src carries a rank contribute; dst outside
            # the base is summed then dropped by the left join — skip it
            contrib = s_ok & d_ok
            es, ed = spos[contrib], dpos[contrib]
            eod = od_edge[contrib]

            rank = np.full(len(snodes), np.int64(scale), dtype=np.int64)
            for _ in range(n_iter):
                dshare = int(rank[~has_out].sum()) // n
                s = np.zeros(len(snodes), dtype=np.int64)
                if len(es):
                    np.add.at(s, ed, rank[es] // eod)
                rank = (
                    np.int64(teleport)
                    + (np.int64(damping_num) * (s + np.int64(dshare)))
                    // np.int64(damping_den)
                )
            return pd.DataFrame({"node": snodes, "pr": rank})

        out = _local_graph_kernel(base, edges, pr_kernel, "node long, pr long")
        return out

    outdeg = edges.groupBy("src").agg(F.count("*").alias("od")).persist()
    edges_od = edges.join(outdeg, "src").persist()
    ranks = base.withColumn("rank", F.lit(scale).cast("long")).localCheckpoint()
    for _ in range(n_iter):
        # dangling mass rides the update plan as a 1-row crossJoin branch
        # instead of a separate collect() job — one Spark job per
        # iteration (the eager localCheckpoint), not two; the arithmetic
        # is the same integer sum/div, so ranks stay bit-identical
        dangdf = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("d"))
            .select(F.expr(f"d div {n}L").alias("dshare"))
        )
        contribs = (
            ranks.join(edges_od, ranks["node"] == edges_od["src"])
            .select(F.col("dst").alias("node"), F.expr("rank div od").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = base.join(contribs, "node", "left").crossJoin(F.broadcast(dangdf)).select(
            "node",
            F.expr(
                f"{teleport}L + ({damping_num}L * (coalesce(s, 0L) + dshare))"
                f" div {damping_den}L"
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint()
    edges_od.unpersist()
    outdeg.unpersist()
    edges.unpersist()
    return ranks.select("node", F.col("rank").alias("pr"))


HITS_SCALE = 10**6


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg): returns ``(node, hub, auth)`` as
    int64 scores scaled to [0, scale].

    Per iteration (all integer arithmetic)::

        auth(v) = sum_{u->v} hub(u);   auth = auth * scale // max(auth)
        hub(u)  = sum_{u->v} auth(v);  hub  = hub * scale // max(hub)

    Max-normalization replaces the usual L2 norm (a square root has no
    exact integer form); it preserves the ranking and keeps every score
    in [0, scale]. The normalize step multiplies a sum (<= n_nodes *
    scale) by scale before the integer divide, so with the default
    scale=1e6 the int64 headroom holds to ~9e6 nodes — 6 significant
    digits of score; past that run the same plan with doubles. Like
    :func:`pagerank`, integer sums make the result bit-identical across
    partitionings and engines. Same per-iteration shape: two
    (scores ⋈ edges) shuffles + grouped sums, lineage cut per iteration.
    """
    node_col = nodes.columns[0]
    base = nodes.select(F.col(node_col).alias("node")).distinct()
    # the edge table feeds two joins per iteration — persist or the
    # whole derivation lineage re-runs each time (the pagerank rule)
    edges = edges.select("src", "dst").persist()
    n_e = edges.count()
    n_b = base.count()
    # small-graph fast path (same argument as pagerank's): int64 sums +
    # floor divides on non-negative operands replicate the Spark longs
    # bit for bit; the max-normalize multiply bounds the node count by
    # (n+1)*scale*scale inside int64, the docstring's ~9e6-node headroom.
    if (
        n_e <= LOCAL_GRAPH_EDGES_MAX
        and n_b <= LOCAL_GRAPH_EDGES_MAX
        and (n_b + 1) * scale * scale < (1 << 62)
        and _integral(base, "node")
        and _integral(edges, "src")
        and _integral(edges, "dst")
    ):
        import numpy as np
        import pandas as pd

        def hits_kernel(node_ids, src, dst):
            node_ids = node_ids.astype(np.int64)
            src = src.astype(np.int64)
            dst = dst.astype(np.int64)
            snodes = np.sort(node_ids, kind="stable")
            nn = len(snodes)

            def member(vals):
                pos = np.searchsorted(snodes, vals)
                ok = (pos < nn) & (
                    snodes[np.minimum(pos, max(nn - 1, 0))] == vals
                )
                return pos, ok

            spos, s_ok = member(src)
            dpos, d_ok = member(dst)

            def spread(weights, key_vals):
                """sum weights per key value (ANY key — the groupBy sums
                non-base keys too, and the max-normalizer sees them);
                returns (sums_over_all_keys, per-base-node sums)."""
                ukeys, inv = np.unique(key_vals, return_inverse=True)
                sums = np.zeros(len(ukeys), dtype=np.int64)
                np.add.at(sums, inv, weights)
                per_base = np.zeros(nn, dtype=np.int64)
                if len(ukeys):
                    p = np.searchsorted(ukeys, snodes)
                    ok = (p < len(ukeys)) & (
                        ukeys[np.minimum(p, len(ukeys) - 1)] == snodes
                    )
                    per_base[ok] = sums[p[ok]]
                return sums, per_base

            hub_v = np.full(nn, np.int64(scale), dtype=np.int64)
            auth_v = np.zeros(nn, dtype=np.int64)
            for _ in range(n_iter):
                # auth step: contributions from edges whose src is ranked
                sums, per_base = spread(hub_v[spos[s_ok]], dst[s_ok])
                amax = max(int(sums.max()) if len(sums) else 0, 1)
                auth_v = (per_base * np.int64(scale)) // np.int64(amax)
                # hub step: contributions from edges whose dst is ranked
                sums, per_base = spread(auth_v[dpos[d_ok]], src[d_ok])
                hmax = max(int(sums.max()) if len(sums) else 0, 1)
                hub_v = (per_base * np.int64(scale)) // np.int64(hmax)
            return pd.DataFrame({"node": snodes, "hub": hub_v, "auth": auth_v})

        return _local_graph_kernel(
            base, edges, hits_kernel, "node long, hub long, auth long"
        )
    hub = base.withColumn("hub", F.lit(scale).cast("long")).localCheckpoint()
    auth = None
    for _ in range(n_iter):
        # max-normalization denominator rides the update plan as a 1-row
        # crossJoin branch instead of a collect() job — two Spark jobs
        # per iteration (the eager localCheckpoints), not four; same
        # integer arithmetic, bit-identical scores
        a = (
            hub.join(edges, hub["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("s"))
            .persist()
        )
        amaxdf = a.agg(
            F.expr("greatest(coalesce(max(s), 0L), 1L)").alias("amax")
        )
        auth = base.join(a, "node", "left").crossJoin(F.broadcast(amaxdf)).select(
            "node",
            F.expr(f"coalesce(s, 0L) * {scale}L div amax").alias("auth"),
        ).localCheckpoint()
        a.unpersist()
        h = (
            auth.join(edges, auth["node"] == edges["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("s"))
            .persist()
        )
        hmaxdf = h.agg(
            F.expr("greatest(coalesce(max(s), 0L), 1L)").alias("hmax")
        )
        hub = base.join(h, "node", "left").crossJoin(F.broadcast(hmaxdf)).select(
            "node",
            F.expr(f"coalesce(s, 0L) * {scale}L div hmax").alias("hub"),
        ).localCheckpoint()
        h.unpersist()
    edges.unpersist()
    return hub.join(auth, "node").select("node", "hub", "auth")
