"""Deduplication suite for large-scale training-data pipelines — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All shapes are shuffle-conscious for web scale:
- exact: hash-groupBy on a digest, never on the raw text (a 100 TB
  corpus shuffles 16-byte digests, not documents);
- MinHash/LSH: signatures are per-doc (narrow), candidate generation is
  an equi-join on band keys (only colliding docs meet);
- SimHash: 64-bit signature per doc; near-dup = identical signature or
  banded-prefix join for hamming<=3;
- n-gram Jaccard: shingle inverted join with a frequency cap on hot
  shingles (a boilerplate shingle shared by 10^6 docs would otherwise
  produce 10^12 candidate pairs).
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import tokenize_col

_P = 2147483647  # 2^31-1

# connected_components small-graph gate: when the materialized pair
# table holds at most this many edges, labels come from a single-task
# union-find (one job) instead of the iterative propagation rounds; the
# scalable iterative path stays the default for larger graphs. 4M edges
# is ~64 MB of (x, y) longs — comfortably one task.
LOCAL_CC_EDGES_MAX = int(
    os.environ.get("DPR_SPARK_LOCAL_CC_EDGES_MAX", str(4_000_000))
)


def portable_hash60(col):
    """md5-derived 60-bit non-negative int with an identical spelling in
    ANSI-ish SQL engines (DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT).
    Slower than xxhash64 (md5 + string slice per value) — the default
    hash for the dedup family stays xxhash64; pass this as `hash_fn`
    when the pipeline must be replayable outside Spark (the driver's
    DuckDB oracle twins do)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # vectorized Arrow n-gram kernel (functions/ngrams_fast.py): same
    # (doc, shingle) rows as the explode_outer(array_distinct(transform))
    # + filter('' out) shape — short_tail mode reproduces the
    # slice-past-the-end behaviour (a doc with 1 <= len < n emits one
    # whole-doc shingle) — without per-element interpreted HOF eval
    from dpr_spark.functions.ngrams_fast import ngram_rows

    return ngram_rows(
        df, n, id_col=id_col, text_col=text_col,
        lowercase_first=False, mode="short_tail", distinct=True,
        out_id="doc", out_gram="shingle",
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: (keep_id, dup_id) pairs; keep_id =
    min id per group. groupBy on xxhash64+md5 digest (fixed width)."""
    d = df.select(
        F.col(id_col).alias("doc"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    groups = d.groupBy("digest").agg(
        F.min("doc").alias("keep_id"), F.collect_list("doc").alias("docs"), F.count("*").alias("n")
    )
    return (
        groups.filter(F.col("n") > 1)
        .select("keep_id", F.explode("docs").alias("dup_id"))
        .filter(F.col("dup_id") != F.col("keep_id"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 3,
    hash_fn=None,
) -> DataFrame:
    """(doc, sig array<long>) — affine permutations over dense shingle
    ids (hash-based, no global dictionary: hash & (2^31-1) keeps the
    arithmetic exact). `hash_fn` maps a string column to int64; default
    xxhash64 (fast, JVM); portable_hash60 for cross-engine replay."""
    a = [((i * 2 + 1) * 40503) % _P for i in range(1, num_perm + 1)]
    b = [((i * 7 + 3) * 69069) % _P for i in range(1, num_perm + 1)]
    hf = hash_fn or F.xxhash64
    sh = _shingles(df, text_col, id_col, shingle_n).withColumn(
        "sid", F.pmod(hf(F.col("shingle")), F.lit(_P))
    )
    return sh.groupBy("doc").agg(
        F.array(
            *[
                F.min((F.col("sid") * F.lit(a[j]) + F.lit(b[j])) % F.lit(_P))
                for j in range(num_perm)
            ]
        ).alias("sig")
    )


def band_keys(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4, hash_keys: bool = True
) -> DataFrame:
    """(doc, sig, band, key): one row per (doc, LSH band). The key is
    deterministic in the signature values only, so band tables written
    in different jobs/epochs join correctly (streaming/neardup.py keeps
    them as its cross-batch ledger)."""

    def _band_key(bb):
        concat = F.concat_ws(
            "_",
            *[F.element_at("sig", bb * rows_per_band + r + 1) for r in range(rows_per_band)],
        )
        return F.xxhash64(concat) if hash_keys else concat

    return signatures.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bb).alias("band"), _band_key(bb).alias("key"))
                    for bb in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def sig_match_frac(siga, sigb):
    """Estimated Jaccard: fraction of matching minhash slots."""
    match = F.size(F.filter(F.zip_with(siga, sigb, lambda p, q: p == q), lambda e: e))
    return match / F.size(siga).cast("double")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4, hash_keys: bool = True
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard): docs colliding in >=1 LSH band;
    est_jaccard = matching signature fraction. Band join is the only
    shuffle; signatures stay narrow. `hash_keys=True` (default) joins on
    an 8-byte xxhash64 of the band values (narrowest shuffle; the rare
    hash collision only ADDS a candidate, which est_jaccard then scores
    honestly); False joins on the concatenated values themselves —
    collision-free and portable to SQL oracles."""
    num_perm = bands * rows_per_band
    banded = band_keys(signatures, bands, rows_per_band, hash_keys)
    x, y = banded.alias("x"), banded.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.sig").alias("siga"),
            F.col("y.sig").alias("sigb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    match = F.size(F.filter(F.zip_with("siga", "sigb", lambda p, q: p == q), lambda e: e))
    return pairs.select(
        "doc_a", "doc_b", (match / F.lit(float(num_perm))).alias("est_jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(keep_id, dup_id) near-dup pairs above the estimated-Jaccard
    threshold (MinHash -> LSH -> verify)."""
    sig = minhash_signatures(df, text_col, id_col, num_perm)
    cands = lsh_candidate_pairs(sig, bands, num_perm // bands)
    hits = cands.filter(F.col("est_jaccard") >= threshold)
    return hits.select(
        F.least("doc_a", "doc_b").alias("keep_id"),
        F.greatest("doc_a", "doc_b").alias("dup_id"),
        "est_jaccard",
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """(doc, simhash long): tf-weighted SimHash over terms. Pure column
    math: per (doc, term) the term's hash bits vote +tf/-tf per
    position; sign of the per-position sum sets the bit. Default 64-bit
    xxhash64; pass bits=60, hash_fn=portable_hash60 for a signature
    replayable in SQL engines (md5-derived hashes carry 60 bits)."""
    toks = tokenize_col(text_col)
    hf = hash_fn or F.xxhash64
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", hf(F.col("term")))
    )
    def _mask(i):  # JVM-side shift: bit 63 overflows a Python->py4j long lit
        return F.shiftleft(F.lit(1).cast("long"), i)

    votes = tf.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(_mask(i)) != 0, F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, _mask(i)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return votes.select("doc", sim.alias("simhash"))


def simhash_near_duplicates(
    signatures: DataFrame, max_hamming: int = 3, bits: int = 64
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) <= max_hamming.
    signatures(doc, simhash). Pigeonhole banding: split the `bits` bits
    into max_hamming+1 chunks — any pair within hamming k must agree
    EXACTLY on at least one chunk, so candidates come from k+1 equi-joins
    on chunk values (never an all-pairs product), then exact popcount
    verifies. The same join shape as MinHash LSH; shuffles (doc, 8B key)
    rows."""
    bands = max_hamming + 1
    width = bits // bands
    chunks = []
    for i in range(bands):
        shift = i * width
        w = width if i < bands - 1 else bits - shift  # last band takes the slack
        if w >= 64:
            key = F.col("simhash")
        else:
            mask = F.lit((1 << w) - 1).cast("long")
            key = F.shiftrightunsigned("simhash", shift).bitwiseAND(mask)
        chunks.append(F.struct(F.lit(i).alias("band"), key.alias("key")))
    banded = signatures.select(
        "doc", "simhash", F.explode(F.array(*chunks)).alias("bk")
    ).select("doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    x, y = banded.alias("x"), banded.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(keep_id, dup_id): docs with IDENTICAL simhash (hamming 0). For
    hamming<=k use simhash_near_duplicates (banded k+1-chunk equi-join +
    exact popcount verify).

    CAUTION (observed on short Zipfian corpora): simhash bits are
    majority votes dominated by head terms, so short docs with similar
    term-frequency profiles can collide at hamming 0 without being
    near-duplicates. Treat the output as CANDIDATE pairs and verify with
    ngram_jaccard_pairs / exact cosine before deleting anything."""
    s = simhash64(df, text_col, id_col)
    g = s.groupBy("simhash").agg(
        F.min("doc").alias("keep_id"), F.collect_list("doc").alias("docs"), F.count("*").alias("n")
    )
    return (
        g.filter(F.col("n") > 1)
        .select("keep_id", F.explode("docs").alias("dup_id"))
        .filter(F.col("dup_id") != F.col("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.0,
    max_shingle_df: Optional[int] = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for docs sharing >=1 n-gram shingle.
    `max_shingle_df` drops shingles hotter than the cap before the
    self-join — the web-scale guard against quadratic blowup on
    boilerplate (dropped shingles only LOWER estimated similarity for
    pairs glued by boilerplate alone, which is the desired bias)."""
    sh = _shingles(df, text_col, id_col, n)
    if max_shingle_df:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("sdf") > max_shingle_df).select("shingle")),
            "shingle",
            "left_anti",
        )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    x, y = sh.alias("x"), sh.alias("y")
    common = (
        x.join(y, (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc") < F.col("y.doc")))
        .groupBy(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    jac = (
        common.join(sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def embedding_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
) -> DataFrame:
    """(doc_a, doc_b, cosine) pairs above threshold. Candidates via
    random-hyperplane LSH buckets (seeded, deterministic), verified with
    exact cosine inside each bucket — only bucket-mates meet."""
    from dpr_spark.extras.ann import add_hyperplane_bucket, cosine_expr

    e = emb.select(
        F.col(id_col).alias("doc"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    e = add_hyperplane_bucket(e, "v", num_planes=num_planes, seed=42)
    x, y = e.alias("x"), e.alias("y")
    pairs = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.doc") < F.col("y.doc"))
    ).select(
        F.col("x.doc").alias("doc_a"),
        F.col("y.doc").alias("doc_b"),
        cosine_expr(F.col("x.v"), F.col("y.v")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def connected_components(
    pairs: DataFrame,
    id_a: str = "a",
    id_b: str = "b",
    max_iters: int = 20,
) -> DataFrame:
    """(node, component) over an undirected edge list — the CLUSTERING
    step of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/Jaccard
    output) become duplicate CLUSTERS, and `component` (= the cluster's
    minimum node id) is the canonical document every other member
    collapses to.

    Algorithm: iterative min-label propagation (the Spark-friendly
    special case of large-star/small-star, e.g. Kiveris et al. 2014
    "Connected Components in MapReduce and Beyond"): each round every
    node adopts the smallest label among itself and its neighbors;
    convergence is checked with one count of changed labels and takes
    ≤ graph-diameter rounds — dup clusters are shallow (pairs/stars),
    so 2-4 rounds in practice. Each round is one join + one min-agg on
    the EDGE list (never materializes neighborhoods), so a 10^10-edge
    pair table shuffles only (node, label) rows.

    Isolated nodes never appear (no pairs -> no row), matching the
    dedup contract: docs absent from the output keep themselves.
    Raises if not converged within max_iters (a pathological chain —
    raise max_iters, or pre-collapse with exact dedup first).

    Small-graph fast path (same pattern as the build's local vocab
    rank): the raw pair table is persisted and counted — the same
    materialization job the iterative path pays via its first
    labels.count() — and a graph of at most LOCAL_CC_EDGES_MAX edges
    takes a single-task union-find with min-as-root instead of the
    iterative join rounds: ONE job, and union-find's min-root invariant
    computes exactly the same (node, min id of its component) labels
    the converged propagation does. Larger graphs keep the scalable
    iterative path (the count there prices one cached scan, not a
    pipeline re-run)."""
    e0 = (
        pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
        .filter(F.col("x") != F.col("y"))
    ).persist()
    n_edges = e0.count()
    if n_edges <= LOCAL_CC_EDGES_MAX:
        ntype = e0.schema["x"].dataType.simpleString()

        def uf_full(it):
            parent: dict = {}
            seen: set = set()

            def find(v):
                r = v
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(v, v) != v:  # path compression
                    parent[v], v = r, parent[v]
                return r

            for pdf in it:
                for xv, yv in zip(pdf["x"], pdf["y"]):
                    seen.add(xv)
                    seen.add(yv)
                    rx, ry = find(xv), find(yv)
                    if rx == ry:
                        continue
                    # attach the larger root under the smaller: the root
                    # IS the component minimum at every step
                    if rx < ry:
                        parent[ry] = rx
                    else:
                        parent[rx] = ry
            members = list(seen)
            yield pd.DataFrame(
                {"node": members, "component": [find(v) for v in members]}
            )

        # repartition(1), not coalesce(1): the (often expensive — MinHash/
        # LSH) pair pipeline keeps its full parallelism above the one-
        # partition exchange
        return e0.repartition(1).mapInPandas(
            uf_full, f"node {ntype}, component {ntype}"
        )
    # symmetrize once via explode, NOT a union of two selects over the
    # same child: the union references the (often expensive — e.g. a
    # whole MinHash/LSH pipeline) pair subtree twice and re-executes it
    # per reference inside the materialization job (guide §7.2
    # "duplicated subtrees"); explode reads it once. Labels start as
    # the node id.
    edges = (
        e0.select(
            F.explode(
                F.array(
                    F.struct(F.col("x"), F.col("y")),
                    F.struct(F.col("y").alias("x"), F.col("x").alias("y")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.x").alias("x"), F.col("_e.y").alias("y"))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()
    e0.unpersist(True)  # the symmetrized edges cache is materialized now
    for _ in range(max_iters):
        # neighbor-min in one pass: edge (x, y) proposes y's label to x
        prop = (
            edges.join(labels.withColumnRenamed("node", "y"), "y")
            .select(F.col("x").alias("node"), "component")
        )
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        # ONE job per round: counting changed labels is the first action
        # on `new`, so it materializes the persist as a side effect (the
        # previous separate new.count() was a second full job per round)
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(f"connected_components: not converged in {max_iters} iters")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "a",
    id_b: str = "b",
) -> DataFrame:
    """(doc_id, component, is_canonical): every doc labeled with its
    duplicate cluster (docs in no pair are their own singleton
    component) — the table a pipeline keeps WHERE is_canonical to
    drop near-duplicates while retaining exactly one representative."""
    comp = connected_components(pairs, id_a, id_b)
    out = (
        docs.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("component"))


def semdedup(
    emb: DataFrame,
    centroids,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dedup by embedding —
    cluster the corpus with a coarse quantizer, then drop any document
    whose rounded cosine to a SMALLER-id cluster-mate is >= tau (the
    same keep-lowest-id rule as the simhash/minhash dedup family, made
    semantic). This is the LLM-data-pipeline step that removes
    paraphrase-level duplicates exact/MinHash dedup can't see.

    -> (id, cluster, keep, dup_of) with dup_of = the smallest similar
    cluster-mate id, -1 when kept.

    Scale shape: the quadratic term is confined WITHIN clusters — the
    paper's whole point — so the self-join shuffles on cluster id and
    compares |cluster|^2 pairs per cluster, never corpus^2; the
    assignment is one Arrow map pass with the centroid matrix in the
    UDF closure (extras/ann.py::ivf_assign). Cosines are rounded so a
    SQL twin replays the exact keep/drop set."""
    from dpr_spark.extras.ann import cosine_expr, ivf_assign

    a = ivf_assign(emb, centroids, vec_col=vec_col, out_col="cluster").select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
        "cluster",
    )
    x = a.select(F.col("id").alias("xid"), F.col("v").alias("xv"), "cluster")
    y = a.select(F.col("id").alias("yid"), F.col("v").alias("yv"), "cluster")
    sim = F.round(cosine_expr(F.col("xv"), F.col("yv")), decimals)
    dups = (
        x.join(y, "cluster")
        .filter(F.col("xid") < F.col("yid"))
        .filter(sim >= F.lit(tau))
        .groupBy("yid")
        .agg(F.min("xid").alias("dup_of"))
    )
    return (
        a.join(dups, a["id"] == dups["yid"], "left")
        .select(
            "id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce("dup_of", F.lit(-1)).alias("dup_of"),
        )
    )
