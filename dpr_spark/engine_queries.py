"""Driver-contract queries: each SURVEY.md §2 operator expressed over the
driver's testdata tables (documents/embeddings/events at
/root/testdata/sf*/), with a DuckDB-runnable oracle SQL twin.

Parity rules that make the value-hash comparison deterministic:
- tokenization uses the lowercase-first Catalyst/RE2 shared spelling
  (identical on the ASCII testdata corpus; full reference fidelity is
  pytest-gated separately against the regex-module tokenizer);
- every float column is rounded (6 dp scores, 4 dp ratios) in BOTH
  engines, and ranks order by the ROUNDED score so last-ulp float
  differences can't flip a rank;
- int math (minhash, fingerprints) is exact in both engines.

Each `q_*` function returns (callable(spark, sf_dir) -> DataFrame,
oracle_sql or None).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.functions.tokenizer import TOKEN_PATTERN_SQL, tokenize

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

_DUCK_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN_SQL}')"

# Fixed NQ-style query set over the testdata documents vocabulary
# (SURVEY.md S2/J6; the driver corpus speaks a 31-word SQL-flavored language).
BENCH_QUERIES = [
    (0, "spark window agg"),
    (1, "customer join order"),
    (2, "fast scan filter"),
    (3, "the big table"),
    (4, "hash merge sort key"),
    (5, "stream batch window data"),
    (6, "slow query line part"),
    (7, "vector group value column"),
]

# answers copied verbatim from corpus phrases (has_answer A1/V1 needs hits)
BENCH_ANSWERS = {
    0: ["spark window", "agg"],
    1: ["customer join", "order scan"],
    2: ["fast scan", "filter value"],
    3: ["big table", "the part"],
    4: ["hash merge", "sort key"],
    5: ["stream batch", "window data"],
    6: ["slow query", "line part"],
    7: ["vector group", "value column"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _tok_col():
    from dpr_spark.functions.tokenizer import tokenize_col

    return tokenize_col("text", lowercase_first=True)


def _tokenized(spark, sf_dir) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", _tok_col().alias("toks")
    )


def _parallel_builds(fns):
    """Run independent index builds from a small driver thread pool so
    their driver-side barriers (stats collects) overlap and later
    builds' tasks back-fill the earlier builds' stage tails (guide
    §2.6). Builds are independent — results identical to sequential."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(fns))) as ex:
        return [f.result() for f in [ex.submit(fn) for fn in fns]]


def _qterm_values_sql() -> str:
    """(qid, term) VALUES literal — queries pre-tokenized with the
    reference tokenizer (pure Python, ASCII → identical to SQL spelling)."""
    pairs = []
    for qid, q in BENCH_QUERIES:
        for t in sorted(set(tokenize(q))):
            pairs.append(f"({qid}, '{t}')")
    return ", ".join(pairs)


def _qterms_df(spark: SparkSession) -> DataFrame:
    rows = []
    for qid, q in BENCH_QUERIES:
        for t in sorted(set(tokenize(q))):
            rows.append((qid, t))
    return spark.createDataFrame(rows, "qid int, term string")


_BM25_CTES = f"""
tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term)),
scored AS (
  SELECT qt.qid, tf.doc_id,
         sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
             * tf.tf * {BM25_K1 + 1.0}
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
         ) AS score
  FROM qt JOIN dict USING (term) JOIN tf USING (term)
       JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
  GROUP BY 1, 2),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scored)
"""


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark-side BM25 pipeline over the testdata documents table,
    mirroring _BM25_CTES term for term (J6 + M1 + A6/A7)."""
    # persist: tok feeds three consumers (the stats branch, tf, and dic
    # via tf) — without it the Arrow tokenize pass re-runs per consumer
    tok = _tokenized(spark, sf_dir).persist()
    ds = tok.select("doc_id", F.size("toks").alias("doclen"))
    # corpus scalars ride the plan as a broadcast 1-row crossJoin instead
    # of a driver collect: one Spark job per consuming entry instead of
    # two, same doubles (count/avg computed by the identical aggregates)
    stats = ds.agg(
        F.count("*").cast("double").alias("n"), F.avg("doclen").alias("avgdl")
    )
    tf = (
        tok.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dic = tf.groupBy("term").agg(F.count("*").alias("df"))
    qt = _qterms_df(spark)
    joined = (
        qt.join(F.broadcast(dic), "term")
        .join(tf, "term")
        .join(ds, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    component = (
        F.log((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("doclen").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        joined.select("qid", "doc_id", component.alias("c"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc(F.round("score", 6)), F.asc("doc_id"))
    return scored.select(
        "qid",
        "doc_id",
        F.round("score", 6).alias("score_r"),
        F.row_number().over(w).alias("rank"),
    )


# ---------------------------------------------------------------------------
# operator entries: (spark_fn, oracle_sql)
# ---------------------------------------------------------------------------

Entry = Tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]


def q_docstats() -> Entry:
    """A6 doc stats: doclen per doc via the shared tokenizer."""

    def fn(spark, sf_dir):
        return _tokenized(spark, sf_dir).select(
            "doc_id", F.size("toks").cast("long").alias("doclen")
        )

    sql = f"SELECT doc_id, len({_DUCK_TOKS})::BIGINT AS doclen FROM documents"
    return fn, sql


def q_dictionary() -> Entry:
    """A6 document frequency per term (`dictionary` table of the engine)."""

    def fn(spark, sf_dir):
        tok = _tokenized(spark, sf_dir)
        return (
            tok.select("doc_id", F.explode_outer("toks").alias("term"))
            .distinct()
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("df"))
        )

    sql = f"""
      SELECT term, count(*)::BIGINT AS df
      FROM (SELECT DISTINCT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      GROUP BY term"""
    return fn, sql


def q_tf_term_doc() -> Entry:
    """A7 term frequency per (term, doc) — the posting rows."""

    def fn(spark, sf_dir):
        return (
            _tokenized(spark, sf_dir)
            .select("doc_id", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count("*").cast("long").alias("tf"))
        )

    sql = f"""
      SELECT term, doc_id, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      GROUP BY term, doc_id"""
    return fn, sql


def q_corpus_stats() -> Entry:
    """A6: N + avgdl (broadcast scalars of the scorer)."""

    def fn(spark, sf_dir):
        return (
            _tokenized(spark, sf_dir)
            .select(F.size("toks").alias("dl"))
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.round(F.avg("dl"), 6).alias("avgdl"),
            )
        )

    sql = f"""
      SELECT count(*)::BIGINT AS n_docs, round(avg(len({_DUCK_TOKS})), 6) AS avgdl
      FROM documents"""
    return fn, sql


def q_bm25_topk() -> Entry:
    """The flagship: BM25 (k1=1.2, b=0.75) top-10 per fixed query (J6+M1+K1)."""

    def fn(spark, sf_dir):
        return (
            _bm25_ranked(spark, sf_dir)
            .filter(F.col("rank") <= 10)
            .select("qid", "rank", "doc_id", "score_r")
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_topk_join_text() -> Entry:
    """J1: top-3 results joined back to passage text
    (`dense_retriever.py:352`)."""

    def fn(spark, sf_dir):
        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 3)
        docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
        return top.join(docs, "doc_id").select("qid", "rank", "doc_id", "text", "lang")

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """
        SELECT r.qid, r.rank, r.doc_id, d.text, d.lang
        FROM ranked r JOIN documents d USING (doc_id) WHERE r.rank <= 3"""
    )
    return fn, sql


def _answers_values_sql() -> str:
    rows = []
    for qid, answers in BENCH_ANSWERS.items():
        for a in answers:
            toks = " ".join(tokenize(a))
            rows.append(f"({qid}, '{toks}')")
    return ", ".join(rows)


def q_accuracy_at_k() -> Entry:
    """A1+V1: has_answer (token-subsequence via space-joined containment)
    over top-10 docs, first-hit rank, cumulative accuracy@k histogram
    (`qa_validation.py:72-78`, `:175-193`)."""
    n_q = len(BENCH_QUERIES)

    def fn(spark, sf_dir):
        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 10)
        toks = _tokenized(spark, sf_dir).select(
            "doc_id",
            F.concat(F.lit(" "), F.concat_ws(" ", "toks"), F.lit(" ")).alias("tstr"),
        )
        ans_rows = [
            (qid, " ".join(tokenize(a)))
            for qid, answers in BENCH_ANSWERS.items()
            for a in answers
        ]
        ans = spark.createDataFrame(ans_rows, "qid int, ans_toks string")
        hits = (
            top.join(toks, "doc_id")
            .join(ans, "qid")
            .withColumn(
                "hit",
                F.col("tstr").contains(F.concat(F.lit(" "), F.col("ans_toks"), F.lit(" "))),
            )
            .groupBy("qid")
            .agg(F.min(F.when(F.col("hit"), F.col("rank"))).alias("first_hit"))
        )
        ks = spark.range(1, 11).select(F.col("id").cast("int").alias("k"))
        return (
            ks.join(hits, F.col("first_hit") <= F.col("k"), "left")
            .groupBy("k")
            .agg(F.count("qid").cast("long").alias("hits"))
            .select(
                "k", "hits", F.round(F.col("hits") / F.lit(float(n_q)), 6).alias("accuracy")
            )
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
        tstr AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS tstr FROM tok),
        ans AS (SELECT * FROM (VALUES {_answers_values_sql()}) AS a(qid, ans_toks)),
        firsthit AS (
          SELECT r.qid, min(CASE WHEN contains(t.tstr, ' ' || a.ans_toks || ' ')
                                 THEN r.rank END) AS first_hit
          FROM ranked r JOIN tstr t USING (doc_id) JOIN ans a ON a.qid = r.qid
          WHERE r.rank <= 10 GROUP BY r.qid),
        ks AS (SELECT range::INT AS k FROM range(1, 11))
        SELECT k, count(f.qid)::BIGINT AS hits,
               round(count(f.qid) / {float(n_q)}, 6) AS accuracy
        FROM ks LEFT JOIN firsthit f ON f.first_hit <= ks.k
        GROUP BY k"""
    )
    return fn, sql


def q_union_dedup() -> Entry:
    """J7 union of sources + A2 exact dedup: duplicate the `en` slice via
    unionByName, dedup on text, count copies."""

    def fn(spark, sf_dir):
        d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
        dup = d.filter(F.col("lang") == "en")
        u = d.unionByName(dup)
        return (
            u.groupBy("text")
            .agg(F.min("doc_id").cast("long").alias("keep_id"), F.count("*").cast("long").alias("n_copies"))
            .select("keep_id", "n_copies")
        )

    sql = """
      SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id, text FROM documents WHERE lang = 'en')
      GROUP BY text"""
    return fn, sql


def q_id_prefix_slice() -> Entry:
    """P2 id-prefix projection + P10 range slice over a deterministic
    ordering (`retriever_data.py:280-283`, `:119-124`)."""

    def fn(spark, sf_dir):
        from dpr_spark.plans.ids import assign_dense_ids

        # two-phase range rank (plans/ids.py) — no single-partition window
        d = assign_dense_ids(_docs(spark, sf_dir).select("doc_id", "lang"), "doc_id", "rn0")
        return (
            d.withColumn("rn", (F.col("rn0") + 1).cast("int"))
            .filter((F.col("rn") > 100) & (F.col("rn") <= 200))
            .select(
                F.concat(F.lit("wiki:"), F.col("doc_id")).alias("sample_id"), "rn", "lang"
            )
        )

    sql = """
      SELECT 'wiki:' || doc_id AS sample_id, rn, lang
      FROM (SELECT doc_id, lang, row_number() OVER (ORDER BY doc_id) AS rn
            FROM documents)
      WHERE rn > 100 AND rn <= 200"""
    return fn, sql


def q_normalize_em() -> Entry:
    """P9+V4 exact-match after answer normalization
    (`qa_validation.py:214-232`): prediction = first 30 chars, gold = a
    mangled twin (case/punct for even ids, truncated for odd)."""
    from dpr_spark.functions.normalize import normalize_answer_col, normalize_answer_sql

    def fn(spark, sf_dir):
        d = _docs(spark, sf_dir).select("doc_id", F.substring("text", 1, 30).alias("pred"))
        d = d.withColumn(
            "gold",
            F.when(F.col("doc_id") % 2 == 0, F.concat(F.upper(F.col("pred")), F.lit("!!")))
            .otherwise(F.substring("pred", 1, 25)),
        )
        return d.select(
            "doc_id",
            (normalize_answer_col("pred") == normalize_answer_col("gold")).alias("em"),
        )

    npred = normalize_answer_sql("pred")
    ngold = normalize_answer_sql("gold")
    sql = f"""
      SELECT doc_id, ({npred} = {ngold}) AS em
      FROM (SELECT doc_id, pred,
                   CASE WHEN doc_id % 2 = 0 THEN upper(pred) || '!!'
                        ELSE substr(pred, 1, 25) END AS gold
            FROM (SELECT doc_id, substr(text, 1, 30) AS pred FROM documents))"""
    return fn, sql


def q_ngram_jaccard_pairs() -> Entry:
    """Near-dup by n-gram Jaccard: 5-gram shingles, bucket join on shared
    shingle, |A∩B| / (|A|+|B|-|A∩B|); top-20 pairs by similarity.
    Scale guards (same semantics in BOTH engines): docs shorter than N
    tokens emit no shingles, and shingles hotter than MAX_SDF docs are
    dropped before the self-join (the extras/dedup.py boilerplate cap —
    the quadratic-blowup defense). Top-20 via global sort+limit
    (TakeOrdered: per-partition top-N + driver merge, no one-task window).
    """
    N = 5
    MAX_SDF = 1000

    def fn(spark, sf_dir):
        from dpr_spark.functions.ngrams_fast import ngram_rows

        # vectorized Arrow n-gram kernel; distinct=True inside the
        # kernel == the former global (doc_id, shingle) DISTINCT (every
        # doc's grams live in one batch), dropping that exchange.
        # persist: sh feeds four consumers (hot filter, anti-join, the
        # a/b self-join, sizes) — cached after the first materialization
        sh = ngram_rows(
            _docs(spark, sf_dir), N, lowercase_first=True, mode="full",
            distinct=True, out_id="doc_id", out_gram="shingle",
        ).persist()
        hot = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("sdf") > MAX_SDF).select("shingle")),
            "shingle",
            "left_anti",
        )
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("common"))
        )
        jac = (
            common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6
                ).alias("jaccard"),
            )
        )
        return jac.orderBy(F.desc("jaccard"), "doc_a", "doc_b").limit(20)

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      sh0 AS (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               array_to_string(toks[i + 1 : i + {N}], ' ') AS shingle
        FROM tok, unnest(range(0, len(toks) - {N} + 1)) AS t(i)
        WHERE len(toks) >= {N})),
      hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > {MAX_SDF}),
      sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
      jac AS (SELECT doc_a, doc_b,
                     round(common / (sa.sz + sb.sz - common), 6) AS jaccard
              FROM common JOIN sizes sa ON sa.doc_id = doc_a
                          JOIN sizes sb ON sb.doc_id = doc_b)
      SELECT doc_a, doc_b, jaccard FROM jac
      ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"""
    return fn, sql


def q_embedding_topk_cosine() -> Entry:
    """Brute-force cosine top-10 ANN baseline over embeddings
    (array<float>), queries = vec_id 0..4; rank by rounded cosine."""

    def fn(spark, sf_dir):
        e = _emb(spark, sf_dir).select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        )
        dot = F.aggregate(
            F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        nrm = lambda c: F.sqrt(
            F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )
        pairs = (
            q.crossJoin(e)
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                F.round(dot / (nrm(F.col("qv")) * nrm(F.col("v"))), 6).alias("cos_r"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), "vec_id")
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("qid", "rank", "vec_id", "cos_r")
        )

    sql = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      pairs AS (
        SELECT q.qid, e.vec_id,
               round(list_dot_product(q.qv, e.v)
                     / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))),
                     6) AS cos_r
        FROM q CROSS JOIN e WHERE e.vec_id != q.qid),
      ranked AS (SELECT qid, vec_id, cos_r,
                        row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id) AS rank
                 FROM pairs)
      SELECT qid, rank, vec_id, cos_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_langid_quality() -> Entry:
    """Text analysis: stopword-ratio language-ID heuristic + quality score
    (length / stopword-ratio / mean word length)."""
    stop = "the a of and to in is was for on as with by at from it".split()
    stop_sql = ", ".join(f"'{s}'" for s in stop)

    def fn(spark, sf_dir):
        tok = _tokenized(spark, sf_dir)
        st = F.array(*[F.lit(s) for s in stop])
        return tok.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.round(
                F.size(F.filter("toks", lambda t: F.array_contains(st, t)))
                / F.greatest(F.size("toks"), F.lit(1)).cast("double"),
                6,
            ).alias("stop_ratio"),
            F.round(
                F.aggregate("toks", F.lit(0.0), lambda acc, t: acc + F.length(t))
                / F.greatest(F.size("toks"), F.lit(1)).cast("double"),
                6,
            ).alias("mean_wlen"),
        ).withColumn("en_like", F.col("stop_ratio") > 0.02)

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
      SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             round(len(list_filter(toks, t -> list_contains([{stop_sql}], t)))
                   / greatest(len(toks), 1)::DOUBLE, 6) AS stop_ratio,
             round(list_sum(list_transform(toks, t -> length(t)::DOUBLE))
                   / greatest(len(toks), 1)::DOUBLE, 6) AS mean_wlen,
             (round(len(list_filter(toks, t -> list_contains([{stop_sql}], t)))
                   / greatest(len(toks), 1)::DOUBLE, 6) > 0.02) AS en_like
      FROM tok"""
    return fn, sql


def q_doc_fingerprint() -> Entry:
    """Document fingerprint: polynomial rolling hash over per-term ids
    (exact integer math — deterministic in both engines). Term id =
    md5-derived 60-bit hash mod 2^31-1: a pure column function, so the
    fingerprint is ONE streaming fold over each doc's token array — no
    vocabulary join, no per-doc token collect, no global window (the
    shape that survives 10^12 docs)."""
    P = 2147483647  # 2^31-1
    R = 1000003

    def _tid(t):
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(P)

    def fn(spark, sf_dir):
        return _tokenized(spark, sf_dir).select(
            "doc_id",
            F.aggregate(
                F.transform("toks", _tid),
                F.lit(0).cast("long"),
                lambda acc, x: (acc * F.lit(R) + x) % F.lit(P),
            ).alias("fingerprint"),
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(toks,
                   t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {P})),
               (acc, x) -> (acc * {R} + x) % {P})::BIGINT AS fingerprint
      FROM tok"""
    return fn, sql


def q_minhash_lsh() -> Entry:
    """MinHash + LSH banding over 3-gram shingles (extras/dedup.py):
    candidate pairs colliding in >=1 band with estimated Jaccard. The
    entry runs the SAME pipeline with hash_fn=portable_hash60 (md5-based
    shingle ids) and collision-free band keys, which DuckDB can replay
    exactly — exact integer affine-permutation math in both engines."""
    P = 2147483647
    NUM_PERM, BANDS, RPB = 16, 4, 4
    # the same affine coefficients minhash_signatures derives
    a = [((i * 2 + 1) * 40503) % P for i in range(1, NUM_PERM + 1)]
    b = [((i * 7 + 3) * 69069) % P for i in range(1, NUM_PERM + 1)]

    def fn(spark, sf_dir):
        from dpr_spark.extras.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            portable_hash60,
        )

        sig = minhash_signatures(
            _docs(spark, sf_dir), num_perm=NUM_PERM, hash_fn=portable_hash60
        )
        return lsh_candidate_pairs(
            sig, bands=BANDS, rows_per_band=RPB, hash_keys=False
        ).select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))

    from dpr_spark.functions.tokenizer import duckdb_tokenize_sql

    perm_vals = ", ".join(f"({j}, {a[j]}, {b[j]})" for j in range(NUM_PERM))
    match_terms = " + ".join(
        f"(CASE WHEN siga[{j + 1}] = sigb[{j + 1}] THEN 1 ELSE 0 END)"
        for j in range(NUM_PERM)
    )
    sql = f"""
      WITH tok AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
      sh0 AS (SELECT DISTINCT doc_id AS doc,
                     array_to_string(toks[i + 1 : i + 3], ' ') AS shingle
              FROM tok, unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS t(i)),
      sh AS (SELECT doc, shingle FROM sh0 WHERE shingle != ''),
      sid AS (SELECT doc,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {P} AS sid
              FROM sh),
      perm AS (SELECT * FROM (VALUES {perm_vals}) AS p(j, a, b)),
      mins AS (SELECT doc, j, min((sid * a + b) % {P}) AS mv
               FROM sid CROSS JOIN perm GROUP BY 1, 2),
      sig AS (SELECT doc, list(mv ORDER BY j) AS sig FROM mins GROUP BY doc),
      banded AS (SELECT doc, sig, band,
                        array_to_string(sig[band * {RPB} + 1 : band * {RPB} + {RPB}], '_') AS key
                 FROM sig, unnest(range(0, {BANDS})) AS t(band)),
      pairs AS (SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
                       x.sig AS siga, y.sig AS sigb
                FROM banded x JOIN banded y
                  ON x.band = y.band AND x.key = y.key AND x.doc < y.doc)
      SELECT doc_a, doc_b,
             round(({match_terms}) / {NUM_PERM}.0, 6) AS est_jaccard
      FROM pairs"""
    return fn, sql


def q_simhash_dedup() -> Entry:
    """SimHash signatures (extras/dedup.py): tf-weighted per-bit majority
    vote over term hashes. The entry uses the 60-bit md5-derived hash
    family (portable_hash60) so DuckDB replays bit-identical signatures;
    the engine default stays 64-bit xxhash64."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.dedup import portable_hash60, simhash64

        return simhash64(_docs(spark, sf_dir), bits=60, hash_fn=portable_hash60)

    from dpr_spark.functions.tokenizer import duckdb_tokenize_sql

    sql = f"""
      WITH tok AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
      tf AS (SELECT doc_id AS doc, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      h AS (SELECT doc, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
      votes AS (SELECT doc, b,
                       sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS v
                FROM h, unnest(range(0, 60)) AS t(b) GROUP BY 1, 2)
      SELECT doc, sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
      FROM votes GROUP BY doc"""
    return fn, sql


def q_ann_lsh_topk() -> Entry:
    """Hyperplane-LSH approximate cosine top-k (extras/ann.py) — the ANN
    scale path: bucket = sign bits of 8 seeded hyperplane dots, candidates
    = corpus vectors within hamming<=2 of the query bucket (multi-probe),
    exact cosine re-rank. The oracle embeds the SAME plane literals
    (np seed 42, dim 64) and replays bucket + probe + rank in DuckDB."""
    NUM_PLANES, PROBE_H, K, DIM = 8, 2, 10, 64

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import lsh_cosine_topk

        e = _emb(spark, sf_dir)
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        return lsh_cosine_topk(
            e, q, k=K, num_planes=NUM_PLANES, probe_hamming=PROBE_H, rank_round=6
        ).select("qid", "rank", "vec_id", F.round("cosine", 6).alias("cos_r"))

    from dpr_spark.extras.ann import _hyperplanes

    planes = _hyperplanes(DIM, NUM_PLANES, seed=42)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in planes[i])}]"
        f"::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(NUM_PLANES)
    )
    sql = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      bkt AS (SELECT vec_id, v, ({bucket_terms})::BIGINT AS bucket FROM e),
      q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM bkt WHERE vec_id < 5),
      cand AS (
        SELECT q.qid, b.vec_id,
               round(list_dot_product(q.qv, b.v)
                     / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
                     6) AS cos_r
        FROM q JOIN bkt b ON bit_count(xor(q.qb, b.bucket)) <= {PROBE_H}),
      ranked AS (SELECT qid, vec_id, cos_r,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos_r DESC, vec_id) AS rank
                 FROM cand)
      SELECT qid, rank, vec_id, cos_r FROM ranked WHERE rank <= {K}"""
    return fn, sql


def q_token_counts() -> Entry:
    """Token counting (extras/textstats.py): whitespace, reference
    tokenizer, BPE-ish subword estimate — with a DuckDB twin."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.textstats import token_counts

        return token_counts(_docs(spark, sf_dir)).withColumnRenamed("doc", "doc_id")

    sql = f"""
      WITH tok AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
             len(toks)::BIGINT AS simple_tokens,
             list_sum(list_transform(toks, t -> ceil(length(t) / 4.0)::BIGINT))::BIGINT
               AS bpe_ish_tokens
      FROM tok"""
    return fn, sql


def q_bpe_pair_counts() -> Entry:
    """Distributed BPE tokenizer training, the SQL-replayable slice
    (extras/bpe.py::initial_pair_counts): iteration-0 adjacent-symbol
    pair statistics over the documents corpus — per word (repo
    tokenizer, lowercased), symbols are its characters plus a trailing
    '</w>' marker, and every adjacent pair counts once per corpus
    occurrence of the word. Top-50 by (cnt DESC, left ASC, right ASC).
    The FULL merge loop is iterative (not SQL-expressible) and is
    verified against the pure-Python Sennrich twin in tests/test_bpe.py;
    this entry pins the statistics every merge decision derives from.
    The unpartitioned rank window is safe: iteration-0 pair space is
    bounded by charset², not corpus or vocab size."""
    N = 50

    def fn(spark, sf_dir):
        from dpr_spark.extras.bpe import initial_pair_counts, word_counts

        pc = initial_pair_counts(word_counts(_docs(spark, sf_dir)))
        w = Window.orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        return (
            pc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= N)
            .select("rank", "left", "right", "cnt")
        )

    sql = f"""
    WITH tok AS (SELECT {_DUCK_TOKS} AS toks FROM documents),
    words AS (SELECT w AS word, count(*)::BIGINT AS cnt
              FROM tok, unnest(toks) AS t(w) GROUP BY 1),
    pairs AS (
      SELECT substr(word, i, 1) AS "left",
             CASE WHEN i < length(word) THEN substr(word, i + 1, 1)
                  ELSE '</w>' END AS "right",
             cnt
      FROM words, unnest(generate_series(1, length(word)::BIGINT)) AS g(i)),
    agg AS (SELECT "left", "right", sum(cnt)::BIGINT AS cnt
            FROM pairs GROUP BY 1, 2),
    ranked AS (SELECT row_number() OVER (ORDER BY cnt DESC, "left", "right")
                 AS rank, "left", "right", cnt FROM agg)
    SELECT rank, "left", "right", cnt FROM ranked WHERE rank <= {N}"""
    return fn, sql


def q_bm25_topk_wand() -> Entry:
    """The full engine path on the driver corpus: build_index_from_docs ->
    impact segments -> doc-partitioned searcher (query/wand.py), checked
    against the same DuckDB BM25 oracle as q_bm25_topk. Rank re-derived
    from the 6-dp-rounded score so float last-ulp noise can't flip it."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        seg = build_impact_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_segments(spark, qdf, idx, seg, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_bm25_topk_blockmax() -> Entry:
    """The north-star serving path on the driver corpus:
    build_index_from_docs -> doc-bucketed COMPRESSED posting blocks
    (delta-gap varint + per-block max score) -> block-max searcher
    (query/blockmax.py), checked against the same DuckDB BM25 oracle as
    q_bm25_topk. Rank re-derived from the 6-dp-rounded score so float
    last-ulp noise can't flip it."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.blockmax import build_block_segments, search_blocks

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        blocks, norms = build_block_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_blocks(spark, qdf, idx, blocks, norms, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_bm25f_topk() -> Entry:
    """Fielded (title+text) weighted BM25 top-10 via the REAL fielded
    engine (index/fielded.py): per-field df/idf/doclen/avgdl, score =
    1.0·BM25_text + 2.0·BM25_title — the Lucene `title:t^2 OR text:t`
    multi-field surface (r4 VERDICT next-round #1). The documents table
    has no title column, so title := the first 3 tokens of the text —
    the same deterministic derivation in both engines (Spark builds the
    title string from tokenize_col; DuckDB slices the token list
    directly; re-tokenizing a space-joined token list is the identity on
    this corpus). Rank re-derived from the 6-dp-rounded score so float
    last-ulp noise can't flip it."""
    W_TEXT, W_TITLE = 1.0, 2.0

    def fn(spark, sf_dir):
        from dpr_spark.index.fielded import build_fielded_index, search_fielded

        docs = _docs(spark, sf_dir).select(
            "doc_id",
            "text",
            F.concat_ws(" ", F.slice(_tok_col(), 1, 3)).alias("title"),
        )
        idx = build_fielded_index(
            spark, docs, fields=("text", "title"),
            weights={"text": W_TEXT, "title": W_TITLE},
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_fielded(qdf, idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      fdoc AS (
        SELECT doc_id, 0 AS field_id, toks FROM tok
        UNION ALL
        SELECT doc_id, 1 AS field_id, list_slice(toks, 1, 3) AS toks FROM tok),
      ds AS (SELECT doc_id, field_id, len(toks) AS doclen FROM fdoc),
      stats AS (SELECT field_id, count(*)::DOUBLE AS n, avg(doclen) AS avgdl
                FROM ds GROUP BY 1),
      tf AS (SELECT doc_id, field_id, term, count(*) AS tf
             FROM (SELECT doc_id, field_id, unnest(toks) AS term FROM fdoc)
             GROUP BY 1, 2, 3),
      dict AS (SELECT field_id, term, count(*) AS df FROM tf GROUP BY 1, 2),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum((CASE WHEN tf.field_id = 1 THEN {W_TITLE} ELSE {W_TEXT} END)
                   * ln((s.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / s.avgdl))
               ) AS score
        FROM qt
        JOIN dict ON dict.term = qt.term
        JOIN tf ON tf.term = qt.term AND tf.field_id = dict.field_id
        JOIN ds ON ds.doc_id = tf.doc_id AND ds.field_id = tf.field_id
        JOIN stats s ON s.field_id = tf.field_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_explain_topk() -> Entry:
    """Score explain (query/explain.py; Lucene IndexSearcher.explain):
    one row per (query, top-3 doc, matched term) with tf, doclen, df,
    idf and the BM25 component — sum(component) == the doc's score. The
    twin recomputes every number from the shared BM25 CTEs."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.explain import explain_topk

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        ex = explain_topk(spark, qdf, idx, k=3)
        return ex.select(
            "qid",
            "rank",
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doclen").cast("long").alias("doclen"),
            F.col("df").cast("long").alias("df"),
            F.round("idf", 6).alias("idf_r"),
            F.round("component", 6).alias("comp_r"),
            F.round("score", 6).alias("score_r"),
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
      comp AS (
        SELECT qt.qid, tf.doc_id, qt.term, tf.tf::BIGINT AS tf,
               ds.doclen::BIGINT AS doclen, dict.df::BIGINT AS df,
               round(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0), 6)
                 AS idf_r,
               round(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                     * tf.tf * {BM25_K1 + 1.0}
                     / (tf.tf + {BM25_K1}
                        * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl)),
                     6) AS comp_r
        FROM qt JOIN dict USING (term) JOIN tf USING (term)
             JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats)
      SELECT c.qid, r.rank, c.doc_id, c.term, c.tf, c.doclen, c.df,
             c.idf_r, c.comp_r, r.score_r
      FROM comp c JOIN ranked r ON r.qid = c.qid AND r.doc_id = c.doc_id
      WHERE r.rank <= 3"""
    )
    return fn, sql


def q_merged_index_topk() -> Entry:
    """Index MERGE (index/merge.py; Lucene segment merge; the north
    rule's 'construction, merge, compression, top-k'): the documents
    table is split by doc_id parity, each half built into its own index,
    the two merged WITHOUT retokenizing (dictionary union + summed df +
    term_id rewrite), and BM25 top-10 over the merged index must equal
    the oracle over the WHOLE table — proving df/idf/avgdl/postings
    merged exactly. Searched via the segments engine, so the merged
    index also drives the production path."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.index.merge import merge_indexes
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        a, b = _parallel_builds(
            [
                lambda i=i: build_index_from_docs(
                    spark, docs.filter(F.col("doc_id") % 2 == i), build_blocks=False
                )
                for i in range(2)
            ]
        )
        idx = merge_indexes(spark, [a, b])
        seg = build_impact_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_segments(spark, qdf, idx, seg, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_delete_live_topk() -> Entry:
    """Live deletes (index/deletes.py; Lucene deleted-docs bitset):
    docs with doc_id % 7 == 0 are tombstoned and excluded at the
    postings iterator of the segments engine while df/N/avgdl stay
    STALE (Lucene's documented trade) — so the twin scores with
    FULL-corpus statistics and filters the dead docs only at ranking."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        dead = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        seg = build_impact_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_segments(spark, qdf, idx, seg, k=10, deletes=dead).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
      live_ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored WHERE doc_id % 7 <> 0)
      SELECT qid, rank, doc_id, score_r FROM live_ranked WHERE rank <= 10"""
    )
    return fn, sql


def q_delete_purge_topk() -> Entry:
    """Purged deletes (index/deletes.py purge_deletes; Lucene merge-time
    reclaim): after the purge the index is a fresh build over the
    survivors — statistics recomputed — so the twin runs the whole BM25
    pipeline over `WHERE doc_id % 7 <> 0` documents."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.index.deletes import purge_deletes
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        dead = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        purged = purge_deletes(spark, idx, dead)
        seg = build_impact_segments(purged, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_segments(spark, qdf, purged, seg, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),\n"
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql()).replace(
            "FROM documents", "FROM live"
        )
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_collapse_topk() -> Entry:
    """Field collapsing (query/paging.py search_collapse; Lucene
    CollapsingTopDocsCollector / ES `collapse`): BM25 top-5 with at most
    ONE result per (query, source) — each source contributes its best
    doc over the FULL candidate set, then the winners rank. The
    "one result per domain" serving contract."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import search_collapse

        docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
        idx = build_index_from_docs(spark, docs.select("doc_id", "text"), build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_collapse(
            spark, qdf, idx, docs.select("doc_id", "source"), "source", k=5
        ).select("qid", "doc_id", "source", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "source", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
      withsrc AS (
        SELECT s.qid, s.doc_id, d.source, round(s.score, 6) AS score_r,
               row_number() OVER (PARTITION BY s.qid, d.source
                                  ORDER BY round(s.score, 6) DESC, s.doc_id)
                 AS grp_rn
        FROM scored s JOIN documents d USING (doc_id)),
      winners AS (
        SELECT qid, doc_id, source, score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_r DESC, doc_id) AS rank
        FROM withsrc WHERE grp_rn = 1)
      SELECT qid, rank, doc_id, source, score_r FROM winners WHERE rank <= 5"""
    )
    return fn, sql


def q_multi_segment_topk() -> Entry:
    """Multi-segment search with blended statistics (index/merge.py
    search_across; Lucene's multi-segment IndexSearcher): the documents
    table split 3 ways by doc_id mod 3, each built independently,
    searched ACROSS without merging — per-query-term df sums over
    segments, avgdl blends exactly — and the top-10 must equal the
    whole-table oracle (the same contract the merged index satisfies,
    proving merge is a throughput choice, not a correctness one)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.index.merge import search_across

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        parts = _parallel_builds(
            [
                lambda i=i: build_index_from_docs(
                    spark, docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i),
                    build_blocks=False,
                )
                for i in range(3)
            ]
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_across(spark, qdf, parts, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_search_after_page2() -> Entry:
    """Result pagination via search_after (query/paging.py; Lucene
    IndexSearcher.searchAfter): page 1 (k=10) runs on the real segments
    engine, its last row per query is echoed back as the (score, doc_id)
    cursor — exact floats, the engine is deterministic bit-for-bit — and
    the returned PAGE 2 must equal oracle ranks 11..20. Each bucket
    drops at-or-before-cursor rows BEFORE its local top-k heap, so page
    N costs what page 1 cost (plan/cost asserts in tests/test_paging.py).
    Rank re-derived from the 6-dp-rounded score; absolute rank = page
    rank + 10 so the twin is a plain BETWEEN window slice."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import cursors_from_page, search_after
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        seg = build_impact_segments(idx, num_buckets=8).persist()
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        page1 = search_segments(spark, qdf, idx, seg, k=10)
        cursors = cursors_from_page(page1)
        res = search_after(spark, qdf, idx, seg, cursors, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn(
            "rank", F.row_number().over(w) + F.lit(10)
        ).select("qid", "rank", "doc_id", "score_r")

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank BETWEEN 11 AND 20"
    )
    return fn, sql


def q_sliced_scroll() -> Entry:
    """ES sliced scroll (query/paging.py::search_sliced): two parallel
    slices (doc_id % 2) each rank their own doc partition top-5 per
    query on the segments engine; the twin re-ranks the BM25 scores
    within each slice. The slice filter sits at the postings iterator,
    so each slice pays only its share (tests/test_paging.py)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import search_sliced
        from dpr_spark.query.wand import build_impact_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        seg = build_impact_segments(idx, num_buckets=8).persist()
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        out = None
        for s in (0, 1):
            page = search_sliced(spark, qdf, idx, seg, s, 2, k=5).select(
                "qid", F.lit(s).alias("slice_id"), "doc_id",
                F.round("score", 6).alias("score_r"),
            )
            out = page if out is None else out.unionByName(page)
        w = Window.partitionBy("qid", "slice_id").orderBy(
            F.desc("score_r"), F.asc("doc_id")
        )
        return out.withColumn("rank", F.row_number().over(w)).select(
            "qid", "slice_id", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    sliced AS (
      SELECT qid, doc_id % 2 AS slice_id, doc_id, score_r,
             row_number() OVER (PARTITION BY qid, doc_id % 2
                                ORDER BY score_r DESC, doc_id) AS rank
      FROM ranked)
    SELECT qid, slice_id, rank, doc_id, score_r FROM sliced WHERE rank <= 5"""
    return fn, sql


def q_sort_by_field_topk() -> Entry:
    """Sort-by-field result mode (query/paging.py; Lucene Sort(SortField)
    over doc values): top-10 MATCHES of each query (any-term OR
    semantics — the same match set BM25 scores) ordered by a stored
    per-doc column instead of relevance. The documents table has no
    timestamp, so warc_ts := (doc_id·2654435761) mod 100003 — a
    deterministic scramble both engines derive identically. Selection is
    the exact two-level top-N (extras/domains.cap_per_key), so one
    mega-query can't funnel through a single window task."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import search_sort_by_field

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        dv = docs.select(
            "doc_id",
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100003)).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return search_sort_by_field(
            spark, qdf, idx, dv, "warc_ts", k=10, salt_buckets=4
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      dterms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      matches AS (SELECT DISTINCT qt.qid, dterms.doc_id
                  FROM qt JOIN dterms USING (term)),
      dv AS (SELECT doc_id, (doc_id * 2654435761) % 100003 AS warc_ts
             FROM documents),
      ranked AS (
        SELECT m.qid, m.doc_id, dv.warc_ts,
               row_number() OVER (PARTITION BY m.qid
                                  ORDER BY dv.warc_ts DESC, m.doc_id) AS rank
        FROM matches m JOIN dv USING (doc_id))
      SELECT qid, rank, doc_id, warc_ts FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_chunk_100w() -> Entry:
    """T5 100-word chunking over documents (reference corpus prep,
    `download_data.py:31-36`) with a DuckDB twin. 30-word chunks so the
    short driver docs actually split."""
    from dpr_spark.functions.chunking import chunk_sql, chunk_text

    def fn(spark, sf_dir):
        return chunk_text(_docs(spark, sf_dir), id_col="doc_id", max_words=30)

    return fn, chunk_sql("documents", id_col="doc_id", max_words=30)


def q_deterministic_shuffle() -> Entry:
    """K4 seeded shuffle: permutation position = dense rank of the
    portable (md5-derived) shuffle key — a pure function of (id, seed),
    so the same seed yields the same permutation on any cluster and in
    any SQL engine. Rank via the two-phase ranged-id kernel (plans/ids),
    not a single-task global window."""

    def fn(spark, sf_dir):
        from dpr_spark.functions.chunking import shuffle_key
        from dpr_spark.plans.ids import assign_dense_ids

        d = _docs(spark, sf_dir).select(
            "doc_id", shuffle_key("doc_id", seed=7, portable=True).alias("skey")
        )
        return assign_dense_ids(d, "skey", "pos").select("doc_id", "pos")

    sql = """
      SELECT doc_id,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 15))::BIGINT
             ) - 1 AS pos
      FROM documents"""
    return fn, sql


def q_has_answer_kilt() -> Entry:
    """V3 KILT containment (`qa_validation.py:288-294`): normalized answer
    substring-in normalized passage over a deterministic doc slice, with
    a DuckDB twin of the same P9 normalization chain."""
    from dpr_spark.functions.normalize import normalize_answer_col, normalize_answer_sql

    def fn(spark, sf_dir):
        d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500).select("doc_id", "text")
        ans_rows = [(qid, a) for qid, answers in BENCH_ANSWERS.items() for a in answers]
        ans = spark.createDataFrame(ans_rows, "qid int, answer string")
        return (
            d.crossJoin(F.broadcast(ans))
            .filter(
                normalize_answer_col("text").contains(normalize_answer_col("answer"))
            )
            .select("qid", "doc_id", "answer")
        )

    vals = ", ".join(
        f"({qid}, '{a.replace(chr(39), chr(39) * 2)}')"
        for qid, answers in BENCH_ANSWERS.items()
        for a in answers
    )
    ntext = normalize_answer_sql("text")
    nans = normalize_answer_sql("answer")
    sql = f"""
      WITH ans AS (SELECT * FROM (VALUES {vals}) AS a(qid, answer)),
           d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500)
      SELECT qid, doc_id, answer
      FROM d CROSS JOIN ans
      WHERE contains({ntext}, {nans})"""
    return fn, sql


def q_results_nested() -> Entry:
    """S7 nested output record (`dense_retriever.py:337-379`,
    `README.md:216-233`): per query {question, ctxs:[{id, text, score,
    has_answer}]} sorted by rank — the df.write.json surface, emitted as
    its JSON serialization (nested arrays are unhashable in the
    harness's pandas compare; the JSON string IS the wire form).

    Oracle-checked byte-for-byte (r3 VERDICT next-round #3): the DuckDB
    twin builds the identical Jackson wire bytes by construction —
    string_agg over '{"rank":..}' fragments in rank order. Portability
    holds because (a) the testdata corpus is printable ASCII with no
    '"'/'\\'/control chars, so JSON string escaping is the identity, and
    (b) the score is cast to decimal(18,6), which Spark's to_json prints
    at fixed scale ("12.345600"), bit-matching printf('%.6f', ..)."""

    def fn(spark, sf_dir):
        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 3)
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        ans_rows = [
            (qid, " ".join(tokenize(a)))
            for qid, answers in BENCH_ANSWERS.items()
            for a in answers
        ]
        ans = spark.createDataFrame(ans_rows, "qid int, ans_toks string")
        joined = (
            top.join(docs, "doc_id")
            .withColumn(
                "tstr", F.concat(F.lit(" "), F.concat_ws(" ", _tok_col()), F.lit(" "))
            )
            .join(ans, "qid")
            .groupBy("qid", "rank", "doc_id", "text", "score_r")
            .agg(
                F.max(
                    F.col("tstr").contains(
                        F.concat(F.lit(" "), F.col("ans_toks"), F.lit(" "))
                    )
                ).alias("has_answer")
            )
        )
        ctx = F.struct(
            F.col("rank"),
            F.col("doc_id").alias("id"),
            F.col("text"),
            F.col("score_r").cast("decimal(18,6)").alias("score"),
            F.col("has_answer"),
        )
        return (
            joined.groupBy("qid")
            .agg(F.sort_array(F.collect_list(ctx)).alias("ctxs"))
            .join(qdf, "qid")
            .select("qid", "question", F.to_json("ctxs").alias("ctxs_json"))
        )

    avals = ", ".join(
        f"({qid}, '{' '.join(tokenize(a))}')"
        for qid, answers in BENCH_ANSWERS.items()
        for a in answers
    )
    qvals = ", ".join(f"({qid}, '{q}')" for qid, q in BENCH_QUERIES)
    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
        top3 AS (SELECT qid, doc_id, rank, score_r FROM ranked WHERE rank <= 3),
        d AS (SELECT doc_id, text,
                     ' ' || array_to_string({_DUCK_TOKS}, ' ') || ' ' AS tstr
              FROM documents),
        ans AS (SELECT * FROM (VALUES {avals}) AS a(qid, ans_toks)),
        q AS (SELECT * FROM (VALUES {qvals}) AS q(qid, question)),
        j AS (SELECT t.qid, t.rank, t.doc_id, d.text, t.score_r,
                     bool_or(contains(d.tstr, ' ' || a.ans_toks || ' ')) AS has_answer
              FROM top3 t JOIN d USING (doc_id) JOIN ans a ON a.qid = t.qid
              GROUP BY 1, 2, 3, 4, 5)
        SELECT j.qid, q.question,
               '[' || string_agg(
                 '{{"rank":' || j.rank::VARCHAR
                 || ',"id":' || j.doc_id::VARCHAR
                 || ',"text":"' || j.text
                 || '","score":' || printf('%.6f', j.score_r)
                 || ',"has_answer":' || CASE WHEN j.has_answer THEN 'true' ELSE 'false' END
                 || '}}', ',' ORDER BY j.rank) || ']' AS ctxs_json
        FROM j JOIN q USING (qid) GROUP BY j.qid, q.question"""
    )
    return fn, sql


def q_range_slice_events() -> Entry:
    """P10 range slice over the events table (deterministic ts order)."""

    def fn(spark, sf_dir):
        from dpr_spark.plans.ids import assign_dense_ids

        e = assign_dense_ids(
            _events(spark, sf_dir).select("event_id", "event_type"), "event_id", "rn0"
        )
        return (
            e.withColumn("rn", (F.col("rn0") + 1).cast("int"))
            .filter((F.col("rn") > 50) & (F.col("rn") <= 150))
            .select("event_id", "event_type", "rn")
        )

    sql = """
      SELECT event_id, event_type, rn
      FROM (SELECT event_id, event_type,
                   row_number() OVER (ORDER BY event_id) AS rn FROM events)
      WHERE rn > 50 AND rn <= 150"""
    return fn, sql


def q_latest_events() -> Entry:
    """Re-crawl upsert primitive (plans/latest.py latest_by_key) on the
    driver's events table: the newest event per user (max (ts, event_id)
    version tuple — exactly the newest-warc_ts-per-url build/compaction
    path, SURVEY.md §1 input_hint re-crawl semantics; reference parity:
    last-write-wins dict insert at `dpr/data/retriever_data.py:253-287`).
    Spark side is ONE max_by aggregation (map-side combined); the oracle
    states the same thing as a row_number window."""

    def fn(spark, sf_dir):
        from dpr_spark.plans.latest import latest_by_key

        ev = _events(spark, sf_dir).select(
            "user_id", "ts", "event_id", "event_type", F.round("value", 6).alias("value")
        )
        out = latest_by_key(ev, "user_id", ["ts", "event_id"])
        return out.select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
        )

    sql = """
      SELECT user_id, event_id AS latest_event_id,
             event_type AS latest_type, round(value, 6) AS latest_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1"""
    return fn, sql


def q_cap_per_source() -> Entry:
    """Per-domain document cap (extras/domains.py cap_per_key) on the
    driver's documents table: keep the 5 largest docs per source —
    C4/RefinedWeb-style host rationing for a 100 TB crawl. The Spark side
    runs the TWO-LEVEL salted form (exact top-N of per-salt top-Ns, so a
    mega-domain never funnels through one task); the oracle states the
    same thing as a plain row_number window — identical rows because
    (n_chars desc, doc_id asc) is a total order."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.domains import cap_per_key

        d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
        out = cap_per_key(
            d,
            ["source"],
            [F.col("n_chars").desc(), F.col("doc_id").asc()],
            5,
            salt_buckets=8,
        )
        return out.select("source", "doc_id", "n_chars")

    sql = """
      SELECT source, doc_id, n_chars
      FROM (SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM documents)
      WHERE rn <= 5"""
    return fn, sql


# ---------------------------------------------------------------------------
# Lucene-parity query surface: phrase / boolean / prefix (round 4)
# ---------------------------------------------------------------------------

# verbatim corpus bigrams (the BENCH_ANSWERS spans) + one OOV phrase
PHRASE_QUERIES = [
    (0, "spark window"),
    (1, "customer join"),
    (2, "fast scan"),
    (3, "sort key"),
    (4, "window data"),
    (5, "value column"),
    (6, "spark zzznope"),  # OOV term -> no rows for qid 6
]

# (qid, must, should, must_not)
BOOL_QUERIES = [
    (0, ["spark"], ["window"], []),
    (1, ["customer", "join"], [], []),
    (2, [], ["fast", "scan"], ["join"]),
    (3, ["table"], [], ["spark"]),
    (4, ["spark", "zzznope"], ["window"], []),  # OOV must -> empty
    (5, ["key"], ["sort", "key"], ["batch"]),   # dup term across clauses
]

PREFIX_QUERIES = [(0, "sp"), (1, "jo"), (2, "wi"), (3, "ta"), (4, "zz")]
PREFIX_EXPANSIONS = 4


def _phrase_values_sql() -> str:
    from dpr_spark.functions.normalize import normalize_question

    rows = []
    for qid, p in PHRASE_QUERIES:
        for off, t in enumerate(tokenize(normalize_question(p))):
            rows.append(f"({qid}, {off}, '{t}')")
    return ", ".join(rows)


def _bool_values_sql() -> str:
    from dpr_spark.query.boolquery import _clause_rows

    return ", ".join(
        f"({qid}, '{t}', '{c}')" for qid, t, c in _clause_rows(BOOL_QUERIES)
    )


_BM25_COMPONENT = (
    f"ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)"
    f" * tf.tf * {BM25_K1 + 1.0}"
    f" / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))"
)

_POS_CTES = f"""
tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
pos AS (SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS p FROM tok),
tf AS (SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
"""


def q_phrase_topk() -> Entry:
    """Exact-phrase top-10 (Lucene PhraseQuery twin, query/phrase.py):
    tf = adjacent-occurrence count, idf = per-position idf sum; the
    DuckDB twin verifies adjacency by grouping start positions
    (p - off) and requiring every offset to hit."""

    def fn(spark, sf_dir):
        from dpr_spark.query.phrase import phrase_search_docs

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        res = phrase_search_docs(spark, docs, PHRASE_QUERIES, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {_phrase_values_sql()}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(*) AS n_off FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    cand AS (
      SELECT q.qid, pos.doc_id, pos.p - q.off AS start, count(*) AS n_hit
      FROM q JOIN pos USING (term) GROUP BY 1, 2, 3),
    pf AS (
      SELECT cand.qid, cand.doc_id, count(*) AS pf
      FROM cand JOIN qn USING (qid) WHERE cand.n_hit = qn.n_off GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_phrase_topk_shingled() -> Entry:
    """Exact-phrase top-10 via the 2-shingle positional index
    (query/shingled.py; ES index_phrases / Lucene CommonGrams shape):
    candidate generation and adjacency verification run on bigram
    postings (pairwise-adjacency pre-verified, far rarer than the
    unigrams), scoring reuses the base index's unigram idf sums and
    norms — bit-identical to phrase_topk, so the twin IS phrase_topk's
    SQL."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.shingled import (
            build_shingle_index,
            phrase_search_shingled,
        )

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=False
        )
        sidx = build_shingle_index(spark, docs)
        res = phrase_search_shingled(
            spark, idx, sidx, PHRASE_QUERIES, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    return fn, q_phrase_topk()[1]


RESCORE_WINDOW, RESCORE_WEIGHT, RESCORE_K = 10, 0.5, 20


def q_rescore_topk() -> Entry:
    """Two-stage retrieval (query/rescore.py; Lucene QueryRescorer / ES
    rescore): BM25 first pass (k=20) over the phrase queries' bags of
    words, then the top-10 window per query re-ranked by
    first + 0.5·exact-phrase score — docs where the words are adjacent
    in order rise; ranks 11..20 keep first-pass order and scores below
    the rescored block. The twin composes the BM25 CTEs with the
    phrase-adjacency CTEs and the same window/tail contract."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions
        from dpr_spark.query.rescore import rescore_phrase
        from dpr_spark.query.wand import build_impact_segments, search_segments

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        seg = build_impact_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(PHRASE_QUERIES, "qid int, question string")
        first = search_segments(spark, qdf, idx, seg, k=RESCORE_K)
        res = rescore_phrase(
            spark, qdf, idx, pos, first,
            window=RESCORE_WINDOW, weight=RESCORE_WEIGHT,
        )
        win = res.filter("rescored").select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        win = win.withColumn("rank", F.row_number().over(w)).withColumn(
            "rescored", F.lit(True)
        )
        tail = res.filter(~F.col("rescored")).select(
            "qid", "rank", "doc_id",
            F.round("score", 6).alias("score_r"), "rescored",
        )
        return win.select("qid", "rank", "doc_id", "score_r", "rescored").unionByName(
            tail
        )

    qt_rows = []
    for qid, p in PHRASE_QUERIES:
        for t in sorted(set(tokenize(p))):
            qt_rows.append(f"({qid}, '{t}')")
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {_phrase_values_sql()}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(*) AS n_off FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    pcand AS (
      SELECT q.qid, pos.doc_id, pos.p - q.off AS start, count(*) AS n_hit
      FROM q JOIN pos USING (term) GROUP BY 1, 2, 3),
    pf AS (
      SELECT pcand.qid, pcand.doc_id, count(*) AS pf
      FROM pcand JOIN qn USING (qid) WHERE pcand.n_hit = qn.n_off GROUP BY 1, 2),
    phsc AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    qt AS (SELECT * FROM (VALUES {", ".join(qt_rows)}) AS q(qid, term)),
    bm AS (
      SELECT qt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked1 AS (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM bm),
    comb AS (
      SELECT r.qid, r.doc_id,
             r.score + {RESCORE_WEIGHT} * coalesce(p.score, 0.0) AS score
      FROM ranked1 r LEFT JOIN phsc p ON p.qid = r.qid AND p.doc_id = r.doc_id
      WHERE r.rank <= {RESCORE_WINDOW}),
    win2 AS (
      SELECT qid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank,
             doc_id, round(score, 6) AS score_r, TRUE AS rescored
      FROM comb)
    SELECT qid, rank, doc_id, score_r, rescored FROM win2
    UNION ALL
    SELECT qid, rank, doc_id, round(score, 6) AS score_r, FALSE AS rescored
    FROM ranked1 WHERE rank > {RESCORE_WINDOW} AND rank <= {RESCORE_K}"""
    return fn, sql


SPAN_ORDERED_SLOP = 2
# ordered-with-gaps fixtures: in-order token pairs/triples that are NOT
# (always) adjacent in the corpus phrases, so slop>0 genuinely adds
# matches over exact phrase; plus an OOV case
SPAN_ORDERED_QUERIES = [
    (0, "spark agg"),
    (1, "customer order"),
    (2, "fast filter"),
    (3, "stream window data"),
    (4, "the table"),
    (5, "spark zzznope"),  # OOV term -> no rows
]


def q_span_ordered_topk() -> Entry:
    """Ordered span-with-slop top-10 (PhraseQuery(slop) /
    SpanNearQuery(inOrder=true) twin, query/phrase.py::
    span_ordered_search_index, r4 Missing #4): tokens in order within
    width n_tokens + slop; pf = start positions whose GREEDY chain
    (min next position > previous) fits the width. The DuckDB twin
    reproduces the greedy fold as per-offset min-aggregation CTEs —
    greedy minimizes the chain end, so existence within the width bound
    is exactly the greedy chain's qualification."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import span_ordered_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = span_ordered_search_index(
            spark, idx, idx.positions, SPAN_ORDERED_QUERIES,
            slop=SPAN_ORDERED_SLOP, k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.functions.normalize import normalize_question

    vals, max_n = [], 0
    for qid, p in SPAN_ORDERED_QUERIES:
        toks = tokenize(normalize_question(p))
        max_n = max(max_n, len(toks))
        for off, t in enumerate(toks):
            vals.append(f"({qid}, {off}, '{t}')")
    chain_ctes, done_parts = [], [
        "SELECT c0.qid, c0.doc_id, c0.p0, c0.cur FROM c0"
        " JOIN qn ON qn.qid = c0.qid AND qn.n_off = 1"
    ]
    for i in range(1, max_n):
        chain_ctes.append(
            f"""c{i} AS (
      SELECT c.qid, c.doc_id, c.p0, min(h.p) AS cur
      FROM c{i - 1} c JOIN h ON h.qid = c.qid AND h.off = {i}
           AND h.doc_id = c.doc_id AND h.p > c.cur
      GROUP BY 1, 2, 3)"""
        )
        done_parts.append(
            f"SELECT c{i}.qid, c{i}.doc_id, c{i}.p0, c{i}.cur FROM c{i}"
            f" JOIN qn ON qn.qid = c{i}.qid AND qn.n_off = {i + 1}"
        )
    vals_sql = ", ".join(vals)
    chains_sql = ",\n    ".join(chain_ctes)
    done_sql = " UNION ALL ".join(done_parts)
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {vals_sql}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(*) AS n_off FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    h AS (SELECT q.qid, q.off, pos.doc_id, pos.p FROM q JOIN pos USING (term)),
    c0 AS (SELECT qid, doc_id, p AS p0, p AS cur FROM h WHERE off = 0),
    {chains_sql},
    done AS ({done_sql}),
    pf AS (
      SELECT d.qid, d.doc_id, count(*) AS pf
      FROM done d JOIN qn USING (qid)
      WHERE d.cur - d.p0 + 1 <= qn.n_off + {SPAN_ORDERED_SLOP}
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SPAN_GAP_SLOP = 1
SPAN_GAP_QUERIES = [
    (0, [("spark", 0), ("window", 1)]),       # spark _ window
    (1, [("customer", 0), ("join", 0)]),      # plain ordered pair
    (2, [("fast", 0), ("scan", 2)]),          # two-token gap
    (3, [("stream", 0), ("window", 1), ("data", 0)]),
    (4, [("spark", 0), ("zzznope", 3)]),      # OOV term -> no rows
]


def q_span_gap_topk() -> Entry:
    """Gapped ordered span top-10 (Lucene SpanNearQuery.Builder
    addGap(width) / SpanGapQuery twin, query/phrase.py::
    span_gap_search_index): a gap of g between tokens inflates the
    query offset by g and the matched positions must leave room for it
    (pos_next >= pos_prev + off_delta — NearSpansOrdered non-overlap);
    a start qualifies when Lucene's slack cur - start <= off_max +
    slop. The twin unrolls the greedy chain into per-step min-
    aggregation CTEs carrying the inflated offsets."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import span_gap_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = span_gap_search_index(
            spark, idx, idx.positions, SPAN_GAP_QUERIES,
            slop=SPAN_GAP_SLOP, k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    vals, max_n = [], 0
    for qid, seq in SPAN_GAP_QUERIES:
        max_n = max(max_n, len(seq))
        off = 0
        for i, (t, gap) in enumerate(seq):
            if i > 0:
                off += 1 + gap
            vals.append(f"({qid}, {i}, {off}, '{t}')")
    chain_ctes, done_parts = [], [
        "SELECT c0.qid, c0.doc_id, c0.p0, c0.cur FROM c0"
        " JOIN qn ON qn.qid = c0.qid AND qn.n_off = 1"
    ]
    for i in range(1, max_n):
        chain_ctes.append(
            f"""c{i} AS (
      SELECT c.qid, c.doc_id, c.p0, min(h.p) AS cur, h.off AS off
      FROM c{i - 1} c JOIN h ON h.qid = c.qid AND h.idx = {i}
           AND h.doc_id = c.doc_id AND h.p >= c.cur + (h.off - c.off)
      GROUP BY 1, 2, 3, 5)"""
        )
        done_parts.append(
            f"SELECT c{i}.qid, c{i}.doc_id, c{i}.p0, c{i}.cur FROM c{i}"
            f" JOIN qn ON qn.qid = c{i}.qid AND qn.n_off = {i + 1}"
        )
    vals_sql = ", ".join(vals)
    chains_sql = ",\n    ".join(chain_ctes)
    done_sql = " UNION ALL ".join(done_parts)
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {vals_sql}) AS q(qid, idx, off, term)),
    qn AS (SELECT qid, count(*) AS n_off, max(off) AS span_1 FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    h AS (SELECT q.qid, q.idx, q.off, pos.doc_id, pos.p
          FROM q JOIN pos USING (term)),
    c0 AS (SELECT qid, doc_id, p AS p0, p AS cur, off FROM h WHERE idx = 0),
    {chains_sql},
    done AS ({done_sql}),
    pf AS (
      SELECT d.qid, d.doc_id, count(*) AS pf
      FROM done d JOIN qn USING (qid)
      WHERE d.cur - d.p0 <= qn.span_1 + {SPAN_GAP_SLOP}
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_bool_topk() -> Entry:
    """Boolean must/should/must_not top-10 (BooleanQuery twin,
    query/boolquery.py): doc qualifies iff every must term present and
    no must_not term; BM25 sum over matched must+should terms."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import bool_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = bool_search(spark, BOOL_QUERIES, idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {_bool_values_sql()}) AS q(qid, term, clause)),
    nmust AS (SELECT qid, count(*) AS n_must FROM q WHERE clause = 'must' GROUP BY 1),
    scored AS (
      SELECT q.qid, tf.doc_id,
             sum({_BM25_COMPONENT}) AS score,
             sum(CASE WHEN q.clause = 'must' THEN 1 ELSE 0 END) AS must_hits
      FROM q JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      WHERE q.clause <> 'must_not'
      GROUP BY 1, 2),
    filt AS (
      SELECT s.* FROM scored s LEFT JOIN nmust USING (qid)
      WHERE s.must_hits = coalesce(nmust.n_must, 0)),
    surv AS (
      SELECT f.* FROM filt f
      WHERE NOT EXISTS (
        SELECT 1 FROM q JOIN tf USING (term)
        WHERE q.clause = 'must_not' AND q.qid = f.qid AND tf.doc_id = f.doc_id)),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM surv)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SYNONYMS = {"join": ["merge"], "scan": ["filter"], "fast": ["quick"]}


def q_synonym_topk() -> Entry:
    """Query-time synonym expansion (query/synonyms.py; Lucene
    SynonymQuery): each query token + its synonyms score as ONE group —
    tf = sum over members in the doc, df = MAX over resolved members
    (blended statistics) — so a rare spelling neither inflates idf nor
    double-counts a doc containing both forms."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.synonyms import synonym_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        syn = spark.createDataFrame(
            [(t, s) for t, syns in SYNONYMS.items() for s in syns],
            "term string, syn string",
        )
        res = synonym_search(spark, qdf, idx, syn, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    rows = []
    for qid, q in BENCH_QUERIES:
        for t in sorted(set(tokenize(q))):
            rows.append(f"({qid}, '{t}', '{t}')")
            for s in SYNONYMS.get(t, []):
                rows.append(f"({qid}, '{t}', '{s}')")
    group_values = ", ".join(rows)
    sql = f"""
    WITH {_POS_CTES},
    g AS (SELECT * FROM (VALUES {group_values}) AS g(qid, grp, term)),
    r AS (SELECT g.qid, g.grp, g.term, dict.df FROM g JOIN dict USING (term)),
    gs AS (SELECT qid, grp, max(df) AS df_g FROM r GROUP BY 1, 2),
    gtf AS (SELECT r.qid, r.grp, tf.doc_id, sum(tf.tf) AS tf_g
            FROM r JOIN tf USING (term) GROUP BY 1, 2, 3),
    comp AS (
      SELECT gtf.qid, gtf.doc_id,
             ln((stats.n - gs.df_g + 0.5) / (gs.df_g + 0.5) + 1.0)
               * gtf.tf_g * {BM25_K1 + 1.0}
               / (gtf.tf_g + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl)) AS c
      FROM gtf JOIN gs ON gs.qid = gtf.qid AND gs.grp = gtf.grp
           JOIN ds ON ds.doc_id = gtf.doc_id CROSS JOIN stats),
    scored AS (SELECT qid, doc_id, sum(c) AS score FROM comp GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


MSM_QUERIES = [
    (0, [], ["fast", "scan", "filter"], []),
    (1, [], ["window", "data", "stream"], []),
    (2, ["table"], ["big", "sort"], []),
]
MSM_RANGES = [(0, 10000, 60000), (1, 20000, 90000)]  # qid 2 unconstrained
_MSM = 2


def q_bool_msm_range() -> Entry:
    """minimum_should_match + FILTER-context range clause (boolquery.py;
    Lucene BooleanQuery.setMinimumNumberShouldMatch + PointRangeQuery in
    filter context): a doc must match >= 2 SHOULD terms AND fall inside
    the query's [lo, hi] doc-values range (warc_ts synthesized from
    doc_id as in sort_by_field_topk); the range constrains matches but
    never contributes to the score."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import bool_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        dv = docs.select(
            "doc_id",
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100003)).alias("warc_ts"),
        )
        res = bool_search(
            spark, MSM_QUERIES, idx, k=10, minimum_should_match=_MSM,
            doc_values=dv, ranges=MSM_RANGES, range_field="warc_ts",
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    qrows = []
    for qid, must, should, must_not in MSM_QUERIES:
        m = sorted({t for x in must for t in tokenize(x)})
        qrows += [f"({qid}, '{t}', 'must')" for t in m]
        qrows += [
            f"({qid}, '{t}', 'should')"
            for t in sorted({t for x in should for t in tokenize(x)})
            if t not in m
        ]
    range_values = ", ".join(f"({q}, {lo}, {hi})" for q, lo, hi in MSM_RANGES)
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {", ".join(qrows)}) AS q(qid, term, clause)),
    nmust AS (SELECT qid, count(*) AS n_must FROM q WHERE clause = 'must' GROUP BY 1),
    rng AS (SELECT * FROM (VALUES {range_values}) AS r(qid, lo, hi)),
    dv AS (SELECT doc_id, (doc_id * 2654435761) % 100003 AS warc_ts FROM documents),
    scored AS (
      SELECT q.qid, tf.doc_id,
             sum({_BM25_COMPONENT}) AS score,
             sum(CASE WHEN q.clause = 'must' THEN 1 ELSE 0 END) AS must_hits,
             sum(CASE WHEN q.clause = 'should' THEN 1 ELSE 0 END) AS should_hits
      FROM q JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    filt AS (
      SELECT s.* FROM scored s LEFT JOIN nmust USING (qid)
      WHERE s.must_hits = coalesce(nmust.n_must, 0)
        AND s.should_hits >= {_MSM}),
    surv AS (
      SELECT f.qid, f.doc_id, f.score
      FROM filt f JOIN dv ON dv.doc_id = f.doc_id
           LEFT JOIN rng ON rng.qid = f.qid
      WHERE rng.lo IS NULL OR (dv.warc_ts >= rng.lo AND dv.warc_ts <= rng.hi)),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM surv)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_prefix_topk() -> Entry:
    """Prefix top-10 (PrefixQuery twin, query/boolquery.py): expand to
    the {PREFIX_EXPANSIONS} highest-df matching terms (ties term ASC),
    score the expansion as a disjunction."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import prefix_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = prefix_search(
            spark, PREFIX_QUERIES, idx, k=10, max_expansions=PREFIX_EXPANSIONS
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    prefix_values = ", ".join(f"({qid}, '{p}')" for qid, p in PREFIX_QUERIES)
    sql = f"""
    WITH {_POS_CTES},
    p AS (SELECT * FROM (VALUES {prefix_values}) AS p(qid, prefix)),
    exp AS (
      SELECT p.qid, d.term,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY d.df DESC, d.term) AS r
      FROM p JOIN dict d ON d.term LIKE p.prefix || '%'),
    qt AS (SELECT qid, term FROM exp WHERE r <= {PREFIX_EXPANSIONS}),
    scored AS (
      SELECT qt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


# (qid, lo, hi, inc_lo, inc_hi) — lexicographic term-range clauses:
# bounded, exclusive-hi, open-hi, open-lo, and empty-range cases
TERM_RANGE_QUERIES = [
    (0, "q", "sz", True, True),
    (1, "a", "c", True, False),
    (2, "t", None, True, True),
    (3, None, "b", True, False),
    (4, "x", "z", True, True),
]
TERM_RANGE_EXPANSIONS = 4


def q_term_range_topk() -> Entry:
    """Term-range top-10 (Lucene TermRangeQuery twin,
    query/boolquery.py::term_range_search): each clause's lexicographic
    [lo, hi] interval (NULL = open side, inc_* inclusivity) expands to
    the {TERM_RANGE_EXPANSIONS} highest-df in-range dictionary terms
    (ties term ASC) and scores as a disjunction — the rewrite contract
    shared with prefix/wildcard/regexp. Binary UTF-8 string order in
    both engines."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import term_range_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = term_range_search(
            spark, TERM_RANGE_QUERIES, idx, k=10,
            max_expansions=TERM_RANGE_EXPANSIONS,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    def lit(v):
        return "NULL::VARCHAR" if v is None else f"'{v}'"

    range_values = ", ".join(
        f"({qid}, {lit(lo)}, {lit(hi)}, {str(il).upper()}, {str(ih).upper()})"
        for qid, lo, hi, il, ih in TERM_RANGE_QUERIES
    )
    sql = f"""
    WITH {_POS_CTES},
    r AS (SELECT * FROM (VALUES {range_values})
          AS r(qid, lo, hi, inc_lo, inc_hi)),
    exp AS (
      SELECT r.qid, d.term,
             row_number() OVER (PARTITION BY r.qid
                                ORDER BY d.df DESC, d.term) AS rr
      FROM r JOIN dict d
        ON (r.lo IS NULL OR
            CASE WHEN r.inc_lo THEN d.term >= r.lo ELSE d.term > r.lo END)
       AND (r.hi IS NULL OR
            CASE WHEN r.inc_hi THEN d.term <= r.hi ELSE d.term < r.hi END)),
    qt AS (SELECT qid, term FROM exp WHERE rr <= {TERM_RANGE_EXPANSIONS}),
    scored AS (
      SELECT qt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


# (qid, query) — misspellings of corpus vocabulary + one exact + one far
FUZZY_QUERIES = [
    (0, "spark"),        # exact term (dist-0 expansion, boost 1.0)
    (1, "spork"),        # 1 sub from 'spark' (and whatever else is near)
    (2, "joon"),         # 1 sub from 'join'
    (3, "tble"),         # 1 del from 'table'
    (4, "winow data"),   # multi-clause: 1-edit + exact
    (5, "qzqzqz"),       # far from all vocabulary -> no rows
]
FUZZY_MAX_EDITS = 1
FUZZY_MAX_EXP = 8


def q_fuzzy_topk() -> Entry:
    """Fuzzy top-10 (Lucene FuzzyQuery twin, query/fuzzy.py): per-clause
    dictionary expansion within Levenshtein max_edits (rank dist ASC,
    df DESC, term ASC; cap max_expansions), BM25 scaled by
    1 - dist/max(len(clause), len(term))."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.fuzzy import fuzzy_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = fuzzy_search(
            spark, FUZZY_QUERIES, idx, k=10,
            max_edits=FUZZY_MAX_EDITS, max_expansions=FUZZY_MAX_EXP,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.fuzzy import _clauses

    clause_values = ", ".join(
        f"({qid}, '{c}')" for qid, c in _clauses(FUZZY_QUERIES)
    )
    sql = f"""
    WITH {_POS_CTES},
    c AS (SELECT * FROM (VALUES {clause_values}) AS c(qid, clause)),
    exp AS (
      SELECT c.qid, c.clause, d.term, levenshtein(d.term, c.clause) AS dist,
             row_number() OVER (
               PARTITION BY c.qid, c.clause
               ORDER BY levenshtein(d.term, c.clause), d.df DESC, d.term) AS r
      FROM c JOIN dict d ON levenshtein(d.term, c.clause) <= {FUZZY_MAX_EDITS}),
    qt AS (
      SELECT qid, clause, term,
             1.0 - dist::DOUBLE / greatest(length(clause), length(term)) AS boost
      FROM exp WHERE r <= {FUZZY_MAX_EXP}),
    scored AS (
      SELECT qt.qid, tf.doc_id, sum(qt.boost * {_BM25_COMPONENT}) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


FUZZY_T_QUERIES = [
    (0, "spark"),        # exact (dist-0, boost 1.0 — unchanged by the variant)
    (1, "sprak"),        # a/r swap: DL=1 from 'spark', plain Levenshtein 2
    (2, "jion"),         # i/o swap: DL=1 from 'join'
    (3, "tabel"),        # l/e swap: DL=1 from 'table'
    (4, "winodw scan"),  # multi-clause: swap + exact
    (5, "qzqzqz"),       # far from all vocabulary -> no rows
]


def q_fuzzy_transpose_topk() -> Entry:
    """Transposition-aware fuzzy top-10 (query/fuzzy.py,
    transpositions=True — Lucene FuzzyQuery's DEFAULT: an adjacent swap
    is ONE edit). Distance is unrestricted Damerau–Levenshtein, the
    exact semantics of DuckDB's damerau_levenshtein (verified
    DL('CA','ABC')=2), so the twin is the fuzzy twin with one function
    swapped. Each query here holds a swap typo that plain max_edits=1
    Levenshtein CANNOT reach (lev=2) — the entry fails against the
    non-transposing engine by construction."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.fuzzy import fuzzy_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = fuzzy_search(
            spark, FUZZY_T_QUERIES, idx, k=10,
            max_edits=FUZZY_MAX_EDITS, max_expansions=FUZZY_MAX_EXP,
            transpositions=True,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.fuzzy import _clauses

    clause_values = ", ".join(
        f"({qid}, '{c}')" for qid, c in _clauses(FUZZY_T_QUERIES)
    )
    sql = f"""
    WITH {_POS_CTES},
    c AS (SELECT * FROM (VALUES {clause_values}) AS c(qid, clause)),
    exp AS (
      SELECT c.qid, c.clause, d.term,
             damerau_levenshtein(d.term, c.clause) AS dist,
             row_number() OVER (
               PARTITION BY c.qid, c.clause
               ORDER BY damerau_levenshtein(d.term, c.clause), d.df DESC,
                        d.term) AS r
      FROM c JOIN dict d
        ON damerau_levenshtein(d.term, c.clause) <= {FUZZY_MAX_EDITS}),
    qt AS (
      SELECT qid, clause, term,
             1.0 - dist::DOUBLE / greatest(length(clause), length(term)) AS boost
      FROM exp WHERE r <= {FUZZY_MAX_EXP}),
    scored AS (
      SELECT qt.qid, tf.doc_id, sum(qt.boost * {_BM25_COMPONENT}) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


WILDCARD_QUERIES = [(0, "sp*k"), (1, "?oin"), (2, "w*"), (3, "*a*e*"), (4, "zz*")]
WILDCARD_EXP = 4


def q_wildcard_topk() -> Entry:
    """Wildcard top-10 (Lucene WildcardQuery twin,
    query/boolquery.py wildcard_search): `*`/`?` glob expands to the
    {WILDCARD_EXP} highest-df matching terms, scored as a disjunction."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import wildcard_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = wildcard_search(
            spark, WILDCARD_QUERIES, idx, k=10, max_expansions=WILDCARD_EXP
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.boolquery import wildcard_regex

    rx_values = ", ".join(
        f"({qid}, '{wildcard_regex(p)}')" for qid, p in WILDCARD_QUERIES
    )
    sql = f"""
    WITH {_POS_CTES},
    p AS (SELECT * FROM (VALUES {rx_values}) AS p(qid, rx)),
    exp AS (
      SELECT p.qid, d.term,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY d.df DESC, d.term) AS r
      FROM p JOIN dict d ON regexp_matches(d.term, p.rx)),
    qt2 AS (SELECT qid, term FROM exp WHERE r <= {WILDCARD_EXP}),
    scored AS (
      SELECT qt2.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qt2 JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_facet_counts() -> Entry:
    """Facet value histograms (lang, source) over the BM25 top-10
    (Lucene faceting twin, query/facets.py)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.facets import facet_counts

        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 10)
        docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
        return facet_counts(top, docs, ["lang", "source"])

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
    top10 AS (SELECT qid, doc_id FROM ranked WHERE rank <= 10),
    j AS (SELECT t.qid, d.lang, d.source
          FROM top10 t JOIN documents d USING (doc_id)),
    fv AS (
      SELECT qid, 'lang' AS facet, lang::VARCHAR AS value FROM j
      UNION ALL
      SELECT qid, 'source' AS facet, source::VARCHAR AS value FROM j)
    SELECT qid, facet, value, count(*) AS n
    FROM fv WHERE value IS NOT NULL GROUP BY 1, 2, 3"""
    )
    return fn, sql


def q_drill_sideways_facets() -> Entry:
    """Lucene DrillSideways over the BM25 top-20: drill-down
    selections lang='en' AND source='src2'; each dimension's counts
    computed with the OTHER selection applied and its own lifted, plus
    a ('_hits','*') row per qid with the fully-drilled hit count
    (query/facets.py drill_sideways — one pass, no per-dim re-query)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.facets import drill_sideways

        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 20)
        docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
        return drill_sideways(
            top, docs, {"lang": "en", "source": "src2"}
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
    top20 AS (SELECT qid, doc_id FROM ranked WHERE rank <= 20),
    j AS (SELECT t.qid, d.lang, d.source,
            (CASE WHEN d.lang IS NOT DISTINCT FROM 'en' THEN 0 ELSE 1 END
             + CASE WHEN d.source IS NOT DISTINCT FROM 'src2' THEN 0 ELSE 1 END)
              AS miss,
            (d.lang IS NOT DISTINCT FROM 'en') AS lang_ok,
            (d.source IS NOT DISTINCT FROM 'src2') AS src_ok
          FROM top20 t JOIN documents d USING (doc_id)),
    fv AS (
      SELECT qid, 'lang' AS facet, lang::VARCHAR AS value, miss,
             lang_ok AS own_ok FROM j
      UNION ALL
      SELECT qid, 'source', source::VARCHAR, miss, src_ok FROM j),
    side AS (
      SELECT qid, facet, value, count(*) AS n
      FROM fv
      WHERE (miss = 0 OR (miss = 1 AND NOT own_ok)) AND value IS NOT NULL
      GROUP BY 1, 2, 3),
    hits AS (
      SELECT q.qid, '_hits' AS facet, '*' AS value,
             coalesce(h.n, 0)::BIGINT AS n
      FROM (SELECT DISTINCT qid FROM top20) q
      LEFT JOIN (SELECT qid, count(*) AS n FROM j WHERE miss = 0
                 GROUP BY 1) h USING (qid))
    SELECT * FROM side UNION ALL SELECT * FROM hits"""
    )
    return fn, sql


SPAN_WINDOW = 6
SPAN_QUERIES = [
    (0, "spark window agg"),
    (1, "customer join"),
    (2, "fast filter"),
    (3, "hash sort key"),
    (4, "stream data"),
    (5, "spark zzznope"),  # OOV -> no rows
]


def q_span_near_topk() -> Entry:
    """Unordered proximity top-10 (Lucene SpanNearQuery twin,
    query/phrase.py span_near_search_index): all distinct query terms
    within a SPAN_WINDOW-token span; tf = qualifying end positions,
    idf = per-term sum."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions, span_near_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = span_near_search_index(
            spark, idx, pos, SPAN_QUERIES, window=SPAN_WINDOW, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.phrase import _near_terms

    term_values = ", ".join(
        f"({qid}, '{t}')" for qid, _off, t in _near_terms(SPAN_QUERIES)
    )
    W = SPAN_WINDOW
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {term_values}) AS q(qid, term)),
    qn AS (SELECT qid, count(*) AS n_terms FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_terms),
    hits AS (SELECT q.qid, pos.doc_id, q.term, pos.p
             FROM q JOIN pos USING (term)),
    ends AS (SELECT DISTINCT qid, doc_id, p FROM hits),
    covered AS (
      SELECT e.qid, e.doc_id, e.p, count(DISTINCT h.term) AS nt
      FROM ends e JOIN hits h ON h.qid = e.qid AND h.doc_id = e.doc_id
           AND h.p <= e.p AND h.p > e.p - {W}
      GROUP BY 1, 2, 3),
    pf AS (
      SELECT c.qid, c.doc_id, count(*) AS pf
      FROM covered c JOIN qn USING (qid) WHERE c.nt = qn.n_terms
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SPAN_FIRST_N = 30


def q_span_first_topk() -> Entry:
    """Lucene SpanFirstQuery top-10 (query/phrase.py
    span_first_search_index): the span-near contract with qualifying end
    positions restricted to the document's first SPAN_FIRST_N tokens
    (lead-paragraph matching). Engine positions are 0-based, DuckDB's
    generate_subscripts 1-based, so p < N becomes p <= N in the twin."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions, span_first_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = span_first_search_index(
            spark, idx, pos, SPAN_QUERIES, window=SPAN_WINDOW,
            first_n=SPAN_FIRST_N, k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.phrase import _near_terms

    term_values = ", ".join(
        f"({qid}, '{t}')" for qid, _off, t in _near_terms(SPAN_QUERIES)
    )
    W = SPAN_WINDOW
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {term_values}) AS q(qid, term)),
    qn AS (SELECT qid, count(*) AS n_terms FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_terms),
    hits AS (SELECT q.qid, pos.doc_id, q.term, pos.p
             FROM q JOIN pos USING (term)),
    ends AS (SELECT DISTINCT qid, doc_id, p FROM hits
             WHERE p <= {SPAN_FIRST_N}),
    covered AS (
      SELECT e.qid, e.doc_id, e.p, count(DISTINCT h.term) AS nt
      FROM ends e JOIN hits h ON h.qid = e.qid AND h.doc_id = e.doc_id
           AND h.p <= e.p AND h.p > e.p - {W}
      GROUP BY 1, 2, 3),
    pf AS (
      SELECT c.qid, c.doc_id, count(*) AS pf
      FROM covered c JOIN qn USING (qid) WHERE c.nt = qn.n_terms
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SPAN_OR_QUERIES = [
    (0, [["spark", "stream"], ["window"]]),
    (1, [["customer", "vector"], ["join", "group"]]),
    (2, [["fast", "slow"], ["scan"], ["filter"]]),
    (3, [["hash"], ["zzznope"]]),  # whole clause OOV -> no rows
]


def q_span_or_topk() -> Entry:
    """SpanOr-inside-SpanNear top-10 (query/phrase.py
    span_or_near_search_index): every clause (an OR over alternative
    terms) must appear within a SPAN_WINDOW-token span; clause positions
    are the union over alternatives, clause idf the max."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions, span_or_near_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = span_or_near_search_index(
            spark, idx, pos, SPAN_OR_QUERIES, window=SPAN_WINDOW, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    term_values = ", ".join(
        f"({qid}, {off}, '{t}')"
        for qid, clauses in SPAN_OR_QUERIES
        for off, alts in enumerate(clauses)
        for t in alts
    )
    W = SPAN_WINDOW
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {term_values}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(DISTINCT off) AS n_clauses FROM q GROUP BY 1),
    cidf AS (
      SELECT q.qid, q.off,
             max(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS cidf
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1, 2),
    idf AS (SELECT qid, sum(cidf) AS idf_sum, count(*) AS n_res
            FROM cidf GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_clauses),
    hits AS (SELECT DISTINCT q.qid, pos.doc_id, q.off, pos.p
             FROM q JOIN pos USING (term)),
    ends AS (SELECT DISTINCT qid, doc_id, p FROM hits),
    covered AS (
      SELECT e.qid, e.doc_id, e.p, count(DISTINCT h.off) AS nc
      FROM ends e JOIN hits h ON h.qid = e.qid AND h.doc_id = e.doc_id
           AND h.p <= e.p AND h.p > e.p - {W}
      GROUP BY 1, 2, 3),
    pf AS (
      SELECT c.qid, c.doc_id, count(*) AS pf
      FROM covered c JOIN qn USING (qid) WHERE c.nc = qn.n_clauses
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SPAN_NOT_QUERIES = [
    (0, "window", "agg"),
    (1, "join", "customer"),
    (2, "scan", "zzznope"),  # unresolvable exclude = plain term query
    (3, "zzznope", "scan"),  # unresolvable include -> no rows
]
SPAN_NOT_DIST = 3


def q_span_not_topk() -> Entry:
    """Lucene SpanNotQuery top-10 (query/phrase.py
    span_not_search_index): include-term occurrences survive only when
    no exclude occurrence is within SPAN_NOT_DIST tokens; tf = surviving
    occurrences, idf = the include term's."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions, span_not_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = span_not_search_index(
            spark, idx, pos, SPAN_NOT_QUERIES, dist=SPAN_NOT_DIST, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    qv = ", ".join(
        f"({qid}, '{inc}', '{exc}')" for qid, inc, exc in SPAN_NOT_QUERIES
    )
    D = SPAN_NOT_DIST
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {qv}) AS q(qid, inc, exc)),
    qi AS (SELECT q.qid, q.inc, q.exc,
                  ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0) AS idf_sum
           FROM q JOIN dict ON dict.term = q.inc CROSS JOIN stats),
    ip AS (SELECT qi.qid, pos.doc_id, pos.p FROM qi JOIN pos ON pos.term = qi.inc),
    ep AS (SELECT qi.qid, pos.doc_id, pos.p FROM qi JOIN pos ON pos.term = qi.exc),
    surv AS (
      SELECT i.qid, i.doc_id, count(*) AS pf
      FROM ip i
      WHERE NOT EXISTS (
        SELECT 1 FROM ep e
        WHERE e.qid = i.qid AND e.doc_id = i.doc_id
          AND abs(e.p - i.p) <= {D})
      GROUP BY 1, 2),
    scored AS (
      SELECT s.qid, s.doc_id,
             qi.idf_sum * s.pf * {BM25_K1 + 1.0}
             / (s.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM surv s JOIN qi USING (qid)
           JOIN ds ON s.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


MPP_MAX_EXP = 4
# search-as-you-type fixtures: prefix "s" has 6 dictionary candidates,
# so the MPP_MAX_EXP=4 term-order cap genuinely truncates; plus a
# single-token query, an OOV exact term, and a zero-expansion prefix
MPP_QUERIES = [
    (0, "the s"),      # cap: scan, slow, small, sort (spark/stream cut)
    (1, "hash j"),     # hash + join
    (2, "group c"),    # group + {column, customer}
    (3, "data st"),    # data + stream
    (4, "w"),          # single-token prefix -> window
    (5, "zzznope s"),  # OOV exact term -> no rows
    (6, "the zzz"),    # zero expansions -> no rows
]


def q_match_phrase_prefix() -> Entry:
    """ES match_phrase_prefix top-10 (query/phrase.py
    match_phrase_prefix_search_index): last token expands to the first
    MPP_MAX_EXP dictionary terms in term order; earlier tokens keep
    exact adjacency over merged last-offset positions; idf = exact sum
    + max over expansions."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import (
            build_positions,
            match_phrase_prefix_search_index,
        )

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = match_phrase_prefix_search_index(
            spark, idx, pos, MPP_QUERIES, max_expansions=MPP_MAX_EXP, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    erows, prows = [], []
    for qid, text in MPP_QUERIES:
        toks = tokenize(text)
        for off, t in enumerate(toks[:-1]):
            erows.append(f"({qid}, {off}, '{t}')")
        prows.append(f"({qid}, {len(toks) - 1}, '{toks[-1]}')")
    sql = f"""
    WITH {_POS_CTES},
    eq AS (SELECT * FROM (VALUES {", ".join(erows)}) AS eq(qid, off, term)),
    pq AS (SELECT * FROM (VALUES {", ".join(prows)}) AS pq(qid, off, prefix)),
    xq AS (SELECT qid, off, term FROM (
             SELECT pq.qid, pq.off, dict.term,
                    row_number() OVER (PARTITION BY pq.qid
                                       ORDER BY dict.term) AS r
             FROM pq JOIN dict ON starts_with(dict.term, pq.prefix))
           WHERE r <= {MPP_MAX_EXP}),
    qn AS (SELECT pq.qid, coalesce(en.n, 0) AS n_exact
           FROM pq LEFT JOIN (SELECT qid, count(*) AS n FROM eq
                              GROUP BY 1) en USING (qid)),
    eidf AS (
      SELECT eq.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS e_idf,
             count(*) AS n_res
      FROM eq JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    xidf AS (
      SELECT xq.qid,
             max(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS x_idf
      FROM xq JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (
      SELECT qn.qid, coalesce(e.e_idf, 0.0::DOUBLE) + x.x_idf AS idf_sum
      FROM qn LEFT JOIN eidf e USING (qid) JOIN xidf x USING (qid)
      WHERE coalesce(e.n_res, 0) = qn.n_exact),
    allq AS (SELECT qid, off, term FROM eq
             UNION ALL SELECT qid, off, term FROM xq),
    cand AS (
      SELECT allq.qid, pos.doc_id, pos.p - allq.off AS start,
             count(DISTINCT allq.off) AS n_hit
      FROM allq JOIN pos USING (term) GROUP BY 1, 2, 3),
    nf AS (SELECT qid, n_exact + 1 AS n_off FROM qn),
    pf AS (
      SELECT cand.qid, cand.doc_id, count(*) AS pf
      FROM cand JOIN nf USING (qid) WHERE cand.n_hit = nf.n_off GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


MBP_MAX_EXP = 4
# match_bool_prefix fixtures: clauses are OPTIONAL, so an OOV head or a
# dead prefix still returns rows via the other clauses (the cases that
# differentiate this from match_phrase_prefix's conjunctive contract)
MBP_QUERIES = [
    (0, "data s"),     # expansion cap truncates (6 s-terms, cap 4)
    (1, "hash j"),
    (2, "group c"),
    (3, "w"),          # bare prefix = plain prefix query
    (4, "zzznope s"),  # OOV head token -> still rows (should, not must)
    (5, "the zzz"),    # dead prefix -> still rows via 'the'
    (6, "zzza zzzb"),  # nothing resolves -> no rows
]


def q_match_bool_prefix() -> Entry:
    """ES match_bool_prefix top-10 (query/boolquery.py
    match_bool_prefix_search): distinct head tokens as optional term
    clauses + highest-df prefix expansion of the last token; BM25 sum
    over matched clauses, no adjacency."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import match_bool_prefix_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = match_bool_prefix_search(
            spark, MBP_QUERIES, idx, k=10, max_expansions=MBP_MAX_EXP
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    trows, prows = [], []
    for qid, text in MBP_QUERIES:
        toks = tokenize(text)
        for t in sorted(set(toks[:-1])):
            trows.append(f"({qid}, '{t}')")
        prows.append(f"({qid}, '{toks[-1]}')")
    sql = f"""
    WITH {_POS_CTES},
    tq AS (SELECT * FROM (VALUES {", ".join(trows)}) AS tq(qid, term)),
    p AS (SELECT * FROM (VALUES {", ".join(prows)}) AS p(qid, prefix)),
    exp AS (
      SELECT p.qid, d.term,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY d.df DESC, d.term) AS r
      FROM p JOIN dict d ON starts_with(d.term, p.prefix)),
    allt AS (SELECT qid, term FROM tq
             UNION ALL SELECT qid, term FROM exp WHERE r <= {MBP_MAX_EXP}),
    scored AS (
      SELECT allt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM allt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


RM3_FB_DOCS_E, RM3_FB_TERMS_E, RM3_ALPHA_E = 5, 8, 0.5


def q_rm3_topk() -> Entry:
    """BM25+RM3 top-10 (the Pyserini strong-baseline twin,
    query/rm3.py): rounded-rank BM25 top-5 feedback docs -> RM1 term
    weights (tf/dl * doc score, normalized, top-8, ties term ASC) ->
    alpha-interpolated weighted BM25 rescore."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.rm3 import rm3_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        base = (
            _bm25_ranked(spark, sf_dir)
            .filter(F.col("rank") <= RM3_FB_DOCS_E)
            .select("qid", "doc_id", F.col("score_r").alias("score"))
        )
        res = rm3_search(
            spark, qdf, idx, docs, k=10,
            fb_terms=RM3_FB_TERMS_E, alpha=RM3_ALPHA_E,
            lowercase_first=True, selection_round=6, first_pass=base,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    a = RM3_ALPHA_E
    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
    fb AS (SELECT qid, doc_id, score_r AS s FROM ranked
           WHERE rank <= {RM3_FB_DOCS_E}),
    w_raw AS (
      SELECT fb.qid, tf.term,
             sum(tf.tf::DOUBLE / ds.doclen * fb.s) AS w_raw
      FROM fb JOIN tf USING (doc_id) JOIN ds USING (doc_id)
      GROUP BY 1, 2),
    tot AS (SELECT qid, sum(w_raw) AS w_total FROM w_raw GROUP BY 1),
    w_norm AS (
      SELECT w_raw.qid, w_raw.term, w_raw.w_raw / tot.w_total AS w_norm,
             row_number() OVER (PARTITION BY w_raw.qid
                                ORDER BY round(w_raw.w_raw / tot.w_total, 6) DESC,
                                         w_raw.term) AS r
      FROM w_raw JOIN tot USING (qid)),
    expn AS (SELECT qid, term, ({1.0 - a}) * w_norm AS w FROM w_norm
             WHERE r <= {RM3_FB_TERMS_E}),
    nq AS (SELECT qid, count(*) AS n_terms FROM qt GROUP BY 1),
    orig AS (SELECT qt.qid, qt.term, {a} / nq.n_terms AS w
             FROM qt JOIN nq USING (qid)),
    fin AS (SELECT qid, term, sum(w) AS w
            FROM (SELECT * FROM orig UNION ALL SELECT * FROM expn)
            GROUP BY 1, 2),
    rescored AS (
      SELECT fin.qid, tf.doc_id,
             sum(fin.w * {_BM25_COMPONENT}) AS score
      FROM fin JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    reranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM rescored)
    SELECT qid, rank, doc_id, score_r FROM reranked WHERE rank <= 10"""
    )
    return fn, sql


MLT_SEEDS = [(0, 0), (1, 7), (2, 42)]  # (qid, seed doc_id)
MLT_MIN_TF, MLT_MIN_DF, MLT_MAX_TERMS_E = 2, 3, 10


def q_mlt_topk() -> Entry:
    """More-like-this top-10 (Lucene MoreLikeThis twin,
    query/morelikethis.py): seed terms with tf>=min_tf and df>=min_df
    ranked by rounded tf*idf (DESC, term ASC), top max_query_terms, run
    as a BM25 disjunction with the seed excluded."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.morelikethis import more_like_this

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        seeds = spark.createDataFrame(MLT_SEEDS, "qid int, doc_id long")
        res = more_like_this(
            spark, seeds, docs, idx, k=10,
            min_tf=MLT_MIN_TF, min_df=MLT_MIN_DF,
            max_query_terms=MLT_MAX_TERMS_E,
            lowercase_first=True, selection_round=6,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    seed_values = ", ".join(f"({q}, {d})" for q, d in MLT_SEEDS)
    sql = f"""
    WITH {_POS_CTES},
    seeds AS (SELECT * FROM (VALUES {seed_values}) AS s(qid, doc_id)),
    stf AS (
      SELECT s.qid, tf.term, tf.tf
      FROM seeds s JOIN tf ON tf.doc_id = s.doc_id
      WHERE tf.tf >= {MLT_MIN_TF}),
    cand AS (
      SELECT stf.qid, stf.term,
             row_number() OVER (
               PARTITION BY stf.qid
               ORDER BY round(stf.tf * ln((stats.n - d.df + 0.5)
                                          / (d.df + 0.5) + 1.0), 6) DESC,
                        stf.term) AS r
      FROM stf JOIN dict d USING (term) CROSS JOIN stats
      WHERE d.df >= {MLT_MIN_DF}),
    qmlt AS (SELECT qid, term FROM cand WHERE r <= {MLT_MAX_TERMS_E}),
    scored AS (
      SELECT qmlt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qmlt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    surv AS (
      SELECT sc.* FROM scored sc
      WHERE NOT EXISTS (SELECT 1 FROM seeds s
                        WHERE s.qid = sc.qid AND s.doc_id = sc.doc_id)),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM surv)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


MLT_UNLIKE = [(0, 1), (1, 3), (2, 5)]  # (qid, unlike doc_id)


def q_mlt_unlike_topk() -> Entry:
    """More-like-this with `unlike` docs (ES more_like_this `unlike` /
    Lucene MLT skip-terms, query/morelikethis.py): terms occurring in a
    query's unlike docs are removed from the candidate set BEFORE the
    tf*idf ranking/cap (the cap refills with next-best liked terms),
    and unlike docs join the seed in the result exclusion."""

    def fn(spark, sf_dir):
        from dpr_spark.query.morelikethis import more_like_this

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        from dpr_spark.index.build import build_index_from_docs

        idx = build_index_from_docs(spark, docs, build_blocks=False)
        seeds = spark.createDataFrame(MLT_SEEDS, "qid int, doc_id long")
        unlike = spark.createDataFrame(MLT_UNLIKE, "qid int, doc_id long")
        res = more_like_this(
            spark, seeds, docs, idx, k=10,
            min_tf=MLT_MIN_TF, min_df=MLT_MIN_DF,
            max_query_terms=MLT_MAX_TERMS_E,
            lowercase_first=True, selection_round=6, unlike=unlike,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    seed_values = ", ".join(f"({q}, {d})" for q, d in MLT_SEEDS)
    unlike_values = ", ".join(f"({q}, {d})" for q, d in MLT_UNLIKE)
    sql = f"""
    WITH {_POS_CTES},
    seeds AS (SELECT * FROM (VALUES {seed_values}) AS s(qid, doc_id)),
    unl AS (SELECT * FROM (VALUES {unlike_values}) AS u(qid, doc_id)),
    skip AS (SELECT DISTINCT u.qid, tf.term
             FROM unl u JOIN tf ON tf.doc_id = u.doc_id),
    stf AS (
      SELECT s.qid, tf.term, tf.tf
      FROM seeds s JOIN tf ON tf.doc_id = s.doc_id
      WHERE tf.tf >= {MLT_MIN_TF}),
    cand AS (
      SELECT stf.qid, stf.term,
             row_number() OVER (
               PARTITION BY stf.qid
               ORDER BY round(stf.tf * ln((stats.n - d.df + 0.5)
                                          / (d.df + 0.5) + 1.0), 6) DESC,
                        stf.term) AS r
      FROM stf JOIN dict d USING (term) CROSS JOIN stats
      WHERE d.df >= {MLT_MIN_DF}
        AND NOT EXISTS (SELECT 1 FROM skip k
                        WHERE k.qid = stf.qid AND k.term = stf.term)),
    qmlt AS (SELECT qid, term FROM cand WHERE r <= {MLT_MAX_TERMS_E}),
    scored AS (
      SELECT qmlt.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qmlt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    surv AS (
      SELECT sc.* FROM scored sc
      WHERE NOT EXISTS (SELECT 1 FROM seeds s
                        WHERE s.qid = sc.qid AND s.doc_id = sc.doc_id)
        AND NOT EXISTS (SELECT 1 FROM unl u
                        WHERE u.qid = sc.qid AND u.doc_id = sc.doc_id)),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM surv)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SPELL_QUERIES = [(0, "spqrk windaw"), (1, "custmer"), (2, "join scan")]
SPELL_N = 3


def q_spell_suggest() -> Entry:
    """Did-you-mean suggestions (Lucene DirectSpellChecker twin,
    query/fuzzy.py spell_suggest): per OOV token, the top-{SPELL_N}
    dictionary terms within 2 edits sharing the first letter, ranked
    (dist ASC, df DESC, term ASC). In-vocab tokens yield no rows."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.fuzzy import spell_suggest

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        return spell_suggest(spark, SPELL_QUERIES, idx, n_suggestions=SPELL_N)

    from dpr_spark.query.fuzzy import _clauses

    clause_values = ", ".join(
        f"({qid}, '{c}')" for qid, c in _clauses(SPELL_QUERIES)
    )
    sql = f"""
    WITH {_POS_CTES},
    c AS (SELECT * FROM (VALUES {clause_values}) AS c(qid, clause)),
    oov AS (
      SELECT c.qid, c.clause FROM c LEFT JOIN dict d ON d.term = c.clause
      WHERE coalesce(d.df, 0) <= 0),
    exp AS (
      SELECT oov.qid, oov.clause, d.term, d.df,
             row_number() OVER (
               PARTITION BY oov.qid, oov.clause
               ORDER BY levenshtein(d.term, oov.clause), d.df DESC, d.term) AS r
      FROM oov JOIN dict d
        ON levenshtein(d.term, oov.clause) <= 2
       AND substr(d.term, 1, 1) = substr(oov.clause, 1, 1))
    SELECT qid, clause, r::INT AS rank, term AS suggestion, df
    FROM exp WHERE r <= {SPELL_N}"""
    return fn, sql


def q_spell_suggest_popular() -> Entry:
    """ES term-suggester suggest_mode=popular (query/fuzzy.py
    spell_suggest): EVERY query token gets suggestions, but a
    suggestion must have df strictly greater than the token's own df
    (OOV tokens have df 0); the token itself never suggests. Same
    2-edit / shared-first-letter expansion, ranked (dist ASC, df DESC,
    term ASC), capped after the popularity bar so the top-{SPELL_N}
    refills."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.fuzzy import spell_suggest

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        return spell_suggest(
            spark, SPELL_QUERIES, idx, n_suggestions=SPELL_N,
            suggest_mode="popular",
        )

    from dpr_spark.query.fuzzy import _clauses

    clause_values = ", ".join(
        f"({qid}, '{c}')" for qid, c in _clauses(SPELL_QUERIES)
    )
    sql = f"""
    WITH {_POS_CTES},
    c AS (SELECT * FROM (VALUES {clause_values}) AS c(qid, clause)),
    cb AS (
      SELECT c.qid, c.clause, coalesce(d.df, 0) AS cdf
      FROM c LEFT JOIN dict d ON d.term = c.clause),
    exp AS (
      SELECT cb.qid, cb.clause, d.term, d.df,
             row_number() OVER (
               PARTITION BY cb.qid, cb.clause
               ORDER BY levenshtein(d.term, cb.clause), d.df DESC, d.term) AS r
      FROM cb JOIN dict d
        ON levenshtein(d.term, cb.clause) <= 2
       AND substr(d.term, 1, 1) = substr(cb.clause, 1, 1)
       AND d.term <> cb.clause
       AND d.df > cb.cdf)
    SELECT qid, clause, r::INT AS rank, term AS suggestion, df
    FROM exp WHERE r <= {SPELL_N}"""
    return fn, sql


HL_WINDOW = 20


def q_highlight_topk() -> Entry:
    """Best-fragment snippets for the BM25 top-3 (Lucene Highlighter
    twin, query/highlight.py): the HL_WINDOW-token window with the most
    query-term hits among windows starting at a hit, ties leftmost;
    fragment = space-joined token slice."""

    def fn(spark, sf_dir):
        from dpr_spark.query.highlight import highlight

        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 3)
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        frags = highlight(
            top, docs, _qterms_df(spark), window=HL_WINDOW, lowercase_first=True
        )
        return top.select("qid", "rank", "doc_id").join(
            frags, ["qid", "doc_id"]
        ).select("qid", "rank", "doc_id", "start_tok", "n_hits", "fragment")

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
    top3 AS (SELECT qid, rank, doc_id FROM ranked WHERE rank <= 3),
    pos AS (SELECT doc_id, unnest(toks) AS term,
                   generate_subscripts(toks, 1) AS p FROM tok),
    h AS (
      SELECT t.qid, t.rank, t.doc_id, pos.p
      FROM top3 t JOIN qt ON qt.qid = t.qid
           JOIN pos ON pos.doc_id = t.doc_id AND pos.term = qt.term),
    win AS (
      SELECT h1.qid, h1.rank, h1.doc_id, h1.p AS s, count(*) AS n_hits
      FROM h h1 JOIN h h2 ON h2.qid = h1.qid AND h2.doc_id = h1.doc_id
           AND h2.p >= h1.p AND h2.p < h1.p + {HL_WINDOW}
      GROUP BY 1, 2, 3, 4),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY qid, doc_id
                                   ORDER BY n_hits DESC, s) AS rn
      FROM win)
    SELECT b.qid, b.rank, b.doc_id, (b.s - 1)::INT AS start_tok,
           b.n_hits::INT AS n_hits,
           array_to_string(t.toks[b.s : b.s + {HL_WINDOW} - 1], ' ') AS fragment
    FROM best b JOIN tok t USING (doc_id) WHERE b.rn = 1"""
    )
    return fn, sql


HLM_WINDOW = 8
HLM_N = 3


def q_highlight_multi_topk() -> Entry:
    """Multi-fragment highlighting (Lucene getBestFragments / ES
    number_of_fragments; query/highlight.py highlight_multi): up to
    {HLM_N} non-overlapping {HLM_WINDOW}-token fragments per BM25
    top-3 hit, greedily selected (hits DESC, start ASC, discard
    overlaps). The Spark side is a Catalyst aggregate fold; the twin
    unrolls the same greedy walk into {HLM_N} ranked picks."""

    def fn(spark, sf_dir):
        from dpr_spark.query.highlight import highlight_multi

        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 3)
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        frags = highlight_multi(
            top, docs, _qterms_df(spark), window=HLM_WINDOW,
            n_fragments=HLM_N, lowercase_first=True,
        )
        return top.select("qid", "rank", "doc_id").join(
            frags, ["qid", "doc_id"]
        ).select(
            "qid", "rank", "doc_id", "frag_rank", "start_tok", "n_hits",
            "fragment",
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
    top3 AS (SELECT qid, rank, doc_id FROM ranked WHERE rank <= 3),
    pos AS (SELECT doc_id, unnest(toks) AS term,
                   generate_subscripts(toks, 1) AS p FROM tok),
    h AS (
      SELECT t.qid, t.rank, t.doc_id, pos.p
      FROM top3 t JOIN qt ON qt.qid = t.qid
           JOIN pos ON pos.doc_id = t.doc_id AND pos.term = qt.term),
    win AS (
      SELECT h1.qid, h1.rank, h1.doc_id, h1.p AS s, count(*) AS n_hits
      FROM h h1 JOIN h h2 ON h2.qid = h1.qid AND h2.doc_id = h1.doc_id
           AND h2.p >= h1.p AND h2.p < h1.p + {HLM_WINDOW}
      GROUP BY 1, 2, 3, 4),
    c1 AS (SELECT *, row_number() OVER (PARTITION BY qid, doc_id
                                        ORDER BY n_hits DESC, s) AS cr
           FROM win),
    f1 AS (SELECT qid, rank, doc_id, s, n_hits FROM c1 WHERE cr = 1),
    c2 AS (SELECT c1.qid, c1.rank, c1.doc_id, c1.s, c1.n_hits,
                  row_number() OVER (PARTITION BY c1.qid, c1.doc_id
                                     ORDER BY c1.n_hits DESC, c1.s) AS cr
           FROM c1 JOIN f1 ON f1.qid = c1.qid AND f1.doc_id = c1.doc_id
           WHERE abs(c1.s - f1.s) >= {HLM_WINDOW}),
    f2 AS (SELECT qid, rank, doc_id, s, n_hits FROM c2 WHERE cr = 1),
    c3 AS (SELECT c2.qid, c2.rank, c2.doc_id, c2.s, c2.n_hits,
                  row_number() OVER (PARTITION BY c2.qid, c2.doc_id
                                     ORDER BY c2.n_hits DESC, c2.s) AS cr
           FROM c2 JOIN f2 ON f2.qid = c2.qid AND f2.doc_id = c2.doc_id
           WHERE abs(c2.s - f2.s) >= {HLM_WINDOW}),
    f3 AS (SELECT qid, rank, doc_id, s, n_hits FROM c3 WHERE cr = 1),
    frags AS (
      SELECT qid, rank, doc_id, s, n_hits, 1 AS frag_rank FROM f1
      UNION ALL
      SELECT qid, rank, doc_id, s, n_hits, 2 AS frag_rank FROM f2
      UNION ALL
      SELECT qid, rank, doc_id, s, n_hits, 3 AS frag_rank FROM f3)
    SELECT fr.qid, fr.rank, fr.doc_id, fr.frag_rank::INT AS frag_rank,
           (fr.s - 1)::INT AS start_tok, fr.n_hits::INT AS n_hits,
           array_to_string(t.toks[fr.s : fr.s + {HLM_WINDOW} - 1], ' ')
             AS fragment
    FROM frags fr JOIN tok t USING (doc_id)"""
    )
    return fn, sql


def q_taxonomy_facets() -> Entry:
    """Hierarchical taxonomy facets (lucene/facet getTopChildren;
    query/facets.py taxonomy_facets): per query, the top immediate
    children UNDER a drill-down path, counted over the BM25 top-10 and
    ranked (n DESC, label ASC). Paths are synthesized 3 levels deep
    from doc_id so every engine sees the same taxonomy."""

    def fn(spark, sf_dir):
        from dpr_spark.query.facets import taxonomy_facets

        top = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 10)
        paths = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.lit("cat"), F.col("doc_id") % 2,
                F.lit("/sub"), F.col("doc_id") % 3,
                F.lit("/leaf"), F.col("doc_id") % 5,
            ).alias("path"),
        )
        return taxonomy_facets(top, paths, under="cat0", top_n=10)

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
    top AS (SELECT qid, doc_id FROM ranked WHERE rank <= 10),
    paths AS (SELECT doc_id,
                     'cat' || (doc_id % 2) || '/sub' || (doc_id % 3)
                     || '/leaf' || (doc_id % 5) AS path
              FROM documents),
    j AS (SELECT t.qid, string_split(p.path, '/') AS parts
          FROM top t JOIN paths p USING (doc_id)),
    f AS (SELECT qid, parts[1] || '/' || parts[2] AS child,
                 parts[2] AS label
          FROM j WHERE len(parts) >= 2 AND parts[1] = 'cat0'),
    c AS (SELECT qid, child, label, count(*) AS n FROM f GROUP BY 1, 2, 3),
    r AS (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY n DESC, label) AS rn
          FROM c)
    SELECT qid, rn::INT AS rank, child, label, n FROM r WHERE rn <= 10"""
    )
    return fn, sql


def q_robots_allowed() -> Entry:
    """robots.txt evaluation (RFC 9309; extras/robots.py): per-host
    rule groups (a catch-all '*' template on every host plus a
    'webbot'-specific allow-all group on the first host, which REPLACES
    '*' there), longest-raw-pattern match wins, allow wins equal-length
    ties, no match/group -> allowed. Both engines compile patterns to
    the same LIKE spelling, so the twin runs the identical decision
    procedure."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.robots import robots_allowed

        docs = _docs(spark, sf_dir)
        m = F.col("doc_id") % 5
        urls = docs.select(
            "doc_id",
            F.concat("source", F.lit(".example.com")).alias("host"),
            F.when(m == 0, F.lit("/"))
            .when(m == 1, F.concat(F.lit("/public/page"), F.col("doc_id")))
            .when(m == 2, F.concat(F.lit("/public/private/"), F.col("doc_id")))
            .when(m == 3, F.concat(F.lit("/files/doc"), F.col("doc_id"), F.lit(".pdf")))
            .otherwise(F.concat(F.lit("/ok/"), F.col("doc_id")))
            .alias("path"),
        )
        srcs = sorted(r["source"] for r in docs.select("source").distinct().collect())
        tmpl = [
            ("*", "disallow", "/"),
            ("*", "allow", "/public*"),
            ("*", "disallow", "/public/private*"),
            ("*", "disallow", "/*.pdf$"),
        ]
        rows = [
            (f"{s}.example.com", a, r, p) for s in srcs for a, r, p in tmpl
        ] + [(f"{srcs[0]}.example.com", "webbot", "allow", "/*")]
        rules = spark.createDataFrame(
            rows, "host string, agent string, rule string, path string"
        )
        return robots_allowed(urls, rules, "webbot").orderBy("doc_id")

    from dpr_spark.extras.robots import LIKE_PATTERN_SQL

    sql = f"""
    WITH srcs AS (SELECT DISTINCT source FROM documents),
    s0 AS (SELECT min(source) AS source FROM srcs),
    tmpl(agent, rule, path) AS (VALUES
      ('*', 'disallow', '/'), ('*', 'allow', '/public*'),
      ('*', 'disallow', '/public/private*'), ('*', 'disallow', '/*.pdf$')),
    rules AS (
      SELECT source || '.example.com' AS host, agent, rule, path
      FROM srcs CROSS JOIN tmpl
      UNION ALL
      SELECT source || '.example.com', 'webbot', 'allow', '/*' FROM s0),
    urls AS (
      SELECT doc_id, source || '.example.com' AS host,
             CASE doc_id % 5
               WHEN 0 THEN '/'
               WHEN 1 THEN '/public/page' || doc_id
               WHEN 2 THEN '/public/private/' || doc_id
               WHEN 3 THEN '/files/doc' || doc_id || '.pdf'
               ELSE '/ok/' || doc_id END AS path
      FROM documents),
    rl AS (
      SELECT host, lower(agent) AS agent, lower(rule) AS rule, path,
             {LIKE_PATTERN_SQL} AS pat, length(path) AS plen
      FROM rules WHERE lower(agent) IN ('webbot', '*')),
    spec AS (SELECT DISTINCT host FROM rl WHERE agent = 'webbot'),
    grp AS (
      SELECT rl.host, rl.rule, rl.path, rl.pat, rl.plen
      FROM rl LEFT JOIN spec ON spec.host = rl.host
      WHERE CASE WHEN spec.host IS NOT NULL THEN rl.agent = 'webbot'
                 ELSE rl.agent = '*' END),
    m AS (
      SELECT u.doc_id, u.host, u.path, g.rule, g.path AS rpath,
             row_number() OVER (
               PARTITION BY u.doc_id
               ORDER BY g.plen DESC, (g.rule = 'allow') DESC, g.path) AS rn
      FROM urls u LEFT JOIN grp g
        ON g.host = u.host AND u.path LIKE g.pat ESCAPE '\\')
    SELECT doc_id, host, path,
           coalesce(rule <> 'disallow', TRUE) AS allowed,
           rule AS matched_rule, rpath AS matched_path
    FROM m WHERE rn = 1 ORDER BY doc_id"""
    return fn, sql


def q_charset_sniff() -> Entry:
    """Charset sniffing + decode (WHATWG HTML encoding prescan;
    functions/textextract.py charset_report): html binary is
    constructed in-query per doc — a utf-8 <meta>, a Latin-1-labelled
    <meta> (the spec maps the whole Latin-1 family to windows-1252),
    and a BOM'd UTF-16LE page — sniffed and decoded by the Arrow UDF
    pair; the twin states the expected label/source/decoded string per
    case, cross-checking the real byte-level sniff."""

    def fn(spark, sf_dir):
        from dpr_spark.functions.textextract import charset_report

        d = _docs(spark, sf_dir)
        m = F.col("doc_id") % 3
        utf8_doc = F.concat(
            F.lit('<html><head><meta charset="utf-8"></head><body>'),
            F.col("text"), F.lit("</body></html>"),
        )
        lat1_doc = F.concat(
            F.lit('<html><head><meta charset="iso-8859-1"></head><body>'),
            F.col("text"), F.lit("</body></html>"),
        )
        u16_doc = F.concat(
            F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")
        )
        html = (
            F.when(m == 0, F.encode(utf8_doc, "UTF-8"))
            .when(m == 1, F.encode(lat1_doc, "UTF-8"))
            .otherwise(
                F.concat(
                    F.lit(bytes([0xFF, 0xFE])), F.encode(u16_doc, "UTF-16LE")
                )
            )
        )
        return charset_report(
            d.select("doc_id", html.alias("html"))
        ).orderBy("doc")

    sql = """
    SELECT doc_id AS doc,
           CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'cp1252'
                ELSE 'utf-16-le' END AS charset,
           CASE WHEN doc_id % 3 = 2 THEN 'bom' ELSE 'meta' END AS source,
           CASE doc_id % 3
             WHEN 0 THEN '<html><head><meta charset="utf-8"></head><body>'
                         || text || '</body></html>'
             WHEN 1 THEN '<html><head><meta charset="iso-8859-1"></head><body>'
                         || text || '</body></html>'
             ELSE '<html><body>' || text || '</body></html>'
           END AS text
    FROM documents ORDER BY doc"""
    return fn, sql


def q_domain_stats() -> Entry:
    """Per-domain crawl stats (extras/domains.py domain_of +
    per_domain_stats) over synthetic URLs derived from the documents
    table: `https://WWW.<source>:8443/page/<doc_id>` exercises host
    lowercasing, `www.` aliasing, and port stripping. domain_of uses only
    RE2-safe regexes, so the oracle applies the identical extraction
    chain in DuckDB — the first look any webtext pipeline takes at a
    crawl's host distribution."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.domains import per_domain_stats

        pages = _docs(spark, sf_dir).select(
            F.concat(
                F.lit("https://WWW."), F.col("source"), F.lit(":8443/page/"),
                F.col("doc_id"),
            ).alias("url"),
            "text",
        )
        return per_domain_stats(pages)

    sql = r"""
      SELECT regexp_replace(regexp_replace(regexp_replace(
               lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
               '^[^@]*@', ''), ':\d+$', ''), '^www\.', '') AS domain,
             count(*) AS n_pages,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             round(avg(length(text)), 4) AS avg_chars
      FROM (SELECT concat('https://WWW.', source, ':8443/page/', doc_id) AS url,
                   text
            FROM documents)
      GROUP BY 1"""
    return fn, sql


def q_best_spans() -> Entry:
    """K3 span selection (`reader_data.py:370-416` get_best_spans):
    deterministic integer logits derived from (doc_id, position), greedy
    containment-suppressed top-2 spans over the first 12 tokens of each
    doc. The DuckDB twin ranks spans by (score DESC, i, j) — exactly the
    reference's stable sort on generation order — and picks span 2 as the
    best candidate not in a containment relation with span 1."""
    L, MAXLEN, TOP = 12, 4, 2

    def fn(spark, sf_dir):
        from dpr_spark.eval.reader import best_spans

        tok = _tokenized(spark, sf_dir).filter(
            (F.col("doc_id") < 200) & (F.size("toks") >= L)
        )
        logits = lambda a, b, m: F.transform(
            F.sequence(F.lit(0), F.lit(L - 1)),
            lambda i: ((F.col("doc_id") * a + i * b) % m).cast("double"),
        )
        passages = tok.select(
            F.col("doc_id").alias("qid"),
            F.lit(0).alias("passage_idx"),
            F.lit(0.0).alias("relevance_score"),
            logits(31, 17, 97).alias("start_logits"),
            logits(13, 23, 89).alias("end_logits"),
            F.slice("toks", 1, L).alias("tokens"),
        )
        return best_spans(passages, max_answer_length=MAXLEN, top_spans=TOP).select(
            F.col("qid").alias("doc_id"),
            "span_rank",
            "start_idx",
            "end_idx",
            F.col("score").cast("long").alias("score"),
            "prediction",
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      d AS (SELECT doc_id, toks[1:{L}] AS toks FROM tok
            WHERE doc_id < 200 AND len(toks) >= {L}),
      spans AS (
        SELECT doc_id, i, j,
               ((doc_id * 31 + i * 17) % 97) + ((doc_id * 13 + j * 23) % 89) AS score
        FROM d, range(0, {L}) r1(i), range(0, {L}) r2(j)
        WHERE j >= i AND j < i + {MAXLEN}),
      rk AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, i, j) AS r FROM spans s),
      b1 AS (SELECT doc_id, i AS i1, j AS j1, score AS s1 FROM rk WHERE r = 1),
      c2 AS (SELECT rk.doc_id, rk.i, rk.j, rk.score, rk.r FROM rk JOIN b1 USING (doc_id)
             WHERE NOT (rk.i <= b1.i1 AND b1.j1 <= rk.j)
               AND NOT (b1.i1 <= rk.i AND rk.j <= b1.j1)),
      b2 AS (SELECT doc_id, i AS i2, j AS j2, score AS s2,
                    row_number() OVER (PARTITION BY doc_id ORDER BY r) AS rr FROM c2),
      united AS (
        SELECT doc_id, 1 AS span_rank, i1 AS i, j1 AS j, s1 AS score FROM b1
        UNION ALL
        SELECT doc_id, 2, i2, j2, s2 FROM b2 WHERE rr = 1)
      SELECT u.doc_id, u.span_rank::INT AS span_rank, u.i::INT AS start_idx,
             u.j::INT AS end_idx, u.score::BIGINT AS score,
             array_to_string(d.toks[u.i + 1 : u.j + 1], ' ') AS prediction
      FROM united u JOIN d USING (doc_id)"""
    return fn, sql


def q_em_by_topk() -> Entry:
    """A4 EM-per-threshold rollup (`train_extractive_reader.py:251-262`):
    per-question exact match at each top-docs threshold after P9 answer
    normalization, mean per threshold."""
    from dpr_spark.functions.normalize import normalize_answer_sql

    def fn(spark, sf_dir):
        from dpr_spark.eval.reader import em_by_topk

        d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
            "doc_id", F.substring("text", 1, 20).alias("snippet")
        )
        preds = d.select(
            F.col("doc_id").alias("qid"), F.lit(10).alias("top_k"),
            F.col("snippet").alias("prediction"),
        ).unionByName(
            d.select(
                F.col("doc_id").alias("qid"), F.lit(50).alias("top_k"),
                F.when(F.col("doc_id") % 2 == 0, F.col("snippet"))
                .otherwise(F.substring("snippet", 1, 10)).alias("prediction"),
            )
        )
        gold = d.select(F.col("doc_id").alias("qid"), F.col("snippet").alias("answer"))
        return em_by_topk(preds, gold).select("top_k", F.round("em", 6).alias("em"))

    npred = normalize_answer_sql("prediction")
    ngold = normalize_answer_sql("answer")
    sql = f"""
      WITH d AS (SELECT doc_id, substr(text, 1, 20) AS snippet FROM documents
                 WHERE doc_id < 100),
      preds AS (
        SELECT doc_id AS qid, 10 AS top_k, snippet AS prediction FROM d
        UNION ALL
        SELECT doc_id, 50, CASE WHEN doc_id % 2 = 0 THEN snippet
                                ELSE substr(snippet, 1, 10) END FROM d),
      gold AS (SELECT doc_id AS qid, snippet AS answer FROM d),
      em AS (SELECT p.qid, p.top_k,
                    max(CASE WHEN {npred} = {ngold} THEN 1 ELSE 0 END) AS em
             FROM preds p JOIN gold USING (qid) GROUP BY 1, 2)
      SELECT top_k, round(avg(em), 6) AS em FROM em GROUP BY top_k"""
    return fn, sql


def q_chunked_accuracy() -> Entry:
    """V6 two-level table-chunk accuracy (`qa_validation.py:239-282` +
    `dense_retriever.py:439-458`): 30-word chunks of each document,
    retrieval = count of distinct query terms in the chunk (integer —
    portable), top-10 chunks per query; chunk-level and parent-doc-level
    cumulative hit histograms."""
    MW, K = 30, 10
    n_q = len(BENCH_QUERIES)

    def fn(spark, sf_dir):
        from dpr_spark.eval.validation import chunked_accuracy
        from dpr_spark.functions.chunking import chunk_text
        from dpr_spark.functions.tokenizer import tokenize_col

        ch = chunk_text(_docs(spark, sf_dir), id_col="doc_id", max_words=MW).select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("chunk_id"),
            F.col("doc_id").alias("table_id"),
            F.col("chunk").alias("text"),
        )
        cht = ch.select(
            "chunk_id", tokenize_col("text", lowercase_first=True).alias("toks")
        ).select("chunk_id", F.explode("toks").alias("term")).distinct()
        qt = _qterms_df(spark)
        scored = (
            cht.join(F.broadcast(qt), "term")
            .groupBy("qid", "chunk_id")
            .agg(F.count("*").alias("score"))
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("chunk_id"))
        results = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .select("qid", "rank", "chunk_id")
        )
        ans_rows = [
            (qid, answers) for qid, answers in BENCH_ANSWERS.items()
        ]
        answers = spark.createDataFrame(ans_rows, "qid int, answers array<string>")
        out = chunked_accuracy(results, ch, answers, n_questions=n_q, max_k=K)
        return out.select(
            "k", "chunk_hits", F.round("chunk_accuracy", 6).alias("chunk_accuracy"),
            "table_hits", F.round("table_accuracy", 6).alias("table_accuracy"),
        )

    ans_vals = ", ".join(
        f"({qid}, '{' '.join(tokenize(a))}')"
        for qid, answers in BENCH_ANSWERS.items()
        for a in answers
    )
    sql = f"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      ch AS (SELECT doc_id * 1000 + i AS chunk_id, doc_id AS table_id,
                    array_to_string(words[i * {MW} + 1 : (i + 1) * {MW}], ' ') AS text
             FROM w, unnest(range(0, greatest(ceil(len(words) / {MW}.0)::INT, 1))) AS u(i)),
      cht AS (SELECT chunk_id, {_DUCK_TOKS} AS toks FROM ch),
      cterm AS (SELECT DISTINCT chunk_id, unnest(toks) AS term FROM cht),
      qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term)),
      scored AS (SELECT qt.qid, cterm.chunk_id, count(*) AS score
                 FROM qt JOIN cterm USING (term) GROUP BY 1, 2),
      res AS (SELECT qid, chunk_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score DESC, chunk_id) AS rank
              FROM scored QUALIFY rank <= {K}),
      tstr AS (SELECT chunk_id, table_id,
                      ' ' || array_to_string(toks, ' ') || ' ' AS tstr
               FROM cht JOIN ch USING (chunk_id)),
      ans AS (SELECT * FROM (VALUES {ans_vals}) AS a(qid, ans_toks)),
      chit AS (SELECT r.qid, r.rank, t.table_id,
                      max(CASE WHEN contains(t.tstr, ' ' || a.ans_toks || ' ')
                          THEN 1 ELSE 0 END) AS chunk_hit
               FROM res r JOIN tstr t USING (chunk_id) JOIN ans a ON a.qid = r.qid
               GROUP BY 1, 2, 3),
      tv AS (SELECT q.qid, t.table_id,
                    max(CASE WHEN contains(t.tstr, ' ' || a.ans_toks || ' ')
                        THEN 1 ELSE 0 END) AS table_hit
             FROM (SELECT DISTINCT qid, table_id FROM chit) q
             JOIN tstr t USING (table_id) JOIN ans a ON a.qid = q.qid
             GROUP BY 1, 2),
      firsts AS (SELECT c.qid,
                        min(CASE WHEN c.chunk_hit = 1 THEN c.rank END) AS first_chunk,
                        min(CASE WHEN v.table_hit = 1 THEN c.rank END) AS first_table
                 FROM chit c JOIN tv v ON v.qid = c.qid AND v.table_id = c.table_id
                 GROUP BY 1),
      ks AS (SELECT range::INT AS k FROM range(1, {K + 1}))
      SELECT k,
             coalesce(sum(CASE WHEN f.first_chunk <= ks.k THEN 1 END), 0)::BIGINT AS chunk_hits,
             round(coalesce(sum(CASE WHEN f.first_chunk <= ks.k THEN 1 END), 0) / {float(n_q)}, 6) AS chunk_accuracy,
             coalesce(sum(CASE WHEN f.first_table <= ks.k THEN 1 END), 0)::BIGINT AS table_hits,
             round(coalesce(sum(CASE WHEN f.first_table <= ks.k THEN 1 END), 0) / {float(n_q)}, 6) AS table_accuracy
      FROM ks LEFT JOIN firsts f ON TRUE
      GROUP BY k""".replace("{QTERMS}", _qterm_values_sql())
    return fn, sql


def q_gold_passage_join() -> Entry:
    """J4 gold-passage map join (`reader_data.py:536-569`): samples left
    join the gold (question -> title/context) map, falling back to the
    tokenized-question key — even qids match on question, odd qids only
    via question_tokens."""

    def fn(spark, sf_dir):
        from dpr_spark.eval.reader import gold_passage_join

        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        samples = qdf.select(
            "qid", "question", F.concat("question", F.lit(" ?")).alias("question_tokens")
        )
        d = _docs(spark, sf_dir).filter(F.col("doc_id") < 8).select("doc_id", "text")
        gold = d.join(qdf, d["doc_id"] == qdf["qid"]).select(
            F.when(F.col("qid") % 2 == 0, F.col("question"))
            .otherwise(F.concat("question", F.lit(" ?"))).alias("question"),
            F.concat(F.lit("title_"), F.col("qid")).alias("title"),
            F.substring("text", 1, 40).alias("context"),
        )
        return gold_passage_join(samples, gold).select(
            "qid", "question", "gold_title", "gold_context"
        )

    q_vals = ", ".join(
        f"({qid}, '{q}')" for qid, q in BENCH_QUERIES
    )
    sql = f"""
      WITH qs AS (SELECT * FROM (VALUES {q_vals}) AS q(qid, question)),
      samples AS (SELECT qid, question, question || ' ?' AS question_tokens FROM qs),
      gold AS (SELECT CASE WHEN qid % 2 = 0 THEN question
                           ELSE question || ' ?' END AS question,
                      'title_' || qid AS title,
                      substr(d.text, 1, 40) AS context
               FROM qs JOIN documents d ON d.doc_id = qs.qid AND d.doc_id < 8)
      SELECT s.qid, s.question,
             coalesce(g1.title, g2.title) AS gold_title,
             coalesce(g1.context, g2.context) AS gold_context
      FROM samples s
      LEFT JOIN gold g1 ON g1.question = s.question
      LEFT JOIN gold g2 ON g2.question = s.question_tokens"""
    return fn, sql


def q_positive_ctx_filter() -> Entry:
    """P6 positive-ctx filter (`biencoder_data.py:77-79`): per-question
    positive passages from the KILT containment slice; questions with no
    positives (a planted qid 99) are dropped by the size()>0 filter."""
    from dpr_spark.functions.normalize import normalize_answer_col, normalize_answer_sql

    def fn(spark, sf_dir):
        from dpr_spark.eval.reader import positive_ctx_filter

        d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500).select("doc_id", "text")
        ans_rows = [(qid, a) for qid, answers in BENCH_ANSWERS.items() for a in answers]
        ans = spark.createDataFrame(ans_rows + [(99, "zqxwvy unfindable")], "qid int, answer string")
        hits = (
            d.crossJoin(F.broadcast(ans))
            .filter(normalize_answer_col("text").contains(normalize_answer_col("answer")))
            .select("qid", "doc_id")
            .distinct()
        )
        qids = spark.createDataFrame(
            [(qid,) for qid, _ in BENCH_QUERIES] + [(99,)], "qid int"
        )
        pos = qids.join(hits, "qid", "left").groupBy("qid").agg(
            F.sort_array(
                F.filter(F.collect_list("doc_id"), lambda x: x.isNotNull())
            ).alias("positive_ctxs")
        )
        return positive_ctx_filter(pos).select(
            "qid", F.size("positive_ctxs").cast("long").alias("n_pos")
        )

    vals = ", ".join(
        f"({qid}, '{a.replace(chr(39), chr(39) * 2)}')"
        for qid, answers in BENCH_ANSWERS.items()
        for a in answers
    )
    ntext = normalize_answer_sql("text")
    nans = normalize_answer_sql("answer")
    sql = f"""
      WITH ans AS (SELECT * FROM (VALUES {vals}, (99, 'zqxwvy unfindable')) AS a(qid, answer)),
      d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      hits AS (SELECT DISTINCT qid, doc_id FROM d CROSS JOIN ans
               WHERE contains({ntext}, {nans}))
      SELECT qid, count(*)::BIGINT AS n_pos FROM hits GROUP BY qid
      HAVING count(*) > 0"""
    return fn, sql


def q_ngrams_view() -> Entry:
    """T2 n-grams view (`tokenizers.py:96-118`): all 1..2-grams per doc
    (first 50 docs) with counts — pure Catalyst, no UDF."""

    def fn(spark, sf_dir):
        from dpr_spark.functions.tokenizer import ngrams_col

        tok = _tokenized(spark, sf_dir).filter(F.col("doc_id") < 50)
        return (
            tok.select("doc_id", F.explode(ngrams_col(F.col("toks"), n=2)).alias("ngram"))
            .groupBy("doc_id", "ngram")
            .agg(F.count("*").cast("long").alias("cnt"))
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
                   WHERE doc_id < 50),
      uni AS (SELECT doc_id, unnest(toks) AS ngram FROM tok),
      bi AS (SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS ngram
             FROM tok, unnest(range(0, len(toks) - 1)) AS t(i)
             WHERE len(toks) >= 2)
      SELECT doc_id, ngram, count(*)::BIGINT AS cnt
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
      GROUP BY doc_id, ngram"""
    return fn, sql


def q_simhash_neardup() -> Entry:
    """SimHash hamming<=3 near-dup (banded pigeonhole join + popcount
    verify, extras/dedup.py) over the portable 60-bit signatures. The
    oracle is deliberately STRONGER than a mirror: it brute-forces ALL
    pairs with popcount <= 3, so a match proves the banding loses no
    pair (pigeonhole completeness), not just that both engines ran the
    same join."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.dedup import (
            portable_hash60,
            simhash64,
            simhash_near_duplicates,
        )

        sig = simhash64(_docs(spark, sf_dir), bits=60, hash_fn=portable_hash60)
        return simhash_near_duplicates(sig, max_hamming=3, bits=60)

    from dpr_spark.functions.tokenizer import duckdb_tokenize_sql

    sql = f"""
      WITH tok AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
      tf AS (SELECT doc_id AS doc, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      h AS (SELECT doc, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
      votes AS (SELECT doc, b,
                       sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS v
                FROM h, unnest(range(0, 60)) AS t(b) GROUP BY 1, 2),
      sim AS (SELECT doc,
                     sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
              FROM votes GROUP BY doc)
      SELECT a.doc AS doc_a, b.doc AS doc_b,
             bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM sim a JOIN sim b ON a.doc < b.doc
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    return fn, sql


def q_table_chunks() -> Entry:
    """T6 HTML-token table parse + linearize (NQTableParser analog,
    `biencoder_data.py:252-337` + `:563-580`): deterministic table token
    streams built from the first 10 documents' tokens, parsed by the
    stack machine and split into header-prefixed chunks.

    Oracle-checked (r3 VERDICT next-round #3): the stack machine itself
    has no SQL spelling, but for this fixture's input family the chunk
    algebra does — each table is 3 rows x 2 cells x 2 tokens, so every
    linearized row is "a b, c d" (4 words); with max_table_len=8 the
    greedy splitter (header_len 4 + row_len 4 >= 8) closes a chunk after
    EVERY body row and never leaves a trailing partial, so chunk i =
    header_row + '\\n' + row_{i+1} + '\\n'. The DuckDB twin recomputes
    that from the raw document tokens by 1-based slice arithmetic —
    an independent spelling, not a mirror of the parser. Full stack-
    machine semantics (nesting, captions, th/td, stray content) stay
    pytest-gated in tests/test_tables.py."""

    def fn(spark, sf_dir):
        from dpr_spark.functions.tables import tables_to_chunks

        # synthesize the 3-row × 2-cell token streams with pure column
        # functions (sequence/transform/flatten/slice — codegen, no
        # .collect() in a driver-contract entry)
        lit_arr = lambda *vs: F.array(*[F.lit(v) for v in vs])
        tokens = F.concat(
            lit_arr("<Table>"),
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(2)),
                    lambda r: F.concat(
                        lit_arr("<Tr>"),
                        F.flatten(
                            F.transform(
                                F.sequence(F.lit(0), F.lit(1)),
                                lambda c: F.concat(
                                    lit_arr("<Td>"),
                                    F.slice(F.col("ts"), r * 4 + c * 2 + 1, 2),
                                    lit_arr("</Td>"),
                                ),
                            )
                        ),
                        lit_arr("</Tr>"),
                    ),
                )
            ),
            lit_arr("</Table>"),
        )
        cell_mask = [True, False, False, True]
        row_mask = [True] + cell_mask * 2 + [True]
        mask = lit_arr(True, *(row_mask * 3), True)
        df = (
            _tokenized(spark, sf_dir)
            .filter((F.col("doc_id") < 10) & (F.size("toks") >= 12))
            .select("doc_id", F.slice("toks", 1, 12).alias("ts"))
            .select(
                "doc_id",
                tokens.alias("tokens"),
                mask.alias("html_mask"),
                F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("title"),
            )
        )
        return tables_to_chunks(df, max_table_len=8)

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      base AS (SELECT doc_id, toks FROM tok WHERE doc_id < 10 AND len(toks) >= 12),
      rows_ AS (
        SELECT doc_id, rn,
               toks[rn*4+1] || ' ' || toks[rn*4+2] || ', '
               || toks[rn*4+3] || ' ' || toks[rn*4+4] AS row_lin
        FROM base CROSS JOIN (SELECT unnest([0, 1, 2]) AS rn)
      )
      SELECT h.doc_id, 0::INT AS table_idx, (b.rn - 1)::INT AS chunk_idx,
             h.row_lin || chr(10) || b.row_lin || chr(10) AS text,
             'doc' || h.doc_id::VARCHAR AS title
      FROM rows_ h JOIN rows_ b USING (doc_id)
      WHERE h.rn = 0 AND b.rn >= 1"""
    return fn, sql


def q_average_rank() -> Entry:
    """A5 average-rank validation (`train_dense_encoder.py:408-428`):
    0-based rank of a designated gold doc (the rank-3 result) in the
    score-descending order, averaged over questions. Count-join form —
    no per-query sort."""

    def fn(spark, sf_dir):
        from dpr_spark.eval.validation import average_rank

        ranked = _bm25_ranked(spark, sf_dir)
        scored = ranked.select("qid", "doc_id", F.col("score_r").alias("score"))
        gold = ranked.filter(F.col("rank") == 3).select(
            "qid", F.col("doc_id").alias("gold_doc_id")
        )
        return average_rank(scored, gold).select(
            F.round("av_rank", 6).alias("av_rank"), "n_questions"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
        gold AS (SELECT qid, doc_id AS gdoc, score_r AS gscore FROM ranked WHERE rank = 3),
        rk AS (SELECT r.qid,
                      sum(CASE WHEN r.score_r > g.gscore
                               OR (r.score_r = g.gscore AND r.doc_id < g.gdoc)
                          THEN 1 ELSE 0 END) AS rank
               FROM ranked r JOIN gold g USING (qid) GROUP BY r.qid)
        SELECT round(avg(rank), 6) AS av_rank, count(*)::BIGINT AS n_questions FROM rk"""
    )
    return fn, sql


def q_kilt_format() -> Entry:
    """S11 KILT output conversion (`retriever_data.py:304-334`): top-3
    results -> {id, input, output:[{provenance}]} with a broadcast
    doc->wikipedia mapping join; emitted as JSON (nested arrays are not
    hashable in the harness's pandas compare — the JSON string is the
    wire form). Oracle-checked byte-for-byte (r3 VERDICT next-round #3):
    all provenance fields are strings/ints, so the DuckDB twin rebuilds
    the exact Jackson bytes with string_agg in rank order."""

    def fn(spark, sf_dir):
        from dpr_spark.eval.validation import to_kilt_format

        results = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 3).select(
            "qid", "rank", "doc_id"
        )
        mapping = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(F.lit("wiki_"), (F.col("doc_id") % 100)).alias("wikipedia_id"),
            (F.col("doc_id") % 7).cast("int").alias("end_paragraph_id"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        gold = qdf.select(
            "qid",
            F.concat(F.lit("kilt_"), F.col("qid")).alias("kilt_id"),
            F.col("question").alias("input"),
        )
        out = to_kilt_format(results, mapping, gold)
        return out.select("id", "input", F.to_json("output").alias("output_json"))

    qvals = ", ".join(f"({qid}, '{q}')" for qid, q in BENCH_QUERIES)
    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
        top3 AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 3),
        q AS (SELECT * FROM (VALUES {qvals}) AS q(qid, question)),
        prov AS (SELECT qid,
                   '[{{"provenance":[' || string_agg(
                     '{{"wikipedia_id":"wiki_' || (doc_id % 100)::VARCHAR
                     || '","end_paragraph_id":' || (doc_id % 7)::VARCHAR
                     || '}}', ',' ORDER BY rank) || ']}}]' AS output_json
                 FROM top3 GROUP BY qid)
        SELECT 'kilt_' || q.qid::VARCHAR AS id, q.question AS input, prov.output_json
        FROM q JOIN prov USING (qid)"""
    )
    return fn, sql


def q_weighted_interleave() -> Entry:
    """D3 weighted multi-set interleave (`data_utils.py:342-451`): two
    deterministic samples of the documents table union-interleaved.
    Selection = md5(id:seed) mod 10^6 < rate·10^6 — a pure function of
    (id, seed), portable to DuckDB, so the entry is oracle-checked."""

    def fn(spark, sf_dir):
        from dpr_spark.functions.chunking import weighted_interleave

        d = _docs(spark, sf_dir).select("doc_id", "lang")
        a = d.filter(F.col("doc_id") % 2 == 0)
        b = d.filter(F.col("doc_id") % 2 == 1)
        return weighted_interleave([a, b], [1.0, 0.5], "doc_id", seed=7)

    sql = """
      SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1
        AND ('0x' || substr(md5(doc_id::VARCHAR || ':8'), 1, 15))::BIGINT
            % 1000000 < 500000
    """
    return fn, sql


def q_sharded_epoch() -> Entry:
    """D2 ShardedDataIterator equalization (`data_utils.py:193-305`):
    epoch-shuffled contiguous shards with equalized iteration counts —
    short shards re-yield their first batch, strict mode pads a short
    final batch from the shard head. 6 shards x batch 16 over the 500
    driver docs exercises both padding paths; portable permutation key
    -> exact DuckDB twin."""
    from dpr_spark.functions.sharding import sharded_epoch_batches, sharded_epoch_sql

    def fn(spark, sf_dir):
        return sharded_epoch_batches(
            _docs(spark, sf_dir).select("doc_id"),
            "doc_id",
            num_shards=6,
            batch_size=16,
            epoch=1,
            seed=3,
            strict_batch_size=True,
            portable_key=True,
        )

    return fn, sharded_epoch_sql(
        "documents", "doc_id", num_shards=6, batch_size=16, epoch=1, seed=3,
        strict_batch_size=True,
    )


def q_reader_samples() -> Entry:
    """Reader TRAINING-sample construction (`reader_data.py:234-521`
    `preprocess_retriever_data` + `_select_reader_passages`): synthetic
    retriever results (documents ranked by doc_id) per BENCH query ->
    span-verified positives (gold-page preferred, uncapped; fallback
    capped), rank-ordered negatives under the 10·n_pos cap, questions
    with no surviving positives dropped. Fully integer-deterministic ->
    DuckDB-checked, including first-span offsets."""
    from dpr_spark.functions.tokenizer import TOKEN_PATTERN_SQL, duckdb_tokenize_sql

    MP, MAXN, MINN = 5, 10, 20

    def fn(spark, sf_dir):
        from dpr_spark.eval.reader import select_reader_passages
        from dpr_spark.functions.tokenizer import tokenize_col

        d = _docs(spark, sf_dir).filter(F.col("doc_id") < 120).select(
            "doc_id",
            (F.col("doc_id") + 1).cast("int").alias("rank"),
            F.concat(F.lit("page_"), (F.col("doc_id") % 6).cast("string")).alias("title"),
            tokenize_col("text", lowercase_first=True).alias("tokens"),
            F.lower("text").alias("_lt"),
        )
        ans = spark.createDataFrame(
            [(q, BENCH_ANSWERS[q]) for q, _ in BENCH_QUERIES],
            "qid int, answers array<string>",
        )
        results = (
            d.crossJoin(F.broadcast(ans))
            .withColumn(
                "has_answer",
                F.exists("answers", lambda a: F.col("_lt").contains(F.lower(a))),
            )
            .select("qid", "rank", "doc_id", "title", "tokens", "has_answer")
        )
        gold = spark.createDataFrame(
            [(q, f"page_{q % 6}") for q, _ in BENCH_QUERIES if q % 2 == 0],
            "qid int, gold_title string",
        )
        out = select_reader_passages(
            results, ans, gold,
            max_positives=MP, max_negatives=MAXN, min_negatives=MINN,
        )
        return out.select(
            "qid",
            "role",
            F.col("sel_rank").cast("int").alias("sel_rank"),
            "rank",
            "doc_id",
            F.size("spans").alias("n_spans"),
            F.try_element_at("spans", F.lit(1)).getField("start").alias("s1_start"),
            F.try_element_at("spans", F.lit(1)).getField("end").alias("s1_end"),
        )

    ans_vals = ", ".join(
        "({}, [{}])".format(
            qid, ", ".join("'" + a.replace("'", "''") + "'" for a in BENCH_ANSWERS[qid])
        )
        for qid, _ in BENCH_QUERIES
    )
    gold_vals = ", ".join(
        f"({q}, 'page_{q % 6}')" for q, _ in BENCH_QUERIES if q % 2 == 0
    )
    pat = TOKEN_PATTERN_SQL.replace("'", "''")
    toks = duckdb_tokenize_sql("text", lowercase_first=True)
    sql = f"""
      WITH ansl AS (
        SELECT qid, answers,
               list_transform(answers, a ->
                 list_transform(regexp_extract_all(a, '{pat}'), t -> lower(t))) AS ans_toks
        FROM (VALUES {ans_vals}) AS a(qid, answers)),
      gold AS (SELECT * FROM (VALUES {gold_vals}) AS g(qid, gold_title)),
      d AS (SELECT doc_id, (doc_id + 1)::INT AS rank,
                   'page_' || (doc_id % 6) AS title,
                   {toks} AS toks, lower(text) AS lt
            FROM documents WHERE doc_id < 120),
      pairs AS (
        SELECT a.qid, d.rank, d.doc_id, d.title, d.toks, a.ans_toks,
               len(list_filter(a.answers, x -> contains(d.lt, lower(x)))) > 0 AS has_answer
        FROM d CROSS JOIN ansl a),
      sp AS (
        SELECT qid, rank, doc_id, title, has_answer,
          CASE WHEN has_answer THEN
            flatten(list_transform(ans_toks, at ->
              CASE WHEN len(at) = 0 THEN [] ELSE
                list_transform(
                  list_filter(range(0, len(toks) - len(at) + 1),
                              i -> toks[i + 1 : i + len(at)] = at),
                  i -> [i, i + len(at) - 1])
              END))
          ELSE [] END AS spans
        FROM pairs),
      sel AS (
        SELECT sp.*,
          has_answer AND len(spans) > 0 AS is_pos_cand,
          has_answer AND len(spans) > 0 AND gold_title IS NOT NULL
            AND lower(title) = lower(gold_title) AS is_gold_pos
        FROM sp LEFT JOIN gold USING (qid)),
      w1 AS (
        SELECT *,
          sum(is_gold_pos::INT) OVER (PARTITION BY qid) AS n_gold,
          sum(is_pos_cand::INT) OVER (PARTITION BY qid ORDER BY rank) AS cand_rank
        FROM sel),
      w2 AS (
        SELECT *,
          CASE WHEN n_gold > 0 THEN is_gold_pos
               ELSE is_pos_cand AND cand_rank <= {MP} END AS is_positive
        FROM w1),
      w3 AS (
        SELECT *,
          sum(is_positive::INT) OVER (PARTITION BY qid) AS n_pos,
          sum(is_positive::INT) OVER (PARTITION BY qid ORDER BY rank) AS pos_rank,
          sum((NOT has_answer)::INT) OVER (PARTITION BY qid ORDER BY rank) AS neg_rank
        FROM w2)
      SELECT qid::INT AS qid,
             CASE WHEN is_positive THEN 'positive' ELSE 'negative' END AS role,
             (CASE WHEN is_positive THEN pos_rank ELSE neg_rank END)::INT AS sel_rank,
             rank::INT AS rank, doc_id::BIGINT AS doc_id,
             len(spans)::INT AS n_spans,
             spans[1][1]::INT AS s1_start, spans[1][2]::INT AS s1_end
      FROM w3
      WHERE n_pos > 0
        AND (is_positive
             OR (NOT has_answer
                 AND neg_rank <= least(greatest({MAXN}, n_pos * 10), {MINN})))"""
    return fn, sql


def q_tfidf_topk() -> Entry:
    """Pluggable similarity #1 (query/similarity.py; Lucene
    ClassicSimilarity): classic TF-IDF top-10 via the REAL engine —
    build_index_from_docs + search_similarity('classic') — score =
    Σ sqrt(tf)·idf²·1/sqrt(dl), idf = 1 + ln(N/(df+1)). Same index, same
    probe plan as BM25; only the Catalyst formula differs. Rank
    re-derived from the 6-dp-rounded score."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.similarity import search_similarity

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_similarity(qdf, idx, similarity="classic", k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
      stats AS (SELECT count(*)::DOUBLE AS n FROM ds),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(sqrt(tf.tf)
                   * (1.0 + ln(stats.n / (dict.df + 1.0)))
                   * (1.0 + ln(stats.n / (dict.df + 1.0)))
                   / sqrt(ds.doclen)) AS score
        FROM qt JOIN dict USING (term) JOIN tf USING (term)
             JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_lmdirichlet_topk() -> Entry:
    """Pluggable similarity #2 (query/similarity.py; Lucene
    LMDirichletSimilarity, mu=2000): per-term
    max(0, ln(1 + tf/(mu·ctf/total)) + ln(mu/(dl+mu))) — ctf resolved at
    query time from one extra postings probe over the query terms only
    (ctf is NOT in the dictionary; adding it would break the merge
    bit-identity contract). Rank re-derived from the 6-dp-rounded
    score."""
    MU = 2000.0

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.similarity import search_similarity

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_similarity(qdf, idx, similarity="lmdirichlet", k=10, mu=MU).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
      total AS (SELECT sum(doclen)::DOUBLE AS tt FROM ds),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      ctf AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM tf GROUP BY 1),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(greatest(0.0,
                   ln(1.0 + tf.tf / ({MU} * (ctf.ctf / total.tt)))
                   + ln({MU} / (ds.doclen + {MU})))) AS score
        FROM qt JOIN ctf USING (term) JOIN tf USING (term)
             JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN total
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


# (qid, [(clause_text, boost), ...]) — clause 3 of qid 3 is fully OOV, so
# the doc set comes from the surviving clause alone (DisMax semantics:
# union of clause matches, not intersection).
DISMAX_QUERIES = [
    (0, [("spark window data", 1.0), ("customer join", 1.5)]),
    (1, [("fast scan", 2.0), ("sort key", 1.0)]),
    (2, [("table", 1.0), ("value column data", 0.5)]),
    (3, [("zzznope", 1.0), ("spark", 1.25)]),
]
DISMAX_TIE_BREAKER = 0.3


def q_dismax_topk() -> Entry:
    """Disjunction-max top-10 (query/dismax.py; Lucene
    DisjunctionMaxQuery with tieBreakerMultiplier=0.3 and per-clause
    BoostQuery): clause_score = boost · BM25 sum over the clause's token
    set; doc score = max + tb·(sum − max). The twin scores each
    (qid, clause) group independently then folds max/sum per doc."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.dismax import dismax_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = dismax_search(
            spark, DISMAX_QUERIES, idx, tie_breaker=DISMAX_TIE_BREAKER, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.dismax import _clause_rows

    values = ", ".join(
        f"({qid}, {cid}, {boost!r}::DOUBLE, '{t}')"
        for qid, cid, boost, t in _clause_rows(DISMAX_QUERIES)
    )
    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {values}) AS q(qid, clause_id, boost, term)),
    cs AS (
      SELECT q.qid, tf.doc_id, q.clause_id,
             max(q.boost) * sum({_BM25_COMPONENT}) AS bcs
      FROM q JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2, 3),
    scored AS (
      SELECT qid, doc_id,
             max(bcs) + {DISMAX_TIE_BREAKER} * (sum(bcs) - max(bcs)) AS score
      FROM cs GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_analyzed_topk() -> Entry:
    """English analysis chain (functions/analysis.py; Lucene
    EnglishAnalyzer shape: lowercase → stop-filter → stem): BM25 top-10
    over an index built with the 33-word Lucene stop set + the Harman
    S-stemmer (the SQL-expressible stemmer; Porter is pytest-verified in
    tests/test_analysis.py). doclen counts surviving tokens. The twin
    wraps the token CTE in the analyzer's list_filter/list_transform
    spelling and pre-analyzes the query VALUES with the same chain."""
    from dpr_spark.functions.analysis import ENGLISH_S, analyze_query

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.scorer import search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, analyzer=ENGLISH_S
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search(qdf, idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in BENCH_QUERIES
        for t in analyze_query(q, ENGLISH_S)
    )
    ctes = _BM25_CTES.replace("{QTERMS}", qvals).replace(
        _DUCK_TOKS, ENGLISH_S.sql_toks_expr(_DUCK_TOKS)
    )
    sql = f"""
    WITH {ctes}
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


FUNC_SCORE_SCALE, FUNC_SCORE_DECAY = 500.0, 0.5


def q_func_score_topk() -> Entry:
    """Function-score top-10 (query/funcscore.py; ES function_score /
    Lucene FunctionScoreQuery): BM25 × exp-decay over n_chars (origin 0,
    scale 500, decay 0.5 — "prefer short docs"), boost_mode=multiply,
    applied to EVERY matched doc before the top-k. The twin multiplies
    the scored CTE by the same exp literal (λ pre-computed in Python so
    both engines see the identical float64 constant)."""
    import math

    lam = math.log(FUNC_SCORE_DECAY) / FUNC_SCORE_SCALE

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.funcscore import decay_expr, search_function_score

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_function_score(
            qdf, idx, docs, "n_chars",
            lambda c: decay_expr(
                c, "exp", origin=0.0, scale=FUNC_SCORE_SCALE,
                decay=FUNC_SCORE_DECAY,
            ),
            k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    fs AS (
      SELECT s.qid, s.doc_id,
             s.score * exp({lam!r} * greatest(0.0, abs(d.n_chars::DOUBLE)))
             AS score
      FROM scored s JOIN documents d USING (doc_id)),
    ranked_fs AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM fs)
    SELECT qid, rank, doc_id, score_r FROM ranked_fs WHERE rank <= 10"""
    return fn, sql


_MATCH_CTES = f"""
tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term)),
matches AS (SELECT DISTINCT qt.qid, tf.doc_id FROM qt JOIN tf USING (term))
"""


def q_terms_agg_matches() -> Entry:
    """ES `terms` aggregation over the FULL match set (query/aggs.py):
    top-5 (source, count) buckets per query, count desc / value asc —
    EXACT global counts (no shard approximation), computed with the
    two-level salted top-N so a mega-query can't funnel one window."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import terms_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return terms_agg(
            qdf, idx, docs.select("doc_id", "source"), "source",
            size=5, salt_buckets=4,
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    counts AS (
      SELECT m.qid, d.source AS value, count(*) AS count
      FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2),
    ranked AS (
      SELECT qid, value, count,
             row_number() OVER (PARTITION BY qid
                                ORDER BY count DESC, value ASC) AS rank
      FROM counts)
    SELECT qid, value, count, rank FROM ranked WHERE rank <= 5"""
    return fn, sql


def q_stats_agg_matches() -> Entry:
    """ES `stats` aggregation + track_total_hits (query/aggs.py):
    count/min/max/sum/avg of n_chars over every matched doc per query
    (`n` IS the total-hits count — Lucene TotalHitCountCollector)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import stats_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = stats_agg(qdf, idx, docs.select("doc_id", "n_chars"), "n_chars")
        return res.select(
            "qid", "n",
            F.round("min", 6).alias("min_v"), F.round("max", 6).alias("max_v"),
            F.round("sum", 6).alias("sum_v"), F.round("avg", 6).alias("avg_v"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())}
    SELECT m.qid, count(*) AS n,
           round(min(d.n_chars::DOUBLE), 6) AS min_v,
           round(max(d.n_chars::DOUBLE), 6) AS max_v,
           round(sum(d.n_chars::DOUBLE), 6) AS sum_v,
           round(avg(d.n_chars::DOUBLE), 6) AS avg_v
    FROM matches m JOIN documents d USING (doc_id) GROUP BY 1"""
    return fn, sql


def q_filters_agg() -> Entry:
    """ES `filters` aggregation (query/aggs.py::filters_agg): named
    buckets english/long/web0 + `_other_` over each query's match set —
    one conditional-sum pass, no per-filter scan."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import filters_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return filters_agg(
            qdf, idx, docs.select("doc_id", "lang", "source", "n_chars"),
            [
                ("english", F.col("lang") == "en"),
                ("long", F.col("n_chars") >= 300),
                ("web0", F.col("source") == "src0"),
            ],
            other_bucket=True,
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    j AS (SELECT m.qid, d.lang, d.n_chars, d.source
          FROM matches m JOIN documents d USING (doc_id)),
    wide AS (SELECT qid,
        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS english,
        sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS longb,
        sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS web0,
        sum(CASE WHEN NOT (coalesce(lang = 'en', FALSE)
                           OR coalesce(n_chars >= 300, FALSE)
                           OR coalesce(source = 'src0', FALSE))
            THEN 1 ELSE 0 END) AS otherb
      FROM j GROUP BY 1)
    SELECT qid, 'english' AS bucket, CAST(english AS BIGINT) AS count FROM wide
    UNION ALL SELECT qid, 'long', CAST(longb AS BIGINT) FROM wide
    UNION ALL SELECT qid, 'web0', CAST(web0 AS BIGINT) FROM wide
    UNION ALL SELECT qid, '_other_', CAST(otherb AS BIGINT) FROM wide"""
    return fn, sql


def q_adjacency_matrix() -> Entry:
    """ES `adjacency_matrix` (query/aggs.py::adjacency_matrix_agg):
    per-filter and pairwise-intersection buckets (key 'a&b'), empty
    buckets omitted — n(n+1)/2 conditional sums in one pass."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import adjacency_matrix_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return adjacency_matrix_agg(
            qdf, idx, docs.select("doc_id", "lang", "n_chars"),
            [
                ("en", F.col("lang") == "en"),
                ("long", F.col("n_chars") >= 300),
                ("zh", F.col("lang") == "zh"),
            ],
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    j AS (SELECT m.qid, d.lang, d.n_chars
          FROM matches m JOIN documents d USING (doc_id)),
    wide AS (SELECT qid,
        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS b_en,
        sum(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS b_en_long,
        sum(CASE WHEN lang = 'en' AND lang = 'zh' THEN 1 ELSE 0 END) AS b_en_zh,
        sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS b_long,
        sum(CASE WHEN n_chars >= 300 AND lang = 'zh' THEN 1 ELSE 0 END) AS b_long_zh,
        sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS b_zh
      FROM j GROUP BY 1),
    longf AS (
      SELECT qid, 'en' AS bucket, b_en AS count FROM wide
      UNION ALL SELECT qid, 'en&long', b_en_long FROM wide
      UNION ALL SELECT qid, 'en&zh', b_en_zh FROM wide
      UNION ALL SELECT qid, 'long', b_long FROM wide
      UNION ALL SELECT qid, 'long&zh', b_long_zh FROM wide
      UNION ALL SELECT qid, 'zh', b_zh FROM wide)
    SELECT qid, bucket, CAST(count AS BIGINT) AS count
    FROM longf WHERE count > 0"""
    return fn, sql


def q_rare_terms_agg() -> Entry:
    """ES `rare_terms` (query/aggs.py::rare_terms_agg): source buckets
    with match-set doc count <= 2 — the exact long tail, no
    CuckooFilter approximation."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import rare_terms_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        # source alone is too coarse on the testdata (every bucket is
        # common — the agg matched zero rows); the scattered 199-bucket
        # key (2-3 docs each) keeps a genuine long tail at every sf
        vals = docs.select(
            "doc_id",
            F.pmod(F.col("doc_id") * 7919, F.lit(199)).cast("string").alias("shard"),
        )
        return rare_terms_agg(qdf, idx, vals, "shard", max_doc_count=2)

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    counts AS (
      SELECT m.qid, ((m.doc_id * 7919) % 199)::VARCHAR AS value,
             count(*) AS count
      FROM matches m GROUP BY 1, 2)
    SELECT qid, value, count FROM counts WHERE count <= 2"""
    return fn, sql


def q_multi_terms_agg() -> Entry:
    """ES `multi_terms` (query/aggs.py::multi_terms_agg): composite
    (lang, source) buckets, top-5 per query by count desc then keys
    asc — exact global counts, salted top-N."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import multi_terms_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return multi_terms_agg(
            qdf, idx, docs.select("doc_id", "lang", "source"),
            ["lang", "source"], size=5, salt_buckets=4,
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    counts AS (
      SELECT m.qid, d.lang, d.source, count(*) AS count
      FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
    ranked AS (
      SELECT qid, lang, source, count,
             row_number() OVER (PARTITION BY qid
                                ORDER BY count DESC, lang ASC, source ASC) AS rank
      FROM counts)
    SELECT qid, lang, source, count, rank FROM ranked WHERE rank <= 5"""
    return fn, sql


def q_global_agg() -> Entry:
    """ES `global` bucket (query/aggs.py::global_agg): per-query
    match-set n/sum of n_chars next to the corpus-wide n/avg — the
    results-vs-everything comparison, one broadcast corpus aggregate."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import global_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = global_agg(qdf, idx, docs.select("doc_id", "n_chars"), "n_chars")
        return res.select(
            "qid", "n", F.round("sum", 6).alias("sum_v"),
            "g_n", F.round("g_avg", 6).alias("g_avg_v"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    per AS (SELECT m.qid, count(*) AS n,
                   round(sum(d.n_chars::DOUBLE), 6) AS sum_v
            FROM matches m JOIN documents d USING (doc_id) GROUP BY 1),
    g AS (SELECT count(*) AS g_n, round(avg(n_chars::DOUBLE), 6) AS g_avg_v
          FROM documents)
    SELECT per.qid, per.n, per.sum_v, g.g_n, g.g_avg_v FROM per CROSS JOIN g"""
    return fn, sql


def q_rank_eval() -> Entry:
    """ES `_rank_eval` (eval/rankeval.py): precision@10, recall@10, RR,
    DCG@10, nDCG@10, ERR@10 of the BM25 ranking against graded
    judgments derived from the data (rel = distinct query terms in the
    doc − 1, so single-term docs are non-relevant). ERR's rank-ordered
    fold uses dyadic R values, bit-exact vs DuckDB's windowed
    product()."""
    K = 10

    def fn(spark, sf_dir):
        from dpr_spark.eval.rankeval import rank_eval

        ranked = _bm25_ranked(spark, sf_dir)
        tok = _tokenized(spark, sf_dir)
        tf = (
            tok.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        qt = _qterms_df(spark)
        qrels = (
            qt.join(tf, "term")
            .groupBy("qid", "doc_id")
            .agg((F.count("*") - F.lit(1)).alias("rel"))
        )
        res = rank_eval(ranked.select("qid", "rank", "doc_id"), qrels, k=K)
        return res.select(
            "qid", "retrieved",
            F.round("precision_k", 6).alias("precision_k"),
            F.round("recall_k", 6).alias("recall_k"),
            F.round("rr", 6).alias("rr"),
            F.round("dcg_k", 6).alias("dcg_k"),
            F.round("ndcg_k", 6).alias("ndcg_k"),
            F.round("err_k", 6).alias("err_k"),
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    topk AS (SELECT qid, rank, doc_id FROM ranked WHERE rank <= {K}),
    qrels AS (SELECT qt.qid, tf.doc_id, count(*) - 1 AS rel
              FROM qt JOIN tf USING (term) GROUP BY 1, 2),
    j AS (SELECT t.qid, t.rank, coalesce(q.rel, 0) AS rel
          FROM topk t LEFT JOIN qrels q
               ON q.qid = t.qid AND q.doc_id = t.doc_id),
    hit AS (SELECT qid, rank, rel,
                   (pow(2.0::DOUBLE, rel) - 1.0::DOUBLE)
                     / log2(rank + 1.0::DOUBLE) AS dg,
                   (pow(2.0::DOUBLE, rel) - 1.0::DOUBLE) / 8.0::DOUBLE AS rp
            FROM j),
    errt AS (SELECT qid, rank, rp,
                    coalesce(product(1.0::DOUBLE - rp)
                             OVER (PARTITION BY qid ORDER BY rank
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 1.0::DOUBLE) AS pfx
             FROM hit),
    base AS (SELECT qid, count(*) AS retrieved,
                    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS rel_hits,
                    min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
                    sum(dg) AS dcg FROM hit GROUP BY 1),
    errs AS (SELECT qid, sum(rp * pfx / rank) AS err FROM errt GROUP BY 1),
    nrel AS (SELECT qid, count(*) AS n_rel FROM qrels WHERE rel > 0 GROUP BY 1),
    ideal AS (SELECT qid,
                     sum((pow(2.0::DOUBLE, rel) - 1.0::DOUBLE)
                         / log2(irank + 1.0::DOUBLE)) AS idcg
              FROM (SELECT qid, rel, doc_id,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY rel DESC, doc_id) AS irank
                    FROM qrels WHERE rel > 0)
              WHERE irank <= {K} GROUP BY 1)
    SELECT b.qid, b.retrieved,
           round(b.rel_hits::DOUBLE / b.retrieved, 6) AS precision_k,
           round(CASE WHEN coalesce(n.n_rel, 0) > 0
                      THEN b.rel_hits::DOUBLE / n.n_rel
                      ELSE 0.0::DOUBLE END, 6) AS recall_k,
           round(CASE WHEN b.first_rel IS NOT NULL
                      THEN 1.0::DOUBLE / b.first_rel
                      ELSE 0.0::DOUBLE END, 6) AS rr,
           round(b.dcg, 6) AS dcg_k,
           round(CASE WHEN coalesce(i.idcg, 0.0::DOUBLE) > 0
                      THEN b.dcg / i.idcg ELSE 0.0::DOUBLE END, 6) AS ndcg_k,
           round(e.err, 6) AS err_k
    FROM base b LEFT JOIN nrel n USING (qid) LEFT JOIN ideal i USING (qid)
         JOIN errs e USING (qid)"""
    return fn, sql


def q_percolate_matches() -> Entry:
    """Percolator / reverse search (query/percolate.py; ES percolate,
    Lucene Monitor): six standing subscriptions evaluated against every
    document — (doc_id, pqid) match pairs. The twin re-derives the
    clause algebra (must conjunction, msm threshold, must_not veto,
    should-only ≥1) from the registered-term VALUES."""
    from dpr_spark.query.percolate import PercolatorQuery

    PERC = [
        PercolatorQuery(0, must=("spark",)),
        PercolatorQuery(1, must=("customer", "join")),
        PercolatorQuery(2, should=("fast", "scan", "sort"), msm=2),
        PercolatorQuery(3, must=("table",), must_not=("spark",)),
        PercolatorQuery(4, should=("window", "key")),
        PercolatorQuery(5, must=("zzznope",)),  # OOV -> no pairs
    ]

    def fn(spark, sf_dir):
        from dpr_spark.query.percolate import percolate, register_queries

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        reg = register_queries(spark, PERC)
        return percolate(docs, reg)

    # registered rows rebuilt inline (same normalization chain)
    from dpr_spark.query.percolate import register_queries as _rq

    class _Cap:
        def createDataFrame(self, rows, schema):
            self.rows = rows
            return rows

    cap = _Cap()
    _rq(cap, PERC)
    vals = ", ".join(
        f"({p}, '{t}', '{c}', {nm}, {ms})" for p, t, c, nm, ms in cap.rows
    )
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    dterms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
    reg AS (SELECT * FROM (VALUES {vals})
            AS r(pqid, term, clause, n_must, msm)),
    agg AS (
      SELECT d.doc_id, r.pqid, max(r.n_must) AS n_must, max(r.msm) AS msm,
             sum(CASE WHEN r.clause = 'must' THEN 1 ELSE 0 END) AS must_hits,
             sum(CASE WHEN r.clause = 'should' THEN 1 ELSE 0 END) AS should_hits,
             sum(CASE WHEN r.clause = 'must_not' THEN 1 ELSE 0 END) AS neg_hits
      FROM dterms d JOIN reg r USING (term) GROUP BY 1, 2)
    SELECT doc_id, pqid FROM agg
    WHERE must_hits = n_must AND should_hits >= msm AND neg_hits = 0
      AND (n_must > 0 OR should_hits >= greatest(msm, 1))"""
    return fn, sql


REGEXP_QUERIES = [
    (0, "sp[a-z]+k"),
    (1, "win.*"),
    (2, "jo.n|sort"),   # alternation: no pushable prefix, still correct
    (3, "ta[b-d]le"),
    (4, "zzz[0-9]+"),   # matches nothing
]
REGEXP_EXP = 8


def q_regexp_topk() -> Entry:
    """Regexp top-10 (Lucene RegexpQuery twin, query/boolquery.py
    regexp_search): anchored Java/RE2-shared regex over the term
    dictionary, expanded to the {REGEXP_EXP} highest-df matches and
    scored as a disjunction; required literal prefixes push into the
    dictionary scan (tests/test_regexp.py plan assert)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import regexp_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = regexp_search(
            spark, REGEXP_QUERIES, idx, k=10, max_expansions=REGEXP_EXP
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    rx_values = ", ".join(
        f"({qid}, '^(?:{p})$')" for qid, p in REGEXP_QUERIES
    )
    sql = f"""
    WITH {_POS_CTES},
    p AS (SELECT * FROM (VALUES {rx_values}) AS p(qid, rx)),
    exp AS (
      SELECT p.qid, d.term,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY d.df DESC, d.term) AS r
      FROM p JOIN dict d ON regexp_matches(d.term, p.rx)),
    qt2 AS (SELECT qid, term FROM exp WHERE r <= {REGEXP_EXP}),
    scored AS (
      SELECT qt2.qid, tf.doc_id, sum({_BM25_COMPONENT}) AS score
      FROM qt2 JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


SUGGEST_PREFIXES = [(0, "sp"), (1, "wi"), (2, "jo"), (3, "ta"), (4, "zz")]


def q_suggest_topn() -> Entry:
    """Completion suggester (query/suggest.py; Lucene suggest module fed
    from index terms): top-5 df-weighted vocabulary completions per
    prefix, weight desc / term asc; the prefix condition pushes to the
    dictionary scan."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.suggest import suggest_completions

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        return suggest_completions(spark, SUGGEST_PREFIXES, idx, n=5)

    pvals = ", ".join(f"({qid}, '{p}')" for qid, p in SUGGEST_PREFIXES)
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
    dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    p AS (SELECT * FROM (VALUES {pvals}) AS p(qid, prefix)),
    cand AS (
      SELECT p.qid, d.term, d.df AS weight,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY d.df DESC, d.term ASC) AS rank
      FROM p JOIN dict d ON starts_with(d.term, p.prefix))
    SELECT qid, rank, term, weight FROM cand WHERE rank <= 5"""
    return fn, sql


FUZZY_SUGGEST_PREFIXES = [(0, "spar"), (1, "spqr"), (2, "custm"), (3, "wi")]


def q_suggest_fuzzy_topn() -> Entry:
    """Typo-tolerant autocomplete (Lucene FuzzySuggester, its default
    guards; query/suggest.py suggest_completions_fuzzy): a term
    completes a typed prefix when some term-prefix within one char of
    the typed length is within 1 edit — the first char stays exact
    (nonFuzzyPrefix=1) and prefixes under 3 chars match exactly
    (minFuzzyLength=3). Exact completions rank first, then df DESC,
    term ASC."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.suggest import suggest_completions_fuzzy

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        return suggest_completions_fuzzy(
            spark, FUZZY_SUGGEST_PREFIXES, idx, n=5
        )

    pvals = ", ".join(f"({qid}, '{p}')" for qid, p in FUZZY_SUGGEST_PREFIXES)
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
    dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    p AS (SELECT * FROM (VALUES {pvals}) AS p(qid, prefix)),
    cand AS (
      SELECT p.qid, p.prefix, d.term, d.df,
             starts_with(d.term, p.prefix) AS ex,
             CASE WHEN starts_with(d.term, p.prefix) THEN 0 ELSE least(
               CASE WHEN length(p.prefix) - 1 >= 1
                    THEN levenshtein(substr(d.term, 1, length(p.prefix) - 1),
                                     p.prefix) ELSE 999 END,
               levenshtein(substr(d.term, 1, length(p.prefix)), p.prefix),
               levenshtein(substr(d.term, 1, length(p.prefix) + 1), p.prefix)
             ) END AS dist
      FROM p JOIN dict d ON length(d.term) >= length(p.prefix) - 1),
    ok AS (
      SELECT * FROM cand
      WHERE ex OR (length(prefix) >= 3
                   AND substr(term, 1, 1) = substr(prefix, 1, 1)
                   AND dist <= 1)),
    r AS (SELECT qid, term, df, dist,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY (dist > 0), df DESC, term) AS rn
          FROM ok)
    SELECT qid, rn::INT AS rank, term, df AS weight, dist::INT AS dist
    FROM r WHERE rn <= 5"""
    return fn, sql


def q_sorted_layout_topk() -> Entry:
    """Index-time sorting + early termination (query/paging.py
    build_sorted_layout / search_sorted_layout; Lucene IndexSorting +
    early-terminating TopFieldCollector): the same sort-by-field
    contract as sort_by_field_topk served from a value-range-bucketed
    postings layout that probes ranges in field order and stops when
    every query holds k matches. The twin is layout-independent (same
    semantics), so a green row PROVES the early-terminated probe set is
    exact."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import build_sorted_layout, search_sorted_layout

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        dv = docs.select(
            "doc_id",
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100003)).alias("warc_ts"),
        )
        sp, _ = build_sorted_layout(idx, dv, "warc_ts", n_ranges=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_sorted_layout(spark, qdf, idx, sp, k=10, ascending=False)
        return res.select("qid", "rank", "doc_id", F.col("value").alias("warc_ts"))

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      dterms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      matches AS (SELECT DISTINCT qt.qid, dterms.doc_id
                  FROM qt JOIN dterms USING (term)),
      dv AS (SELECT doc_id, ((doc_id * 2654435761) % 100003)::DOUBLE AS warc_ts
             FROM documents),
      ranked AS (
        SELECT m.qid, m.doc_id, dv.warc_ts,
               row_number() OVER (PARTITION BY m.qid
                                  ORDER BY dv.warc_ts DESC, m.doc_id) AS rank
        FROM matches m JOIN dv USING (doc_id))
      SELECT qid, rank, doc_id, warc_ts FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_has_child_topk() -> Entry:
    """Relation join query (query/joinquery.py; ES has_child / Lucene
    ToParentBlockJoinQuery): rank SOURCES by their best-matching page —
    score(parent) = max over child BM25 scores, min_children=2 — the
    'which sites are most relevant' serving question. max mode is
    fold-order-free, so the twin hashes exactly."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.joinquery import has_child_search

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = has_child_search(
            qdf, idx, docs.select("doc_id", F.col("source").alias("parent")),
            score_mode="max", min_children=2, k=10,
        ).select(
            "qid", "parent", F.round("score", 6).alias("score_r"), "n_children"
        )
        # rank re-derived from the 6-dp score on both sides
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("parent"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "parent", "score_r", "n_children"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    withp AS (
      SELECT s.qid, d.source AS parent, s.score
      FROM scored s JOIN documents d USING (doc_id)),
    agg AS (
      SELECT qid, parent, count(*) AS n_children, max(score) AS score
      FROM withp GROUP BY 1, 2),
    ranked_p AS (
      SELECT qid, parent, round(score, 6) AS score_r, n_children,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, parent) AS rank
      FROM agg WHERE n_children >= 2)
    SELECT qid, rank, parent, score_r, n_children FROM ranked_p WHERE rank <= 10"""
    return fn, sql


def _tree_sql_ctes(qid: int, node, counter: list) -> Tuple[str, list]:
    """Recursively emit one CTE per tree node (leaf = per-term BM25
    rows; Bool = grouped/filtered union of its children) — the SQL
    twin mirrors the engine's level fold structurally."""
    from dpr_spark.query.booltree import Bool, T

    nid = counter[0]
    counter[0] += 1
    name = f"n{qid}_{nid}"
    if isinstance(node, T):
        cte = (
            f"{name} AS (SELECT tf.doc_id, {node.boost!r} * {_BM25_COMPONENT} AS score"
            f" FROM tf JOIN dict USING (term) JOIN ds ON tf.doc_id = ds.doc_id"
            f" CROSS JOIN stats WHERE tf.term = '{node.text}')"
        )
        return name, [cte]
    ctes: list = []
    tagged = []
    for clause, children in (
        ("must", node.must), ("should", node.should), ("must_not", node.must_not)
    ):
        for c in children:
            cname, sub = _tree_sql_ctes(qid, c, counter)
            ctes.extend(sub)
            tagged.append(f"SELECT doc_id, '{clause}' AS clause, score FROM {cname}")
    need_sh = node.msm if (node.must or node.msm) else 1
    union = " UNION ALL ".join(tagged)
    cte = (
        f"{name} AS (SELECT doc_id, {node.boost!r} * score AS score FROM ("
        f" SELECT doc_id,"
        f" sum(CASE WHEN clause = 'must' THEN 1 ELSE 0 END) AS mh,"
        f" sum(CASE WHEN clause = 'should' THEN 1 ELSE 0 END) AS sh,"
        f" sum(CASE WHEN clause = 'must_not' THEN 1 ELSE 0 END) AS nh,"
        f" sum(CASE WHEN clause <> 'must_not' THEN score ELSE 0 END) AS score"
        f" FROM ({union}) GROUP BY doc_id)"
        f" WHERE mh = {len(node.must)} AND nh = 0 AND sh >= {need_sh})"
    )
    ctes.append(cte)
    return name, ctes


def _bool_trees():
    from dpr_spark.query.booltree import Bool, T

    return [
        (0, Bool(must=[Bool(should=[T("spark"), T("window")])],
                 must_not=[T("batch")])),
        (1, Bool(should=[
                Bool(must=[T("customer"), T("join")], boost=2.0),
                Bool(should=[T("fast"), T("scan"), T("sort")], msm=2),
                T("table", boost=0.5),
            ], msm=1)),
        (2, Bool(must=[T("key")], must_not=[Bool(must=[T("spark"), T("window")])])),
    ]


def q_bool_tree_topk() -> Entry:
    """Nested boolean query trees (query/booltree.py; the full Lucene
    BooleanQuery composition — clauses are themselves queries): three
    depth-2/3 trees with msm, boosts, and a must_not SUBTREE. The twin
    generates one CTE per node recursively, mirroring the engine's
    level-synchronous fold."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.booltree import bool_tree_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = bool_tree_search(spark, _bool_trees(), idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    all_ctes: list = []
    roots = []
    for qid, root in _bool_trees():
        name, ctes = _tree_sql_ctes(qid, root, [0])
        all_ctes.extend(ctes)
        roots.append(f"SELECT {qid} AS qid, doc_id, score FROM {name}")
    sql = f"""
    WITH {_POS_CTES}, {", ".join(all_ctes)},
    allroots AS ({" UNION ALL ".join(roots)}),
    ranked_t AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM allroots)
    SELECT qid, rank, doc_id, score_r FROM ranked_t WHERE rank <= 10"""
    return fn, sql


DEDUP_CLUSTER_THRESHOLD = 0.5


def q_dedup_clusters() -> Entry:
    """Near-dup CLUSTERING (extras/dedup.py connected_components /
    dedup_clusters): MinHash-LSH pairs (the q_minhash_lsh pipeline,
    est_jaccard ≥ {threshold}) -> duplicate clusters via iterative
    min-label propagation; component = min doc_id (the canonical doc a
    pipeline keeps). The twin replays the MinHash SQL and closes the
    pairs transitively with a RECURSIVE CTE — exact, engine-independent
    components."""
    P = 2147483647
    NUM_PERM, BANDS, RPB = 16, 4, 4
    a = [((i * 2 + 1) * 40503) % P for i in range(1, NUM_PERM + 1)]
    b = [((i * 7 + 3) * 69069) % P for i in range(1, NUM_PERM + 1)]

    def fn(spark, sf_dir):
        from dpr_spark.extras.dedup import (
            dedup_clusters,
            lsh_candidate_pairs,
            minhash_signatures,
            portable_hash60,
        )

        docs = _docs(spark, sf_dir)
        sig = minhash_signatures(docs, num_perm=NUM_PERM, hash_fn=portable_hash60)
        pairs = (
            lsh_candidate_pairs(sig, bands=BANDS, rows_per_band=RPB, hash_keys=False)
            .filter(F.col("est_jaccard") >= DEDUP_CLUSTER_THRESHOLD)
            .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        )
        return dedup_clusters(docs, pairs)

    from dpr_spark.functions.tokenizer import duckdb_tokenize_sql

    perm_vals = ", ".join(f"({j}, {a[j]}, {b[j]})" for j in range(NUM_PERM))
    match_terms = " + ".join(
        f"(CASE WHEN siga[{j + 1}] = sigb[{j + 1}] THEN 1 ELSE 0 END)"
        for j in range(NUM_PERM)
    )
    sql = f"""
      WITH RECURSIVE tok AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
      sh0 AS (SELECT DISTINCT doc_id AS doc,
                     array_to_string(toks[i + 1 : i + 3], ' ') AS shingle
              FROM tok, unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS t(i)),
      sh AS (SELECT doc, shingle FROM sh0 WHERE shingle != ''),
      sid AS (SELECT doc,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {P} AS sid
              FROM sh),
      perm AS (SELECT * FROM (VALUES {perm_vals}) AS p(j, a, b)),
      mins AS (SELECT doc, j, min((sid * a + b) % {P}) AS mv
               FROM sid CROSS JOIN perm GROUP BY 1, 2),
      sig AS (SELECT doc, list(mv ORDER BY j) AS sig FROM mins GROUP BY doc),
      banded AS (SELECT doc, sig, band,
                        array_to_string(sig[band * {RPB} + 1 : band * {RPB} + {RPB}], '_') AS key
                 FROM sig, unnest(range(0, {BANDS})) AS t(band)),
      cpairs AS (SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
                        x.sig AS siga, y.sig AS sigb
                 FROM banded x JOIN banded y
                   ON x.band = y.band AND x.key = y.key AND x.doc < y.doc),
      dpairs AS (SELECT doc_a, doc_b FROM cpairs
                 WHERE ({match_terms}) / {NUM_PERM}.0 >= {DEDUP_CLUSTER_THRESHOLD}),
      edges AS (SELECT doc_a AS x, doc_b AS y FROM dpairs
                UNION SELECT doc_b, doc_a FROM dpairs),
      reach AS (
        SELECT x AS node, x AS lab FROM edges
        UNION
        SELECT e.x, r.lab FROM edges e JOIN reach r ON e.y = r.node),
      comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
      SELECT d.doc_id,
             coalesce(c.component, d.doc_id) AS component,
             (coalesce(c.component, d.doc_id) = d.doc_id) AS is_canonical
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node"""
    return fn, sql


def q_significant_terms() -> Entry:
    """ES significant_terms over the match set (query/aggs.py): top-5
    terms per query by the JLH heuristic (fg%−bg%)·(fg%/bg%), fg_count
    = matching docs containing the term, min_fg=2. Exact — no shard
    approximation or sampling. Rank re-derived from round(score, 6) on
    both sides (the score is closed-form over integer counts)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import significant_terms

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = significant_terms(qdf, idx, size=5, min_fg=2).select(
            "qid", "term", "fg_count", "bg_count",
            F.round("score", 6).alias("score_r"),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("term"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "term", "fg_count", "bg_count", "score_r"
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    nmatch AS (SELECT qid, count(*) AS n_matches FROM matches GROUP BY 1),
    stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
    dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    fg AS (
      SELECT m.qid, tf.term, count(*) AS fg_count
      FROM matches m JOIN tf USING (doc_id) GROUP BY 1, 2
      HAVING count(*) >= 2),
    scored AS (
      SELECT fg.qid, fg.term, fg.fg_count, dict.df AS bg_count,
             ((fg.fg_count / nm.n_matches) - (dict.df / stats.n))
             * ((fg.fg_count / nm.n_matches) / (dict.df / stats.n)) AS score
      FROM fg JOIN dict USING (term) JOIN nmatch nm USING (qid)
           CROSS JOIN stats),
    ranked_s AS (
      SELECT qid, term, fg_count, bg_count, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, term) AS rank
      FROM scored)
    SELECT qid, rank, term, fg_count, bg_count, score_r
    FROM ranked_s WHERE rank <= 5"""
    return fn, sql


def q_histogram_agg() -> Entry:
    """ES `histogram` aggregation over the match set (query/aggs.py):
    floor(n_chars/200)*200 buckets per query with min_doc_count=0 —
    empty buckets between the observed min and max are filled
    (sequence+explode in Spark, generate_series in the twin)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import histogram_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return histogram_agg(
            qdf, idx, docs.select("doc_id", "n_chars"), "n_chars",
            interval=200.0, min_doc_count=0,
        ).select("qid", F.round("bucket", 6).alias("bucket"), "count")

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    counts AS (
      SELECT m.qid, floor(d.n_chars / 200.0)::BIGINT AS b, count(*) AS cnt
      FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2),
    span AS (SELECT qid, min(b) AS lo, max(b) AS hi FROM counts GROUP BY 1),
    dense AS (
      SELECT s.qid, gs.b
      FROM span s, LATERAL unnest(generate_series(s.lo, s.hi)) AS gs(b))
    SELECT d.qid, round(d.b::DOUBLE * 200.0::DOUBLE, 6) AS bucket,
           coalesce(c.cnt, 0)::BIGINT AS count
    FROM dense d LEFT JOIN counts c ON d.qid = c.qid AND d.b = c.b"""
    return fn, sql


def q_date_histogram_agg() -> Entry:
    """ES `date_histogram` (calendar_interval=week) over the match set
    (query/aggs.py): weekly crawl-volume per query. The page table's
    `warc_ts` is synthesized identically in both engines (2025-01-01 +
    doc_id%45 days — the testdata documents table carries no timestamp);
    buckets are ISO-Monday date_trunc('week') in Spark and DuckDB."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import date_histogram_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = date_histogram_agg(qdf, idx, vals, "warc_ts", unit="week")
        return res.select(
            "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())}
    SELECT m.qid,
           strftime(date_trunc('week',
                    DATE '2025-01-01' + (m.doc_id % 45)::INT), '%Y-%m-%d')
             AS week,
           count(*) AS count
    FROM matches m GROUP BY 1, 2"""
    return fn, sql


def q_pipeline_aggs() -> Entry:
    """ES pipeline aggregations (query/aggs.py::pipeline_metrics +
    bucket_sort): weekly date_histogram per query -> derivative,
    cumulative_sum, moving 3-bucket unweighted average -> bucket_sort
    keeps each query's top-5 weeks by count (ties by week). All metric
    math is integer-derived (counts), so both engines agree bit-exactly;
    weeks order lexicographically == chronologically."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import bucket_sort, date_histogram_agg, pipeline_metrics

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        hist = date_histogram_agg(qdf, idx, vals, "warc_ts", unit="week").select(
            "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
        )
        met = pipeline_metrics(hist, order_col="week", window=3)
        return bucket_sort(met, sort_col="count", tiebreak_col="week", size=5)

    sql = f"""
    WITH {{MATCH}},
    hist AS (
      SELECT m.qid,
             strftime(date_trunc('week',
                      DATE '2025-01-01' + (m.doc_id % 45)::INT), '%Y-%m-%d')
               AS week,
             count(*) AS count
      FROM matches m GROUP BY 1, 2),
    met AS (
      SELECT qid, week, count,
             coalesce(count::DOUBLE - lag(count::DOUBLE) OVER
                        (PARTITION BY qid ORDER BY week), 0.0::DOUBLE) AS deriv,
             sum(count) OVER (PARTITION BY qid ORDER BY week
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                             )::BIGINT AS cum,
             round(avg(count::DOUBLE) OVER (PARTITION BY qid ORDER BY week
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS mov_avg
      FROM hist),
    cut AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY count DESC, week) AS rn
      FROM met)
    SELECT qid, week, count, deriv, cum, mov_avg FROM cut WHERE rn <= 5"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


GEO_LAT_SQL = "(-60.0::DOUBLE + ((doc_id * 7919) % 12000)::DOUBLE / 100.0::DOUBLE)"
GEO_LON_SQL = "(-150.0::DOUBLE + ((doc_id * 104729) % 30000)::DOUBLE / 100.0::DOUBLE)"

GEO_QUERIES = [
    (0, 10.0, 20.0, 3000.0),
    (1, -45.5, -120.25, 2500.0),
    (2, 55.25, 140.0, 2000.0),
    (3, 0.0, 0.0, 4000.0),
]


def _doc_geo(spark, sf_dir):
    """Deterministic per-doc coordinates (integer-derived doubles, so
    both engines hold bit-identical lat/lon): lat in [-60, 60), lon in
    [-150, 150) — clear of the mercator cut and the antimeridian."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(-60.0) + F.pmod(F.col("doc_id") * 7919, F.lit(12000)) / F.lit(100.0)).alias("lat"),
        (F.lit(-150.0) + F.pmod(F.col("doc_id") * 104729, F.lit(30000)) / F.lit(100.0)).alias("lon"),
    )


def q_geo_distance_topk() -> Entry:
    """ES geo_distance query + sort-by-_geo_distance (query/geo.py):
    per-query bounding-box prefilter (a pushed-down range predicate —
    Lucene's BKD box visit), exact haversine on survivors, nearest
    first. Distances round to 6 dp before the radius test and the rank
    so last-ulp trig differences can't flip either."""

    def fn(spark, sf_dir):
        from dpr_spark.query.geo import geo_distance_search

        geo = _doc_geo(spark, sf_dir)
        return geo_distance_search(spark, GEO_QUERIES, geo, k=10).select(
            "qid", "rank", "doc_id", F.col("dist").alias("dist_r")
        )

    qvals = ", ".join(
        f"({qid}, {lat!r}::DOUBLE, {lon!r}::DOUBLE, {r!r}::DOUBLE)"
        for qid, lat, lon, r in GEO_QUERIES
    )
    sql = f"""
    WITH geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
                 FROM documents),
    gq AS (SELECT * FROM (VALUES {qvals}) AS q(qid, qlat, qlon, radius)),
    hav AS (
      SELECT gq.qid, geo.doc_id,
             round(2.0::DOUBLE * 6371.0088::DOUBLE * asin(sqrt(
               sin(radians(geo.lat - gq.qlat) / 2.0::DOUBLE)
                 * sin(radians(geo.lat - gq.qlat) / 2.0::DOUBLE)
               + cos(radians(gq.qlat)) * cos(radians(geo.lat))
                 * sin(radians(geo.lon - gq.qlon) / 2.0::DOUBLE)
                 * sin(radians(geo.lon - gq.qlon) / 2.0::DOUBLE)
             )), 6) AS dist
      FROM gq JOIN geo ON TRUE),
    hits_g AS (SELECT * FROM hav JOIN gq USING (qid) WHERE dist <= radius),
    ranked_g AS (
      SELECT qid, doc_id, dist AS dist_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY dist, doc_id) AS rank
      FROM hits_g)
    SELECT qid, rank, doc_id, dist_r FROM ranked_g WHERE rank <= 10"""
    return fn, sql


def q_geotile_grid_agg() -> Entry:
    """ES geotile_grid aggregation over the match set (query/geo.py):
    slippy-map tiles at zoom 5, top-5 tiles per query by doc count
    (ties by tile coords). Tile indices are floor() of the mercator
    transform on bit-identical inputs — integer cross-engine."""
    ZOOM, SIZE = 5, 5

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches
        from dpr_spark.query.geo import geotile_grid_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        pts = _matches(qdf, idx).join(_doc_geo(spark, sf_dir), "doc_id")
        return geotile_grid_agg(pts, zoom=ZOOM, size=SIZE)

    n = 1 << ZOOM
    sql = f"""
    WITH {{MATCH}},
    geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
            FROM documents),
    tiles AS (
      SELECT m.qid,
             floor((geo.lon + 180.0::DOUBLE) / 360.0::DOUBLE
                   * {n}.0::DOUBLE)::BIGINT AS tile_x,
             floor((1.0::DOUBLE
                    - ln(tan(radians(geo.lat))
                         + 1.0::DOUBLE / cos(radians(geo.lat))) / pi())
                   / 2.0::DOUBLE * {n}.0::DOUBLE)::BIGINT AS tile_y
      FROM matches m JOIN geo USING (doc_id)),
    counts AS (SELECT qid, tile_x, tile_y, count(*) AS count
               FROM tiles GROUP BY 1, 2, 3),
    ranked_t AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY count DESC, tile_x, tile_y) AS rank
      FROM counts)
    SELECT qid, rank, tile_x, tile_y, count FROM ranked_t WHERE rank <= {SIZE}"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


RING_ORIGIN_LAT, RING_ORIGIN_LON = -5.0, 40.0
RING_EDGES = [1000.0, 3000.0, 7000.0]


def q_geo_distance_rings() -> Entry:
    """ES `geo_distance` aggregation (query/geo.py::
    geo_distance_rings_agg): distance rings around one origin over each
    query's match set — every ring reported (empty rings count 0, the
    ES dense-response shape), half-open [from, to) bounds, haversine
    rounded to 6 dp before the edge test. One Catalyst pass: no UDF,
    no per-ring scan."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches
        from dpr_spark.query.geo import geo_distance_rings_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        pts = _matches(qdf, idx).join(_doc_geo(spark, sf_dir), "doc_id")
        return geo_distance_rings_agg(
            pts, RING_ORIGIN_LAT, RING_ORIGIN_LON, RING_EDGES
        )

    bounds_vals = ", ".join(
        f"({i}, {0.0 if i == 0 else RING_EDGES[i - 1]!r}::DOUBLE, "
        + (f"{RING_EDGES[i]!r}::DOUBLE" if i < len(RING_EDGES) else "NULL::DOUBLE")
        + ")"
        for i in range(len(RING_EDGES) + 1)
    )
    case_rings = "CASE "
    for i, e in enumerate(RING_EDGES):
        case_rings += f"WHEN dist < {e!r} THEN {i} "
    case_rings += f"ELSE {len(RING_EDGES)} END"
    sql = f"""
    WITH {{MATCH}},
    geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
            FROM documents),
    hav AS (
      SELECT m.qid,
             round(2.0::DOUBLE * 6371.0088::DOUBLE * asin(sqrt(
               sin(radians(geo.lat - {RING_ORIGIN_LAT!r}) / 2.0::DOUBLE)
                 * sin(radians(geo.lat - {RING_ORIGIN_LAT!r}) / 2.0::DOUBLE)
               + cos(radians({RING_ORIGIN_LAT!r}::DOUBLE)) * cos(radians(geo.lat))
                 * sin(radians(geo.lon - {RING_ORIGIN_LON!r}) / 2.0::DOUBLE)
                 * sin(radians(geo.lon - {RING_ORIGIN_LON!r}) / 2.0::DOUBLE)
             )), 6) AS dist
      FROM matches m JOIN geo USING (doc_id)),
    ringed AS (SELECT qid, {case_rings} AS ring FROM hav),
    counts AS (SELECT qid, ring, count(*) AS count FROM ringed GROUP BY 1, 2),
    bounds AS (SELECT * FROM (VALUES {bounds_vals}) AS b(ring, from_km, to_km)),
    spine AS (SELECT q.qid, b.ring, b.from_km, b.to_km
              FROM (SELECT DISTINCT qid FROM matches) q CROSS JOIN bounds b)
    SELECT s.qid, s.ring, s.from_km, s.to_km,
           coalesce(c.count, 0) AS count
    FROM spine s LEFT JOIN counts c ON s.qid = c.qid AND s.ring = c.ring"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


DF_ORIGIN_LAT, DF_ORIGIN_LON, DF_PIVOT_KM, DF_BOOST = 10.0, 20.0, 1500.0, 2.0


def q_distance_feature_topk() -> Entry:
    """ES distance_feature query: BM25 + boost * pivot/(pivot + dist)
    — docs near the origin rise without geo being a filter. Engine:
    funcscore's sum boost_mode with the haversine column (query/geo.py)
    as the doc value; twin recomputes the identical formula over the
    shared BM25 CTEs. dist rounds to 6 dp before the boost so the trig
    ulp can't move the 6-dp-rounded final score across a tie."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.funcscore import search_function_score
        from dpr_spark.query.geo import haversine_km

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        geo = _doc_geo(spark, sf_dir).select(
            "doc_id",
            F.round(
                haversine_km(
                    F.lit(DF_ORIGIN_LAT), F.lit(DF_ORIGIN_LON),
                    F.col("lat"), F.col("lon"),
                ),
                6,
            ).alias("dist"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_function_score(
            qdf, idx, geo, "dist",
            lambda c: F.lit(DF_BOOST) * F.lit(DF_PIVOT_KM) / (F.lit(DF_PIVOT_KM) + c),
            boost_mode="sum", k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
            FROM documents),
    dist AS (
      SELECT doc_id,
             round(2.0::DOUBLE * 6371.0088::DOUBLE * asin(sqrt(
               sin(radians(lat - {DF_ORIGIN_LAT!r}) / 2.0::DOUBLE)
                 * sin(radians(lat - {DF_ORIGIN_LAT!r}) / 2.0::DOUBLE)
               + cos(radians({DF_ORIGIN_LAT!r}::DOUBLE)) * cos(radians(lat))
                 * sin(radians(lon - {DF_ORIGIN_LON!r}) / 2.0::DOUBLE)
                 * sin(radians(lon - {DF_ORIGIN_LON!r}) / 2.0::DOUBLE)
             )), 6) AS dist
      FROM geo),
    boosted AS (
      SELECT s.qid, s.doc_id,
             s.score + {DF_BOOST!r}::DOUBLE * {DF_PIVOT_KM!r}::DOUBLE
                       / ({DF_PIVOT_KM!r}::DOUBLE + d.dist) AS score
      FROM scored s JOIN dist d USING (doc_id)),
    ranked_df AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM boosted)
    SELECT qid, rank, doc_id, score_r FROM ranked_df WHERE rank <= 10"""
    return fn, sql


def q_auto_date_histogram() -> Entry:
    """ES auto_date_histogram (query/aggs.py::auto_date_histogram_agg):
    per query, the finest calendar unit (day/week/month/quarter/year)
    whose distinct-bucket count fits 10; the doc_id%400-day timestamp
    spread makes different queries pick different units. Pure calendar
    + integer math — bit-identical cross-engine."""
    TARGET = 10

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import auto_date_histogram_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(400)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return auto_date_histogram_agg(
            qdf, idx, vals, "warc_ts", target_buckets=TARGET
        )

    units = ["day", "week", "month", "quarter", "year"]
    n_cols = ", ".join(
        f"count(DISTINCT date_trunc('{u}', ts)) AS n_{u}" for u in units
    )
    chosen = " ".join(
        f"WHEN n_{u} <= {TARGET} THEN '{u}'" for u in units[:-1]
    )
    bucket_case = " ".join(
        f"WHEN s.unit = '{u}' THEN date_trunc('{u}', m.ts)" for u in units
    )
    sql = f"""
    WITH {{MATCH}},
    mt AS (SELECT m.qid, m.doc_id,
                  (DATE '2025-01-01' + (m.doc_id % 400)::INT)::TIMESTAMP AS ts
           FROM matches m),
    cnt AS (SELECT qid, {n_cols} FROM mt GROUP BY qid),
    sel AS (SELECT qid, CASE {chosen} ELSE 'year' END AS unit FROM cnt)
    SELECT m.qid, s.unit,
           strftime(CASE {bucket_case} END, '%Y-%m-%d') AS bucket,
           count(*) AS count
    FROM mt m JOIN sel s USING (qid)
    GROUP BY 1, 2, 3"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_terms_set_topk() -> Entry:
    """ES terms_set query (query/boolquery.py::terms_set_search): each
    doc declares its own minimum_should_match in a stored field (here
    msm = 1 + doc_id % 3, the same derivation in both engines); a doc
    matches when it hits at least that many of the query's terms, and
    scores the BM25 sum over the matched terms."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import terms_set_search

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id", (F.lit(1) + F.pmod("doc_id", F.lit(3))).alias("msm")
        )
        res = terms_set_search(spark, BENCH_QUERIES, idx, vals, "msm", k=10)
        return res.select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        ).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
            ),
        ).select("qid", "rank", "doc_id", "score_r")

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    hitcnt AS (
      SELECT qt.qid, tf.doc_id, count(*) AS n_hits,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                 * tf.tf * {BM25_K1 + 1.0}
                 / (tf.tf + {BM25_K1}
                    * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             ) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ts AS (
      SELECT h.qid, h.doc_id, h.score
      FROM hitcnt h JOIN documents d ON d.doc_id = h.doc_id
      WHERE h.n_hits >= 1 + d.doc_id % 3),
    ranked_ts AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM ts)
    SELECT qid, rank, doc_id, score_r FROM ranked_ts WHERE rank <= 10"""
    return fn, sql


def q_sibling_pipeline_aggs() -> Entry:
    """ES sibling + normalize pipeline aggregations (query/aggs.py::
    sibling_bucket_metrics, normalize_agg): weekly date_histogram per
    query -> per-bucket percent_of_sum share, joined with the per-query
    avg/sum/min/max/stats_bucket summary. All inputs are counts, so the
    divisions are integer-derived and bit-identical cross-engine."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import (
            date_histogram_agg,
            normalize_agg,
            sibling_bucket_metrics,
        )

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        hist = date_histogram_agg(qdf, idx, vals, "warc_ts", unit="week").select(
            "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
        )
        shares = normalize_agg(hist, method="percent_of_sum")
        sib = sibling_bucket_metrics(hist)
        return shares.join(sib, "qid").select(
            "qid", "week", "count", F.col("share").alias("share_r"),
            F.col("avg_bucket").alias("avg_bucket_r"),
            "sum_bucket", "min_bucket", "max_bucket", "n_buckets",
        )

    sql = f"""
    WITH {{MATCH}},
    hist AS (
      SELECT m.qid,
             strftime(date_trunc('week',
                      DATE '2025-01-01' + (m.doc_id % 45)::INT), '%Y-%m-%d')
               AS week,
             count(*) AS count
      FROM matches m GROUP BY 1, 2),
    shares AS (
      SELECT qid, week, count,
             round(count::DOUBLE
                   / sum(count::DOUBLE) OVER (PARTITION BY qid), 6) AS share_r
      FROM hist),
    sib AS (
      SELECT qid,
             round(avg(count::DOUBLE), 6) AS avg_bucket_r,
             sum(count)::BIGINT AS sum_bucket,
             min(count)::BIGINT AS min_bucket,
             max(count)::BIGINT AS max_bucket,
             count(*)::BIGINT AS n_buckets
      FROM hist GROUP BY qid)
    SELECT s.qid, s.week, s.count, s.share_r,
           b.avg_bucket_r, b.sum_bucket, b.min_bucket, b.max_bucket,
           b.n_buckets
    FROM shares s JOIN sib b USING (qid)"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_diversified_sampler() -> Entry:
    """ES diversified_sampler -> terms (query/aggs.py::sampler_agg): per
    query, cap matches at 2 docs per source, take the 30 best by
    (round(score,6) DESC, doc_id), count the sample per source. The
    deterministic total order makes the sample itself — not just the
    counts — identical cross-engine."""
    SHARD, PER_VALUE = 30, 2

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import sampler_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return sampler_agg(
            qdf, idx, docs.select("doc_id", "source"), "source",
            shard_size=SHARD, max_docs_per_value=PER_VALUE,
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    dv AS (SELECT s.qid, s.doc_id, round(s.score, 6) AS sr, d.source AS value
           FROM scored s JOIN documents d USING (doc_id)),
    capped AS (
      SELECT *, row_number() OVER (PARTITION BY qid, value
                                   ORDER BY sr DESC, doc_id) AS rnv
      FROM dv),
    samp AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY sr DESC, doc_id) AS rn
      FROM capped WHERE rnv <= {PER_VALUE})
    SELECT qid, value, count(*) AS count
    FROM samp WHERE rn <= {SHARD} GROUP BY 1, 2"""
    return fn, sql


def q_percentiles_agg() -> Entry:
    """ES `percentiles` aggregation over the match set (query/aggs.py),
    EXACT path: linear-interpolated quantiles of n_chars at p25/50/75/95
    per query — Spark's exact `percentile` and DuckDB's `quantile_cont`
    share the textbook definition, so values match at 6 dp. (The sketch
    path — percentile_approx, the 100 TB route — is pytest-verified
    against its rank-error bound instead.)"""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import percentiles_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = percentiles_agg(
            qdf, idx, docs.select("doc_id", "n_chars"), "n_chars",
            pcts=(0.25, 0.5, 0.75, 0.95),
        )
        return res.select("qid", "pct", F.round("value", 6).alias("value_r"))

    # quantile_cont takes CONSTANT percentiles only in DuckDB — one
    # branch per pct, unioned (each re-reads the tiny matches CTE)
    branches = "\n    UNION ALL\n".join(
        f"""    SELECT qid, {p}::DOUBLE AS pct,
           round(quantile_cont(v, {p}), 6) AS value_r FROM mv GROUP BY 1"""
        for p in (0.25, 0.5, 0.75, 0.95)
    )
    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, d.n_chars::DOUBLE AS v
           FROM matches m JOIN documents d USING (doc_id))
{branches}"""
    return fn, sql


def q_cardinality_agg() -> Entry:
    """ES `cardinality` aggregation over the match set (query/aggs.py),
    EXACT path: distinct `source` values per query via the two-level
    (qid, value) distinct — no single task holds a query's value set.
    (The HLL++ path — approx_count_distinct — is pytest-verified within
    its rsd bound.)"""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import cardinality_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return cardinality_agg(
            qdf, idx, docs.select("doc_id", "source"), "source"
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())}
    SELECT m.qid, count(DISTINCT d.source) AS cardinality
    FROM matches m JOIN documents d USING (doc_id) GROUP BY 1"""
    return fn, sql


def q_top_hits_agg() -> Entry:
    """ES `top_hits` inside a `terms` bucket (query/aggs.py): the top-2
    highest-BM25 matched docs per (query, source) — "best page per
    source for q" in one plan. Rank on round(score, 6) in both engines
    (the cross-engine tie discipline); the per-bucket cap is the exact
    salted two-level top-N."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import top_hits_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = top_hits_agg(
            qdf, idx, docs.select("doc_id", "source"), "source",
            size=2, score_round=6, salt_buckets=4,
        )
        return res.select(
            "qid", "value", "rank", "doc_id",
            F.round("score", 6).alias("score_r"),
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    th AS (
      SELECT s.qid, d.source AS value, s.doc_id, round(s.score, 6) AS score_r,
             row_number() OVER (PARTITION BY s.qid, d.source
                                ORDER BY round(s.score, 6) DESC, s.doc_id)
               AS rank
      FROM scored s JOIN documents d USING (doc_id))
    SELECT qid, value, rank, doc_id, score_r FROM th WHERE rank <= 2"""
    return fn, sql


# shared fielded-corpus CTEs (title := first 3 tokens of text, same
# derivation as q_bm25f_topk): per-field tf/df/doclen/avgdl
_FIELDED_CTES = f"""
tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
fdoc AS (
  SELECT doc_id, 0 AS field_id, toks FROM tok
  UNION ALL
  SELECT doc_id, 1 AS field_id, list_slice(toks, 1, 3) AS toks FROM tok),
ds AS (SELECT doc_id, field_id, len(toks) AS doclen FROM fdoc),
stats AS (SELECT field_id, count(*)::DOUBLE AS n, avg(doclen) AS avgdl
          FROM ds GROUP BY 1),
tf AS (SELECT doc_id, field_id, term, count(*) AS tf
       FROM (SELECT doc_id, field_id, unnest(toks) AS term FROM fdoc)
       GROUP BY 1, 2, 3),
dict AS (SELECT field_id, term, count(*) AS df FROM tf GROUP BY 1, 2),
qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term))
"""

_FIELD_W = "(CASE WHEN tf.field_id = 1 THEN 2.0::DOUBLE ELSE 1.0::DOUBLE END)"
_FIELD_TFNORM = (
    f"tf.tf * {BM25_K1 + 1.0} / (tf.tf + {BM25_K1} * "
    f"(1.0 - {BM25_B} + {BM25_B} * ds.doclen / s.avgdl))"
)

MM_TIE = 0.3


def q_multi_match_best_fields() -> Entry:
    """ES multi_match best_fields / Lucene DisjunctionMaxQuery over the
    title^2+text fielded index (query/multimatch.py): per-field BM25
    sums, score = best field + tie_breaker·rest (tie=0.3). Rank from
    round(score, 6) on both sides."""

    def fn(spark, sf_dir):
        from dpr_spark.index.fielded import build_fielded_index
        from dpr_spark.query.multimatch import multi_match_best_fields

        docs = _docs(spark, sf_dir).select(
            "doc_id", "text",
            F.concat_ws(" ", F.slice(_tok_col(), 1, 3)).alias("title"),
        )
        idx = build_fielded_index(
            spark, docs, fields=("text", "title"),
            weights={"text": 1.0, "title": 2.0},
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = multi_match_best_fields(
            qdf, idx, k=10, tie_breaker=MM_TIE
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_FIELDED_CTES.replace("{QTERMS}", _qterm_values_sql())},
    fscore AS (
      SELECT qt.qid, tf.doc_id, tf.field_id,
             {_FIELD_W} * sum(
               ln((s.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
               * {_FIELD_TFNORM}) AS s
      FROM qt
      JOIN dict ON dict.term = qt.term
      JOIN tf ON tf.term = qt.term AND tf.field_id = dict.field_id
      JOIN ds ON ds.doc_id = tf.doc_id AND ds.field_id = tf.field_id
      JOIN stats s ON s.field_id = tf.field_id
      GROUP BY 1, 2, 3),
    agg AS (SELECT qid, doc_id, max(s) AS mx, sum(s) AS sm
            FROM fscore GROUP BY 1, 2),
    ranked2 AS (
      SELECT qid, doc_id,
             round(mx + {MM_TIE}::DOUBLE * (sm - mx), 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(mx + {MM_TIE}::DOUBLE * (sm - mx), 6) DESC,
                        doc_id) AS rank
      FROM agg)
    SELECT qid, rank, doc_id, score_r FROM ranked2 WHERE rank <= 10"""
    return fn, sql


def q_multi_match_cross_fields() -> Entry:
    """ES multi_match cross_fields / Lucene BlendedTermQuery over the
    title^2+text fielded index (query/multimatch.py): per term idf
    blended from max df across fields, best per-field contribution per
    (term, doc), contributions summed. Rank from round(score, 6)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.fielded import build_fielded_index
        from dpr_spark.query.multimatch import multi_match_cross_fields

        docs = _docs(spark, sf_dir).select(
            "doc_id", "text",
            F.concat_ws(" ", F.slice(_tok_col(), 1, 3)).alias("title"),
        )
        idx = build_fielded_index(
            spark, docs, fields=("text", "title"),
            weights={"text": 1.0, "title": 2.0},
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = multi_match_cross_fields(qdf, idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_FIELDED_CTES.replace("{QTERMS}", _qterm_values_sql())},
    bdict AS (SELECT term, max(df) AS df_b FROM dict GROUP BY 1),
    nn AS (SELECT n FROM stats WHERE field_id = 0),
    tcomp AS (
      SELECT qt.qid, tf.doc_id, qt.term,
             max({_FIELD_W}
                 * ln((nn.n - b.df_b + 0.5) / (b.df_b + 0.5) + 1.0)
                 * {_FIELD_TFNORM}) AS comp
      FROM (SELECT DISTINCT qid, term FROM qt) qt
      JOIN bdict b ON b.term = qt.term
      JOIN tf ON tf.term = qt.term
      JOIN ds ON ds.doc_id = tf.doc_id AND ds.field_id = tf.field_id
      JOIN stats s ON s.field_id = tf.field_id
      CROSS JOIN nn
      GROUP BY 1, 2, 3),
    scored2 AS (SELECT qid, doc_id, sum(comp) AS score
                FROM tcomp GROUP BY 1, 2),
    ranked2 AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored2)
    SELECT qid, rank, doc_id, score_r FROM ranked2 WHERE rank <= 10"""
    return fn, sql


TV_DOC_IDS = (7, 42, 105, 311, 499)


def q_term_vectors() -> Entry:
    """ES _termvectors with term_statistics=true (query/termvectors.py;
    Lucene Terms getTermVector): per requested doc, every indexed term
    with tf, corpus df, idf and ascending token positions — served from
    the positional index tables, no retokenization. Positions compare as
    a comma-joined string (the driver's hashable-columns rule)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.termvectors import term_vectors

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = term_vectors(spark, idx, TV_DOC_IDS)
        return res.select(
            "doc_id", "term", "tf", "df",
            F.round("idf", 6).alias("idf_r"),
            F.array_join(
                F.transform("positions", lambda p: p.cast("string")), ","
            ).alias("positions"),
        )

    ids = ", ".join(str(d) for d in TV_DOC_IDS)
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    tp AS (SELECT doc_id, unnest(toks) AS term,
                  generate_subscripts(toks, 1) - 1 AS p
           FROM tok),
    dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tp GROUP BY 1),
    stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
    tv AS (SELECT doc_id, term, count(*) AS tf,
                  string_agg(p::VARCHAR, ',' ORDER BY p) AS positions
           FROM tp WHERE doc_id IN ({ids}) GROUP BY 1, 2)
    SELECT tv.doc_id, tv.term, tv.tf, d.df,
           round(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 6) AS idf_r,
           tv.positions
    FROM tv JOIN dict d USING (term) CROSS JOIN stats s"""
    return fn, sql


TV_TEXTS = [
    (0, "spark window spark zzunknown"),
    (1, "the customer batch customer"),
]


def q_term_vectors_artificial() -> Entry:
    """ES _termvectors with an ARTIFICIAL doc (doc: body, no _id;
    query/termvectors.py term_vectors_for_text): tf + positions from
    the supplied text, df/idf from the LIVE index dictionary; a term
    the index has never seen reports df 0 and the df-0 idf. Positions
    compare as a comma-joined string."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.termvectors import term_vectors_for_text

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        res = term_vectors_for_text(spark, TV_TEXTS, idx)
        return res.select(
            "tid", "term", "tf", "df",
            F.round("idf", 6).alias("idf_r"),
            F.array_join(
                F.transform("positions", lambda p: p.cast("string")), ","
            ).alias("positions"),
        )

    tvals = ", ".join(f"({tid}, '{t}')" for tid, t in TV_TEXTS)
    toks_of_txt = _DUCK_TOKS.replace("lower(text)", "lower(txt)")
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    tp AS (SELECT doc_id, unnest(toks) AS term FROM tok),
    dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tp GROUP BY 1),
    stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
    tx AS (SELECT * FROM (VALUES {tvals}) t(tid, txt)),
    xt AS (SELECT tid, unnest({toks_of_txt}) AS term,
                  generate_subscripts({toks_of_txt}, 1) - 1 AS p
           FROM tx),
    tv AS (SELECT tid, term, count(*) AS tf,
                  string_agg(p::VARCHAR, ',' ORDER BY p) AS positions
           FROM xt GROUP BY 1, 2)
    SELECT tv.tid, tv.term, tv.tf,
           coalesce(d.df, 0)::BIGINT AS df,
           round(ln((s.n - coalesce(d.df, 0) + 0.5)
                    / (coalesce(d.df, 0) + 0.5) + 1.0), 6) AS idf_r,
           tv.positions
    FROM tv LEFT JOIN dict d USING (term) CROSS JOIN stats s"""
    return fn, sql


NEG_BOOST = 0.25


def q_boosting_topk() -> Entry:
    """ES `boosting` query (query/funcscore.py::search_boosting; Lucene
    BoostingQuery): positive BM25, docs also matching the per-query
    negative text demoted ×0.25 but KEPT (vs must_not's veto). The
    negative for query i is query i+1's text — deterministic in both
    engines. Rank from round(score, 6)."""
    negs = [
        (qid, BENCH_QUERIES[(i + 1) % len(BENCH_QUERIES)][1])
        for i, (qid, _) in enumerate(BENCH_QUERIES)
    ]

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.funcscore import search_boosting

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        ndf = spark.createDataFrame(negs, "qid int, neg_question string")
        res = search_boosting(
            qdf, idx, ndf, negative_boost=NEG_BOOST, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    neg_pairs = []
    for qid, q in negs:
        for t in sorted(set(tokenize(q))):
            neg_pairs.append(f"({qid}, '{t}')")
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    nqt AS (SELECT * FROM (VALUES {", ".join(neg_pairs)}) AS n(qid, term)),
    nm AS (SELECT DISTINCT nqt.qid, tf.doc_id FROM nqt JOIN tf USING (term)),
    boosted AS (
      SELECT s.qid, s.doc_id,
             CASE WHEN nm.doc_id IS NOT NULL
                  THEN s.score * {NEG_BOOST}::DOUBLE ELSE s.score END AS score
      FROM scored s LEFT JOIN nm ON nm.qid = s.qid AND nm.doc_id = s.doc_id),
    ranked_b AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM boosted)
    SELECT qid, rank, doc_id, score_r FROM ranked_b WHERE rank <= 10"""
    return fn, sql


# misspelled variants of the bench queries (one corrupted token each);
# tokens are pre-tokenized literals so both engines see identical input
PS_QUERIES = [
    (0, "spark windw agg"),
    (1, "custmer join order"),
    (2, "fast scan filtr"),
    (3, "the big tble"),
]


def q_phrase_suggest() -> Entry:
    """ES `phrase` suggester (query/phrasesuggest.py): whole-query
    did-you-mean — per-position 1-edit candidates from the dictionary
    (dist ASC, df DESC, term ASC, top-3), one substitution per
    suggestion, scored with a stupid-backoff bigram LM (alpha=0.4,
    Laplace unigrams) over the corpus token stream; top-3 per query by
    (round(score, 6) DESC, suggestion ASC)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrasesuggest import build_bigram_lm, suggest_phrases

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        lm = build_bigram_lm(docs)
        res = suggest_phrases(
            spark, PS_QUERIES, idx, lm,
            max_edits=1, per_term=3, topn=3, alpha=0.4, prefix_len=1,
        ).select("qid", "suggestion", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(
            F.desc("score_r"), F.asc("suggestion")
        )
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "suggestion", "score_r"
        )

    # literals shared by fn (via tokenize) and the twin
    qpos_vals, pair_vals, head_vals, sub_vals = [], [], [], []
    for qid, q in PS_QUERIES:
        toks = tokenize(q)
        head_vals.append(f"({qid}, '{toks[0]}')")
        for i, t in enumerate(toks):
            qpos_vals.append(f"({qid}, {i + 1}, '{t}')")
            pre = " ".join(toks[:i])
            suf = " ".join(toks[i + 1 :])
            sub_vals.append(f"({qid}, {i + 1}, '{pre}', '{suf}')")
        for j in range(1, len(toks)):
            pair_vals.append(f"({qid}, {j}, '{toks[j - 1]}', '{toks[j]}')")
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    uni AS (SELECT w, count(*) AS c
            FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY 1),
    bi AS (SELECT w1, w2, count(*) AS c FROM (
             SELECT unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
                    unnest(list_slice(toks, 2, len(toks))) AS w2
             FROM tok WHERE len(toks) >= 2) GROUP BY 1, 2),
    consts AS (SELECT sum(c)::DOUBLE AS tt,
                      count(*)::DOUBLE AS vv FROM uni),
    dict AS (SELECT term, count(DISTINCT doc_id) AS df
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1),
    qpos AS (SELECT * FROM (VALUES {", ".join(qpos_vals)})
             AS q(qid, pos, token)),
    pairs AS (SELECT * FROM (VALUES {", ".join(pair_vals)})
              AS p(qid, j, w1, w2)),
    heads AS (SELECT * FROM (VALUES {", ".join(head_vals)}) AS h(qid, h)),
    subs AS (SELECT * FROM (VALUES {", ".join(sub_vals)})
             AS s(qid, pos, pre, suf)),
    cand0 AS (
      SELECT q.qid, q.pos, d.term AS cand,
             row_number() OVER (PARTITION BY q.qid, q.pos
               ORDER BY levenshtein(d.term, q.token), d.df DESC, d.term) AS r
      FROM qpos q JOIN dict d
        ON substr(d.term, 1, 1) = substr(q.token, 1, 1)
       AND levenshtein(d.term, q.token) = 1),
    cand AS (SELECT qid, pos, cand FROM cand0 WHERE r <= 3
             UNION ALL SELECT qid, 1, token FROM qpos WHERE pos = 1),
    lp_head AS (
      SELECT c.qid, c.pos, c.cand,
             ln((coalesce(u.c, 0) + 1.0) / (k.tt + k.vv)) AS lp
      FROM cand c JOIN heads h USING (qid) CROSS JOIN consts k
      LEFT JOIN uni u
        ON u.w = CASE WHEN c.pos = 1 THEN c.cand ELSE h.h END),
    sp AS (
      SELECT c.qid, c.pos, c.cand, p.j,
             CASE WHEN p.j = c.pos THEN c.cand ELSE p.w1 END AS w1,
             CASE WHEN p.j = c.pos - 1 THEN c.cand ELSE p.w2 END AS w2
      FROM cand c JOIN pairs p USING (qid)),
    lp_pairs AS (
      SELECT sp.qid, sp.pos, sp.cand,
             CASE WHEN coalesce(b.c, 0) > 0
                  THEN ln(b.c::DOUBLE / u1.c::DOUBLE)
                  ELSE ln(0.4::DOUBLE * (coalesce(u2.c, 0) + 1.0)
                          / (k.tt + k.vv)) END AS lp
      FROM sp CROSS JOIN consts k
      LEFT JOIN bi b ON b.w1 = sp.w1 AND b.w2 = sp.w2
      LEFT JOIN uni u1 ON u1.w = sp.w1
      LEFT JOIN uni u2 ON u2.w = sp.w2),
    sugscore AS (
      SELECT qid, pos, cand, sum(lp) AS score
      FROM (SELECT * FROM lp_head UNION ALL SELECT * FROM lp_pairs)
      GROUP BY 1, 2, 3),
    sugtext AS (
      SELECT g.qid,
             trim(s.pre || ' ' || g.cand || ' ' || s.suf) AS suggestion,
             max(g.score) AS score
      FROM sugscore g JOIN subs s ON s.qid = g.qid AND s.pos = g.pos
      GROUP BY 1, 2),
    ranked_ps AS (
      SELECT qid, suggestion, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(score, 6) DESC, suggestion) AS rank
      FROM sugtext)
    SELECT qid, rank, suggestion, score_r FROM ranked_ps WHERE rank <= 3"""
    return fn, sql


def q_hybrid_rrf_topk() -> Entry:
    """Hybrid BM25 + vector retrieval fused with Reciprocal Rank Fusion
    (query/hybrid.py; ES 8.x `rrf` retriever, DPR paper §6.2's
    BM25+dense fusion): BM25 top-100 over documents + cosine top-100
    over the aligned embeddings table (vec_id == doc_id; query vector =
    embedding of vec_id == qid), score = Σ 1/(60 + rank). Both input
    rankings use the rounded-key rank discipline, so ranks — hence the
    exact RRF floats — are engine-identical."""

    def fn(spark, sf_dir):
        from dpr_spark.query.hybrid import rrf_fuse

        text = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 100).select(
            "qid", "rank", "doc_id"
        )
        e = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        qids = [qid for qid, _ in BENCH_QUERIES]
        qv = e.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        )
        dot = F.aggregate(
            F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda c: F.sqrt(
            F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                        lambda acc, x: acc + x)
        )
        pairs = F.broadcast(qv).crossJoin(e).select(
            "qid", "vec_id",
            F.round(dot / (nrm(F.col("qv")) * nrm(F.col("v"))), 6).alias("cos_r"),
        )
        wv = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
        vec = (
            pairs.withColumn("rank", F.row_number().over(wv))
            .filter(F.col("rank") <= 100)
            .select("qid", "rank", F.col("vec_id").alias("doc_id"))
        )
        res = rrf_fuse([text, vec], k=10, k_rrf=60)
        return res.select(
            "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
        )

    qid_list = ", ".join(str(q) for q, _ in BENCH_QUERIES)
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    t_rank AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 100),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qid_list})),
    vpairs AS (
      SELECT qv.qid, e.vec_id,
             round(list_dot_product(qv.qv, e.v)
                   / (sqrt(list_dot_product(qv.qv, qv.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_r
      FROM qv CROSS JOIN e),
    v_rank AS (
      SELECT qid, vec_id AS doc_id, rank FROM (
        SELECT qid, vec_id, cos_r,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos_r DESC, vec_id) AS rank
        FROM vpairs) WHERE rank <= 100),
    contribs AS (
      SELECT qid, doc_id, 1.0::DOUBLE / (60.0::DOUBLE + rank::DOUBLE) AS c
      FROM t_rank
      UNION ALL
      SELECT qid, doc_id, 1.0::DOUBLE / (60.0::DOUBLE + rank::DOUBLE) AS c
      FROM v_rank),
    fused AS (SELECT qid, doc_id, sum(c) AS score
              FROM contribs GROUP BY 1, 2),
    ranked_h AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, doc_id) AS rank
      FROM fused)
    SELECT qid, rank, doc_id, score_r FROM ranked_h WHERE rank <= 10"""
    return fn, sql


HYBRID_LINEAR_W = (0.7, 0.3)


PINNED = [(0, [497, 3]), (1, [42]), (2, []), (3, [499, 498, 497])]


SYN_GRAPH = {"window data": ["vector"], "customer join": ["table"]}


SUGGEST_CTX = [(0, "s", "src1"), (1, "c", "src1"), (2, "s", "src2"), (3, "t", "src3")]


SPAN_WC_QUERIES = [
    (0, "spark", "agg", "window"),
    (1, "customer", "order", "join"),
    (2, "fast", "filter", "scan"),
    (3, "hash", "sort", "merge"),
]
SPAN_WC_WINDOW = 8


def _q_span_wc(mode: str) -> Entry:
    """Lucene SpanWithinQuery / SpanContainingQuery (query/phrase.py::
    span_within_search_index): the big span is the unordered pair (a,b)
    within 8 tokens; the little span is term c. within counts c
    occurrences inside a big span (idf = idf(c)); containing counts
    a-anchored big spans holding a c occurrence (idf = idf(a)+idf(b))."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import span_within_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = span_within_search_index(
            spark, idx, idx.positions, SPAN_WC_QUERIES,
            window=SPAN_WC_WINDOW, mode=mode, k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    q_vals = ", ".join(
        f"({q}, '{a}', '{b}', '{c}')" for q, a, b, c in SPAN_WC_QUERIES
    )
    if mode == "within":
        pf_col = "count(DISTINCT zc.i)"
        idf_expr = "ln((stats.n - dc.df + 0.5) / (dc.df + 0.5) + 1.0)"
        idf_from = "JOIN dict dc ON dc.term = q.c CROSS JOIN stats"
    else:
        pf_col = "count(DISTINCT za.i)"
        idf_expr = ("ln((stats.n - da.df + 0.5) / (da.df + 0.5) + 1.0)"
                    " + ln((stats.n - db.df + 0.5) / (db.df + 0.5) + 1.0)")
        idf_from = ("JOIN dict da ON da.term = q.a "
                    "JOIN dict db ON db.term = q.b CROSS JOIN stats")
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
    z AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS i FROM tok),
    dict AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM z GROUP BY 1),
    q AS (SELECT * FROM (VALUES {q_vals}) AS q(qid, a, b, c)),
    pf AS (
      SELECT q.qid, za.doc_id, {pf_col} AS pf
      FROM q
      JOIN z za ON za.tok = q.a
      JOIN z zb ON zb.tok = q.b AND zb.doc_id = za.doc_id
      JOIN z zc ON zc.tok = q.c AND zc.doc_id = za.doc_id
      WHERE abs(za.i - zb.i) < {SPAN_WC_WINDOW}
        AND zc.i >= least(za.i, zb.i) AND zc.i <= greatest(za.i, zb.i)
      GROUP BY 1, 2),
    idfq AS (SELECT q.qid, {idf_expr} AS idf_sum FROM q {idf_from}),
    scored_w AS (
      SELECT pf.qid, pf.doc_id,
             idfq.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl)) AS score
      FROM pf JOIN idfq USING (qid)
           JOIN ds ON ds.doc_id = pf.doc_id CROSS JOIN stats),
    ranked_w AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored_w)
    SELECT qid, rank, doc_id, score_r FROM ranked_w WHERE rank <= 10"""
    return fn, sql


def q_span_within_topk() -> Entry:
    return _q_span_wc("within")


def q_span_containing_topk() -> Entry:
    return _q_span_wc("containing")


def q_ltr_features() -> Entry:
    """Learning-to-rank feature extraction (the ES LTR plugin's feature
    logging): for each query's BM25 top-10, one row of ranking features
    — text BM25, title-field BM25, exact-phrase frequency of the whole
    question, fixed-point PageRank, and doc length — each recomputed
    from first principles in the twin. The showcase that the engine's
    parts compose: retrieval, fielded scoring, positional verify, and
    the link graph in ONE feature row."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import pagerank, shingle_edges
        from dpr_spark.functions.normalize import normalize_question

        docs = _docs(spark, sf_dir)
        cand = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 10)
        tok = _tokenized(spark, sf_dir).persist()

        # title-field BM25 (title = first 3 tokens, its own stats)
        ttl = tok.select("doc_id", F.slice("toks", 1, 3).alias("ttoks"))
        ds_t = ttl.select("doc_id", F.size("ttoks").alias("doclen"))
        # title-field scalars ride the plan as a broadcast 1-row
        # crossJoin (same trick as _bm25_ranked) — no driver collect
        stats_t = ds_t.agg(
            F.count("*").cast("double").alias("n_t"), F.avg("doclen").alias("avgdl_t")
        )
        tf_t = (
            ttl.select("doc_id", F.explode("ttoks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        dic_t = tf_t.groupBy("term").agg(F.count("*").alias("df"))
        comp_t = (
            F.log((F.col("n_t") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
            * F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)
            / (F.col("tf").cast("double")
               + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                                   + F.lit(BM25_B) * F.col("doclen").cast("double")
                                   / F.col("avgdl_t")))
        )
        tscore = (
            _qterms_df(spark).join(F.broadcast(dic_t), "term")
            .join(tf_t, "term").join(ds_t, "doc_id")
            .crossJoin(F.broadcast(stats_t))
            .select("qid", "doc_id", comp_t.alias("c"))
            .groupBy("qid", "doc_id").agg(F.round(F.sum("c"), 6).alias("f_title"))
        )

        # exact-phrase frequency of the whole question in the text
        qrows = [
            (qid, tokenize(normalize_question(q))) for qid, q in BENCH_QUERIES
        ]
        qdf = spark.createDataFrame(qrows, "qid long, qtoks array<string>")
        nq = F.size("qtoks")
        pf_expr = F.when(
            F.size("toks") >= nq,
            F.size(
                F.filter(
                    F.sequence(F.lit(0), F.size("toks") - nq),
                    lambda i: F.slice("toks", i + 1, nq) == F.col("qtoks"),
                )
            ),
        ).otherwise(F.lit(0))
        pf = (
            cand.select("qid", "doc_id")
            .join(tok, "doc_id")
            .join(F.broadcast(qdf), "qid")
            .select("qid", "doc_id", pf_expr.cast("long").alias("f_phrase"))
        )

        pr = pagerank(
            docs.select("doc_id"),
            shingle_edges(docs).select("src", "dst").distinct(),
            n_iter=PAGERANK_ITERS, scale=PAGERANK_SCALE,
        ).withColumnRenamed("node", "doc_id")
        dl = tok.select("doc_id", F.size("toks").cast("long").alias("f_doclen"))

        out = (
            cand.join(tscore, ["qid", "doc_id"], "left")
            .join(pf, ["qid", "doc_id"], "left")
            # pr is doc-count-sized — never an explicit broadcast; AQE
            # upgrades the join when it happens to be small
            .join(pr, "doc_id")
            .join(dl, "doc_id")
            .select(
                "qid", "rank", "doc_id",
                F.col("score_r").alias("f_bm25"),
                F.coalesce("f_title", F.lit(0.0)).alias("f_title"),
                F.coalesce("f_phrase", F.lit(0)).alias("f_phrase"),
                F.col("pr").alias("f_pr"),
                "f_doclen",
            )
        )
        return out.localCheckpoint()

    from dpr_spark.functions.normalize import normalize_question

    seq_vals = []
    for qid, q in BENCH_QUERIES:
        for off, t in enumerate(tokenize(normalize_question(q))):
            seq_vals.append(f"({qid}, {off}, '{t}')")
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    {_PAGERANK_CTES},
    cand AS (SELECT qid, doc_id, score_r, rank FROM ranked WHERE rank <= 10),
    ttl AS (SELECT doc_id, list_slice(toks, 1, 3) AS ttoks FROM tok),
    ds_t AS (SELECT doc_id, len(ttoks) AS doclen FROM ttl),
    stats_t AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds_t),
    tf_t AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(ttoks) AS term FROM ttl) GROUP BY 1, 2),
    dict_t AS (SELECT term, count(*) AS df FROM tf_t GROUP BY 1),
    tscore AS (
      SELECT qt.qid, tf_t.doc_id,
             round(sum(ln((stats_t.n - dict_t.df + 0.5) / (dict_t.df + 0.5) + 1.0)
                       * tf_t.tf * {BM25_K1 + 1.0}
                       / (tf_t.tf + {BM25_K1}
                          * (1.0 - {BM25_B}
                             + {BM25_B} * ds_t.doclen / stats_t.avgdl))), 6)
               AS f_title
      FROM qt JOIN dict_t USING (term) JOIN tf_t USING (term)
           JOIN ds_t ON tf_t.doc_id = ds_t.doc_id CROSS JOIN stats_t
      GROUP BY 1, 2),
    qseq AS (SELECT * FROM (VALUES {", ".join(seq_vals)}) AS q(qid, off, term)),
    qseqn AS (SELECT qid, count(*) AS n_off FROM qseq GROUP BY 1),
    ph_cand AS (
      SELECT q.qid, z.doc_id, z.i - q.off AS start, count(*) AS n_hit
      FROM qseq q JOIN z ON z.tok = q.term GROUP BY 1, 2, 3),
    ph_pf AS (
      SELECT c.qid, c.doc_id, count(*) AS pf
      FROM ph_cand c JOIN qseqn USING (qid)
      WHERE c.n_hit = qseqn.n_off GROUP BY 1, 2)
    SELECT c.qid, c.rank, c.doc_id,
           c.score_r AS f_bm25,
           coalesce(t.f_title, 0.0::DOUBLE) AS f_title,
           coalesce(p.pf, 0)::BIGINT AS f_phrase,
           r{PAGERANK_ITERS}.rank AS f_pr,
           ds.doclen::BIGINT AS f_doclen
    FROM cand c
    LEFT JOIN tscore t ON t.qid = c.qid AND t.doc_id = c.doc_id
    LEFT JOIN ph_pf p ON p.qid = c.qid AND p.doc_id = c.doc_id
    JOIN r{PAGERANK_ITERS} ON r{PAGERANK_ITERS}.node = c.doc_id
    JOIN ds ON ds.doc_id = c.doc_id"""
    return fn, sql


def q_suggest_in_context() -> Entry:
    """Context-filtered completion suggester (query/suggest.py::
    suggest_completions_in_context; ES completion contexts): each
    request carries a category; only terms carried by that category's
    documents suggest, weighted by in-context df. Contexts come from
    the documents' source column."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.suggest import (
            context_term_weights,
            suggest_completions_in_context,
        )

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        cw = context_term_weights(idx, docs.select("doc_id", "source"), "source")
        return suggest_completions_in_context(spark, SUGGEST_CTX, cw, n=5)

    req_vals = ", ".join(f"({q}, '{p}', '{c}')" for q, p, c in SUGGEST_CTX)
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    td AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
    cw AS (SELECT td.term, d.source AS ctx, count(*) AS weight
           FROM td JOIN documents d USING (doc_id) GROUP BY 1, 2),
    req AS (SELECT * FROM (VALUES {req_vals}) AS r(qid, prefix, ctx)),
    cand AS (
      SELECT r.qid, cw.term, cw.weight
      FROM req r JOIN cw ON cw.ctx = r.ctx
                        AND cw.term LIKE r.prefix || '%'),
    ranked_s AS (
      SELECT qid, term, weight,
             row_number() OVER (PARTITION BY qid
                                ORDER BY weight DESC, term) AS rank
      FROM cand)
    SELECT qid, rank, term, weight FROM ranked_s WHERE rank <= 5"""
    return fn, sql


def q_lm_perplexity() -> Entry:
    """Corpus-LM perplexity quality filter (extras/textstats.py::
    bigram_lm_perplexity; the KenLM/CCNet web-pipeline stage): add-0.1
    bigram LM fit on the documents table, per-doc ppl = exp(mean -ln p)
    rounded at 4 dp (coarse enough to absorb cross-engine ln/sum ulp
    drift over ~300-term docs)."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.textstats import bigram_lm_perplexity

        return bigram_lm_perplexity(_docs(spark, sf_dir)).select(
            "doc", "n_bigrams", F.col("ppl").alias("ppl_r")
        )

    sql = f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    z AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS i FROM t),
    uni AS (SELECT tok AS u, count(*) AS cu FROM z GROUP BY 1),
    vv AS (SELECT count(*)::DOUBLE AS v FROM uni),
    bg AS (SELECT a.doc_id, a.tok AS u, a.tok || ' ' || b.tok AS g
           FROM z a JOIN z b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
    big AS (SELECT g, count(*) AS cg FROM bg GROUP BY 1),
    scored AS (
      SELECT bg.doc_id AS doc, count(*) AS n_bigrams,
             sum(ln((big.cg::DOUBLE + 0.1::DOUBLE)
                    / (uni.cu::DOUBLE + 0.1::DOUBLE * (SELECT v FROM vv)))) AS s
      FROM bg JOIN big USING (g) JOIN uni USING (u)
      GROUP BY 1)
    SELECT doc, n_bigrams, round(exp(-s / n_bigrams), 4) AS ppl_r FROM scored"""
    return fn, sql


def q_phrase_title_topk() -> Entry:
    """Field-scoped exact phrase (index/fielded.py::
    phrase_search_fielded; Lucene PhraseQuery(field) / ES match_phrase
    on a field): phrases match inside the TITLE field only (title =
    first 3 + doc_id%5 tokens — variable length so the field norm is
    exercised), scored with the title field's own idf/doclen/avgdl."""

    def fn(spark, sf_dir):
        from dpr_spark.index.fielded import (
            build_fielded_index,
            build_positions_fielded,
            phrase_search_fielded,
        )

        docs = _docs(spark, sf_dir).select(
            "doc_id",
            "text",
            F.concat_ws(
                " ",
                F.slice(_tok_col(), 1, (F.lit(3) + F.pmod("doc_id", F.lit(5))).cast("int")),
            ).alias("title"),
        )
        idx = build_fielded_index(spark, docs, fields=("text", "title"))
        pos = build_positions_fielded(docs, idx)
        res = phrase_search_fielded(
            spark, idx, pos, PHRASE_QUERIES, "title", k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.functions.normalize import normalize_question

    vals = []
    for qid, p in PHRASE_QUERIES:
        for off, t in enumerate(tokenize(normalize_question(p))):
            vals.append(f"({qid}, {off}, '{t}')")
    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    ttl AS (SELECT doc_id,
                   list_slice(toks, 1, 3 + (doc_id % 5)::INT) AS toks
            FROM tok),
    ds AS (SELECT doc_id, len(toks) AS doclen FROM ttl),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
    z AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS i FROM ttl),
    dict AS (SELECT tok AS term, count(DISTINCT doc_id) AS df FROM z GROUP BY 1),
    q AS (SELECT * FROM (VALUES {", ".join(vals)}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(*) AS n_off FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    cand AS (
      SELECT q.qid, z.doc_id, z.i - q.off AS start, count(*) AS n_hit
      FROM q JOIN z ON z.tok = q.term GROUP BY 1, 2, 3),
    pf AS (
      SELECT cand.qid, cand.doc_id, count(*) AS pf
      FROM cand JOIN qn USING (qid) WHERE cand.n_hit = qn.n_off GROUP BY 1, 2),
    scored_t AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl)) AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked_t AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored_t)
    SELECT qid, rank, doc_id, score_r FROM ranked_t WHERE rank <= 10"""
    return fn, sql


def q_synonym_graph_topk() -> Entry:
    """Multi-word synonyms (query/synonyms.py::synonym_graph_search;
    Lucene SynonymGraphFilter at query time): a registered span becomes
    PhraseQuery(span) OR TermQuery(alternate), clause score = sum of
    matching paths (Lucene's boolean-of-paths graph query); uncovered
    tokens stay plain BM25 terms. The twin reuses the BM25 CTEs for the
    term paths (VALUES keep row multiplicity) and the start-grouping
    adjacency CTEs for the phrase paths."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.synonyms import synonym_graph_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = synonym_graph_search(
            spark, idx, idx.positions, BENCH_QUERIES, SYN_GRAPH,
            k=10, score_round=6,
        )
        return res.select(
            "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
        )

    from dpr_spark.query.synonyms import parse_synonym_graph

    pq_rows, t_rows = [], []
    for qid, q in BENCH_QUERIES:
        phrases, alts, singles = parse_synonym_graph(q, SYN_GRAPH)
        for cid, ph in phrases:
            for off, t in enumerate(tokenize(ph)):
                pq_rows.append((qid, cid, off, t))
        for _, t in alts:
            t_rows.append((qid, t))
        for t in singles:
            t_rows.append((qid, t))
    pq_vals = ", ".join(f"({q}, {c}, {o}, '{t}')" for q, c, o, t in pq_rows)
    t_vals = ", ".join(f"({q}, '{t}')" for q, t in t_rows)
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", t_vals)},
    z AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS i FROM tok),
    pq AS (SELECT * FROM (VALUES {pq_vals}) AS p(qid, cid, off, term)),
    pqn AS (SELECT qid, cid, count(*) AS n_off FROM pq GROUP BY 1, 2),
    idfp AS (
      SELECT p.qid, p.cid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0))
               AS idf_sum,
             count(*) AS n_res
      FROM pq p JOIN dict ON dict.term = p.term CROSS JOIN stats
      GROUP BY 1, 2),
    idf_ok AS (SELECT i.qid, i.cid, i.idf_sum
               FROM idfp i JOIN pqn USING (qid, cid)
               WHERE i.n_res = pqn.n_off),
    cand AS (
      SELECT p.qid, p.cid, z.doc_id, z.i - p.off AS start, count(*) AS n_hit
      FROM pq p JOIN z ON z.tok = p.term GROUP BY 1, 2, 3, 4),
    pf AS (
      SELECT c.qid, c.cid, c.doc_id, count(*) AS pf
      FROM cand c JOIN pqn USING (qid, cid)
      WHERE c.n_hit = pqn.n_off GROUP BY 1, 2, 3),
    ph_score AS (
      SELECT pf.qid, pf.doc_id,
             io.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl)) AS score
      FROM pf JOIN idf_ok io USING (qid, cid)
           JOIN ds ON ds.doc_id = pf.doc_id CROSS JOIN stats),
    contribs AS (
      SELECT qid, doc_id, score FROM scored
      UNION ALL
      SELECT qid, doc_id, score FROM ph_score),
    total AS (SELECT qid, doc_id, sum(score) AS score
              FROM contribs GROUP BY 1, 2),
    ranked_sg AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM total)
    SELECT qid, rank, doc_id, score_r FROM ranked_sg WHERE rank <= 10"""
    return fn, sql


def q_pinned_topk() -> Entry:
    """ES pinned query (query/paging.py::search_pinned): editorial doc
    ids rank first in list order (score 0.0 when they don't match
    organically), the organic BM25 ranking follows with pins removed;
    `kind` marks provenance."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.paging import search_pinned

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_pinned(spark, qdf, idx, PINNED, k=10)
        # re-rank on rounded score within the organic block (pins keep
        # their list order): rank is already deterministic, only the
        # score column needs rounding for the hash
        return res.select(
            "qid", "rank", "kind", "doc_id", F.round("score", 6).alias("score_r")
        )

    pin_vals = ", ".join(
        f"({qid}, {d}, {pos})"
        for qid, ids in PINNED for pos, d in enumerate(ids)
    )
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    pins AS (SELECT * FROM (VALUES {pin_vals}) AS p(qid, doc_id, pin_pos)),
    organic AS (
      SELECT s.qid, s.doc_id, round(s.score, 6) AS score_r,
             1000000 + row_number() OVER (
               PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id) AS ord,
             'organic' AS kind
      FROM scored s LEFT JOIN pins p
        ON p.qid = s.qid AND p.doc_id = s.doc_id
      WHERE p.doc_id IS NULL),
    pinned AS (
      SELECT p.qid, p.doc_id, round(coalesce(s.score, 0.0::DOUBLE), 6) AS score_r,
             p.pin_pos AS ord, 'pinned' AS kind
      FROM pins p LEFT JOIN scored s
        ON s.qid = p.qid AND s.doc_id = p.doc_id),
    unioned AS (SELECT * FROM pinned UNION ALL SELECT * FROM organic),
    ranked_p AS (
      SELECT qid, doc_id, score_r, kind,
             row_number() OVER (PARTITION BY qid
                                ORDER BY ord, doc_id) AS rank
      FROM unioned)
    SELECT qid, rank, kind, doc_id, score_r FROM ranked_p WHERE rank <= 10"""
    return fn, sql


def q_combined_fields_topk() -> Entry:
    """ES combined_fields (query/multimatch.py::search_combined_fields):
    text+title blend into one pseudo-field BEFORE BM25 — tf_c = Σ w_f·tf,
    dl_c = Σ w_f·dl (the norms table), df = docs with the term in ANY
    field, one BM25 per term. Same field model as bm25f_topk (title =
    first 3 tokens), distinct scoring contract (term-centric blend vs
    per-field sum)."""
    W_TEXT, W_TITLE = 1.0, 2.0

    def fn(spark, sf_dir):
        from dpr_spark.index.fielded import build_fielded_index
        from dpr_spark.query.multimatch import (
            combined_field_norms,
            search_combined_fields,
        )

        docs = _docs(spark, sf_dir).select(
            "doc_id",
            "text",
            F.concat_ws(" ", F.slice(_tok_col(), 1, 3)).alias("title"),
        )
        idx = build_fielded_index(
            spark, docs, fields=("text", "title"),
            weights={"text": W_TEXT, "title": W_TITLE},
        )
        norms = combined_field_norms(idx)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_combined_fields(qdf, idx, norms, idx.n_docs, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    fdoc AS (
      SELECT doc_id, 0 AS field_id, toks FROM tok
      UNION ALL
      SELECT doc_id, 1 AS field_id, list_slice(toks, 1, 3) AS toks FROM tok),
    ds AS (SELECT doc_id, field_id, len(toks) AS doclen FROM fdoc),
    norms AS (
      SELECT doc_id,
             sum((CASE WHEN field_id = 1 THEN {W_TITLE} ELSE {W_TEXT} END)
                 * doclen::DOUBLE) AS dl_c
      FROM ds GROUP BY 1),
    nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
    avgc AS (SELECT sum(dl_c) / (SELECT n FROM nn) AS a FROM norms),
    tf AS (SELECT doc_id, field_id, term, count(*) AS tf
           FROM (SELECT doc_id, field_id, unnest(toks) AS term FROM fdoc)
           GROUP BY 1, 2, 3),
    qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term)),
    ctf AS (
      SELECT qt.qid, tf.doc_id, tf.term,
             sum((CASE WHEN tf.field_id = 1 THEN {W_TITLE} ELSE {W_TEXT} END)
                 * tf.tf::DOUBLE) AS ctf
      FROM qt JOIN tf USING (term) GROUP BY 1, 2, 3),
    dfany AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM tf WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
    scored_cf AS (
      SELECT c.qid, c.doc_id,
             sum(ln(((SELECT n FROM nn) - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * c.ctf * {BM25_K1 + 1.0}
                 / (c.ctf + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * nm.dl_c / (SELECT a FROM avgc)))
             ) AS score
      FROM ctf c JOIN dfany d USING (term) JOIN norms nm ON nm.doc_id = c.doc_id
      GROUP BY 1, 2),
    ranked_cf AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored_cf)
    SELECT qid, rank, doc_id, score_r FROM ranked_cf WHERE rank <= 10"""
    return fn, sql.replace("{QTERMS}", _qterm_values_sql())


def q_index_stats() -> Entry:
    """ES `_stats`/`_cat/indices` analog: one row of index-shape
    numbers from the REAL built index's tables — docs, vocabulary size,
    postings rows, total tokens, avgdl, max df. The twin recomputes
    every number from raw text, so this also re-proves the build's
    dictionary/postings/docstats against first principles."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        n_docs = idx.docstats.count()
        vocab = idx.dictionary.count()
        prow = idx.postings.agg(
            F.count("*").alias("np"), F.sum("tf").alias("toks")
        ).collect()[0]
        max_df = idx.dictionary.agg(F.max("df")).collect()[0][0]
        return spark.createDataFrame(
            [(
                n_docs, vocab, int(prow["np"]), int(prow["toks"]),
                round(float(idx.stats.avgdl), 6), int(max_df),
            )],
            "n_docs long, vocab long, n_postings long, n_tokens long, "
            "avgdl_r double, max_df long",
        )

    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, unnest(toks) AS term FROM tok),
    per AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
    dict AS (SELECT term, count(*) AS df FROM per GROUP BY 1)
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
           (SELECT count(*) FROM dict)::BIGINT AS vocab,
           (SELECT count(*) FROM per)::BIGINT AS n_postings,
           (SELECT coalesce(sum(tf), 0) FROM per)::BIGINT AS n_tokens,
           (SELECT round(coalesce(sum(tf), 0)::DOUBLE
                         / (SELECT count(*) FROM documents), 6)
            FROM per) AS avgdl_r,
           (SELECT coalesce(max(df), 0) FROM dict)::BIGINT AS max_df"""
    return fn, sql


def q_percolate_phrase_matches() -> Entry:
    """Percolator with PHRASE subscriptions (query/percolate.py;
    Lucene Monitor phrase queries): term presence prescreens (the
    presearcher), adjacency verifies positionally. The twin rebuilds
    the presearch as a distinct-term containment join and the verify as
    the (i - off) start-grouping adjacency count."""
    from dpr_spark.query.percolate import PercolatorQuery

    PQS = [
        PercolatorQuery(1, phrases=("spark window",)),
        PercolatorQuery(2, must=("customer",), phrases=("join order",)),
        PercolatorQuery(3, phrases=("window spark",)),
        PercolatorQuery(4, must=("table", "scan")),
    ]

    def fn(spark, sf_dir):
        from dpr_spark.query.percolate import (
            percolate,
            register_phrases,
            register_queries,
        )

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        reg = register_queries(spark, PQS)
        book = register_phrases(spark, PQS)
        return percolate(docs, reg, phrase_book=book).select("doc_id", "pqid")

    # requirement rows (must ∪ phrase terms) and phrase offset rows
    req, phr, nph = [], [], {}
    for q in PQS:
        terms = set(t for w in q.must for t in tokenize(w))
        for pid, ph in enumerate(q.phrases):
            toks = tokenize(ph)
            for off, t in enumerate(toks):
                phr.append((q.pqid, pid, off, t))
            terms.update(toks)
        for t in sorted(terms):
            req.append((q.pqid, t))
        if q.phrases:
            nph[q.pqid] = len(q.phrases)
    req_vals = ", ".join(f"({p}, '{t}')" for p, t in req)
    phr_vals = ", ".join(f"({p}, {pid}, {off}, '{t}')" for p, pid, off, t in phr)
    nph_vals = ", ".join(f"({p}, {n})" for p, n in sorted(nph.items()))
    sql = f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    z AS (SELECT doc_id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) AS i FROM t),
    req AS (SELECT * FROM (VALUES {req_vals}) AS r(pqid, term)),
    reqn AS (SELECT pqid, count(*) AS n FROM req GROUP BY 1),
    pres AS (SELECT DISTINCT doc_id, tok FROM z),
    base AS (
      SELECT p.doc_id, r.pqid
      FROM pres p JOIN req r ON p.tok = r.term
      GROUP BY 1, 2
      HAVING count(*) = (SELECT n FROM reqn WHERE reqn.pqid = r.pqid)),
    phr AS (SELECT * FROM (VALUES {phr_vals}) AS f(pqid, pid, off, term)),
    phn AS (SELECT pqid, pid, count(*) AS n_off FROM phr GROUP BY 1, 2),
    nph AS (SELECT * FROM (VALUES {nph_vals}) AS n(pqid, n_ph)),
    ph_hits AS (
      SELECT f.pqid, f.pid, z.doc_id, z.i - f.off AS start, count(*) AS n_hit
      FROM phr f JOIN z ON z.tok = f.term
      GROUP BY 1, 2, 3, 4),
    ph_ok AS (
      SELECT DISTINCT h.pqid, h.pid, h.doc_id
      FROM ph_hits h JOIN phn USING (pqid, pid) WHERE h.n_hit = phn.n_off),
    ph_full AS (
      SELECT o.pqid, o.doc_id
      FROM (SELECT pqid, doc_id, count(DISTINCT pid) AS c
            FROM ph_ok GROUP BY 1, 2) o
      JOIN nph USING (pqid) WHERE o.c = nph.n_ph)
    SELECT b.doc_id, b.pqid
    FROM base b LEFT JOIN nph ON nph.pqid = b.pqid
    WHERE nph.n_ph IS NULL
       OR EXISTS (SELECT 1 FROM ph_full f
                  WHERE f.pqid = b.pqid AND f.doc_id = b.doc_id)"""
    return fn, sql


def q_hybrid_linear_topk() -> Entry:
    """Hybrid BM25 + vector with the ES 8.x `linear` retriever
    (query/hybrid.py::linear_fuse): each source minmax-normalizes within
    the query's top-100 candidates, fused as 0.7·text + 0.3·vector.
    Upstream scores enter ROUNDED (6 dp), so min/max, the rescale, and
    the 2-element weighted sum are bit-identical cross-engine — the
    fused raw score ranks directly."""

    def fn(spark, sf_dir):
        from dpr_spark.query.hybrid import linear_fuse

        text = _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= 100).select(
            "qid", "doc_id", F.col("score_r").alias("score")
        )
        e = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        qids = [qid for qid, _ in BENCH_QUERIES]
        qv = e.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        )
        dot = F.aggregate(
            F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda c: F.sqrt(
            F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                        lambda acc, x: acc + x)
        )
        pairs = F.broadcast(qv).crossJoin(e).select(
            "qid", "vec_id",
            F.round(dot / (nrm(F.col("qv")) * nrm(F.col("v"))), 6).alias("cos_r"),
        )
        wv = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
        vec = (
            pairs.withColumn("rank", F.row_number().over(wv))
            .filter(F.col("rank") <= 100)
            .select("qid", F.col("vec_id").alias("doc_id"),
                    F.col("cos_r").alias("score"))
        )
        res = linear_fuse([text, vec], weights=HYBRID_LINEAR_W, k=10)
        return res.select(
            "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
        )

    w_t, w_v = HYBRID_LINEAR_W
    qid_list = ", ".join(str(q) for q, _ in BENCH_QUERIES)
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    t_top AS (SELECT qid, doc_id, score_r FROM ranked WHERE rank <= 100),
    t_n AS (
      SELECT qid, doc_id,
             CASE WHEN max(score_r) OVER (PARTITION BY qid)
                       - min(score_r) OVER (PARTITION BY qid) = 0
                  THEN 1.0::DOUBLE
                  ELSE (score_r - min(score_r) OVER (PARTITION BY qid))
                       / (max(score_r) OVER (PARTITION BY qid)
                          - min(score_r) OVER (PARTITION BY qid)) END AS n
      FROM t_top),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qid_list})),
    vpairs AS (
      SELECT qv.qid, e.vec_id,
             round(list_dot_product(qv.qv, e.v)
                   / (sqrt(list_dot_product(qv.qv, qv.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_r
      FROM qv CROSS JOIN e),
    v_top AS (
      SELECT qid, vec_id AS doc_id, cos_r FROM (
        SELECT qid, vec_id, cos_r,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos_r DESC, vec_id) AS rank
        FROM vpairs) WHERE rank <= 100),
    v_n AS (
      SELECT qid, doc_id,
             CASE WHEN max(cos_r) OVER (PARTITION BY qid)
                       - min(cos_r) OVER (PARTITION BY qid) = 0
                  THEN 1.0::DOUBLE
                  ELSE (cos_r - min(cos_r) OVER (PARTITION BY qid))
                       / (max(cos_r) OVER (PARTITION BY qid)
                          - min(cos_r) OVER (PARTITION BY qid)) END AS n
      FROM v_top),
    contribs AS (
      SELECT qid, doc_id, {w_t!r}::DOUBLE * n AS c FROM t_n
      UNION ALL
      SELECT qid, doc_id, {w_v!r}::DOUBLE * n AS c FROM v_n),
    fused AS (SELECT qid, doc_id, sum(c) AS score
              FROM contribs GROUP BY 1, 2),
    ranked_l AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, doc_id) AS rank
      FROM fused)
    SELECT qid, rank, doc_id, score_r FROM ranked_l WHERE rank <= 10"""
    return fn, sql


RANGE_AGG_RANGES = [(None, 400.0), (400.0, 800.0), (700.0, None), (99999.0, None)]


def q_range_agg() -> Entry:
    """ES `range` aggregation over the match set (query/aggs.py):
    explicit [lo, hi) buckets of n_chars per query — unbounded edges,
    an overlapping range, and an empty range emitting 0 (the range list
    is the schema)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import range_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return range_agg(
            qdf, idx, docs.select("doc_id", "n_chars"), "n_chars",
            RANGE_AGG_RANGES,
        )

    rng_vals = ", ".join(
        f"('{'*' if lo is None else lo}-{'*' if hi is None else hi}', "
        f"{'NULL::DOUBLE' if lo is None else repr(lo) + '::DOUBLE'}, "
        f"{'NULL::DOUBLE' if hi is None else repr(hi) + '::DOUBLE'})"
        for lo, hi in RANGE_AGG_RANGES
    )
    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, d.n_chars::DOUBLE AS v
           FROM matches m JOIN documents d USING (doc_id)),
    keys AS (SELECT DISTINCT qid FROM mv),
    rng AS (SELECT * FROM (VALUES {rng_vals}) r(range_key, lo, hi)),
    grid AS (SELECT k.qid, r.range_key, r.lo, r.hi
             FROM keys k CROSS JOIN rng r)
    SELECT g.qid, g.range_key, count(mv.v) AS count
    FROM grid g LEFT JOIN mv
      ON mv.qid = g.qid
     AND (g.lo IS NULL OR mv.v >= g.lo)
     AND (g.hi IS NULL OR mv.v < g.hi)
    GROUP BY 1, 2"""
    return fn, sql


COMPOSITE_AFTER = {"source": "src12", "lang": "en"}


def q_composite_agg() -> Entry:
    """ES `composite` aggregation (query/aggs.py): two-source (source,
    lang) bucket tuples in NATURAL key order, page 2 of size 8 after
    the cursor ('src12', 'en') — the aggregation analog of search_after
    (deep bucket pagination; the after-key predicate prunes before the
    per-qid window)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import composite_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return composite_agg(
            qdf, idx, docs.select("doc_id", "source", "lang"),
            ["source", "lang"], size=8, after=COMPOSITE_AFTER,
        )

    a_src, a_lang = COMPOSITE_AFTER["source"], COMPOSITE_AFTER["lang"]
    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    counts AS (
      SELECT m.qid, d.source, d.lang, count(*) AS count
      FROM matches m JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
    filtered AS (
      SELECT * FROM counts
      WHERE source > '{a_src}' OR (source = '{a_src}' AND lang > '{a_lang}')),
    paged AS (
      SELECT qid, source, lang, count,
             row_number() OVER (PARTITION BY qid
               ORDER BY source ASC, lang ASC) AS rn
      FROM filtered)
    SELECT qid, source, lang, count FROM paged WHERE rn <= 8"""
    return fn, sql


def q_ann_filtered_topk() -> Entry:
    """Filtered vector search (extras/ann.py; ES `knn` with `filter`):
    cosine top-10 restricted to label IN (2, 5) — a PRE-filter (every
    result satisfies it; the predicate reaches the parquet scan), not a
    post-filter that could return < k. Queries = vec_id 0..4."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import brute_cosine_topk

        e = _emb(spark, sf_dir)
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
        res = brute_cosine_topk(
            e, q, k=10, filter_expr=F.col("label").isin([2, 5])
        )
        # rounded re-rank (driver float discipline)
        out = res.select(
            "qid", "vec_id", F.round("cosine", 6).alias("cos_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
        return out.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "vec_id", "cos_r"
        )

    sql = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE label IN (2, 5)),
    q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id < 5),
    pairs AS (
      SELECT q.qid, e.vec_id,
             round(list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_r
      FROM q CROSS JOIN e),
    ranked_f AS (
      SELECT qid, vec_id, cos_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY cos_r DESC, vec_id) AS rank
      FROM pairs)
    SELECT qid, rank, vec_id, cos_r FROM ranked_f WHERE rank <= 10"""
    return fn, sql


def q_ann_ivf_topk() -> Entry:
    """IVF coarse-quantized vector search (extras/ann.py::ivf_cosine_topk;
    FAISS IVF-flat analog, reference faiss_indexers.py): nlist=8 sampled
    centroids (every (N//8)-th vector by id — iters=0 so the quantizer is
    SQL-replayable; k-means training is pytest-gated separately), corpus
    assigned to its nearest list by rounded cosine, queries (vec_id 0..4)
    probe their nprobe=2 nearest lists, exact rounded-cosine re-rank
    inside the candidates. Candidates come from a broadcast equi-join on
    list_id — the corpus is never cross-joined."""
    NLIST, NPROBE, K = 8, 2, 10

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import ivf_cosine_topk, sampled_centroids

        e = _emb(spark, sf_dir)
        cent = sampled_centroids(e, nlist=NLIST)
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        return ivf_cosine_topk(e, q, cent, k=K, nprobe=NPROBE, rank_round=6).select(
            "qid", "rank", "vec_id", F.round("cosine", 6).alias("cos_r")
        )

    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (SELECT greatest((max(vec_id) + 1) // {NLIST}, 1) AS md FROM e),
    c AS (SELECT (e.vec_id // m.md)::INT AS cid, e.v AS cv
          FROM e, m WHERE e.vec_id % m.md = 0 AND e.vec_id // m.md < {NLIST}),
    sim AS (SELECT e.vec_id, e.v, c.cid,
                   round(list_dot_product(e.v, c.cv)
                         / (sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cs
            FROM e CROSS JOIN c),
    assigned AS (SELECT vec_id, v, cid AS list_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid) AS rn
        FROM sim) WHERE rn = 1),
    probes AS (SELECT vec_id AS qid, v AS qv, cid AS list_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid) AS rn
        FROM sim WHERE vec_id < 5) WHERE rn <= {NPROBE}),
    cand AS (SELECT p.qid, a.vec_id,
                    round(list_dot_product(p.qv, a.v)
                          / (sqrt(list_dot_product(p.qv, p.qv))
                             * sqrt(list_dot_product(a.v, a.v))), 6) AS cos_r
             FROM probes p JOIN assigned a USING (list_id)),
    ranked AS (SELECT qid, vec_id, cos_r,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY cos_r DESC, vec_id) AS rank
               FROM cand)
    SELECT qid, rank, vec_id, cos_r FROM ranked WHERE rank <= {K}"""
    return fn, sql


def q_ann_ivfpq_topk() -> Entry:
    """IVF-PQ vector search (extras/ann.py::ivfpq_cosine_topk; FAISS
    IVFPQ analog): nlist=8 sampled centroids + m_sub=8 x nbits=4
    sampled codebooks (both SQL-replayable — every (N//2^nbits)-th
    vector's subvectors); corpus PQ-encoded by integerized squared-L2
    argmin; queries probe nprobe=2 lists, ADC-score candidates from
    codes alone (integer micro-unit table sums — order-independent, so
    bit-exact cross-engine), shortlist 50, exact rounded-cosine refine
    to top-10. The result carries both the exact cosine and the ADC
    integer so the twin checks the approximate path, not just the
    refine."""
    NLIST, NPROBE, K, NCODE, REFINE = 8, 2, 10, 16, 50

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import (
            ivfpq_cosine_topk,
            sampled_centroids,
            sampled_pq_codebooks,
        )

        e = _emb(spark, sf_dir)
        cent = sampled_centroids(e, nlist=NLIST)
        books = sampled_pq_codebooks(e, m_sub=8, nbits=4)
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        return ivfpq_cosine_topk(
            e, q, cent, books, k=K, nprobe=NPROBE, refine=REFINE, rank_round=6
        ).select(
            "qid", "rank", "vec_id", F.round("cosine", 6).alias("cos_r"), "adc"
        )

    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (SELECT greatest((max(vec_id) + 1) // {NLIST}, 1) AS md FROM e),
    c AS (SELECT (e.vec_id // m.md)::INT AS cid, e.v AS cv
          FROM e, m WHERE e.vec_id % m.md = 0 AND e.vec_id // m.md < {NLIST}),
    sim AS (SELECT e.vec_id, e.v, c.cid,
                   round(list_dot_product(e.v, c.cv)
                         / (sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cs
            FROM e CROSS JOIN c),
    assigned AS (SELECT vec_id, v, cid AS list_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid) AS rn
        FROM sim) WHERE rn = 1),
    probes AS (SELECT vec_id AS qid, v AS qv, cid AS list_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid) AS rn
        FROM sim WHERE vec_id < 5) WHERE rn <= {NPROBE}),
    m2 AS (SELECT greatest((max(vec_id) + 1) // {NCODE}, 1) AS md FROM e),
    cb AS (SELECT (e.vec_id // m2.md)::INT AS cj, r.s::INT AS s,
                  e.v[r.s * 8 + 1 : r.s * 8 + 8] AS cw
           FROM e, m2, range(8) r(s)
           WHERE e.vec_id % m2.md = 0 AND e.vec_id // m2.md < {NCODE}),
    enc AS (SELECT vec_id, s, cj FROM (
        SELECT e.vec_id, cb.s, cb.cj,
               row_number() OVER (PARTITION BY e.vec_id, cb.s ORDER BY
                 floor((list_dot_product(e.v[cb.s * 8 + 1 : cb.s * 8 + 8],
                                         e.v[cb.s * 8 + 1 : cb.s * 8 + 8])
                        - 2 * list_dot_product(e.v[cb.s * 8 + 1 : cb.s * 8 + 8],
                                               cb.cw)
                        + list_dot_product(cb.cw, cb.cw))
                       * 1000000.0::DOUBLE + 0.5::DOUBLE), cb.cj) AS rn
        FROM e CROSS JOIN cb) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
    dtab AS (SELECT q.qid, cb.s, cb.cj,
                    CAST(floor(list_dot_product(q.qv[cb.s * 8 + 1 : cb.s * 8 + 8],
                                                cb.cw)
                               * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t
             FROM q CROSS JOIN cb),
    cand AS (SELECT DISTINCT p.qid, a.vec_id
             FROM probes p JOIN assigned a USING (list_id)),
    adct AS (SELECT cand.qid, cand.vec_id, CAST(sum(d.t) AS BIGINT) AS adc
             FROM cand JOIN enc ON enc.vec_id = cand.vec_id
                  JOIN dtab d ON d.qid = cand.qid AND d.s = enc.s
                                 AND d.cj = enc.cj
             GROUP BY 1, 2),
    short AS (SELECT qid, vec_id, adc FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY adc DESC, vec_id) AS rn
        FROM adct) WHERE rn <= {REFINE}),
    exact AS (SELECT s.qid, s.vec_id, s.adc,
                     round(list_dot_product(q.qv, e.v)
                           / (sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_r
              FROM short s JOIN q ON q.qid = s.qid
                   JOIN e ON e.vec_id = s.vec_id),
    ranked AS (SELECT qid, vec_id, cos_r, adc,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY cos_r DESC, vec_id) AS rank
               FROM exact)
    SELECT qid, rank, vec_id, cos_r, adc FROM ranked WHERE rank <= {K}"""
    return fn, sql


def q_matched_queries_topk() -> Entry:
    """ES `matched_queries` (query/boolquery.py::matched_queries):
    BM25 top-10 where each hit carries the sorted names of the named
    clauses ('head' = first query token, 'tail' = the rest) with ≥1
    term in the doc; '' when none. Annotation probes postings doubly
    restricted (broadcast named term_ids + broadcast top-k semi-join)."""
    named = []
    for qid, q in BENCH_QUERIES:
        toks = tokenize(q)
        named.append((qid, "head", toks[0]))
        if len(toks) > 1:
            named.append((qid, "tail", " ".join(toks[1:])))

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import matched_queries
        from dpr_spark.query.scorer import search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search(qdf, idx, k=10)
        out = matched_queries(spark, res, named, idx)
        w = Window.partitionBy("qid").orderBy(
            F.desc(F.round("score", 6)), F.asc("doc_id")
        )
        return out.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", F.round("score", 6).alias("score_r"),
            "matched_queries",
        )

    nrows = []
    for qid, name, text in named:
        for t in sorted(set(tokenize(text))):
            nrows.append(f"({qid}, '{name}', '{t}')")
    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    topk AS (SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10),
    nterms AS (SELECT * FROM (VALUES {", ".join(nrows)}) n(qid, name, term)),
    hits AS (
      SELECT DISTINCT t.qid, t.doc_id, n.name
      FROM topk t JOIN nterms n ON n.qid = t.qid
      JOIN tf ON tf.doc_id = t.doc_id AND tf.term = n.term),
    names AS (
      SELECT qid, doc_id,
             string_agg(DISTINCT name, ',' ORDER BY name) AS matched_queries
      FROM hits GROUP BY 1, 2)
    SELECT t.qid, t.rank, t.doc_id, t.score_r,
           coalesce(n.matched_queries, '') AS matched_queries
    FROM topk t LEFT JOIN names n
      ON n.qid = t.qid AND n.doc_id = t.doc_id"""
    return fn, sql


QS_QUERIES = [
    (0, '+spark "window agg"'),
    (1, 'customer -"slow query" join'),
    (2, "fast filt* scan"),
    (3, "windo~ agg"),
    (4, "+table -merge sort"),
]
QS_EXP = 8


def _query_string_entry(qs, default_operator: str = "or") -> Entry:
    """Lucene query-string language (query/querystring.py): `+must`,
    `-must_not`, `"phrases"`, `glob*`, `fuzzy~` clauses compiled onto
    the engine's term/expansion/phrase machinery in ONE scoring pass.
    The twin regenerates every clause's SQL from the SAME parse:
    expansion windows (dist ASC / df DESC / term ASC for fuzzy, df DESC
    / term ASC for globs, cap {QS_EXP}), phrase adjacency via start-
    position grouping, must coverage counted over distinct clause ids,
    must_not as NOT EXISTS. default_operator="and" (ES
    simple_query_string contract) makes unprefixed clauses MUST —
    the SAME parse drives both engines, so the twin inherits it."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.querystring import query_string_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = query_string_search(
            spark, qs, idx, positions=idx.positions,
            k=10, max_expansions=QS_EXP,
            default_operator=default_operator,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.boolquery import wildcard_regex
    from dpr_spark.query.querystring import parse_query_string

    term_v, fuzzy_v, wild_v, phrase_v, nmust_v = [], [], [], [], []
    for qid, q in qs:
        clauses = parse_query_string(q, default_operator)
        nmust_v.append(
            f"({qid}, {sum(1 for c in clauses if c.occur == 'must')})"
        )
        for c in clauses:
            if c.kind == "term":
                term_v.append(f"({qid}, {c.cid}, '{c.occur}', '{c.text}')")
            elif c.kind == "fuzzy":
                fuzzy_v.append(
                    f"({qid}, {c.cid}, '{c.occur}', '{c.text}', {c.edits})"
                )
            elif c.kind == "wildcard":
                wild_v.append(
                    f"({qid}, {c.cid}, '{c.occur}', '{wildcard_regex(c.text)}')"
                )
            else:
                for off, t in enumerate(c.text.split(" ")):
                    phrase_v.append(
                        f"({qid}, {c.cid}, '{c.occur}', {off}, '{t}')"
                    )
    parts = []
    if term_v:
        parts.append(f"""
    pterms AS (SELECT * FROM (VALUES {", ".join(term_v)})
               p(qid, cid, occur, term)),
    c_term AS (
      SELECT p.qid, p.cid, p.occur, tf.doc_id,
             sum({_BM25_COMPONENT}) AS contrib
      FROM pterms p JOIN dict ON dict.term = p.term
      JOIN tf ON tf.term = p.term
      JOIN ds ON ds.doc_id = tf.doc_id CROSS JOIN stats
      GROUP BY 1, 2, 3, 4)""")
    if fuzzy_v:
        parts.append(f"""
    fz AS (SELECT * FROM (VALUES {", ".join(fuzzy_v)})
           f(qid, cid, occur, token, edits)),
    fexp AS (
      SELECT f.qid, f.cid, f.occur, d.term,
             1.0 - levenshtein(d.term, f.token)::DOUBLE
                   / greatest(length(f.token), length(d.term))::DOUBLE
               AS boost,
             row_number() OVER (PARTITION BY f.qid, f.cid
               ORDER BY levenshtein(d.term, f.token), d.df DESC, d.term)
               AS r
      FROM fz f JOIN dict d
        ON substr(d.term, 1, 1) = substr(f.token, 1, 1)
       AND levenshtein(d.term, f.token) <= f.edits),
    c_fuzzy AS (
      SELECT e.qid, e.cid, e.occur, tf.doc_id,
             sum(e.boost * {_BM25_COMPONENT}) AS contrib
      FROM (SELECT * FROM fexp WHERE r <= {QS_EXP}) e
      JOIN dict ON dict.term = e.term JOIN tf ON tf.term = e.term
      JOIN ds ON ds.doc_id = tf.doc_id CROSS JOIN stats
      GROUP BY 1, 2, 3, 4)""")
    if wild_v:
        parts.append(f"""
    wc AS (SELECT * FROM (VALUES {", ".join(wild_v)})
           w(qid, cid, occur, rx)),
    wexp AS (
      SELECT w.qid, w.cid, w.occur, d.term,
             row_number() OVER (PARTITION BY w.qid, w.cid
               ORDER BY d.df DESC, d.term) AS r
      FROM wc w JOIN dict d ON regexp_matches(d.term, w.rx)),
    c_wild AS (
      SELECT e.qid, e.cid, e.occur, tf.doc_id,
             sum({_BM25_COMPONENT}) AS contrib
      FROM (SELECT * FROM wexp WHERE r <= {QS_EXP}) e
      JOIN dict ON dict.term = e.term JOIN tf ON tf.term = e.term
      JOIN ds ON ds.doc_id = tf.doc_id CROSS JOIN stats
      GROUP BY 1, 2, 3, 4)""")
    if phrase_v:
        parts.append(f"""
    phq AS (SELECT * FROM (VALUES {", ".join(phrase_v)})
            q(qid, cid, occur, off, term)),
    phn AS (SELECT qid, cid, occur, count(*) AS n_off
            FROM phq GROUP BY 1, 2, 3),
    phidf AS (
      SELECT q.qid, q.cid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0))
               AS idf_sum,
             count(*) AS n_res
      FROM phq q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1, 2),
    phok AS (SELECT i.qid, i.cid, i.idf_sum
             FROM phidf i JOIN phn n ON n.qid = i.qid AND n.cid = i.cid
             WHERE i.n_res = n.n_off),
    phcand AS (
      SELECT q.qid, q.cid, pos.doc_id, pos.p - q.off AS start,
             count(*) AS n_hit
      FROM phq q JOIN pos USING (term) GROUP BY 1, 2, 3, 4),
    phpf AS (
      SELECT c.qid, c.cid, c.doc_id, count(*) AS pf
      FROM phcand c JOIN phn n ON n.qid = c.qid AND n.cid = c.cid
      WHERE c.n_hit = n.n_off GROUP BY 1, 2, 3),
    c_phrase AS (
      SELECT pf.qid, pf.cid, n.occur, pf.doc_id,
             k.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
               AS contrib
      FROM phpf pf
      JOIN phok k ON k.qid = pf.qid AND k.cid = pf.cid
      JOIN phn n ON n.qid = pf.qid AND n.cid = pf.cid
      JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats)""")
    union = "\n      UNION ALL\n".join(
        f"      SELECT * FROM c_{name}"
        for name, v in (
            ("term", term_v), ("fuzzy", fuzzy_v),
            ("wild", wild_v), ("phrase", phrase_v),
        )
        if v
    )
    sql = f"""
    WITH {_POS_CTES},{",".join(parts)},
    contribs AS (
{union}),
    nmust AS (SELECT * FROM (VALUES {", ".join(nmust_v)}) n(qid, n_must)),
    per_doc AS (
      SELECT qid, doc_id, sum(contrib) AS score,
             count(DISTINCT CASE WHEN occur = 'must' THEN cid END)
               AS must_hits
      FROM contribs WHERE occur != 'must_not' GROUP BY 1, 2),
    ok AS (
      SELECT p.qid, p.doc_id, p.score
      FROM per_doc p JOIN nmust USING (qid)
      WHERE p.must_hits = nmust.n_must
        AND NOT EXISTS (
          SELECT 1 FROM contribs v
          WHERE v.occur = 'must_not'
            AND v.qid = p.qid AND v.doc_id = p.doc_id)),
    ranked_qs AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM ok)
    SELECT qid, rank, doc_id, score_r FROM ranked_qs WHERE rank <= 10"""
    return fn, sql


def q_query_string_topk() -> Entry:
    return _query_string_entry(QS_QUERIES, "or")


QS_AND_QUERIES = [
    (0, 'spark window agg'),
    (1, 'customer join -batch'),
    (2, 'fast filt* scan'),
    (3, '"hash join" table'),
]


def q_query_string_and_topk() -> Entry:
    """simple_query_string with default_operator=AND: every unprefixed
    clause (terms, globs, phrases alike) is required; explicit `-`
    still vetoes. Same parse -> same twin SQL, with n_must counting the
    promoted clauses."""
    return _query_string_entry(QS_AND_QUERIES, "and")


def q_has_parent_topk() -> Entry:
    """ES `has_parent` (query/joinquery.py::has_parent_search; the other
    direction of has_child): top-10 CHILD docs whose parent (the decade
    leader doc_id − doc_id%10, a real indexed doc) matches the query —
    each child inherits its parent's BM25 score. Rank from
    round(score, 6) then doc_id."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.joinquery import has_parent_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        cp = docs.select(
            "doc_id",
            (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(10))).alias("parent"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = has_parent_search(qdf, idx, cp, score=True, k=10).select(
            "qid", "doc_id", "parent", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "parent", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    kids AS (SELECT doc_id, doc_id - doc_id % 10 AS parent FROM documents),
    joined AS (
      SELECT s.qid, k.doc_id, k.parent, s.score
      FROM scored s JOIN kids k ON k.parent = s.doc_id),
    ranked_p AS (
      SELECT qid, doc_id, parent, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
               ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM joined)
    SELECT qid, rank, doc_id, parent, score_r FROM ranked_p WHERE rank <= 10"""
    return fn, sql


def q_inner_hits() -> Entry:
    """ES has_child `inner_hits` (query/joinquery.py): for each of the
    top-3 parents (score_mode=max over children, parent = doc_id%25),
    the 2 best-scoring matching children. Both the parent selection and
    the child ranking use round(score, 6) in both engines."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.joinquery import (
            has_child_inner_hits,
            has_child_search,
        )

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        cp = docs.select(
            "doc_id", F.pmod(F.col("doc_id"), F.lit(25)).alias("parent")
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        allp = has_child_search(qdf, idx, cp, score_mode="max", k=1000)
        wp = Window.partitionBy("qid").orderBy(
            F.desc(F.round("score", 6)), F.asc("parent")
        )
        parents = (
            allp.withColumn("_r", F.row_number().over(wp))
            .filter(F.col("_r") <= 3)
            .select("qid", "parent")
        )
        res = has_child_inner_hits(
            qdf, idx, cp, parents, size=2, score_round=6, salt_buckets=4
        )
        return res.select(
            "qid", "parent", "rank", "doc_id",
            F.round("score", 6).alias("score_r"),
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    cp AS (SELECT doc_id, doc_id % 25 AS parent FROM documents),
    withp AS (SELECT s.qid, s.doc_id, c.parent, s.score
              FROM scored s JOIN cp c USING (doc_id)),
    pmax AS (SELECT qid, parent, max(score) AS pscore
             FROM withp GROUP BY 1, 2),
    parents AS (
      SELECT qid, parent FROM (
        SELECT qid, parent,
               row_number() OVER (PARTITION BY qid
                 ORDER BY round(pscore, 6) DESC, parent) AS r
        FROM pmax) WHERE r <= 3),
    inner_h AS (
      SELECT w.qid, w.parent, w.doc_id, round(w.score, 6) AS score_r,
             row_number() OVER (PARTITION BY w.qid, w.parent
               ORDER BY round(w.score, 6) DESC, w.doc_id) AS rank
      FROM withp w JOIN parents p
        ON p.qid = w.qid AND p.parent = w.parent)
    SELECT qid, parent, rank, doc_id, score_r
    FROM inner_h WHERE rank <= 2"""
    return fn, sql


def q_metric_aggs_misc() -> Entry:
    """ES `weighted_avg` + `value_count` + `missing` over the match set
    (query/aggs.py): Σ(n_chars·w)/Σ(w) with w = doc_id%5+1, and
    non-null/missing counts of a field defined only for doc_id%3 != 0."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import (
            value_count_missing_agg,
            weighted_avg_agg,
        )

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        vals = docs.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("v"),
            (F.pmod("doc_id", F.lit(5)) + 1).cast("double").alias("w"),
        )
        wa = weighted_avg_agg(qdf, idx, vals, "v", "w").select(
            "qid", F.round("weighted_avg", 6).alias("weighted_avg_r")
        )
        sparse = vals.filter(F.pmod("doc_id", F.lit(3)) != 0).select(
            "doc_id", "v"
        )
        vc = value_count_missing_agg(qdf, idx, sparse, "v")
        return wa.join(vc, "qid").select(
            "qid", "weighted_avg_r", "value_count", "missing"
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, m.doc_id, d.n_chars::DOUBLE AS v,
                  (m.doc_id % 5 + 1)::DOUBLE AS w
           FROM matches m JOIN documents d USING (doc_id)),
    wa AS (SELECT qid, round(sum(v * w) / sum(w), 6) AS weighted_avg_r
           FROM mv GROUP BY 1),
    vc AS (SELECT qid,
                  sum(CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END)::BIGINT
                    AS value_count,
                  sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
                    AS missing
           FROM mv GROUP BY 1)
    SELECT wa.qid, wa.weighted_avg_r, vc.value_count, vc.missing
    FROM wa JOIN vc USING (qid)"""
    return fn, sql


# ---------------------------------------------------------------------------
# link graph: fixed-point PageRank + anchor-text field (extras/graph.py)
# ---------------------------------------------------------------------------

# AS MATERIALIZED: DuckDB otherwise inlines a CTE per reference, which
# goes exponential across the chained graph iterations (measured: >2min
# -> 0.2s on the hits twin)
_LINK_CTES = f"""t AS MATERIALIZED (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      z AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok,
                   generate_subscripts(toks, 1) AS i FROM t),
      sh AS MATERIALIZED (SELECT DISTINCT a.doc_id,
                    a.tok || ' ' || b.tok || ' ' || c.tok AS anchor
             FROM z a JOIN z b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                      JOIN z c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
      rare AS MATERIALIZED (SELECT anchor FROM sh
               GROUP BY anchor HAVING count(*) BETWEEN 2 AND 3),
      hits AS MATERIALIZED (SELECT sh.anchor, sh.doc_id FROM sh JOIN rare USING (anchor)),
      triples AS MATERIALIZED (SELECT anchor, src, dst FROM (
          SELECT anchor,
                 lag(doc_id) OVER (PARTITION BY anchor ORDER BY doc_id) AS src,
                 doc_id AS dst FROM hits) WHERE src IS NOT NULL)"""


PAGERANK_ITERS, PAGERANK_SCALE = 5, 10**12


def _pagerank_ctes(n_iter: int = PAGERANK_ITERS, scale: int = PAGERANK_SCALE) -> str:
    """Chained-CTE unrolled fixed-point PageRank over the link edges —
    shared by the pagerank entry and the rank-feature boost twin."""
    tele = (scale * 15) // 100
    parts = [
        f"""{_LINK_CTES},
      edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM triples),
      nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
      outdeg AS MATERIALIZED (SELECT src, count(*) AS od FROM edges GROUP BY src),
      nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
      r0 AS MATERIALIZED (SELECT node, {scale}::BIGINT AS rank FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
      d{i} AS MATERIALIZED (SELECT (coalesce(sum(r.rank), 0)
                       // (SELECT n FROM nn))::BIGINT AS dsh
               FROM r{i - 1} r LEFT JOIN outdeg o ON r.node = o.src
               WHERE o.od IS NULL),
      r{i} AS MATERIALIZED (SELECT n.node,
                 ({tele} + (85 * (coalesce(s.s, 0)
                                  + (SELECT dsh FROM d{i}))) // 100)::BIGINT
                   AS rank
               FROM nodes n LEFT JOIN (
                 SELECT e.dst AS node, (sum(r.rank // o.od))::BIGINT AS s
                 FROM r{i - 1} r JOIN edges e ON r.node = e.src
                                 JOIN outdeg o ON o.src = e.src
                 GROUP BY e.dst) s ON s.node = n.node)"""
        )
    return "".join(parts)


_PAGERANK_CTES = _pagerank_ctes()


def q_pagerank_topk() -> Entry:
    """Fixed-point PageRank over the content link graph
    (extras/graph.py): edges between consecutive docs sharing a rare
    3-token shingle, 5 power iterations in int64 arithmetic (rank
    scaled by 1e12, integer division everywhere) — integer sums
    commute, so the result is bit-identical across partitionings and
    engines; the twin unrolls the same iterations as chained CTEs.
    Top-20 by (rank desc, doc_id) — the tiebreak matters because every
    no-inlink node holds the identical teleport-only rank."""
    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import pagerank, shingle_edges

        docs = _docs(spark, sf_dir)
        edges = shingle_edges(docs).select("src", "dst").distinct()
        pr = pagerank(
            docs.select("doc_id"), edges,
            n_iter=PAGERANK_ITERS, scale=PAGERANK_SCALE,
        )
        w = Window.orderBy(F.desc("pr"), F.asc("node"))
        return (
            pr.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= 20)
            .select("pos", F.col("node").alias("doc_id"), "pr")
        )

    return fn, (
        f"""
      WITH {_PAGERANK_CTES}
      SELECT pos, doc_id, pr FROM (
        SELECT node AS doc_id, rank AS pr,
               row_number() OVER (ORDER BY rank DESC, node) AS pos
        FROM r{PAGERANK_ITERS})
      WHERE pos <= 20"""
    )


def q_anchor_bm25f_topk() -> Entry:
    """Anchor-text ranking: each link's shingle becomes anchor text on
    the TARGET doc (the web-search signal: what other pages say about
    you), indexed as a second field of the fielded index and scored
    1.0*BM25_text + 1.5*BM25_anchor. Engine: extras/graph.shingle_edges
    + index/fielded.py; per-field avgdl counts anchor-less docs at
    length 0 in both engines. tf over the anchor field is a token
    multiset, so concat order is irrelevant cross-engine."""
    W_TEXT, W_ANCHOR = 1.0, 1.5

    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import shingle_edges
        from dpr_spark.index.fielded import build_fielded_index, search_fielded

        docs = _docs(spark, sf_dir)
        anch = (
            shingle_edges(docs)
            .groupBy("dst")
            .agg(F.concat_ws(" ", F.collect_list("anchor")).alias("anchor"))
            .withColumnRenamed("dst", "doc_id")
        )
        fdocs = (
            docs.select("doc_id", "text")
            .join(anch, "doc_id", "left")
            .withColumn("anchor", F.coalesce("anchor", F.lit("")))
        )
        idx = build_fielded_index(
            spark, fdocs, fields=("text", "anchor"),
            weights={"text": W_TEXT, "anchor": W_ANCHOR},
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_fielded(qdf, idx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH {_LINK_CTES},
      atok AS MATERIALIZED (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term
               FROM triples),
      ds AS (SELECT doc_id, 0 AS field_id, len(toks) AS doclen FROM t
             UNION ALL
             SELECT d.doc_id, 1 AS field_id, coalesce(a.c, 0) AS doclen
             FROM documents d LEFT JOIN (
               SELECT doc_id, count(*) AS c FROM atok GROUP BY doc_id) a
             USING (doc_id)),
      stats AS (SELECT field_id, count(*)::DOUBLE AS n, avg(doclen) AS avgdl
                FROM ds GROUP BY 1),
      tf AS (SELECT doc_id, 0 AS field_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM t)
             GROUP BY doc_id, term
             UNION ALL
             SELECT doc_id, 1 AS field_id, term, count(*) AS tf
             FROM atok GROUP BY doc_id, term),
      dict AS (SELECT field_id, term, count(*) AS df FROM tf GROUP BY 1, 2),
      qt AS (SELECT * FROM (VALUES {{QTERMS}}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum((CASE WHEN tf.field_id = 1 THEN {W_ANCHOR} ELSE {W_TEXT} END)
                   * ln((s.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / s.avgdl))
               ) AS score
        FROM qt
        JOIN dict ON dict.term = qt.term
        JOIN tf ON tf.term = qt.term AND tf.field_id = dict.field_id
        JOIN ds ON ds.doc_id = tf.doc_id AND ds.field_id = tf.field_id
        JOIN stats s ON s.field_id = tf.field_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql.replace("{QTERMS}", _qterm_values_sql())


def q_hits_topk() -> Entry:
    """Fixed-point HITS hubs/authorities over the content link graph
    (extras/graph.py::hits, Kleinberg 1999): 3 iterations, integer
    max-normalization (scale 1e6) so scores are bit-identical
    cross-engine; top-10 authorities and top-10 hubs, tie-broken by
    doc_id (edge-less nodes all score 0)."""
    from dpr_spark.extras.graph import HITS_SCALE

    n_iter = 3

    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import hits, shingle_edges

        docs = _docs(spark, sf_dir)
        edges = shingle_edges(docs).select("src", "dst").distinct()
        res = hits(docs.select("doc_id"), edges, n_iter=n_iter)
        wa = Window.orderBy(F.desc("auth"), F.asc("node"))
        wh = Window.orderBy(F.desc("hub"), F.asc("node"))
        top_a = res.withColumn("rank", F.row_number().over(wa)).select(
            F.lit("auth").alias("kind"), "rank",
            F.col("node").alias("doc_id"), F.col("auth").alias("score"),
        )
        top_h = res.withColumn("rank", F.row_number().over(wh)).select(
            F.lit("hub").alias("kind"), "rank",
            F.col("node").alias("doc_id"), F.col("hub").alias("score"),
        )
        return top_a.unionByName(top_h).filter(F.col("rank") <= 10)

    parts = [
        f"""
      WITH {_LINK_CTES},
      edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM triples),
      nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
      h0 AS MATERIALIZED (SELECT node, {HITS_SCALE}::BIGINT AS hub FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
      asum{i} AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub) AS s
                  FROM h{i - 1} h JOIN edges e ON h.node = e.src
                  GROUP BY e.dst),
      a{i} AS MATERIALIZED (SELECT n.node,
                 (coalesce(sa.s, 0) * {HITS_SCALE}
                  // (SELECT greatest(max(s), 1) FROM asum{i}))::BIGINT AS auth
               FROM nodes n LEFT JOIN asum{i} sa ON sa.node = n.node),
      hsum{i} AS MATERIALIZED (SELECT e.src AS node, sum(a.auth) AS s
                  FROM a{i} a JOIN edges e ON a.node = e.dst
                  GROUP BY e.src),
      h{i} AS MATERIALIZED (SELECT n.node,
                 (coalesce(sh.s, 0) * {HITS_SCALE}
                  // (SELECT greatest(max(s), 1) FROM hsum{i}))::BIGINT AS hub
               FROM nodes n LEFT JOIN hsum{i} sh ON sh.node = n.node)"""
        )
    parts.append(
        f"""
      SELECT kind, rank, doc_id, score FROM (
        SELECT 'auth' AS kind,
               row_number() OVER (ORDER BY auth DESC, node) AS rank,
               node AS doc_id, auth AS score FROM a{n_iter}
        UNION ALL
        SELECT 'hub' AS kind,
               row_number() OVER (ORDER BY hub DESC, node) AS rank,
               node AS doc_id, hub AS score FROM h{n_iter})
      WHERE rank <= 10"""
    )
    return fn, "".join(parts)


def q_link_graph_stats() -> Entry:
    """Link-graph shape summary: node/edge/dangling counts and degree
    maxima — the numbers a crawl-pipeline operator reads before running
    anything iterative over the graph."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import shingle_edges

        docs = _docs(spark, sf_dir)
        edges = shingle_edges(docs).select("src", "dst").distinct().persist()
        nodes = docs.select("doc_id")
        outd = edges.groupBy("src").agg(F.count("*").alias("d"))
        ind = edges.groupBy("dst").agg(F.count("*").alias("d"))
        n_nodes = nodes.count()
        n_edges = edges.count()
        dangling = nodes.join(outd, nodes.doc_id == outd.src, "left_anti").count()
        max_out = outd.agg(F.coalesce(F.max("d"), F.lit(0))).collect()[0][0]
        max_in = ind.agg(F.coalesce(F.max("d"), F.lit(0))).collect()[0][0]
        edges.unpersist()
        return spark.createDataFrame(
            [(n_nodes, n_edges, dangling, int(max_out), int(max_in))],
            "n_nodes long, n_edges long, n_dangling long, max_out long, max_in long",
        )

    sql = f"""
      WITH {_LINK_CTES},
      edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM triples),
      outd AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
      ind AS MATERIALIZED (SELECT dst, count(*) AS d FROM edges GROUP BY dst)
      SELECT (SELECT count(*) FROM documents)::BIGINT AS n_nodes,
             (SELECT count(*) FROM edges)::BIGINT AS n_edges,
             (SELECT count(*) FROM documents d
              WHERE NOT EXISTS (SELECT 1 FROM outd o WHERE o.src = d.doc_id)
             )::BIGINT AS n_dangling,
             (SELECT coalesce(max(d), 0) FROM outd)::BIGINT AS max_out,
             (SELECT coalesce(max(d), 0) FROM ind)::BIGINT AS max_in"""
    return fn, sql


def q_rank_feature_topk() -> Entry:
    """Rank-feature boost (ES rank_feature query / web-search authority
    prior): BM25 x ln(1 + pagerank), boost_mode=multiply over every
    matched doc — the classic query-independent authority signal folded
    into relevance via the function-score machinery (funcscore.py).
    The pagerank doc-values come from the fixed-point engine
    (extras/graph.py), so the boost input is bit-identical cross-engine
    and only the final float product needs the 6-dp rounded rank."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.graph import pagerank, shingle_edges
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.funcscore import search_function_score

        docs = _docs(spark, sf_dir)
        edges = shingle_edges(docs).select("src", "dst").distinct()
        pr = pagerank(
            docs.select("doc_id"), edges,
            n_iter=PAGERANK_ITERS, scale=PAGERANK_SCALE,
        ).withColumnRenamed("node", "doc_id")
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_function_score(
            qdf, idx, pr, "pr",
            lambda c: F.log1p(c.cast("double") / F.lit(float(PAGERANK_SCALE))),
            k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    {_PAGERANK_CTES},
    rf AS (
      SELECT s.qid, s.doc_id,
             s.score * ln(1.0 + r{PAGERANK_ITERS}.rank
                                / {float(PAGERANK_SCALE)!r}) AS score
      FROM scored s JOIN r{PAGERANK_ITERS} ON r{PAGERANK_ITERS}.node = s.doc_id),
    ranked_rf AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM rf)
    SELECT qid, rank, doc_id, score_r FROM ranked_rf WHERE rank <= 10"""
    return fn, sql


# ---------------------------------------------------------------------------
# web-corpus cleaning (extras/webclean.py): Gopher repetition stats,
# benchmark decontamination, PII redaction, URL canonicalization,
# boilerplate stripping
# ---------------------------------------------------------------------------

_LINE_TOKENS = 2  # the synthetic corpus has no newlines; entries chunk
# tokens into 2-token "lines" (measured: 3.6% within-doc duplicate lines,
# 92 cross-doc boilerplate lines at sf0.01 — nonzero signal, audit rule)

# multi-line text built from 2-token chunks, identical in both engines
_DUCK_LINES = (
    f"list_transform(range(0, cast(ceil(len(toks) / {_LINE_TOKENS}.0) AS INT)), "
    f"i -> array_to_string(toks[i * {_LINE_TOKENS} + 1 : i * {_LINE_TOKENS} + {_LINE_TOKENS}], ' '))"
)


def _multiline_docs(spark, sf_dir) -> DataFrame:
    # tokens into a NAMED column first: the tokenizer expression inside
    # the transform() lambda re-runs per array element otherwise
    # (interpreted HOF eval — measured 10x on exactly this shape)
    toks = F.col("_toks")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", _tok_col().alias("_toks"))
        .select(
            "doc_id",
            "source",
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(toks) / _LINE_TOKENS).cast("int") - 1,
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i * _LINE_TOKENS + 1, _LINE_TOKENS)
                    ),
                ),
            ).alias("text"),
        )
    )


def q_c4_clean() -> Entry:
    """C4 cleaning heuristics (extras/webclean c4_clean; Raffel et al.
    2020 §2.2): terminal-punctuation + min-word line filter, kept-text
    sentence minimum, lorem-ipsum / curly-brace / badword page rules.
    Both engines synthesize the same punctuated multi-line text from
    the token stream (5-token lines; every 3rd line unterminated; 1-in-7
    docs get a brace line, 1-in-11 a lorem-ipsum lead, 1-in-13 a
    badword line), so every rule fires on a real subset."""

    LW = 5  # tokens per synthetic line

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import c4_clean

        # named token column: the tokenizer inside the transform() lambda
        # would re-run per array element (interpreted HOF eval)
        toks = F.col("_toks")
        n_lines = F.ceil(F.size(toks) / LW).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat(
                F.concat_ws(" ", F.slice(toks, i * LW + 1, LW)),
                F.when(i % 3 == 0, F.lit("."))
                .when(i % 3 == 1, F.lit(""))
                .otherwise(F.lit("?")),
            ),
        )
        text = F.concat_ws("\n", lines)
        text = F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("lorem ipsum comes first here.\n"), text),
        ).otherwise(text)
        text = F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(text, F.lit("\ncurly brace line { here okay.")),
        ).otherwise(text)
        text = F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(text, F.lit("\nthis verboten word line ends.")),
        ).otherwise(text)
        d = (
            _docs(spark, sf_dir)
            .select("doc_id", _tok_col().alias("_toks"))
            .select("doc_id", text.alias("text"))
        )
        return c4_clean(d, badwords=("verboten",)).orderBy("doc")

    sql = f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    built AS (
      SELECT doc_id,
        array_to_string(list_transform(
          range(0, cast(ceil(len(toks) / {LW}.0) AS INT)),
          i -> array_to_string(toks[i * {LW} + 1 : i * {LW} + {LW}], ' ')
               || CASE WHEN i % 3 = 0 THEN '.'
                       WHEN i % 3 = 1 THEN ''
                       ELSE '?' END), chr(10)) AS base
      FROM t),
    txt AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 11 = 0
              THEN 'lorem ipsum comes first here.' || chr(10) ELSE '' END)
        || base
        || (CASE WHEN doc_id % 7 = 0
                 THEN chr(10) || 'curly brace line {{ here okay.' ELSE '' END)
        || (CASE WHEN doc_id % 13 = 0
                 THEN chr(10) || 'this verboten word line ends.' ELSE '' END)
        AS text
      FROM built),
    m AS (
      SELECT doc_id AS doc, text,
        string_split(text, chr(10)) AS ls,
        list_filter(string_split(text, chr(10)),
          l -> regexp_matches(rtrim(l), '[.!?"]$')
           AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                               w -> w <> '')) >= 5) AS kept
      FROM txt),
    o AS (
      SELECT doc,
        array_to_string(kept, chr(10)) AS clean_text,
        len(kept)::BIGINT AS n_kept_lines,
        len(ls)::BIGINT AS n_lines,
        (length(array_to_string(kept, chr(10)))
         - length(regexp_replace(array_to_string(kept, chr(10)),
                                 '[.!?]', '', 'g')))::BIGINT AS n_sentences,
        NOT (lower(text) LIKE '%lorem ipsum%') AS rule_no_lorem_ipsum,
        NOT (lower(text) LIKE '%{{%') AS rule_no_brace,
        NOT list_has_any(
          list_filter(regexp_split_to_array(lower(text), '\\s+'),
                      w -> w <> ''), ['verboten']) AS rule_no_badword
      FROM m)
    SELECT doc, clean_text, n_kept_lines, n_lines, n_sentences,
      (n_sentences >= 3) AS rule_min_sentences,
      rule_no_lorem_ipsum, rule_no_brace, rule_no_badword,
      ((n_sentences >= 3) AND rule_no_lorem_ipsum AND rule_no_brace
       AND rule_no_badword) AS c4_keep
    FROM o ORDER BY doc"""
    return fn, sql


def q_gopher_rules() -> Entry:
    """Gopher non-repetition quality rules (extras/webclean
    gopher_quality_rules; Rae et al. 2021 §A1.1): word-count bounds,
    mean word length, symbol-to-word ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, and the 8-word stop-word
    requirement — raw metrics + per-rule booleans + the AND. Pure
    per-row column math (no shuffle) on the Spark side; the twin
    recomputes every metric from the same reconstructed multi-line
    text. min_words=60 / min_stop_word_hits=1 tuned so the synthetic
    corpus splits on both rules."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import gopher_quality_rules

        return gopher_quality_rules(
            _multiline_docs(spark, sf_dir).select("doc_id", "text"),
            min_words=60,
            min_stop_word_hits=1,
        ).orderBy("doc")

    wc = "list_sum(list_transform(ws, w -> length(w)))"
    joined = "array_to_string(ws, ' ')"
    sql = f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    base AS (SELECT doc_id AS doc, toks AS ws, {_DUCK_LINES} AS ls FROM t),
    m AS (
      SELECT doc,
        len(ws)::BIGINT AS n_words,
        round(coalesce({wc}, 0) / greatest(len(ws), 1)::DOUBLE, 6)
          AS mean_word_len,
        round((coalesce(list_sum(list_transform(ws,
                 w -> length(w) - length(replace(w, '#', '')))), 0)
               + length({joined}) - length(replace({joined}, '…', ''))
               + (length({joined})
                  - length(regexp_replace({joined}, '\\.\\.\\.', '', 'g'))) / 3.0
              ) / greatest(len(ws), 1)::DOUBLE, 6) AS symbol_word_ratio,
        round(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[•‣▪*-]')))
              / greatest(len(ls), 1)::DOUBLE, 6) AS bullet_line_frac,
        round(len(list_filter(ls, l -> ends_with(rtrim(l), '…')
                                    OR ends_with(rtrim(l), '...')))
              / greatest(len(ls), 1)::DOUBLE, 6) AS ellipsis_line_frac,
        round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
              / greatest(len(ws), 1)::DOUBLE, 6) AS alpha_word_frac,
        len(list_filter(['the','be','to','of','and','that','have','with'],
                        s -> list_contains(ws, s)))::BIGINT AS stop_word_hits
      FROM base)
    SELECT doc, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
      ellipsis_line_frac, alpha_word_frac, stop_word_hits,
      (n_words >= 60 AND n_words <= 100000) AS rule_word_count,
      (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
      (symbol_word_ratio <= 0.1) AS rule_symbol_ratio,
      (bullet_line_frac <= 0.9) AS rule_bullet_lines,
      (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
      (alpha_word_frac >= 0.8) AS rule_alpha_words,
      (stop_word_hits >= 1) AS rule_stop_words,
      ((n_words >= 60 AND n_words <= 100000)
       AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
       AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
       AND stop_word_hits >= 1) AS gopher_pass
    FROM m ORDER BY doc"""
    return fn, sql


def q_repetition_stats() -> Entry:
    """Gopher-style intra-document repetition metrics (extras/webclean
    repetition_stats): duplicate-line fractions over 2-token chunk lines
    plus top-{2,3,4}-gram and dup-{2,3}-gram character fractions. The
    Spark side is per-row fold math (no shuffle); the twin recomputes
    each metric with unnest + GROUP BY."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import repetition_stats

        return repetition_stats(_multiline_docs(spark, sf_dir)).orderBy("doc")

    gram_ctes, joins, outs = [], [], []
    for n, kind in ((2, "top"), (3, "top"), (4, "top"), (2, "dup"), (3, "dup")):
        g = f"g{n}"
        if not any(c.startswith(f"{g} AS") for c in gram_ctes):
            gram_ctes.append(
                f"{g} AS (SELECT doc_id, array_to_string(toks[i + 1 : i + {n}], ' ') AS g"
                f" FROM base, unnest(range(0, len(toks) - {n} + 1)) t(i)"
                f" WHERE len(toks) >= {n}),"
                f" {g}c AS (SELECT doc_id, g, count(*) AS c FROM {g} GROUP BY 1, 2)"
            )
        if kind == "top":
            gram_ctes.append(
                f"top{n} AS (SELECT doc_id, c * len(g) AS num FROM ("
                f"SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id"
                f" ORDER BY c DESC, len(g) DESC, g ASC) AS rn FROM {g}c) WHERE rn = 1)"
            )
            joins.append(f"LEFT JOIN top{n} ON top{n}.doc_id = b.doc_id")
            outs.append(
                f"round(coalesce(top{n}.num, 0) / greatest(b.tok_chars, 1), 6)"
                f" AS top{n}gram_char_frac"
            )
        else:
            gram_ctes.append(
                f"dup{n} AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c * len(g)"
                f" ELSE 0 END)::BIGINT AS num FROM {g}c GROUP BY 1)"
            )
            joins.append(f"LEFT JOIN dup{n} ON dup{n}.doc_id = b.doc_id")
            outs.append(
                f"round(coalesce(dup{n}.num, 0) / greatest(b.tok_chars, 1), 6)"
                f" AS dup{n}gram_char_frac"
            )
    # column order must match the Spark side: tops then dups
    outs = outs[:3] + outs[3:]
    sql = f"""
    WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS toks,
                         len(array_to_string({_DUCK_TOKS}, ' ')) AS tok_chars
                  FROM documents),
    lines AS (SELECT doc_id, unnest({_DUCK_LINES}) AS line FROM base),
    lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
    lstats AS (SELECT doc_id,
                      sum(c)::BIGINT AS n_lines,
                      sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dupn,
                      sum(c * len(line))::BIGINT AS line_chars,
                      sum(CASE WHEN c > 1 THEN c * len(line) ELSE 0 END)::BIGINT AS dupc
               FROM lc GROUP BY 1),
    {", ".join(gram_ctes)},
    b AS (SELECT base.doc_id, base.tok_chars, l.n_lines, l.dupn, l.dupc, l.line_chars
          FROM base JOIN lstats l ON l.doc_id = base.doc_id)
    SELECT b.doc_id AS doc, b.n_lines,
           round(b.dupn / greatest(b.n_lines, 1), 6) AS dup_line_frac,
           round(b.dupc / greatest(b.line_chars, 1), 6) AS dup_line_char_frac,
           {", ".join(outs)}
    FROM b {" ".join(joins)}
    ORDER BY doc"""
    return fn, sql


def q_decontaminate_ngrams() -> Entry:
    """Benchmark 8-gram decontamination (extras/webclean
    ngram_decontaminate): benchmark grams = tokens[5..12] of every
    doc_id % 29 == 0 document; output = (doc, n_hits) for every
    contaminated document. Entry uses join_on="text" (the exact
    contract the twin expresses); production defaults to the 64-bit
    hash join, which can only over-flag."""
    N = 8

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import ngram_decontaminate

        docs = _docs(spark, sf_dir)
        toks = _tok_col()
        bench = (
            docs.filter(F.col("doc_id") % 29 == 0)
            .filter(F.size(toks) >= 12)
            .select(F.concat_ws(" ", F.slice(toks, 5, N)).alias("gram"))
        )
        return ngram_decontaminate(docs, bench, n=N, join_on="text").orderBy("doc")

    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    bench AS (SELECT DISTINCT array_to_string(toks[5 : {4 + N}], ' ') AS gram
              FROM tok WHERE doc_id % 29 = 0 AND len(toks) >= 12),
    dg AS (SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + {N}], ' ') AS g
           FROM tok, unnest(range(0, len(toks) - {N} + 1)) t(i)
           WHERE len(toks) >= {N})
    SELECT doc_id AS doc, count(*)::BIGINT AS n_hits
    FROM dg JOIN bench ON dg.g = bench.gram
    GROUP BY 1 ORDER BY doc"""
    return fn, sql


_PII_SUFFIX_SPARK = None  # built inline below


def _pii_text_col():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.com today"),
            ),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit(" server 10."),
                (did % 200).cast("string"),
                F.lit(".3."),
                (did % 97).cast("string"),
                F.lit(" online"),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(
                F.lit(" call 555-010-"),
                F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.lit("")),
    )


_PII_TEXT_SQL = (
    "text || CASE"
    " WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id || '@mail.example.com today'"
    " WHEN doc_id % 4 = 1 THEN ' server 10.' || (doc_id % 200) || '.3.' || (doc_id % 97) || ' online'"
    " WHEN doc_id % 4 = 2 THEN ' call 555-010-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') || ' now'"
    " ELSE '' END"
)


def q_pii_redact() -> Entry:
    """PII redaction (extras/webclean pii_redact): count + mask emails,
    IPv4s and phone-shaped numbers. PII is injected deterministically
    (the synthetic corpus has none — audit rule: nonzero rows) with the
    same expression in both engines; regexes are Java∩RE2."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import pii_redact

        d = _docs(spark, sf_dir).select("doc_id", _pii_text_col().alias("text"))
        return pii_redact(d).orderBy("doc")

    from dpr_spark.extras.webclean import EMAIL_RX, IPV4_RX, PHONE_RX

    sql = f"""
    WITH t AS (SELECT doc_id, {_PII_TEXT_SQL} AS txt FROM documents)
    SELECT doc_id AS doc,
           len(regexp_extract_all(txt, '{EMAIL_RX}'))::BIGINT AS n_email,
           len(regexp_extract_all(txt, '{IPV4_RX}'))::BIGINT AS n_ip,
           len(regexp_extract_all(txt, '{PHONE_RX}'))::BIGINT AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(txt,
             '{EMAIL_RX}', '<EMAIL>', 'g'),
             '{IPV4_RX}', '<IP>', 'g'),
             '{PHONE_RX}', '<PHONE>', 'g') AS redacted
    FROM t ORDER BY doc"""
    return fn, sql


def q_fix_mojibake() -> Entry:
    """Encoding repair (extras/mojibake fix_mojibake): Latin-1-class
    mojibake fixed by a pure-JVM encode/decode roundtrip. Damage is
    injected deterministically (the synthetic corpus is ASCII — 'a'
    becomes the 2-byte mojibake of a-acute, 'e' the 3-byte mojibake of
    an em dash); the twin states the expected repair directly, so the
    entry cross-checks Spark's real charset roundtrip against the
    declared byte semantics."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.mojibake import fix_mojibake

        corrupted = F.regexp_replace(
            F.regexp_replace(F.col("text"), "a", "\u00c3\u00a1"),
            "e", "\u00e2\u0080\u0094",
        )
        d = _docs(spark, sf_dir).select("doc_id", corrupted.alias("text"))
        return fix_mojibake(d).orderBy("doc")

    sql = """
    SELECT doc_id AS doc,
           replace(replace(text, 'a', chr(225)), 'e', chr(8212)) AS fixed,
           (contains(text, 'a') OR contains(text, 'e')) AS changed
    FROM documents ORDER BY doc"""
    return fn, sql


_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END"
    " || source || '.example.com/p/' || (doc_id % 3) || CASE"
    " WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=a'"
    " WHEN doc_id % 4 = 1 THEN '/'"
    " WHEN doc_id % 4 = 2 THEN '#frag' ELSE '' END"
)


def _url_col():
    did = F.col("doc_id")
    return F.concat(
        F.lit("https://"),
        F.when(did % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com/p/"),
        (did % 3).cast("string"),
        F.when(did % 4 == 0, F.lit("?utm_source=feed&ref=a"))
        .when(did % 4 == 1, F.lit("/"))
        .when(did % 4 == 2, F.lit("#frag"))
        .otherwise(F.lit("")),
    )


def q_url_canonical_latest() -> Entry:
    """URL canonicalization + latest-wins dedup (extras/webclean
    canonical_url / latest_by_canonical_url): synthesized crawl urls
    (www/tracking-params/fragment/trailing-slash variants) collapse to
    one row per canonical url, keeping the highest-ts (doc_id) version.
    The twin replays the same regexp chain with RE2."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import latest_by_canonical_url

        d = _docs(spark, sf_dir).select(
            "doc_id",
            "source",
            _url_col().alias("url"),
            F.col("doc_id").cast("long").alias("ts"),
        )
        return latest_by_canonical_url(d, keep_cols=("doc_id",)).orderBy(
            "canonical_url"
        )

    sql = f"""
    WITH u AS (SELECT doc_id, doc_id::BIGINT AS ts, {_URL_SQL} AS url FROM documents),
    canon AS (SELECT doc_id, ts,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(lower(url), '#.*$', ''),
        '^https?://', ''),
        '^www\\.', ''),
        '(utm_[a-z0-9]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
        '[?&]+$', ''),
        '/+$', '') AS canonical_url
      FROM u)
    SELECT canonical_url, max(ts) AS ts, arg_max(doc_id, ts) AS doc_id
    FROM canon GROUP BY 1 ORDER BY canonical_url"""
    return fn, sql


def q_boilerplate_strip() -> Entry:
    """Cross-document boilerplate stripping (extras/webclean
    strip_boilerplate): 2-token chunk lines occurring in ≥4 distinct
    documents of the same source are removed; output preserves line
    order in clean_text. Spark counts/joins on (source, xxhash64(line));
    the twin keys on line text (identical absent 64-bit collisions)."""
    MIN_DOCS = 4

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import strip_boilerplate

        return strip_boilerplate(
            _multiline_docs(spark, sf_dir), group_col="source", min_docs=MIN_DOCS
        ).orderBy("doc")

    sql = f"""
    WITH base AS (SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents),
    la AS (SELECT doc_id, source, {_DUCK_LINES} AS arr FROM base),
    lines AS (SELECT doc_id, source, i AS pos, arr[i + 1] AS line
              FROM la, unnest(range(0, len(arr))) t(i)),
    boiler AS (SELECT source, line FROM lines
               GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= {MIN_DOCS}),
    flagged AS (SELECT l.doc_id, l.source, l.pos, l.line,
                       (b.line IS NOT NULL) AS boil
                FROM lines l LEFT JOIN boiler b
                  ON l.source = b.source AND l.line = b.line)
    SELECT doc_id AS doc, source,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN boil THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           coalesce(string_agg(CASE WHEN NOT boil THEN line END, chr(10)
                               ORDER BY pos), '') AS clean_text
    FROM flagged GROUP BY 1, 2 ORDER BY doc"""
    return fn, sql


def q_extended_stats() -> Entry:
    """ES `extended_stats` + `median_absolute_deviation` + single-metric
    `top_metrics` over each query's match set (query/aggs.py::
    extended_stats_agg). Variance/std/σ-bounds are derived from EXACT
    integer sums with the same textual IEEE expression in both engines;
    MAD uses exact interpolated medians (Spark percentile ≡ DuckDB
    quantile_cont); top_v = n_chars at the max doc_id."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import extended_stats_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = extended_stats_agg(qdf, idx, docs.select("doc_id", "n_chars"), "n_chars")
        return res.select(
            "qid", "n", "sum_v", "sum_sq",
            F.round("avg_v", 6).alias("avg_r"),
            F.round("var_v", 6).alias("var_r"),
            F.round("std_v", 6).alias("std_r"),
            F.round("upper_v", 6).alias("upper_r"),
            F.round("lower_v", 6).alias("lower_r"),
            F.round("mad_v", 6).alias("mad_r"),
            F.round("top_v", 6).alias("top_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, m.doc_id, d.n_chars AS v
           FROM matches m JOIN documents d USING (doc_id)),
    med AS (SELECT qid, quantile_cont(v::DOUBLE, 0.5) AS med FROM mv GROUP BY 1),
    madt AS (SELECT mv.qid, quantile_cont(abs(mv.v - med.med), 0.5) AS mad_v
             FROM mv JOIN med USING (qid) GROUP BY 1),
    base AS (SELECT qid, count(*) AS n,
                    sum(v)::BIGINT AS sum_v,
                    sum(v * v)::BIGINT AS sum_sq,
                    arg_max(v::DOUBLE, doc_id) AS top_v
             FROM mv GROUP BY 1),
    o AS (SELECT b.qid, b.n, b.sum_v, b.sum_sq,
                 b.sum_v::DOUBLE / b.n AS avg_v,
                 b.sum_sq::DOUBLE / b.n
                   - (b.sum_v::DOUBLE / b.n) * (b.sum_v::DOUBLE / b.n) AS var_v,
                 sqrt(b.sum_sq::DOUBLE / b.n
                   - (b.sum_v::DOUBLE / b.n) * (b.sum_v::DOUBLE / b.n)) AS std_v,
                 m.mad_v, b.top_v
          FROM base b JOIN madt m USING (qid))
    SELECT qid, n, sum_v, sum_sq,
           round(avg_v, 6) AS avg_r,
           round(var_v, 6) AS var_r,
           round(std_v, 6) AS std_r,
           round(avg_v + 2.0::DOUBLE * std_v, 6) AS upper_r,
           round(avg_v - 2.0::DOUBLE * std_v, 6) AS lower_r,
           round(mad_v, 6) AS mad_r,
           round(top_v, 6) AS top_r
    FROM o"""
    return fn, sql


def q_dist_aggs() -> Entry:
    """ES `percentile_ranks` + `boxplot` over each query's match set
    (query/aggs.py::percentile_ranks_boxplot_agg): exact CDF ranks at
    n_chars ∈ {400, 700} and exact-quantile boxplot with 1.5·IQR-clamped
    whiskers. Percentile interpolation is the shared exact contract
    (Spark percentile ≡ DuckDB quantile_cont); rank sums are
    integer-derived."""
    XS = (400.0, 700.0)

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import percentile_ranks_boxplot_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = percentile_ranks_boxplot_agg(
            qdf, idx, docs.select("doc_id", "n_chars"), "n_chars", rank_values=XS
        )
        return res.select(
            "qid", "n",
            F.round("q1", 6).alias("q1_r"),
            F.round("q2", 6).alias("q2_r"),
            F.round("q3", 6).alias("q3_r"),
            F.round("lower_whisker", 6).alias("lw_r"),
            F.round("upper_whisker", 6).alias("uw_r"),
            F.round("rank_at_0", 6).alias("rank400_r"),
            F.round("rank_at_1", 6).alias("rank700_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, d.n_chars::DOUBLE AS v
           FROM matches m JOIN documents d USING (doc_id)),
    b AS (SELECT qid, count(*) AS n, min(v) AS mn, max(v) AS mx,
                 quantile_cont(v, 0.25) AS q1,
                 quantile_cont(v, 0.5) AS q2,
                 quantile_cont(v, 0.75) AS q3,
                 sum(CASE WHEN v <= {XS[0]!r}::DOUBLE THEN 1 ELSE 0 END) * 100.0::DOUBLE AS le0,
                 sum(CASE WHEN v <= {XS[1]!r}::DOUBLE THEN 1 ELSE 0 END) * 100.0::DOUBLE AS le1
          FROM mv GROUP BY 1)
    SELECT qid, n,
           round(q1, 6) AS q1_r, round(q2, 6) AS q2_r, round(q3, 6) AS q3_r,
           round(greatest(mn, q1 - 1.5::DOUBLE * (q3 - q1)), 6) AS lw_r,
           round(least(mx, q3 + 1.5::DOUBLE * (q3 - q1)), 6) AS uw_r,
           round(le0 / n, 6) AS rank400_r,
           round(le1 / n, 6) AS rank700_r
    FROM b"""
    return fn, sql


GEO_BOX_QUERIES = [
    (0, 30.0, -50.0, -10.0, 40.0),
    (1, 59.0, 100.0, 20.0, 149.0),
    (2, -20.0, -149.0, -59.0, -60.0),
    (3, 5.0, -5.0, -5.0, 5.0),
    (4, -59.0, 140.0, -60.0, 149.0),  # sliver: few/no docs
]


def q_geo_bounding_box() -> Entry:
    """ES geo_bounding_box filter (query/geo.py::geo_bounding_box_search):
    constant-score box containment, doc_id-ascending rank — the join
    condition is pure lat/lon range predicates (the BKD box visit with
    no verify phase)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.geo import geo_bounding_box_search

        geo = _doc_geo(spark, sf_dir)
        res = geo_bounding_box_search(spark, GEO_BOX_QUERIES, geo, k=15)
        return res.select(
            "qid", "rank", "doc_id",
            F.round("lat", 6).alias("lat_r"),
            F.round("lon", 6).alias("lon_r"),
        )

    qvals = ", ".join(
        f"({qid}, {t!r}::DOUBLE, {l!r}::DOUBLE, {b!r}::DOUBLE, {r!r}::DOUBLE)"
        for qid, t, l, b, r in GEO_BOX_QUERIES
    )
    sql = f"""
    WITH geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
                 FROM documents),
    gq AS (SELECT * FROM (VALUES {qvals}) AS q(qid, t, l, b, r)),
    hit AS (SELECT gq.qid, geo.doc_id, geo.lat, geo.lon
            FROM gq JOIN geo ON geo.lat <= gq.t AND geo.lat >= gq.b
                 AND geo.lon >= gq.l AND geo.lon <= gq.r),
    ranked AS (SELECT qid, doc_id, lat, lon,
                      row_number() OVER (PARTITION BY qid ORDER BY doc_id)
                        AS rank
               FROM hit)
    SELECT qid, rank, doc_id, round(lat, 6) AS lat_r, round(lon, 6) AS lon_r
    FROM ranked WHERE rank <= 15"""
    return fn, sql


def q_geo_bounds_centroid() -> Entry:
    """ES geo_bounds + geo_centroid over each query's match set
    (query/geo.py::geo_bounds_centroid_agg): bounding box of matched
    points + arithmetic centroid, both engines on bit-identical
    integer-derived coordinates."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches
        from dpr_spark.query.geo import geo_bounds_centroid_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = geo_bounds_centroid_agg(
            _matches(qdf, idx), _doc_geo(spark, sf_dir)
        )
        return res.select(
            "qid", "n",
            F.round("top", 6).alias("top_r"),
            F.round("bottom", 6).alias("bottom_r"),
            F.round("left", 6).alias("left_r"),
            F.round("right", 6).alias("right_r"),
            F.round("c_lat", 6).alias("clat_r"),
            F.round("c_lon", 6).alias("clon_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
            FROM documents),
    mv AS (SELECT m.qid, g.lat, g.lon
           FROM matches m JOIN geo g USING (doc_id))
    SELECT qid, count(*) AS n,
           round(max(lat), 6) AS top_r, round(min(lat), 6) AS bottom_r,
           round(min(lon), 6) AS left_r, round(max(lon), 6) AS right_r,
           round(avg(lat), 6) AS clat_r, round(avg(lon), 6) AS clon_r
    FROM mv GROUP BY 1"""
    return fn, sql


def q_frequent_pairs() -> Entry:
    """ES `frequent_item_sets` at the exact pair level (query/aggs.py::
    frequent_pairs): event_type pairs co-occurring for >= 5 distinct
    users, with the Apriori single-item prune running before the
    within-basket self-join."""

    def fn(spark, sf_dir):
        from dpr_spark.query.aggs import frequent_pairs

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return frequent_pairs(
            ev, "user_id", "event_type", min_support=5
        ).select("item_a", "item_b", "support")

    sql = """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (SELECT x.event_type AS item_a, y.event_type AS item_b
          FROM b x JOIN b y
            ON y.user_id = x.user_id AND x.event_type < y.event_type)
    SELECT item_a, item_b, count(*) AS support
    FROM p GROUP BY 1, 2 HAVING count(*) >= 5"""
    return fn, sql


def q_serial_diff_pct_bucket() -> Entry:
    """ES `serial_diff` (lag=2, first-lag buckets omitted) +
    `percentiles_bucket` (exact interpolated p25/50/75 of the sibling
    count series) over the weekly date_histogram parent
    (query/aggs.py::serial_diff/percentiles_bucket). Diff math is
    integer-derived; percentiles are the shared exact-interpolation
    contract."""
    LAG = 2

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import (
            date_histogram_agg,
            percentiles_bucket,
            serial_diff,
        )

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        hist = date_histogram_agg(qdf, idx, vals, "warc_ts", unit="week").select(
            "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
        )
        sd = serial_diff(hist, lag=LAG, order_col="week")
        pb = percentiles_bucket(hist)
        return sd.join(pb, "qid").select(
            "qid", "week", "count",
            F.round("diff", 6).alias("diff_r"),
            F.round("p25", 6).alias("p25_r"),
            F.round("p50", 6).alias("p50_r"),
            F.round("p75", 6).alias("p75_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    hist AS (
      SELECT m.qid,
             strftime(date_trunc('week',
                      DATE '2025-01-01' + (m.doc_id % 45)::INT), '%Y-%m-%d')
               AS week,
             count(*) AS count
      FROM matches m GROUP BY 1, 2),
    sd AS (
      SELECT qid, week, count,
             count::DOUBLE - lag(count::DOUBLE, {LAG})
               OVER (PARTITION BY qid ORDER BY week) AS diff
      FROM hist),
    pb AS (
      SELECT qid,
             quantile_cont(count::DOUBLE, 0.25) AS p25,
             quantile_cont(count::DOUBLE, 0.5) AS p50,
             quantile_cont(count::DOUBLE, 0.75) AS p75
      FROM hist GROUP BY 1)
    SELECT sd.qid, sd.week, sd.count,
           round(sd.diff, 6) AS diff_r,
           round(pb.p25, 6) AS p25_r, round(pb.p50, 6) AS p50_r,
           round(pb.p75, 6) AS p75_r
    FROM sd JOIN pb USING (qid) WHERE sd.diff IS NOT NULL"""
    return fn, sql


def q_eql_sequence() -> Entry:
    """EQL sequence detection (extras/eql.py): `sequence by user_id
    with maxspan=7d [click][view][purchase]` — every click anchors a
    greedy chain to the earliest strictly-later view, then the earliest
    strictly-later purchase; emit when the chain fits in the span. The
    twin spells the same greedy chain as two min-over-later self-joins
    (quadratic in the twin, ONE window pass + narrow joins in the
    engine)."""
    SPAN = 7 * 86400.0

    def fn(spark, sf_dir):
        from dpr_spark.extras.eql import sequence_match

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        res = sequence_match(
            ev, ["click", "view", "purchase"], maxspan_seconds=SPAN
        )
        return res.select("user_id", "t1", "t2", "t3")

    sql = f"""
    WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    s2 AS (SELECT a.user_id, a.ts AS t1, min(b.ts) AS t2
           FROM a JOIN b ON b.user_id = a.user_id AND b.ts > a.ts
           GROUP BY 1, 2),
    s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(c.ts) AS t3
           FROM s2 JOIN c ON c.user_id = s2.user_id AND c.ts > s2.t2
           GROUP BY 1, 2, 3)
    SELECT user_id, t1, t2, t3 FROM s3
    WHERE epoch(t3) - epoch(t1) <= {SPAN!r}"""
    return fn, sql


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_transform_pivot() -> Entry:
    """ES transform (pivot): the continuous entity-centric job — events
    pivoted to one row per user_id with per-event_type counts and value
    sums plus overall totals (the destination index a transform
    materializes). Spark-side this is groupBy(user).pivot(type) with
    the type set PINNED (never inferred — an inference scan over 10^12
    events is the classic pivot trap); the twin spells the same thing
    as conditional sums."""

    def fn(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        wide = (
            ev.groupBy("user_id")
            .pivot("event_type", EVENT_TYPES)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("sum"),
            )
        )
        tot = ev.groupBy("user_id").agg(
            F.count("*").alias("total_n"),
            F.round(F.sum("value"), 6).alias("total_sum_r"),
        )
        cols = [F.col("user_id"), F.col("total_n"), F.col("total_sum_r")]
        for t in EVENT_TYPES:
            cols.append(
                F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n")
            )
            cols.append(
                F.coalesce(F.col(f"{t}_sum"), F.lit(0.0)).alias(f"{t}_sum_r")
            )
        return wide.join(tot, "user_id").select(*cols)

    parts = []
    for t in EVENT_TYPES:
        parts.append(
            f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS {t}_n"
        )
        parts.append(
            f"round(coalesce(sum(value) FILTER (event_type = '{t}'), 0.0), 6)"
            f" AS {t}_sum_r"
        )
    sql = f"""
    SELECT user_id, count(*) AS total_n, round(sum(value), 6) AS total_sum_r,
           {", ".join(parts)}
    FROM events GROUP BY 1"""
    return fn, sql


def q_rollup_events_agg() -> Entry:
    """ES rollup / TSDB downsampling (extras/rollup.py): the events
    table pre-aggregated into a DAY rollup per event_type, then a WEEK
    histogram answered from the rollup ONLY — must equal the twin's
    direct aggregation over raw events (the exactness-of-aligned-
    rollup contract: sum of sums, min of mins, avg re-derived as
    sum/count)."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.rollup import build_rollup, rollup_histogram

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        day = build_rollup(
            ev, ts_col="ts", unit="day", group_cols=["event_type"]
        )
        res = rollup_histogram(day, "day", "week", group_cols=["event_type"])
        return res.select(
            F.date_format("bucket", "yyyy-MM-dd").alias("week"),
            "event_type",
            "n",
            F.round("sum_v", 6).alias("sum_r"),
            F.round("min_v", 6).alias("min_r"),
            F.round("max_v", 6).alias("max_r"),
            F.round("avg_v", 6).alias("avg_r"),
        )

    sql = """
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           event_type,
           count(*) AS n,
           round(sum(value), 6) AS sum_r,
           round(min(value), 6) AS min_r,
           round(max(value), 6) AS max_r,
           round(sum(value) / count(*), 6) AS avg_r
    FROM events GROUP BY 1, 2"""
    return fn, sql


COMMON_TERMS_CUTOFF = 0.78


def q_common_terms_topk() -> Entry:
    """Lucene CommonTermsQuery (query/commonterms.py): terms with
    df > cutoff·N are scoring-only — candidates come from the
    low-frequency terms' short posting lists; a query whose terms are
    all high-frequency falls back to all-generate. The twin filters the
    full BM25 ranking to the candidate contract. (cutoff=0.78 splits
    the synthetic corpus's query terms both ways, including one
    all-high query.)"""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.commonterms import common_terms_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = common_terms_search(
            qdf, idx, cutoff=COMMON_TERMS_CUTOFF, k=10
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
      qdf AS (SELECT qt.qid, qt.term, dict.df
              FROM qt JOIN dict USING (term)),
      nlow AS (SELECT qid,
                      sum(CASE WHEN df <= {COMMON_TERMS_CUTOFF} * (SELECT n FROM stats)
                               THEN 1 ELSE 0 END) AS n_low
               FROM qdf GROUP BY 1),
      gens AS (SELECT q.qid, q.term
               FROM qdf q JOIN nlow USING (qid)
               WHERE q.df <= {COMMON_TERMS_CUTOFF} * (SELECT n FROM stats)
                  OR nlow.n_low = 0),
      cand AS (SELECT DISTINCT g.qid, tf.doc_id
               FROM gens g JOIN tf USING (term)),
      cranked AS (
        SELECT s.qid, s.doc_id, round(s.score, 6) AS score_r,
               row_number() OVER (PARTITION BY s.qid
                                  ORDER BY round(s.score, 6) DESC, s.doc_id)
                 AS rank
        FROM scored s JOIN cand USING (qid, doc_id))
      SELECT qid, rank, doc_id, score_r FROM cranked WHERE rank <= 10"""
    )
    return fn, sql


def q_significant_terms_bg() -> Entry:
    """ES significant_terms with background_filter (query/aggs.py): JLH
    scores where bg% is the term's df WITHIN the lang='en' document set
    over that set's size (not the global dictionary stats). Terms
    absent from the background drop out (ES expects the background to
    contain the foreground)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import significant_terms

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        bg = docs.filter(F.col("lang") == "en").select("doc_id")
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = significant_terms(
            qdf, idx, size=5, min_fg=2, background=bg
        ).select(
            "qid", "term", "fg_count", "bg_count",
            F.round("score", 6).alias("score_r"),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("term"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "term", "fg_count", "bg_count", "score_r"
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    nmatch AS (SELECT qid, count(*) AS n_matches FROM matches GROUP BY 1),
    bset AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    bstats AS (SELECT count(*)::DOUBLE AS n FROM bset),
    bdict AS (SELECT tf.term, count(*) AS df
              FROM tf JOIN bset USING (doc_id) GROUP BY 1),
    fg AS (
      SELECT m.qid, tf.term, count(*) AS fg_count
      FROM matches m JOIN tf USING (doc_id) GROUP BY 1, 2
      HAVING count(*) >= 2),
    scored AS (
      SELECT fg.qid, fg.term, fg.fg_count, bdict.df AS bg_count,
             ((fg.fg_count / nm.n_matches) - (bdict.df / bstats.n))
             * ((fg.fg_count / nm.n_matches) / (bdict.df / bstats.n)) AS score
      FROM fg JOIN bdict USING (term) JOIN nmatch nm USING (qid)
           CROSS JOIN bstats),
    ranked_s AS (
      SELECT qid, term, fg_count, bg_count, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, term) AS rank
      FROM scored)
    SELECT qid, rank, term, fg_count, bg_count, score_r
    FROM ranked_s WHERE rank <= 5"""
    return fn, sql


DATE_RANGES = [
    (None, "2025-01-15"),
    ("2025-01-15", "2025-02-01"),
    ("2025-02-01", None),
    ("2025-01-10", "2025-01-20"),  # overlaps bucket 1 and 2
]


def q_date_range_agg() -> Entry:
    """ES `date_range` over the match set (query/aggs.py::
    date_range_agg): ISO-boundary [from, to) buckets on the synthesized
    warc_ts (2025-01-01 + doc_id%45 days), possibly overlapping, in ONE
    pass (conditional sums + stack — N ranges never cost N scans)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import date_range_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return date_range_agg(qdf, idx, vals, "warc_ts", DATE_RANGES)

    cases = []
    for lo, hi in DATE_RANGES:
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        conds = []
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        cond = " AND ".join(conds) or "TRUE"
        cases.append(
            f"SELECT qid, '{key}' AS range_key,"
            f" CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS count"
            f" FROM mv GROUP BY 1"
        )
    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid,
                  (DATE '2025-01-01' + (m.doc_id % 45)::INT)::TIMESTAMP AS ts
           FROM matches m)
    {" UNION ALL ".join(cases)}"""
    return fn, sql


ALIAS_BOOSTS = {"corpus-000001": 1.0, "corpus-000002": 1.5, "corpus-000003": 0.5}


def q_indices_boost_topk() -> Entry:
    """ES `indices_boost` on an alias search (index/aliases.py): three
    rollover generations (doc_id mod 3) searched with per-generation
    score multipliers — global merged statistics, boost applied after
    scoring, BEFORE top-k selection. The twin boosts the full-corpus
    BM25 score by CASE doc_id % 3."""

    def fn(spark, sf_dir):
        import tempfile

        from dpr_spark.index.aliases import AliasCatalog, search_alias
        from dpr_spark.index.build import build_index_from_docs

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        cat = AliasCatalog(tempfile.mkdtemp(prefix="alias_"))
        cat.create("corpus", "corpus-000001")
        cat.rollover("corpus", 1, 1)
        cat.rollover("corpus", 1, 1)
        names = cat.resolve("corpus")
        built = _parallel_builds(
            [
                lambda i=i: build_index_from_docs(
                    spark, docs.filter(F.col("doc_id") % 3 == i),
                    build_blocks=False,
                )
                for i in range(len(names))
            ]
        )
        indexes = dict(zip(names, built))
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_alias(
            spark, cat, "corpus", indexes, qdf, k=10, boosts=ALIAS_BOOSTS
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + """,
      boosted AS (
        SELECT qid, doc_id,
               score * (CASE doc_id % 3 WHEN 0 THEN 1.0::DOUBLE
                        WHEN 1 THEN 1.5::DOUBLE ELSE 0.5::DOUBLE END)
                 AS bscore
        FROM scored),
      branked AS (
        SELECT qid, doc_id, round(bscore, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(bscore, 6) DESC, doc_id) AS rank
        FROM boosted)
      SELECT qid, rank, doc_id, score_r FROM branked WHERE rank <= 10"""
    )
    return fn, sql


def q_alias_rollover_topk() -> Entry:
    """Alias + rollover lifecycle (index/aliases.py; ES `_rollover` /
    `_aliases`): the documents table arrives as three rollover
    generations (doc_id mod 3), each its own index behind one alias;
    searching the alias merges the generations WITHOUT retokenizing
    (global df/N/avgdl — the ES coordinator contract) and must rank
    exactly like one index over the whole table."""

    def fn(spark, sf_dir):
        import tempfile

        from dpr_spark.index.aliases import AliasCatalog, search_alias
        from dpr_spark.index.build import build_index_from_docs

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        cat = AliasCatalog(tempfile.mkdtemp(prefix="alias_"))
        cat.create("corpus", "corpus-000001")
        cat.rollover("corpus", 1, 1)
        cat.rollover("corpus", 1, 1)
        names = cat.resolve("corpus")
        built = _parallel_builds(
            [
                lambda i=i: build_index_from_docs(
                    spark, docs.filter(F.col("doc_id") % 3 == i),
                    build_blocks=False,
                )
                for i in range(len(names))
            ]
        )
        indexes = dict(zip(names, built))
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_alias(spark, cat, "corpus", indexes, qdf, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + "SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"
    )
    return fn, sql


def q_scripted_metric() -> Entry:
    """ES `scripted_metric` (query/aggs.py::scripted_metric_agg): the
    user map/combine script computes per-batch partials (Σ ln v, Σ 1/v,
    n over n_chars) and the reduce script folds them into geometric and
    harmonic means per query. The twin is the closed form
    exp(avg(ln v)) / n·(Σ 1/v)⁻¹. Rounded 6dp: the partial fold's
    float order differs between engines by design — the CONTRACT is the
    script phases, the values agree to rounding."""

    def fn(spark, sf_dir):
        import numpy as np
        import pandas as pd

        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import scripted_metric_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")

        def map_partial(pdf):
            v = pdf["n_chars"].astype("float64")
            g = pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "sum_ln": np.log(v),
                    "sum_inv": 1.0 / v,
                    "n": 1,
                }
            )
            return g.groupby("qid", as_index=False).sum()

        def reduce_partials(pdf):
            n = float(pdf["n"].sum())
            return pd.DataFrame(
                {
                    "qid": [int(pdf["qid"].iloc[0])],
                    "n": [int(n)],
                    "geo_mean": [float(np.exp(pdf["sum_ln"].sum() / n))],
                    "harm_mean": [n / float(pdf["sum_inv"].sum())],
                }
            )

        res = scripted_metric_agg(
            qdf, idx, docs.select("doc_id", "n_chars"), ["n_chars"],
            map_partial, reduce_partials,
            "qid int, sum_ln double, sum_inv double, n long",
            "qid int, n long, geo_mean double, harm_mean double",
        )
        return res.select(
            "qid", "n",
            F.round("geo_mean", 6).alias("geo_r"),
            F.round("harm_mean", 6).alias("harm_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, d.n_chars::DOUBLE AS v
           FROM matches m JOIN documents d USING (doc_id))
    SELECT qid, count(*) AS n,
           round(exp(sum(ln(v)) / count(*)), 6) AS geo_r,
           round(count(*) / sum(1.0 / v), 6) AS harm_r
    FROM mv GROUP BY 1"""
    return fn, sql


def q_runtime_field_agg() -> Entry:
    """ES runtime fields: a query-time computed field (chars-per-token
    = n_chars / doclen, never materialized in the index) used directly
    as an aggregation bucket over the match set — floor(v) buckets with
    counts. The Spark side IS the contract: runtime field ≡ a select
    expression Catalyst folds into the scan."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        vals = docs.select("doc_id", "n_chars").join(
            idx.docstats.select("doc_id", "doclen"), "doc_id"
        )
        runtime = F.floor(
            F.col("n_chars").cast("double") / F.col("doclen").cast("double")
        ).alias("cpt")
        m = _matches(qdf, idx).join(vals, "doc_id").select("qid", runtime)
        return (
            m.groupBy("qid", "cpt")
            .agg(F.count("*").alias("count"))
            .select("qid", "cpt", "count")
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
    mv AS (SELECT m.qid,
                  floor(d.n_chars::DOUBLE / ds.doclen::DOUBLE)::BIGINT AS cpt
           FROM matches m JOIN documents d USING (doc_id)
                JOIN ds USING (doc_id))
    SELECT qid, cpt, count(*) AS count FROM mv GROUP BY 1, 2"""
    return fn, sql


SPAN_MULTI_QUERIES = [
    (0, ["spark", "wind*"]),
    (1, ["cust*", "join"]),
    (2, ["fa?t", "filter"]),
    (3, ["s*", "data"]),        # broad glob: the expansion cap binds
    (4, ["zzznope*", "spark"]),  # empty expansion -> no rows
]
SPAN_MULTI_EXP = 4
SPAN_MULTI_W = 8


def q_span_multi_topk() -> Entry:
    """Span-near with multi-term clauses (Lucene
    SpanMultiTermQueryWrapper in SpanNearQuery, query/phrase.py::
    span_multi_search_index): a `*`/`?` clause expands to its
    SPAN_MULTI_EXP highest-df dictionary terms (ties term asc — the
    TopTermsRewrite cap), clause positions = union, clause idf = the
    union-df pseudo-term idf; tf = qualifying end positions within a
    SPAN_MULTI_W-token window. The twin re-runs the expansion with
    regexp_matches + row_number over the same dictionary."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import build_positions, span_multi_search_index

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        res = span_multi_search_index(
            spark, idx, pos, SPAN_MULTI_QUERIES,
            window=SPAN_MULTI_W, max_expansions=SPAN_MULTI_EXP, k=10,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    from dpr_spark.query.boolquery import wildcard_regex as _wrx

    cl_rows = []
    for qid, clauses in SPAN_MULTI_QUERIES:
        for off, c in enumerate(clauses):
            if "*" in c or "?" in c:
                cl_rows.append(f"({qid}, {off}, NULL, '{_wrx(c)}')")
            else:
                cl_rows.append(f"({qid}, {off}, '{c.lower()}', NULL)")
    W = SPAN_MULTI_W
    sql = f"""
    WITH {_POS_CTES},
    cl AS (SELECT * FROM (VALUES {", ".join(cl_rows)})
           AS c(qid, off, lit, rx)),
    qn AS (SELECT qid, count(*) AS n_off FROM cl GROUP BY 1),
    exp AS (
      SELECT qid, off, term FROM (
        SELECT c.qid, c.off, d.term,
               row_number() OVER (PARTITION BY c.qid, c.off
                                  ORDER BY d.df DESC, d.term) AS r
        FROM cl c JOIN dict d
          ON (c.rx IS NOT NULL AND regexp_matches(d.term, c.rx))
             OR (c.rx IS NULL AND d.term = c.lit))
      WHERE r <= {SPAN_MULTI_EXP}),
    cpos AS (SELECT DISTINCT e.qid, e.off, pos.doc_id, pos.p
             FROM exp e JOIN pos ON pos.term = e.term),
    dfu AS (SELECT qid, off, count(DISTINCT doc_id) AS dfu
            FROM cpos GROUP BY 1, 2),
    idf AS (SELECT dfu.qid,
                   sum(ln((stats.n - dfu.dfu + 0.5) / (dfu.dfu + 0.5) + 1.0))
                     AS idf_sum,
                   count(*) AS n_res
            FROM dfu CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    ends AS (SELECT DISTINCT qid, doc_id, p FROM cpos),
    covered AS (
      SELECT e.qid, e.doc_id, e.p, count(DISTINCT c.off) AS no
      FROM ends e JOIN cpos c ON c.qid = e.qid AND c.doc_id = e.doc_id
           AND c.p <= e.p AND c.p > e.p - {W}
      GROUP BY 1, 2, 3),
    pf AS (
      SELECT c.qid, c.doc_id, count(*) AS pf
      FROM covered c JOIN qn USING (qid) WHERE c.no = qn.n_off
      GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_matrix_stats() -> Entry:
    """ES `matrix_stats` for the field pair (n_chars, doclen) over each
    query's match set (query/aggs.py::matrix_stats_agg): population
    means/variances/covariance/correlation from EXACT integer sums —
    the same textual IEEE expression in both engines. doclen comes from
    the index's own docstats on the Spark side and from the shared
    tokenizer CTE in the twin."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import matrix_stats_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select("doc_id", "n_chars").join(
            idx.docstats.select("doc_id", "doclen"), "doc_id"
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = matrix_stats_agg(qdf, idx, vals, "n_chars", "doclen")
        return res.select(
            "qid", "n",
            F.round("mean_x", 6).alias("mean_x_r"),
            F.round("mean_y", 6).alias("mean_y_r"),
            F.round("var_x", 6).alias("var_x_r"),
            F.round("var_y", 6).alias("var_y_r"),
            F.round("cov", 6).alias("cov_r"),
            F.round("corr", 6).alias("corr_r"),
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
    mv AS (SELECT m.qid, d.n_chars AS x, ds.doclen AS y
           FROM matches m JOIN documents d USING (doc_id)
                JOIN ds USING (doc_id)),
    base AS (SELECT qid, count(*) AS n,
                    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
                    sum(x * y)::BIGINT AS sxy
             FROM mv GROUP BY 1)
    SELECT qid, n,
           round(sx::DOUBLE / n, 6) AS mean_x_r,
           round(sy::DOUBLE / n, 6) AS mean_y_r,
           round(sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n), 6) AS var_x_r,
           round(syy::DOUBLE / n - (sy::DOUBLE / n) * (sy::DOUBLE / n), 6) AS var_y_r,
           round(sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n), 6) AS cov_r,
           round((sxy::DOUBLE / n - (sx::DOUBLE / n) * (sy::DOUBLE / n))
                 / sqrt((sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n))
                        * (syy::DOUBLE / n - (sy::DOUBLE / n) * (sy::DOUBLE / n))), 6) AS corr_r
    FROM base"""
    return fn, sql


def q_t_test_paired() -> Entry:
    """ES `t_test` (paired) between n_chars and doclen over each query's
    match set (query/aggs.py::t_test_agg): t = mean(d)/sqrt(s²/n) with
    sample variance from exact long Σd, Σd²; n ≤ 1 or zero variance →
    NULL (the ES cannot-compute contract)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import t_test_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select("doc_id", "n_chars").join(
            idx.docstats.select("doc_id", "doclen"), "doc_id"
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = t_test_agg(qdf, idx, vals, "n_chars", "doclen")
        return res.select("qid", "n", F.round("t_stat", 6).alias("t_r"))

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
    mv AS (SELECT m.qid, d.n_chars - ds.doclen AS dv
           FROM matches m JOIN documents d USING (doc_id)
                JOIN ds USING (doc_id)),
    base AS (SELECT qid, count(*) AS n,
                    sum(dv)::BIGINT AS sd, sum(dv * dv)::BIGINT AS sdd
             FROM mv GROUP BY 1)
    SELECT qid, n,
           CASE WHEN n > 1 AND (sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE / n) / (n - 1.0) > 0
                THEN round((sd::DOUBLE / n)
                     / sqrt(((sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE / n) / (n - 1.0)) / n), 6)
                ELSE NULL END AS t_r
    FROM base"""
    return fn, sql


def q_lmjm_topk() -> Entry:
    """Pluggable similarity #3 (query/similarity.py; Lucene
    LMJelinekMercerSimilarity, λ=0.1): per-term
    ln(1 + ((1−λ)·tf/dl)/(λ·ctf/total)). Same collection-statistics
    probe as lmdirichlet; rank re-derived from the 6-dp-rounded
    score."""
    LAM = 0.1

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.similarity import search_similarity

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_similarity(
            qdf, idx, similarity="lmjelinekmercer", k=10, lam=LAM
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
      total AS (SELECT sum(doclen)::DOUBLE AS tt FROM ds),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      ctf AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM tf GROUP BY 1),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(ln(1.0 + ({1.0 - LAM} * tf.tf / ds.doclen)
                            / ({LAM} * (ctf.ctf / total.tt)))) AS score
        FROM qt JOIN ctf USING (term) JOIN tf USING (term)
             JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN total
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_dfi_topk() -> Entry:
    """Pluggable similarity #4 (query/similarity.py; Lucene
    DFISimilarity, standardized independence measure): expected =
    ctf·dl/total; component = log2(1 + (tf−e)/sqrt(e)) when tf > e else
    0 (terms at or below independence contribute nothing)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.similarity import search_similarity

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_similarity(qdf, idx, similarity="dfi", k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
      WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
      ds AS (SELECT doc_id, len(toks) AS doclen FROM tok),
      total AS (SELECT sum(doclen)::DOUBLE AS tt FROM ds),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
      ctf AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM tf GROUP BY 1),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(CASE WHEN tf.tf > ctf.ctf * ds.doclen / total.tt
                        THEN log2(1.0 + (tf.tf - ctf.ctf * ds.doclen / total.tt)
                                        / sqrt(ctf.ctf * ds.doclen / total.tt))
                        ELSE 0.0 END) AS score
        FROM qt JOIN ctf USING (term) JOIN tf USING (term)
             JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN total
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_dup_span_strip() -> Entry:
    """Exact-substring dedup (extras/webclean dup_span_strip, the Lee et
    al. 2021 contract at k=4, min_docs=2): tokens covered by any 4-gram
    occurring in ≥2 distinct docs are stripped everywhere. The engine
    keys grams by xxhash64 (24-byte occurrence rows); the twin keys on
    gram text — identical absent 64-bit collisions (~1e-11 here, and a
    collision only over-strips)."""
    K = 4
    MIN_DOCS = 2

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import dup_span_strip

        return dup_span_strip(
            _docs(spark, sf_dir), k=K, min_docs=MIN_DOCS
        ).orderBy("doc")

    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, i AS s, array_to_string(toks[i + 1 : i + {K}], ' ') AS gram
          FROM tok, unnest(range(0, len(toks) - {K} + 1)) t(i)
          WHERE len(toks) >= {K}),
    hot AS (SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= {MIN_DOCS}),
    ds AS (SELECT g.doc_id, g.s FROM g JOIN hot USING (gram)),
    tr AS (SELECT doc_id, i, toks[i + 1] AS tok
           FROM tok, unnest(range(0, len(toks))) t(i)),
    cov AS (SELECT tr.doc_id, tr.i, tr.tok,
                   EXISTS (SELECT 1 FROM ds
                           WHERE ds.doc_id = tr.doc_id
                             AND ds.s <= tr.i AND tr.i < ds.s + {K}) AS c
            FROM tr)
    SELECT doc_id AS doc,
           count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN c THEN 1 ELSE 0 END)::BIGINT AS n_covered,
           round(sum(CASE WHEN c THEN 1 ELSE 0 END) / greatest(count(*), 1), 6)
             AS dup_span_frac,
           coalesce(string_agg(CASE WHEN NOT c THEN tok END, ' ' ORDER BY i), '')
             AS clean_text
    FROM cov GROUP BY 1 ORDER BY doc"""
    return fn, sql


_XS_SPAN_CTES = """
    WITH w AS (
      SELECT doc_id, text, unnest(generate_series(0, length(text)-{L})) AS pos
      FROM documents WHERE length(text) >= {L}),
    k AS (SELECT doc_id, pos, substr(text, pos+1, {L}) AS win FROM w),
    d AS (SELECT win FROM k GROUP BY win HAVING count(*) > 1),
    m AS (SELECT k.doc_id, k.pos FROM k JOIN d USING (win)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(lag(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos), -1000000) + {L}
                  THEN 1 ELSE 0 END AS brk
      FROM m),
    g AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM isl),
    spans AS (SELECT doc_id, min(pos) AS s, max(pos) + {L} AS e
              FROM g GROUP BY doc_id, gid)"""


def q_dup_spans_exact() -> Entry:
    """Character-level ExactSubstr span report (extras/substrdedup.py,
    Lee et al. 2022 at L=25 chars): maximal character spans covered by a
    length-L window occurring >= 2 times in the corpus (within-doc
    repeats count, unlike the token-level dup_span_strip's cross-doc
    rule). The engine keys windows by a 128-bit md5 fingerprint so the
    shuffle never carries text; the twin groups the literal window."""
    L = 25

    def fn(spark, sf_dir):
        from dpr_spark.extras.substrdedup import duplicate_spans

        return (
            duplicate_spans(_docs(spark, sf_dir), L)
            .select(
                "doc_id",
                F.col("start").cast("long").alias("start"),
                F.col("end").cast("long").alias("end"),
            )
            .orderBy("doc_id", "start")
        )

    sql = (
        _XS_SPAN_CTES.format(L=L)
        + """
    SELECT doc_id, s::BIGINT AS start, e::BIGINT AS "end"
    FROM spans ORDER BY doc_id, start"""
    )
    return fn, sql


def q_exact_substr_dedup() -> Entry:
    """ExactSubstr removal (extras/substrdedup.py): every duplicated
    span (per dup_spans_exact) cut from every occurrence via a pure
    Catalyst fold over the doc's sorted span array; the twin reassembles
    the kept segments with string_agg. Docs with no duplicated span pass
    through byte-identical with removed_chars = 0."""
    L = 25

    def fn(spark, sf_dir):
        from dpr_spark.extras.substrdedup import exact_substr_dedup

        return exact_substr_dedup(_docs(spark, sf_dir), L).orderBy("doc_id")

    sql = (
        _XS_SPAN_CTES.format(L=L)
        + """,
    segs AS (
      SELECT doc_id,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ss,
             s AS se
      FROM spans
      UNION ALL
      SELECT sp.doc_id, max(sp.e), max(length(doc.text))
      FROM spans sp JOIN documents doc USING (doc_id) GROUP BY sp.doc_id),
    rem AS (SELECT doc_id, sum(e - s) AS removed FROM spans GROUP BY doc_id),
    clean AS (
      SELECT segs.doc_id,
             string_agg(substr(doc.text, ss + 1, se - ss), '' ORDER BY ss)
               AS clean_text
      FROM segs JOIN documents doc USING (doc_id)
      GROUP BY segs.doc_id)
    SELECT d.doc_id,
           coalesce(c.clean_text, d.text) AS clean_text,
           coalesce(r.removed, 0)::BIGINT AS removed_chars
    FROM documents d
    LEFT JOIN clean c USING (doc_id)
    LEFT JOIN rem r USING (doc_id)
    ORDER BY d.doc_id"""
    )
    return fn, sql


def q_variable_width_histogram() -> Entry:
    """ES variable_width_histogram over documents.n_chars at 8 buckets
    (query/aggs.py deterministic equal-depth contract: exact-ntile
    seeding, distinct values pinned to their first row's tile so equal
    values never split). The twin uses DuckDB's actual ntile + min-tile-
    per-value — the contract's definition, not the engine's closed-form
    tile arithmetic."""
    B = 8

    def fn(spark, sf_dir):
        from dpr_spark.query.aggs import variable_width_histogram

        return variable_width_histogram(
            _docs(spark, sf_dir), "n_chars", buckets=B
        ).orderBy("bucket")

    sql = f"""
    WITH v AS (SELECT n_chars AS value FROM documents WHERE n_chars IS NOT NULL),
    t AS (SELECT value, ntile({B}) OVER (ORDER BY value) AS tl FROM v),
    mt AS (SELECT value, min(tl) AS tile FROM t GROUP BY value),
    j AS (SELECT v.value, mt.tile FROM v JOIN mt USING (value)),
    b AS (SELECT tile, min(value)::BIGINT AS vmin, max(value)::BIGINT AS vmax,
                 round(avg(value), 6) AS centroid, count(*)::BIGINT AS doc_count
          FROM j GROUP BY tile)
    SELECT dense_rank() OVER (ORDER BY tile)::BIGINT AS bucket,
           vmin, vmax, centroid, doc_count
    FROM b ORDER BY bucket"""
    return fn, sql


def q_cumulative_cardinality() -> Entry:
    """ES cumulative_cardinality over events (query/aggs.py): per
    event_type, per day, the EXACT number of distinct user_ids seen to
    date (ES approximates with HLL; the first-seen collapse gives the
    exact number at the same shuffle class). Day buckets are yyyy-MM-dd
    strings in both engines (string order == chronological order)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.aggs import cumulative_cardinality

        rows = _events(spark, sf_dir).select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("user_id").alias("value"),
        )
        return cumulative_cardinality(
            rows, "event_type", "day", "value"
        ).orderBy("event_type", "day")

    sql = """
    WITH r AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                      user_id AS value FROM events),
    present AS (SELECT DISTINCT event_type, day FROM r),
    f0 AS (SELECT event_type, value, min(day) AS day FROM r GROUP BY 1, 2),
    firsts AS (SELECT event_type, day, count(*) AS new_values
               FROM f0 GROUP BY 1, 2),
    j AS (SELECT p.event_type, p.day,
                 coalesce(f.new_values, 0)::BIGINT AS new_values
          FROM present p LEFT JOIN firsts f USING (event_type, day))
    SELECT event_type, day, new_values,
           sum(new_values) OVER (PARTITION BY event_type ORDER BY day)::BIGINT
             AS cumulative_distinct
    FROM j ORDER BY event_type, day"""
    return fn, sql


def q_change_point() -> Entry:
    """ES change_point agg (query/aggs.py deterministic two-segment SSE
    contract) over the per-day sum(value) series of each event_type:
    the split minimizing within-segment SSE, costs rounded to 6 dp
    before the argmin in BOTH engines so float last-ulps can't flip the
    winner. The daily series itself is rounded to 6 dp in both engines
    before the detector runs (identical inputs)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.aggs import change_point

        series = (
            _events(spark, sf_dir)
            .groupBy(
                "event_type",
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
            )
            .agg(F.round(F.sum("value"), 6).alias("x"))
        )
        return change_point(series, "event_type", "day", "x").orderBy(
            "event_type"
        )

    sql = """
    WITH s AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                      round(sum(value), 6) AS x
               FROM events GROUP BY 1, 2),
    p AS (SELECT event_type, day, x,
                 sum(x) OVER w - x AS s1,
                 sum(x*x) OVER w - x*x AS q1,
                 row_number() OVER w - 1 AS n1,
                 sum(x) OVER (PARTITION BY event_type) AS S,
                 sum(x*x) OVER (PARTITION BY event_type) AS Q,
                 count(*) OVER (PARTITION BY event_type) AS N
          FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    c AS (SELECT *,
                 (q1 - s1*s1/n1) + ((Q-q1) - (S-s1)*(S-s1)/(N-n1)) AS cost
          FROM p WHERE n1 >= 1),
    b AS (SELECT *, row_number() OVER
            (PARTITION BY event_type ORDER BY round(cost, 6), day) AS rk
          FROM c)
    SELECT event_type, day AS change_at,
           round(s1/n1, 6) AS before_mean,
           round((S-s1)/(N-n1), 6) AS after_mean,
           round(CASE WHEN (Q - S*S/N) > 0
                      THEN 1.0 - cost/(Q - S*S/N) ELSE 0.0 END, 6)
             AS reduction
    FROM b WHERE rk = 1 ORDER BY event_type"""
    return fn, sql


def q_geo_line() -> Entry:
    """ES geo_line agg (query/geo.py): per user, the first 5 positions
    in (ts, event_id) order as a "lon lat, lon lat" track string.
    Coordinates synthesize from event_id as exact multiples of 0.25, so
    %.6f prints identical digits in the JVM and DuckDB (no float-
    rounding-mode edge). (ts, event_id) is a total order — ES's
    shard-order tie nondeterminism is refused by contract."""
    SIZE = 5

    def fn(spark, sf_dir):
        from dpr_spark.query.geo import geo_line_agg

        pts = (
            _events(spark, sf_dir)
            .filter(F.col("user_id") < 20)
            .select(
                "user_id",
                (F.lit(20.0) + F.pmod("event_id", F.lit(160)) * 0.25).alias(
                    "lon"
                ),
                (F.lit(10.0) + F.pmod("event_id", F.lit(80)) * 0.5).alias(
                    "lat"
                ),
                "ts",
                "event_id",
            )
        )
        return geo_line_agg(
            pts, "user_id", ["ts", "event_id"], size=SIZE
        ).orderBy("user_id")

    sql = f"""
    WITH p AS (SELECT user_id,
                      20 + (event_id % 160) * 0.25 AS lon,
                      10 + (event_id % 80) * 0.5 AS lat,
                      ts, event_id
               FROM events WHERE user_id < 20),
    r AS (SELECT *,
                 row_number() OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM p)
    SELECT user_id,
           string_agg(printf('%.6f %.6f', lon, lat), ', ' ORDER BY rk)
             AS line,
           count(*)::BIGINT AS n_points,
           any_value(n) <= {SIZE} AS complete
    FROM r WHERE rk <= {SIZE} GROUP BY user_id ORDER BY user_id"""
    return fn, sql


_ALPHA_MIX_TARGETS_SQL = """
    c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
    wt AS (SELECT *, round(pow(n, 0.5) * 1e6)::BIGINT AS wu FROM c),
    tw AS (SELECT *, sum(wu) OVER () AS W FROM wt),
    bs AS (SELECT *, (150 * wu) // W AS base,
                  150 * wu - ((150 * wu) // W) * W AS rem
           FROM tw),
    rr AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
                  150 - sum(base) OVER () AS leftover
           FROM bs),
    tg AS (SELECT lang, n,
                  least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END,
                        n)::BIGINT AS target
           FROM rr)"""


def q_alpha_mix_targets() -> Entry:
    """Temperature-scaled mix targets (extras/training.py): p_lang ∝
    n^0.5 (the mC4/XLM-R alpha rule), resolved to integers by exact
    largest-remainder rounding in BIGINT micro-units — sum(target) ==
    150 exactly, identical in any engine (the one float op, pow, is
    rounded to micro-units before any arithmetic that could flip a
    floor)."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.training import alpha_mix_targets

        return alpha_mix_targets(
            _docs(spark, sf_dir), "lang", alpha=0.5, total=150
        ).orderBy("lang")

    sql = (
        "\n    WITH "
        + _ALPHA_MIX_TARGETS_SQL.strip()
        + "\n    SELECT lang, n, target FROM tg ORDER BY lang"
    )
    return fn, sql


def q_alpha_mix_sample() -> Entry:
    """The mixed sample itself: alpha_mix_targets quotas filled per lang
    by portable seeded-md5 rank (K4 shuffle_key, seed=7) — the exact
    150-doc training mix, reproducible by any SQL engine."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.training import alpha_mix_sample

        return (
            alpha_mix_sample(
                _docs(spark, sf_dir),
                "lang",
                alpha=0.5,
                total=150,
                seed=7,
                portable=True,
            )
            .select("lang", "doc_id")
            .orderBy("lang", "doc_id")
        )

    sql = (
        "\n    WITH "
        + _ALPHA_MIX_TARGETS_SQL.strip()
        + """,
    s AS (SELECT d.lang, d.doc_id,
                 row_number() OVER (PARTITION BY d.lang
                   ORDER BY ('0x' || substr(md5(d.doc_id::VARCHAR || ':7'),
                                            1, 15))::BIGINT,
                            d.doc_id) AS rn
          FROM documents d)
    SELECT s.lang, s.doc_id
    FROM s JOIN tg ON s.lang = tg.lang AND s.rn <= tg.target
    ORDER BY s.lang, s.doc_id"""
    )
    return fn, sql


def q_pipeline_e2e() -> Entry:
    """The composed training-data/serving pipeline in ONE run: chunked
    crawl text → boilerplate stripping (webclean W73) → benchmark 8-gram
    decontamination (W70) → REAL index build (build_index_from_docs) →
    impact-segment BM25 top-10 (query/wand.py). Proves the cleaning
    operators and the engine compose end to end; the twin replays the
    whole chain — boiler lines, kept-token streams, contamination set,
    doclen-0 docs retained in N/avgdl exactly like the engine — in one
    DuckDB query."""
    N = 8
    MIN_DOCS = 4

    def fn(spark, sf_dir):
        from dpr_spark.extras.webclean import ngram_decontaminate, strip_boilerplate
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.wand import build_impact_segments, search_segments

        sb = strip_boilerplate(
            _multiline_docs(spark, sf_dir), group_col="source", min_docs=MIN_DOCS
        )
        docs = _docs(spark, sf_dir)
        toks = _tok_col()
        bench = (
            docs.filter(F.col("doc_id") % 29 == 0)
            .filter(F.size(toks) >= 12)
            .select(F.concat_ws(" ", F.slice(toks, 5, N)).alias("gram"))
        )
        contaminated = ngram_decontaminate(docs, bench, n=N, join_on="text").select(
            F.col("doc").alias("doc_id")
        )
        corpus = sb.select(
            F.col("doc").alias("doc_id"), F.col("clean_text").alias("text")
        ).join(contaminated, "doc_id", "left_anti").persist()
        # persist: the cleaned corpus feeds BOTH the tokenize kernel and
        # the corpus-count stats job inside the build — without it the
        # whole boilerplate-strip + decontamination subtree re-executes
        # per consumer (guide §7.2 duplicated subtrees)
        idx = build_index_from_docs(spark, corpus, build_blocks=False)
        seg = build_impact_segments(idx, num_buckets=8)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search_segments(spark, qdf, idx, seg, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    sql = f"""
    WITH base AS (SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents),
    la AS (SELECT doc_id, source, {_DUCK_LINES} AS arr FROM base),
    lines AS (SELECT doc_id, source, arr[i + 1] AS line
              FROM la, unnest(range(0, len(arr))) t(i)),
    boiler AS (SELECT source, line FROM lines
               GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= {MIN_DOCS}),
    kept AS (SELECT l.doc_id, l.line FROM lines l
             LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
             WHERE b.line IS NULL),
    bench AS (SELECT DISTINCT array_to_string(toks[5 : {4 + N}], ' ') AS gram
              FROM base WHERE doc_id % 29 = 0 AND len(toks) >= 12),
    dg AS (SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + {N}], ' ') AS g
           FROM base, unnest(range(0, len(toks) - {N} + 1)) t(i)
           WHERE len(toks) >= {N}),
    contam AS (SELECT DISTINCT doc_id FROM dg JOIN bench ON dg.g = bench.gram),
    cleandocs AS (SELECT doc_id FROM base
                  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
    term_rows AS (SELECT k.doc_id, unnest(string_split(k.line, ' ')) AS term
                  FROM kept k JOIN cleandocs c ON c.doc_id = k.doc_id),
    -- the engine keeps doclen-0 docs in N/avgdl (docstats carries them)
    ds AS (SELECT c.doc_id, coalesce(t.dl, 0) AS doclen
           FROM cleandocs c LEFT JOIN (SELECT doc_id, count(*) AS dl
                                       FROM term_rows GROUP BY 1) t
             ON t.doc_id = c.doc_id),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM term_rows GROUP BY 1, 2),
    dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
    scored AS (
      SELECT qt.qid, tf.doc_id,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                 * tf.tf * {BM25_K1 + 1.0}
                 / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             ) AS score
      FROM qt JOIN dict USING (term) JOIN tf USING (term)
           JOIN ds ON tf.doc_id = ds.doc_id CROSS JOIN stats
      GROUP BY 1, 2),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_stratified_sample() -> Entry:
    """Training-mix construction: EXACT per-language quota sample
    (ceil(count_lang · fraction_lang) docs, seeded-hash pick) — the
    deterministic replacement for sampleBy's Bernoulli draw. Uses the
    portable md5 shuffle key and the salted two-level exact cap
    (extras/training.py), so DuckDB replays the identical sample."""
    FRACS = {"en": 0.5, "de": 0.3, "fr": 0.2, "zh": 0.1}

    def fn(spark, sf_dir):
        from dpr_spark.extras.training import stratified_sample

        return stratified_sample(
            _docs(spark, sf_dir).select("doc_id", "lang"),
            "lang",
            FRACS,
            seed=7,
            portable=True,
            salt_buckets=4,
        ).select("lang", "doc_id")

    vals = ", ".join(f"('{s}', {f})" for s, f in sorted(FRACS.items()))
    sql = f"""
      WITH fr AS (SELECT * FROM (VALUES {vals}) v(lang, f)),
      q AS (SELECT d.lang, ceil(count(*) * any_value(fr.f))::BIGINT AS quota
            FROM documents d JOIN fr USING (lang) GROUP BY d.lang),
      r AS (SELECT doc_id, lang,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 15))::BIGINT,
                              doc_id) AS rn
            FROM documents WHERE lang IN (SELECT lang FROM fr))
      SELECT lang, doc_id FROM r JOIN q USING (lang) WHERE rn <= quota"""
    return fn, sql


def q_pack_sequences() -> Entry:
    """GPT-style concat-and-chunk sequence packing manifest: docs hash-
    sharded (portable key % 4), concatenated in doc_id order, token
    stream cut into seq_len=64 training sequences; per-doc (shard,
    offset, bin). One shuffle + one per-shard running-sum window
    (extras/training.py)."""
    SEQ, SHARDS = 64, 4

    def fn(spark, sf_dir):
        from dpr_spark.extras.training import pack_sequences

        nt = _tokenized(spark, sf_dir).select(
            "doc_id", F.size("toks").cast("long").alias("n_tokens")
        )
        return pack_sequences(
            nt, seq_len=SEQ, n_shards=SHARDS, portable=True
        ).select("doc_id", F.col("shard").cast("long").alias("shard"), "offset", "bin")

    sql = f"""
      WITH tok AS (SELECT doc_id, len({_DUCK_TOKS}) AS nt FROM documents),
      sh AS (SELECT doc_id, nt,
                    ('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 15))::BIGINT % {SHARDS}
                      AS shard
             FROM tok),
      cum AS (SELECT doc_id, shard,
                     (sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - nt)::BIGINT
                       AS "offset"
              FROM sh)
      SELECT doc_id, shard, "offset", ("offset" // {SEQ})::BIGINT AS bin FROM cum"""
    return fn, sql


def q_sparse_vector_topk() -> Entry:
    """Learned-sparse retrieval (ES sparse_vector / SPLADE family):
    embeddings pruned to their top-16 positive components as (dim,
    weight) activations, served from a dim-keyed inverted posting
    table; score = Σ w_q·w_d over shared dims — no crossJoin, the
    candidate set is the union of the query's dim posting lists
    (query/sparsevec.py). Queries = vec_id 0..4 (self-match included:
    it is the deterministic rank-1 sanity row)."""

    def fn(spark, sf_dir):
        from dpr_spark.query.sparsevec import sparse_vector_search, sparsify

        sp = sparsify(_emb(spark, sf_dir), top_m=16)
        q = sp.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), "dim", F.col("weight")
        )
        return sparse_vector_search(q, sp, k=10)

    sql = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      x AS (SELECT vec_id, i AS dim, v[i + 1] AS w
            FROM e, unnest(range(0, len(v))) t(i)
            WHERE v[i + 1] > 0),
      kept AS (SELECT vec_id, dim, round(w, 6) AS weight
               FROM (SELECT vec_id, dim, w,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY w DESC, dim DESC) AS rn
                     FROM x)
               WHERE rn <= 16),
      q AS (SELECT vec_id AS qid, dim, weight AS qw FROM kept WHERE vec_id < 5),
      scored AS (SELECT qid, k.vec_id, round(sum(qw * weight), 6) AS score_r
                 FROM q JOIN kept k USING (dim) GROUP BY 1, 2),
      ranked AS (SELECT qid, vec_id, score_r,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY score_r DESC, vec_id) AS rank
                 FROM scored)
      SELECT qid, rank, vec_id, score_r FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_sessionize_events() -> Entry:
    """Gap-based sessionization via Spark's NATIVE session_window (no
    gaps-and-islands emulation on the engine side; the DuckDB twin IS
    the islands spelling, proving the semantics line up): 6-hour
    inactivity gap per user over the events table; session_end = last
    event + gap (the session_window contract). Timestamps compare as
    formatted strings (shared entry convention)."""
    GAP_H = 6

    def fn(spark, sf_dir):
        from dpr_spark.extras.sessions import sessionize

        res = sessionize(_events(spark, sf_dir), gap=f"{GAP_H} hours")
        return res.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "value_sum",
        )

    sql = f"""
      WITH o AS (SELECT user_id, ts, value,
                        CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w > INTERVAL {GAP_H} HOUR
                             THEN 1 ELSE 0 END AS brk
                 FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM o)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts) + INTERVAL {GAP_H} HOUR, '%Y-%m-%d %H:%M:%S')
               AS session_end,
             count(*) AS n_events,
             round(sum(value), 4) AS value_sum
      FROM s GROUP BY user_id, sid"""
    return fn, sql


def q_multivector_maxsim() -> Entry:
    """Late-interaction multi-vector scoring (ES 8.x max_sim / ColBERT
    pooling, extras/ann.py): docs = label-grouped chunk embeddings,
    queries = 2 two-token multi-vector queries (vec_id 0..3 folded as
    qid=vec_id//2, qtok=vec_id%2); score = Σ_token max_chunk cosine."""

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import multivector_maxsim_topk

        e = _emb(spark, sf_dir)
        q = e.filter(F.col("vec_id") < 4).select(
            F.floor(F.col("vec_id") / 2).cast("long").alias("qid"),
            F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("qtok"),
            F.col("embedding").alias("qv"),
        )
        return multivector_maxsim_topk(
            e, q, group_col="label", k=5, qtok_col="qtok"
        )

    sql = """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id // 2 AS qid, vec_id % 2 AS qtok, v AS qv
            FROM e WHERE vec_id < 4),
      pairs AS (SELECT qid, qtok, label AS "group",
                       list_dot_product(qv, v)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(v, v))) AS c
                FROM q CROSS JOIN e),
      pt AS (SELECT qid, qtok, "group", max(c) AS m FROM pairs GROUP BY 1, 2, 3),
      sc AS (SELECT qid, "group", round(sum(m), 6) AS score_r FROM pt GROUP BY 1, 2),
      ranked AS (SELECT qid, "group", score_r,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY score_r DESC, "group") AS rank
                 FROM sc)
      SELECT qid, rank, "group", score_r FROM ranked WHERE rank <= 5"""
    return fn, sql


def q_string_stats() -> Entry:
    """ES `string_stats` (+ show_distribution entropy) over the match
    set's `source` field (query/aggs.py::string_stats_agg): value
    count, min/max/avg length, Shannon entropy of the character
    distribution. Exact integer counts; one float expression per
    derived metric, rounded at 6dp in both engines."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import string_stats_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return string_stats_agg(qdf, idx, docs.select("doc_id", "source"), "source")

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    mv AS (SELECT m.qid, d.source AS v
           FROM matches m JOIN documents d USING (doc_id)
           WHERE d.source IS NOT NULL),
    lens AS (SELECT qid, count(*) AS count,
                    min(length(v)) AS min_length,
                    max(length(v)) AS max_length,
                    CAST(sum(length(v)) AS BIGINT) AS sum_len
             FROM mv GROUP BY 1),
    chars AS (SELECT qid, unnest(string_split(v, '')) AS ch FROM mv),
    cn AS (SELECT qid, ch, count(*) AS n FROM chars
           WHERE length(ch) > 0 GROUP BY 1, 2),
    tot AS (SELECT qid, CAST(sum(n) AS BIGINT) AS tot FROM cn GROUP BY 1),
    ent AS (SELECT cn.qid,
                   round(-sum((cn.n::DOUBLE / tot.tot::DOUBLE)
                              * log2(cn.n::DOUBLE / tot.tot::DOUBLE)), 6)
                     AS entropy_r
            FROM cn JOIN tot USING (qid) GROUP BY 1)
    SELECT l.qid, l.count, l.min_length, l.max_length,
           round(l.sum_len::DOUBLE / l.count::DOUBLE, 6) AS avg_r,
           coalesce(e.entropy_r, 0.0) AS entropy_r
    FROM lens l LEFT JOIN ent e USING (qid)"""
    return fn, sql


def q_random_sampler_agg() -> Entry:
    """ES `random_sampler` (query/aggs.py::random_sampler_agg): terms
    counts per `source` over a deterministic p=0.25 subset of the match
    set (md5-derived portable draw, threshold 262144/2^20), estimates
    scaled by 1/p — the DuckDB twin replays the identical sample."""
    P, SEED = 0.25, 7
    M = 1 << 20
    THR = int(round(P * M))

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import random_sampler_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return random_sampler_agg(
            qdf, idx, docs.select("doc_id", "source"), "source",
            probability=P, seed=SEED, portable=True,
        )

    sql = f"""
    WITH {_MATCH_CTES.replace("{QTERMS}", _qterm_values_sql())},
    s AS (SELECT m.qid, m.doc_id FROM matches m
          WHERE ('0x' || substr(md5(m.doc_id::VARCHAR || ':{SEED}'), 1, 15))::BIGINT
                  % {M} < {THR}),
    c AS (SELECT s.qid, d.source AS value, count(*) AS doc_count
          FROM s JOIN documents d USING (doc_id) GROUP BY 1, 2)
    SELECT qid, value, doc_count,
           CAST(round(doc_count::DOUBLE * {float(M) / THR!r}) AS BIGINT)
             AS est_count
    FROM c"""
    return fn, sql


def q_intervals_topk() -> Entry:
    """ES `intervals` query (query/intervals.py): four rules — 2-term
    ordered w/ max_gaps, 2-term unordered, any_of over two filtered
    branches (cross-source re-minimization), and a 3-term unordered
    match — ranked by minimal-interval count (integer-exact). The twin
    spells the minimal-interval algebra END-ANCHORED: every minimal
    interval ends at some term position p with start = the latest
    occurrence(s) of the other term(s) before p; absorption is an
    anti-join; max_gaps filters AFTER minimization (the Lucene
    Intervals.maxgaps contract, asserted in tests/test_intervals.py)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.intervals import (
            AnyOf,
            Filtered,
            Match,
            intervals_search_index,
        )
        from dpr_spark.query.phrase import build_positions

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pos = build_positions(docs, idx.dictionary)
        rules = [
            (0, Match("spark window", ordered=True, max_gaps=3)),
            (1, Match("merge batch", max_gaps=5)),
            (2, AnyOf([Match("customer join", ordered=True, max_gaps=4),
                       Match("fast scan", max_gaps=6)])),
            (3, Match("data value column", max_gaps=8)),
            (4, Filtered(Match("merge batch", max_gaps=5), Match("spark"),
                         "not_containing")),
        ]
        return intervals_search_index(spark, idx, pos, rules, k=10)

    def lasts(terms):
        cols = ", ".join(
            f"max(CASE WHEN term = '{t}' THEN p END) OVER "
            f"(PARTITION BY doc_id ORDER BY p "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS l_{t}"
            for t in terms
        )
        tl = ", ".join(f"'{t}'" for t in terms)
        return f"SELECT doc_id, p, term, {cols} FROM pos WHERE term IN ({tl})"

    def branch(tag, terms, ordered, gaps):
        k = len(terms)
        if ordered:  # 2-term a-then-b
            a, b = terms
            cand = (f"SELECT doc_id, l_{a} AS s, p AS e FROM w_{tag} "
                    f"WHERE term = '{b}' AND l_{a} IS NOT NULL")
        elif k == 2:
            a, b = terms
            cand = (f"SELECT doc_id, CASE WHEN term = '{a}' THEN l_{b} "
                    f"ELSE l_{a} END AS s, p AS e FROM w_{tag} "
                    f"WHERE (term = '{a}' AND l_{b} IS NOT NULL) "
                    f"OR (term = '{b}' AND l_{a} IS NOT NULL)")
        else:  # unordered k-term: start = least of the other terms' lasts
            parts = []
            for t in terms:
                others = [o for o in terms if o != t]
                nn = " AND ".join(f"l_{o} IS NOT NULL" for o in others)
                lst = ", ".join(f"l_{o}" for o in others)
                parts.append(
                    f"SELECT doc_id, least({lst}) AS s, p AS e FROM w_{tag} "
                    f"WHERE term = '{t}' AND {nn}"
                )
            cand = " UNION ALL ".join(parts)
        return f"""
    w_{tag} AS ({lasts(terms)}),
    cd_{tag} AS (SELECT DISTINCT doc_id, s, e FROM ({cand})),
    f_{tag} AS (
      SELECT c1.doc_id, c1.s, c1.e FROM cd_{tag} c1
      WHERE NOT EXISTS (SELECT 1 FROM cd_{tag} c2
                        WHERE c2.doc_id = c1.doc_id AND c2.s >= c1.s
                          AND c2.e <= c1.e
                          AND (c2.s <> c1.s OR c2.e <> c1.e))
        AND (c1.e - c1.s + 1) - {k} <= {gaps})"""

    sql = f"""
    WITH {_POS_CTES},{branch("r0", ["spark", "window"], True, 3)},
    {branch("r1", ["merge", "batch"], False, 5)},
    {branch("r2a", ["customer", "join"], True, 4)},
    {branch("r2b", ["fast", "scan"], False, 6)},
    u2 AS (SELECT DISTINCT doc_id, s, e FROM
           (SELECT * FROM f_r2a UNION ALL SELECT * FROM f_r2b)),
    f_r2 AS (
      SELECT c1.doc_id, c1.s, c1.e FROM u2 c1
      WHERE NOT EXISTS (SELECT 1 FROM u2 c2
                        WHERE c2.doc_id = c1.doc_id AND c2.s >= c1.s
                          AND c2.e <= c1.e
                          AND (c2.s <> c1.s OR c2.e <> c1.e))),
    {branch("r3", ["data", "value", "column"], False, 8).lstrip().lstrip(",")}
    ,
    f_r4 AS (
      SELECT f.doc_id, f.s, f.e FROM f_r1 f
      WHERE NOT EXISTS (SELECT 1 FROM pos p WHERE p.term = 'spark'
                        AND p.doc_id = f.doc_id
                        AND p.p >= f.s AND p.p <= f.e)),
    allc AS (
      SELECT 0 AS qid, doc_id, count(*) AS n_intervals FROM f_r0 GROUP BY 2
      UNION ALL SELECT 1, doc_id, count(*) FROM f_r1 GROUP BY 2
      UNION ALL SELECT 2, doc_id, count(*) FROM f_r2 GROUP BY 2
      UNION ALL SELECT 3, doc_id, count(*) FROM f_r3 GROUP BY 2
      UNION ALL SELECT 4, doc_id, count(*) FROM f_r4 GROUP BY 2),
    ranked AS (SELECT qid, doc_id, n_intervals,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY n_intervals DESC, doc_id)
                        AS rank
               FROM allc)
    SELECT qid::BIGINT AS qid, rank::INT AS rank, doc_id,
           n_intervals::BIGINT AS n_intervals
    FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_significant_text() -> Entry:
    """ES significant_text aggregation (query/aggs.py): JLH over a
    15-doc top-hit sample whose stored text is RE-ANALYZED (no term
    vectors), with filter_duplicate_text collapsing identical texts to
    their best-ranked copy. Background df reads the dictionary. Rank
    re-derived from the 6-dp score on both sides."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import significant_text

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = significant_text(
            qdf, idx, docs.select("doc_id", "text"),
            size=5, sample_size=15, min_fg=2,
        ).select(
            "qid", "term", "fg_count", "bg_count",
            F.round("score", 6).alias("score_r"),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("term"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "term", "fg_count", "bg_count", "score_r"
        )

    sql = f"""
    WITH {_BM25_CTES.replace("{QTERMS}", _qterm_values_sql())},
    samp AS (
      SELECT r.qid, r.doc_id,
             row_number() OVER (PARTITION BY r.qid, d.text
                                ORDER BY r.rank) AS dup
      FROM ranked r JOIN documents d USING (doc_id) WHERE r.rank <= 15),
    sampled AS (SELECT qid, doc_id FROM samp WHERE dup = 1),
    nsamp AS (SELECT qid, count(*) AS n_sampled FROM sampled GROUP BY 1),
    fg AS (
      SELECT s.qid, t.term, count(*) AS fg_count
      FROM sampled s JOIN (SELECT doc_id, unnest(list_distinct(toks)) AS term
                           FROM tok) t USING (doc_id)
      GROUP BY 1, 2 HAVING count(*) >= 2),
    scored_t AS (
      SELECT fg.qid, fg.term, fg.fg_count, dict.df AS bg_count,
             ((fg.fg_count::DOUBLE / ns.n_sampled) - (dict.df::DOUBLE / stats.n))
             * ((fg.fg_count::DOUBLE / ns.n_sampled) / (dict.df::DOUBLE / stats.n))
               AS score
      FROM fg JOIN dict USING (term) JOIN nsamp ns USING (qid)
           CROSS JOIN stats),
    ranked_st AS (
      SELECT qid, term, fg_count, bg_count, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, term) AS rank
      FROM scored_t)
    SELECT qid, rank, term, fg_count, bg_count, score_r
    FROM ranked_st WHERE rank <= 5"""
    return fn, sql


def q_rate_agg() -> Entry:
    """ES `rate` aggregation nested in a monthly date_histogram
    (query/aggs.py::rate_agg): per-month match counts normalized to a
    per-DAY rate by that month's actual calendar length (31 for
    January — ES's unit_rate contract), over the synthesized warc_ts
    (2025-01-01 + doc_id%75 days so three month lengths appear)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import rate_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(75)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return rate_agg(qdf, idx, vals, "warc_ts", unit="month", rate_unit="day").select(
            "qid",
            F.date_format("bucket", "yyyy-MM").alias("month"),
            "count",
            F.round("rate", 6).alias("rate_r"),
        )

    sql = f"""
    WITH {{MATCH}},
    hist AS (
      SELECT m.qid,
             date_trunc('month', DATE '2025-01-01' + (m.doc_id % 75)::INT) AS mth,
             count(*) AS count
      FROM matches m GROUP BY 1, 2)
    SELECT qid, strftime(mth, '%Y-%m') AS month, count,
           round(count::DOUBLE / date_part('day', last_day(mth)), 6) AS rate_r
    FROM hist"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_moving_percentiles() -> Entry:
    """ES moving_percentiles pipeline aggregation (query/aggs.py):
    exact interpolated median of the trailing 3 PRESENT weekly buckets
    (quantile_cont semantics — the trailing window is tiny and exact,
    nothing to TDigest). Weeks order lexicographically ==
    chronologically; counts are integers so both engines interpolate
    the same doubles."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import date_histogram_agg, moving_percentiles

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        vals = docs.select(
            "doc_id",
            F.to_timestamp(
                F.date_add(
                    F.lit("2025-01-01").cast("date"),
                    F.pmod("doc_id", F.lit(45)).cast("int"),
                )
            ).alias("warc_ts"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        hist = date_histogram_agg(qdf, idx, vals, "warc_ts", unit="week").select(
            "qid", F.date_format("bucket", "yyyy-MM-dd").alias("week"), "count"
        )
        return moving_percentiles(hist, order_col="week", window=3, pct=0.5)

    sql = f"""
    WITH {{MATCH}},
    hist AS (
      SELECT m.qid,
             strftime(date_trunc('week',
                      DATE '2025-01-01' + (m.doc_id % 45)::INT), '%Y-%m-%d')
               AS week,
             count(*) AS count
      FROM matches m GROUP BY 1, 2)
    SELECT qid, week, count,
           round(quantile_cont(count::DOUBLE, 0.5) OVER (
                   PARTITION BY qid ORDER BY week
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_pct
    FROM hist"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


IP_RANGES = [(None, "10.1.0.0"), ("10.1.0.0", "10.3.0.0"), ("10.2.128.0", None)]


def _ip_num(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) + (b << 16) + (c << 8) + d


def q_ip_range_agg() -> Entry:
    """ES `ip_range` aggregation over the match set (query/aggs.py::
    ip_range_agg): [from, to) buckets on dotted-quad IPv4 doc values
    (synthesized 10.{doc_id%4}.{doc_id%200}.1), compared in address
    space, overlapping allowed, ONE pass (conditional sums + stack)."""

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import ip_range_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        ips = docs.select(
            "doc_id",
            F.concat_ws(
                ".",
                F.lit("10"),
                F.pmod("doc_id", F.lit(4)).cast("string"),
                F.pmod("doc_id", F.lit(200)).cast("string"),
                F.lit("1"),
            ).alias("ip"),
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return ip_range_agg(qdf, idx, ips, "ip", IP_RANGES)

    arms = []
    for i, (lo, hi) in enumerate(IP_RANGES):
        conds = []
        if lo is not None:
            conds.append(f"v >= {_ip_num(lo)}")
        if hi is not None:
            conds.append(f"v < {_ip_num(hi)}")
        cond = " AND ".join(conds) or "TRUE"
        arms.append(
            f"SELECT qid, {i} AS range_idx, '{lo or ''}' AS range_from,"
            f" '{hi or ''}' AS range_to,"
            f" sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS count"
            f" FROM ipn GROUP BY 1"
        )
    sql = f"""
    WITH {{MATCH}},
    ipn AS (
      SELECT m.qid,
             (167772160 + (m.doc_id % 4) * 65536
              + (m.doc_id % 200) * 256 + 1)::BIGINT AS v
      FROM matches m)
    {" UNION ALL ".join(arms)}"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_filter_context_topk() -> Entry:
    """ES FILTER CONTEXT (query/boolquery.py::filter_context_search):
    constant_score wrapping bool.filter = query terms (ANY) + `ids`
    allowlist + `exists` on a sparse field + `terms` LOOKUP (the
    allowed-source list comes from another stored row set, not the
    request). Every hit scores the constant boost; order is doc_id asc
    — the deterministic no-relevance contract."""
    IDS = list(range(0, 400, 2))

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.boolquery import filter_context_search

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        meta = docs.select(
            "doc_id",
            F.when(F.pmod("doc_id", F.lit(3)) != 0, F.lit("present")).alias("fld"),
            "source",
        )
        lookup = docs.filter(F.col("doc_id") < 20).select("source").distinct()
        return filter_context_search(
            spark, BENCH_QUERIES, idx,
            doc_meta=meta, ids=IDS, exists_field="fld",
            terms_lookup=(lookup, "source"), boost=1.5, k=10,
        )

    sql = f"""
    WITH {{MATCH}},
    hits_f AS (
      SELECT m.qid, m.doc_id
      FROM matches m JOIN documents d USING (doc_id)
      WHERE m.doc_id % 2 = 0 AND m.doc_id >= 0 AND m.doc_id < 400
        AND m.doc_id % 3 != 0
        AND d.source IN (SELECT DISTINCT source FROM documents
                         WHERE doc_id < 20)),
    ranked_f AS (
      SELECT qid, doc_id,
             row_number() OVER (PARTITION BY qid ORDER BY doc_id) AS rank
      FROM hits_f)
    SELECT qid, rank, doc_id, 1.5::DOUBLE AS score
    FROM ranked_f WHERE rank <= 10"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def _geohash_sql(lat_sql: str, lon_sql: str, precision: int):
    """DuckDB spelling of query/geo.py::geohash_cols — the SAME integer
    arithmetic (floor-division bit extraction, lon-first interleave,
    base-32 render), generated so both engines share one formula."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    x = (
        f"least(floor(({lon_sql} + 180.0) / 360.0 * {float(1 << lon_bits)})::BIGINT,"
        f" {(1 << lon_bits) - 1})"
    )
    y = (
        f"least(floor(({lat_sql} + 90.0) / 180.0 * {float(1 << lat_bits)})::BIGINT,"
        f" {(1 << lat_bits) - 1})"
    )
    terms = []
    for i in range(nbits):
        if i % 2 == 0:
            src, sb = "gx", lon_bits - 1 - i // 2
        else:
            src, sb = "gy", lat_bits - 1 - (i - 1) // 2
        terms.append(
            f"(floor({src}::DOUBLE / {float(1 << sb)})::BIGINT % 2)"
            f" * {1 << (nbits - 1 - i)}"
        )
    chars = []
    for i in range(precision):
        d = (
            f"(floor(gcell::DOUBLE / {float(1 << (5 * (precision - 1 - i)))})::BIGINT"
            f" % 32)"
        )
        chars.append(
            f"substring('0123456789bcdefghjkmnpqrstuvwxyz', ({d} + 1)::INT, 1)"
        )
    return x, y, " + ".join(terms), " || ".join(chars)


def q_geohash_grid_agg() -> Entry:
    """ES geohash_grid aggregation over the match set (query/geo.py::
    geohash_grid_agg): precision-3 Niemeyer geohash cells, top-5 per
    query by doc count (ties by hash). Both engines evaluate the same
    generated floor-division bit-interleave, so cells are integer-
    exact (pytest cross-checks the classic bisection algorithm)."""
    PREC, SIZE = 3, 5

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches
        from dpr_spark.query.geo import geohash_grid_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        pts = _matches(qdf, idx).join(_doc_geo(spark, sf_dir), "doc_id")
        return geohash_grid_agg(pts, precision=PREC, size=SIZE)

    gx, gy, gcell, ghash = _geohash_sql("lat", "lon", PREC)
    sql = f"""
    WITH {{MATCH}},
    geo AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
            FROM documents),
    xy AS (SELECT m.qid, geo.doc_id, {gx} AS gx, {gy} AS gy
           FROM matches m JOIN geo USING (doc_id)),
    cells AS (SELECT qid, doc_id, {gcell} AS gcell FROM xy),
    hashed AS (SELECT qid, {ghash} AS geohash FROM cells),
    counts AS (SELECT qid, geohash, count(*) AS count
               FROM hashed GROUP BY 1, 2),
    ranked_gh AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY count DESC, geohash) AS rank
      FROM counts)
    SELECT qid, rank, geohash, count FROM ranked_gh WHERE rank <= {SIZE}"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_dsir_resample() -> Entry:
    """DSIR importance resampling (extras/dsir.py; Xie et al. 2023):
    hashed unigram+bigram bucket features, add-λ bag-of-ngrams models
    for the target domain (source='src0') vs the raw corpus, per-doc
    log importance weights, Gumbel top-k selection without replacement.
    The entry runs the portable md5 hash family and a hash-seeded
    Gumbel draw so DuckDB replays the exact selection; ranks order by
    the rounded key (ties by doc)."""
    B, LAM, K, SEED = 1024, 0.5, 60, 7
    DEN = float(1 << 60)

    def fn(spark, sf_dir):
        from dpr_spark.extras.dsir import dsir_resample

        docs = _docs(spark, sf_dir)
        return dsir_resample(
            docs,
            docs.filter(F.col("source") == "src0"),
            k=K,
            seed=SEED,
            buckets=B,
            lam=LAM,
            portable=True,
            lowercase_first=True,
        )

    sql = f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id, unnest(toks) AS g FROM tok
      UNION ALL
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
      FROM tok, unnest(range(1, len(toks))) AS t(i)
    ),
    feats AS (SELECT doc_id AS doc,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS bucket,
                     count(*)::BIGINT AS c
              FROM grams GROUP BY 1, 2),
    tgt AS (SELECT bucket, sum(c)::DOUBLE AS ct
            FROM feats JOIN documents ON doc = doc_id
            WHERE source = 'src0' GROUP BY 1),
    raw AS (SELECT bucket, sum(c)::DOUBLE AS cq FROM feats GROUP BY 1),
    tot AS (SELECT (SELECT sum(ct) FROM tgt) AS tt,
                   (SELECT sum(cq) FROM raw) AS tq),
    ratio AS (SELECT raw.bucket,
                     ln((coalesce(tgt.ct, 0) + {LAM}) / (tot.tt + {LAM * B}))
                   - ln((raw.cq + {LAM}) / (tot.tq + {LAM * B})) AS r
              FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
    w AS (SELECT doc, sum(c * r) AS logw
          FROM feats JOIN ratio USING (bucket) GROUP BY 1),
    keyed AS (SELECT doc, round(logw, 6) AS logw,
                     round(logw - ln(-ln(
                       (('0x' || substr(md5(doc::VARCHAR || ':{SEED}'), 1, 15))::BIGINT
                        + 0.5) / {DEN})), 6) AS key
              FROM w)
    SELECT row_number() OVER (ORDER BY key DESC, doc) AS rank, doc, logw, key
    FROM keyed ORDER BY key DESC, doc LIMIT {K}"""
    return fn, sql


def q_quality_clf() -> Entry:
    """Learned quality classifier (extras/quality_clf.py; the
    CCNet/fastText wiki-vs-crawl shape): logistic regression over
    binary hashed unigram+bigram buckets, trained in-domain
    (source='src0') vs rest with 3 fixed full-batch GD steps, scoring
    every doc a probability. The twin unrolls the GD steps as SQL CTEs
    — with zero initial weights step 1's residual is exactly 0.5 - y,
    and each later step is (margin join, residual, per-bucket gradient,
    weight update); both engines round the final sigmoid at 6 dp."""
    B, ETA, STEPS = 1024, 2.0, 3

    def fn(spark, sf_dir):
        from dpr_spark.extras.quality_clf import quality_classifier_scores

        docs = _docs(spark, sf_dir)
        return quality_classifier_scores(
            spark,
            docs,
            docs.filter(F.col("source") == "src0"),
            buckets=B,
            eta=ETA,
            steps=STEPS,
            portable=True,
            lowercase_first=True,
        )

    ctes = [
        f"""tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id, unnest(toks) AS g FROM tok
      UNION ALL
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
      FROM tok, unnest(range(1, len(toks))) AS t(i)
    ),
    feats AS (SELECT DISTINCT doc_id AS doc,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS bucket
              FROM grams),
    lab AS (SELECT doc_id AS doc,
                   CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
            FROM documents
            WHERE doc_id IN (SELECT doc FROM feats)),
    nn AS (SELECT count(*)::DOUBLE AS n FROM lab),
    r1 AS (SELECT doc, 0.5 - y AS r FROM lab),
    g1 AS (SELECT bucket, sum(r) / (SELECT n FROM nn) AS g
           FROM feats JOIN r1 USING (doc) GROUP BY 1),
    w1 AS (SELECT bucket, -{ETA} * g AS w FROM g1),
    b1 AS (SELECT -{ETA} * avg(r) AS bias FROM r1)"""
    ]
    for t in range(2, STEPS + 1):
        p = t - 1
        ctes.append(
            f"""m{t} AS (SELECT f.doc, (SELECT bias FROM b{p}) + sum(w.w) AS m
           FROM feats f JOIN w{p} w USING (bucket) GROUP BY f.doc),
    r{t} AS (SELECT lab.doc, 1.0 / (1.0 + exp(-m{t}.m)) - lab.y AS r
             FROM lab JOIN m{t} USING (doc)),
    g{t} AS (SELECT bucket, sum(r) / (SELECT n FROM nn) AS g
             FROM feats JOIN r{t} USING (doc) GROUP BY 1),
    w{t} AS (SELECT bucket, w.w - {ETA} * g{t}.g AS w
             FROM w{p} w JOIN g{t} USING (bucket)),
    b{t} AS (SELECT (SELECT bias FROM b{p}) - {ETA} * avg(r) AS bias FROM r{t})"""
        )
    sql = (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT lab.doc, lab.y,
           round(1.0 / (1.0 + exp(-((SELECT bias FROM b{STEPS}) + s.m))), 6)
             AS prob
    FROM lab JOIN (SELECT f.doc, sum(w.w) AS m
                   FROM feats f JOIN w{STEPS} w USING (bucket)
                   GROUP BY f.doc) s USING (doc)"""
    )
    return fn, sql


_ROUTE_NB = 8


def _routed_common_sql(nb: int = _ROUTE_NB) -> str:
    """Shared CTEs for the routed entries: routing(qid) = the
    (qid % n)-th distinct source in sorted order; bucket = the portable
    md5-derived shard hash (query/routing.py::route_bucket_sql)."""
    from dpr_spark.query.routing import route_bucket_sql

    qids = ", ".join(f"({qid})" for qid, _ in BENCH_QUERIES)
    return f"""
      srcs AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS rn,
                      count(*) OVER () AS n
               FROM (SELECT DISTINCT source FROM documents)),
      qroute AS (
        SELECT q.qid, {route_bucket_sql('s.source', nb)} AS qbucket
        FROM (VALUES {qids}) AS q(qid)
        JOIN srcs s ON s.rn = q.qid % s.n),
      docsb AS (SELECT doc_id, text,
                       {route_bucket_sql('source', nb)} AS bucket
                FROM documents),
      tok AS (SELECT doc_id, bucket, {_DUCK_TOKS} AS toks FROM docsb),
      ds AS (SELECT doc_id, bucket, len(toks) AS doclen FROM tok),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      tf AS (SELECT bucket, doc_id, term, count(*) AS tf
             FROM (SELECT bucket, doc_id, unnest(toks) AS term FROM tok)
             GROUP BY 1, 2, 3)"""


def _routed_fn(mode: str):
    def fn(spark, sf_dir):
        import tempfile

        from dpr_spark.query.routing import build_routed_layout, search_routed

        docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
        path = tempfile.mkdtemp(prefix="routed_layout_")
        build_routed_layout(
            spark, docs, "source", path, num_buckets=_ROUTE_NB, portable=True
        )
        srcs = sorted(
            r["source"] for r in docs.select("source").distinct().collect()
        )
        queries = [(qid, q, srcs[qid % len(srcs)]) for qid, q in BENCH_QUERIES]
        res = search_routed(
            spark, path, queries, num_buckets=_ROUTE_NB, k=10,
            mode=mode, portable=True,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    return fn


def q_routed_topk() -> Entry:
    """Custom routing, ES default query_then_fetch (query/routing.py):
    each query searches ONLY the shard its routing key (a source value)
    hashes to, scored with SHARD-LOCAL df/N/avgdl — the documented ES
    default, small-shard idf bias included. The layout is parquet
    partitioned by bucket; the scan partition-prunes to the routed
    shards (asserted in tests/test_routing.py / test_plans bar)."""
    return _routed_fn("local"), _routed_local_sql(_ROUTE_NB)


def _routed_local_sql(nb: int) -> str:
    """query_then_fetch twin at ``nb`` shards (shared with the shrink
    entry, which must equal a fresh build at the target count)."""
    return (
        "WITH "
        + _routed_common_sql(nb)
        + f""",
      bstats AS (SELECT bucket, count(*)::DOUBLE AS n, avg(doclen) AS avgdl
                 FROM ds GROUP BY 1),
      dict AS (SELECT bucket, term, count(*) AS df FROM tf GROUP BY 1, 2),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(ln((bs.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / bs.avgdl))
               ) AS score
        FROM qt
        JOIN qroute r ON r.qid = qt.qid
        JOIN dict ON dict.term = qt.term AND dict.bucket = r.qbucket
        JOIN tf ON tf.term = qt.term AND tf.bucket = r.qbucket
        JOIN ds ON ds.doc_id = tf.doc_id AND ds.bucket = tf.bucket
        JOIN bstats bs ON bs.bucket = r.qbucket
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    )


_SHRINK_NB = 4


def q_routed_shrink_topk() -> Entry:
    """Index shrink (ES _shrink; index/resize.py): build the routed
    layout at {_ROUTE_NB} shards, shrink it to {_SHRINK_NB} via the
    stored routing-space hash (rbucket % M — no re-tokenize, no corpus
    access; shard-local impacts recomputed exactly from the stored raw
    tf/doclen), then run query_then_fetch over the SHRUNK layout. The
    twin scores against a direct {_SHRINK_NB}-shard build — the resize
    ≡ fresh-build equivalence, checked cross-engine."""

    def fn(spark, sf_dir):
        import atexit
        import shutil
        import tempfile

        from dpr_spark.index.resize import shrink_layout
        from dpr_spark.query.routing import build_routed_layout, search_routed

        docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
        src = tempfile.mkdtemp(prefix="routed_src_")
        # the returned DataFrame lazily reads these layout dirs, so they
        # must outlive the query — reclaim them at process exit instead
        # of leaking one pair per invocation (r5 ADVICE)
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        build_routed_layout(
            spark, docs, "source", src, num_buckets=_ROUTE_NB, portable=True
        )
        dst = tempfile.mkdtemp(prefix="routed_shrunk_")
        atexit.register(shutil.rmtree, dst, ignore_errors=True)
        shrink_layout(spark, src, dst, _SHRINK_NB)
        srcs = sorted(
            r["source"] for r in docs.select("source").distinct().collect()
        )
        queries = [(qid, q, srcs[qid % len(srcs)]) for qid, q in BENCH_QUERIES]
        res = search_routed(
            spark, dst, queries, num_buckets=_SHRINK_NB, k=10,
            mode="local", portable=True,
        ).select("qid", "doc_id", F.round("score", 6).alias("score_r"))
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    return fn, _routed_local_sql(_SHRINK_NB)


def q_routed_dfs_topk() -> Entry:
    """Custom routing, dfs_query_then_fetch: candidates still come from
    the routed shard only, but scoring uses CORPUS-WIDE df/N/avgdl (ES's
    dfs phase; here a build-time aggregation — the Spark-idiomatic
    place for it). Must agree with the full-corpus BM25 restricted to
    the shard's documents, which is exactly what the twin computes."""
    sql = (
        "WITH "
        + _routed_common_sql()
        + f""",
      gstats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
      gdict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT qt.qid, tf.doc_id,
               sum(ln((g.n - gdict.df + 0.5) / (gdict.df + 0.5) + 1.0)
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / g.avgdl))
               ) AS score
        FROM qt
        JOIN qroute r ON r.qid = qt.qid
        JOIN gdict ON gdict.term = qt.term
        JOIN tf ON tf.term = qt.term AND tf.bucket = r.qbucket
        JOIN ds ON ds.doc_id = tf.doc_id AND ds.bucket = tf.bucket
        CROSS JOIN gstats g
        GROUP BY 1, 2),
      ranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
      SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= 10"""
    )
    return _routed_fn("global"), sql


def q_nested_topk() -> Entry:
    """ES `nested` query (query/nestedquery.py; Lucene
    ToParentBlockJoinQuery): each document's 8-token paragraph chunks
    are indexed as their OWN child documents (child-level BM25 stats —
    the ES nested contract), parent score = max over matching children,
    inner_hits = the best child (ties -> smallest child_ix). The engine
    retrieves via the segments searcher with the exact k·maxc bound;
    the twin scores every child and folds the same max in SQL."""
    W = 8

    def fn(spark, sf_dir):
        from dpr_spark.query.nestedquery import nested_children, nested_search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        children = nested_children(docs, width=W)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = nested_search(spark, qdf, children, k=10, score_mode="max").select(
            "qid",
            "doc_id",
            F.round("score", 6).alias("score_r"),
            "best_child_ix",
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r", "best_child_ix"
        )

    sql = f"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      ch AS (SELECT doc_id, i AS child_ix,
                    array_to_string(words[i * {W} + 1 : (i + 1) * {W}], ' ') AS chunk
             FROM w, unnest(range(0, greatest(ceil(len(words) / {W}.0)::INT, 1))) AS u(i)),
      tok AS (SELECT doc_id, child_ix,
                     regexp_extract_all(lower(chunk), '{TOKEN_PATTERN_SQL}') AS toks
              FROM ch),
      ds AS (SELECT doc_id, child_ix, len(toks) AS doclen FROM tok),
      stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM ds),
      tf AS (SELECT doc_id, child_ix, term, count(*) AS tf
             FROM (SELECT doc_id, child_ix, unnest(toks) AS term FROM tok)
             GROUP BY 1, 2, 3),
      dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      qt AS (SELECT * FROM (VALUES {_qterm_values_sql()}) AS q(qid, term)),
      cscored AS (
        SELECT qt.qid, tf.doc_id, tf.child_ix,
               sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
               ) AS cscore
        FROM qt JOIN dict USING (term) JOIN tf USING (term)
             JOIN ds ON ds.doc_id = tf.doc_id AND ds.child_ix = tf.child_ix
             CROSS JOIN stats
        GROUP BY 1, 2, 3),
      bc AS (
        SELECT qid, doc_id, child_ix, round(cscore, 6) AS score_r,
               row_number() OVER (PARTITION BY qid, doc_id
                                  ORDER BY cscore DESC, child_ix) AS rn
        FROM cscored),
      parents AS (
        SELECT qid, doc_id, score_r, child_ix::INT AS best_child_ix
        FROM bc WHERE rn = 1),
      ranked AS (
        SELECT qid, doc_id, score_r, best_child_ix,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_r DESC, doc_id) AS rank
        FROM parents)
      SELECT qid, rank, doc_id, score_r, best_child_ix
      FROM ranked WHERE rank <= 10"""
    return fn, sql


_NESTED_CH_SQL = """
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    ch AS (SELECT doc_id, i AS child_ix,
                  words[i * 8 + 1 : (i + 1) * 8] AS cw
           FROM w, unnest(range(0, greatest(ceil(len(words) / 8.0)::INT, 1))) AS u(i))
"""


def q_children_agg() -> Entry:
    """ES `children` aggregation (query/joinquery.py::
    children_bucket_agg — the aggregation twin of has_child): bucket
    parent documents by `source`, switch context to their 8-word
    nested paragraph children, and aggregate over the children —
    (bucket, n_parents, n_children, avg child word count). n_parents
    comes from the parent side alone so child fan-out can't inflate
    it; the child fold is one map-side-combined groupBy."""

    def fn(spark, sf_dir):
        from dpr_spark.query.joinquery import children_bucket_agg
        from dpr_spark.query.nestedquery import nested_children

        docs = _docs(spark, sf_dir)
        children = nested_children(docs.select("doc_id", "text"), width=8)
        res = children_bucket_agg(
            docs.select("doc_id", "source"),
            children.withColumn("nw", F.size(F.split("chunk", " "))),
            bucket_col="source",
            child_value_col="nw",
        )
        return res.select(
            "bucket", "n_parents", "n_children",
            F.round("avg_child_value", 6).alias("avg_child_words"),
        )

    sql = f"""
    WITH {_NESTED_CH_SQL},
    p AS (SELECT source AS bucket, count(DISTINCT doc_id) AS n_parents
          FROM documents GROUP BY 1),
    c AS (SELECT d.source AS bucket, count(*) AS n_children,
                 round(avg(len(ch.cw)::DOUBLE), 6) AS avg_child_words
          FROM ch JOIN documents d USING (doc_id) GROUP BY 1)
    SELECT p.bucket, p.n_parents,
           coalesce(c.n_children, 0) AS n_children, c.avg_child_words
    FROM p LEFT JOIN c USING (bucket)"""
    return fn, sql


def q_reverse_nested_agg() -> Entry:
    """ES `reverse_nested` aggregation (query/joinquery.py::
    reverse_nested_agg; also the `parent` agg shape): bucket the 8-word
    nested children by their LEADING word, jump back out to the parent
    context, and report per bucket the DISTINCT parent count plus the
    mean parent n_chars — top-10 buckets (n_parents DESC, key ASC).
    The (key, parent) dedup happens before any parent column joins in,
    so one parent counts once per bucket however many of its children
    hit — the reverse_nested contract."""

    def fn(spark, sf_dir):
        from dpr_spark.query.joinquery import reverse_nested_agg
        from dpr_spark.query.nestedquery import nested_children

        docs = _docs(spark, sf_dir)
        children = nested_children(docs.select("doc_id", "text"), width=8)
        res = reverse_nested_agg(
            children.withColumn(
                "lead", F.element_at(F.split("chunk", " "), 1)
            ),
            docs.select("doc_id", "n_chars"),
            child_key_col="lead",
            parent_value_col="n_chars",
            size=10,
        )
        return res.select(
            "rank", "key", "n_parents",
            F.round("avg_parent_value", 6).alias("avg_n_chars"),
        )

    sql = f"""
    WITH {_NESTED_CH_SQL},
    pairs AS (SELECT DISTINCT ch.cw[1] AS key, doc_id FROM ch),
    agg AS (SELECT key, count(*) AS n_parents,
                   round(avg(d.n_chars::DOUBLE), 6) AS avg_n_chars
            FROM pairs JOIN documents d USING (doc_id) GROUP BY 1),
    ranked AS (SELECT key, n_parents, avg_n_chars,
                      row_number() OVER (ORDER BY n_parents DESC, key) AS rank
               FROM agg)
    SELECT rank, key, n_parents, avg_n_chars FROM ranked WHERE rank <= 10"""
    return fn, sql


def q_categorize_text_agg() -> Entry:
    """ES `categorize_text` aggregation (query/aggs.py::
    categorize_text_agg), deterministic variant: matched docs group by
    the first 4 all-letter tokens of their lowercased text (digit-
    bearing tokens dropped — the categorizer's number-wildcard rule),
    top-10 categories per query by (count DESC, signature ASC). Pure
    Catalyst array math — no UDF, no drain-tree order dependence."""
    MT, SIZE = 4, 10

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.aggs import _matches, categorize_text_agg

        docs = _docs(spark, sf_dir)
        idx = build_index_from_docs(
            spark, docs.select("doc_id", "text"), build_blocks=False
        )
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        return categorize_text_agg(
            _matches(qdf, idx), docs.select("doc_id", "text"),
            size=SIZE, max_tokens=MT,
        )

    sql = f"""
    WITH {{MATCH}},
    cats AS (
      SELECT m.qid,
             array_to_string(
               (list_filter(string_split_regex(lower(d.text), '\\s+'),
                            x -> regexp_full_match(x, '[a-z]+')))[1:{MT}],
               ' ') AS category
      FROM matches m JOIN documents d USING (doc_id)),
    counts AS (SELECT qid, category, count(*) AS count
               FROM cats WHERE category <> '' GROUP BY 1, 2),
    ranked AS (SELECT qid, category, count,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY count DESC, category) AS rank
               FROM counts)
    SELECT qid, rank, category, count FROM ranked WHERE rank <= {SIZE}"""
    sql = sql.replace("{MATCH}", _MATCH_CTES.replace("{QTERMS}", _qterm_values_sql()))
    return fn, sql


def q_phrase_highlight_topk() -> Entry:
    """Phrase-aware highlighting (query/phrase.py::
    phrase_search_index_highlight; Lucene unified highlighter over a
    PhraseQuery): exact-phrase BM25 top-3, each hit carrying the FIRST
    phrase occurrence and a lead+span+trail token fragment around it —
    the term-window highlighter (highlight_topk) can't know where the
    PHRASE matched, only where its words landed individually. The twin
    derives first_pos as the min qualifying start and slices the same
    token window in SQL."""
    LEAD, TRAIL, HK = 3, 3, 3

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.query.phrase import phrase_search_index_highlight

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(
            spark, docs, build_blocks=False, build_positional=True
        )
        res = phrase_search_index_highlight(
            spark, idx, idx.positions, docs, PHRASE_QUERIES,
            k=HK, lead=LEAD, trail=TRAIL,
        ).select(
            "qid",
            "doc_id",
            F.round("score", 6).alias("score_r"),
            F.col("first_pos").cast("int").alias("first_pos"),
            "fragment",
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r", "first_pos", "fragment"
        )

    sql = f"""
    WITH {_POS_CTES},
    q AS (SELECT * FROM (VALUES {_phrase_values_sql()}) AS q(qid, off, term)),
    qn AS (SELECT qid, count(*) AS n_off, max(off) + 1 AS span FROM q GROUP BY 1),
    idf AS (
      SELECT q.qid,
             sum(ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)) AS idf_sum,
             count(*) AS n_res
      FROM q JOIN dict USING (term) CROSS JOIN stats GROUP BY 1),
    idf_ok AS (SELECT idf.qid, idf.idf_sum FROM idf JOIN qn USING (qid)
               WHERE idf.n_res = qn.n_off),
    cand AS (
      SELECT q.qid, pos.doc_id, pos.p - q.off AS start, count(*) AS n_hit
      FROM q JOIN pos USING (term) GROUP BY 1, 2, 3),
    pf AS (
      SELECT cand.qid, cand.doc_id, count(*) AS pf,
             min(cand.start) - 1 AS first_pos
      FROM cand JOIN qn USING (qid) WHERE cand.n_hit = qn.n_off GROUP BY 1, 2),
    scored AS (
      SELECT pf.qid, pf.doc_id, pf.first_pos,
             idf_ok.idf_sum * pf.pf * {BM25_K1 + 1.0}
             / (pf.pf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))
             AS score
      FROM pf JOIN idf_ok USING (qid)
           JOIN ds ON pf.doc_id = ds.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT qid, doc_id, first_pos, round(score, 6) AS score_r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored)
    SELECT r.qid, r.rank, r.doc_id, r.score_r, r.first_pos::INT AS first_pos,
           array_to_string(
             t.toks[greatest(r.first_pos - {LEAD}, 0) + 1 :
                    r.first_pos + qn.span + {TRAIL}], ' ') AS fragment
    FROM ranked r JOIN tok t ON t.doc_id = r.doc_id JOIN qn ON qn.qid = r.qid
    WHERE r.rank <= {HK}"""
    return fn, sql


def q_mmr_rerank_topk() -> Entry:
    """MMR diversified reranking (extras/ann.py::mmr_rerank; Carbonell &
    Goldstein 1998 — the vector-store "diversity" reranker): cosine
    top-12 candidates per query, then 5 greedy selections maximizing
    λ·rel − (1−λ)·max-sim-to-selected with λ = 7/10. The greedy loop is
    inherently sequential, so the twin UNROLLS the 5 selection steps as
    CTEs (the same trick the quality-classifier entry uses for GD
    steps). Utilities are EXACT BIGINT micro-units (util = 7·rel_i −
    3·sim_i over round(cos·10^6) integers): a float spelling would sit
    on x.xxxxxx5 decimal boundaries systematically (λ·(6-dp decimal)
    products), where Spark's decimal HALF_UP round and DuckDB's
    float round disagree."""
    KC, KS = 12, 5

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import cosine_expr, mmr_rerank

        e = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        )
        pairs = (
            q.crossJoin(e)
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                F.col("vec_id").alias("id"),
                "v",
                cosine_expr(F.col("qv"), F.col("v")).alias("rel"),
            )
        )
        rel_i = F.round(F.col("rel") * 1e6, 0).cast("long")
        w = Window.partitionBy("qid").orderBy(rel_i.desc(), F.asc("id"))
        cand = pairs.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= KC
        ).drop("rn")
        res = mmr_rerank(cand, k=KS, micro_lam=(7, 10))
        return res.select("qid", "step", "id", F.col("util").alias("util_i"))

    def _cosi(a, b):
        return (
            f"CAST(round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))) * 1000000) AS BIGINT)"
        )

    ctes = [
        f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      pairs AS (
        SELECT q.qid, e.vec_id, e.v, {_cosi('q.qv', 'e.v')} AS rel_i
        FROM q CROSS JOIN e WHERE e.vec_id != q.qid),
      cand AS (SELECT qid, vec_id, v, rel_i FROM pairs
               QUALIFY row_number() OVER (PARTITION BY qid
                                          ORDER BY rel_i DESC, vec_id) <= {KC}),
      sims AS (SELECT a.qid, a.vec_id AS a_id, b.vec_id AS b_id,
                      {_cosi('a.v', 'b.v')} AS sim_i
               FROM cand a JOIN cand b ON a.qid = b.qid),
      s1 AS (SELECT qid, vec_id, 7 * rel_i AS util FROM cand
             QUALIFY row_number() OVER (PARTITION BY qid
                                        ORDER BY 7 * rel_i DESC, vec_id) = 1),
      sel1 AS (SELECT qid, vec_id FROM s1)"""
    ]
    for i in range(2, KS + 1):
        p = i - 1
        ctes.append(
            f"""u{i} AS (
        SELECT c.qid, c.vec_id, 7 * c.rel_i - 3 * max(s.sim_i) AS util
        FROM cand c
        JOIN sims s ON s.qid = c.qid AND s.a_id = c.vec_id
        JOIN sel{p} ON sel{p}.qid = s.qid AND sel{p}.vec_id = s.b_id
        WHERE NOT EXISTS (SELECT 1 FROM sel{p} x
                          WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
        GROUP BY 1, 2, c.rel_i),
      s{i} AS (SELECT qid, vec_id, util FROM u{i}
               QUALIFY row_number() OVER (PARTITION BY qid
                                          ORDER BY util DESC, vec_id) = 1),
      sel{i} AS (SELECT * FROM sel{p} UNION ALL SELECT qid, vec_id FROM s{i})"""
        )
    unions = "\n      UNION ALL ".join(
        f"SELECT qid, {i} AS step, vec_id AS id, util AS util_i FROM s{i}"
        for i in range(1, KS + 1)
    )
    sql = "WITH " + ",\n      ".join(ctes) + f"\n      {unions}"
    return fn, sql


def q_pruned_index_topk() -> Entry:
    """Static index pruning (index/prune.py; Carmel et al. 2001 top-N
    variant): every posting list keeps only its 8 highest-impact entries
    (rounded impact desc, doc_id asc), full-corpus statistics retained,
    then BM25 top-10 over the pruned index — surviving postings score
    bit-identically to the unpruned index; the twin prunes with the same
    window rule in SQL."""
    KEEP = 8

    def fn(spark, sf_dir):
        from dpr_spark.index.build import build_index_from_docs
        from dpr_spark.index.prune import prune_postings
        from dpr_spark.query.scorer import search

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        idx = build_index_from_docs(spark, docs, build_blocks=False)
        pidx = prune_postings(idx, keep_n=KEEP)
        qdf = spark.createDataFrame(BENCH_QUERIES, "qid int, question string")
        res = search(qdf, pidx, k=10).select(
            "qid", "doc_id", F.round("score", 6).alias("score_r")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return res.withColumn("rank", F.row_number().over(w)).select(
            "qid", "rank", "doc_id", "score_r"
        )

    comp = (
        f"ln((stats.n - dict.df + 0.5) / (dict.df + 0.5) + 1.0)"
        f" * tf.tf * {BM25_K1 + 1.0}"
        f" / (tf.tf + {BM25_K1}"
        f" * (1.0 - {BM25_B} + {BM25_B} * ds.doclen / stats.avgdl))"
    )
    sql = (
        "WITH "
        + _BM25_CTES.replace("{QTERMS}", _qterm_values_sql())
        + f""",
      imp AS (
        SELECT tf.doc_id, tf.term, {comp} AS comp, round({comp}, 6) AS imp_r
        FROM tf JOIN dict USING (term)
             JOIN ds ON ds.doc_id = tf.doc_id CROSS JOIN stats),
      kept AS (
        SELECT doc_id, term, comp FROM (
          SELECT *, row_number() OVER (PARTITION BY term
                                       ORDER BY imp_r DESC, doc_id) AS rn
          FROM imp) WHERE rn <= {KEEP}),
      pscored AS (
        SELECT qt.qid, kept.doc_id, sum(kept.comp) AS score
        FROM qt JOIN kept USING (term) GROUP BY 1, 2),
      pranked AS (
        SELECT qid, doc_id, round(score, 6) AS score_r,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM pscored)
      SELECT qid, rank, doc_id, score_r FROM pranked WHERE rank <= 10"""
    )
    return fn, sql


def q_semdedup() -> Entry:
    """SemDeDup (extras/dedup.py::semdedup; Abbas et al. 2023): semantic
    near-dedup by embedding — coarse-cluster the corpus (nlist=8 sampled
    centroids, the SQL-replayable quantizer the IVF entries use), then
    drop any vector whose rounded cosine to a smaller-id cluster-mate is
    >= 0.95. The corpus is augmented with scaled clones (vec_id + 10^6,
    vector × 2) of every 10th vector — cosine-identical, so they MUST
    drop with dup_of = the original; organic near-dups drop too. The
    quadratic term stays inside clusters (the paper's scaling point)."""
    NLIST, TAU, STRIDE, OFF = 8, 0.95, 10, 1_000_000

    def fn(spark, sf_dir):
        from dpr_spark.extras.ann import sampled_centroids
        from dpr_spark.extras.dedup import semdedup

        e0 = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        clones = e0.filter(F.col("vec_id") % STRIDE == 0).select(
            (F.col("vec_id") + OFF).alias("vec_id"),
            F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        )
        cent = sampled_centroids(e0, nlist=NLIST)
        res = semdedup(e0.unionByName(clones), cent, tau=TAU)
        return res.select(
            F.col("id").alias("vec_id"), "cluster", "keep", "dup_of"
        )

    def _cos(a, b):
        return (
            f"round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))), 6)"
        )

    sql = f"""
    WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (SELECT * FROM e0
          UNION ALL
          SELECT vec_id + {OFF}, list_transform(v, x -> x * 2.0)
          FROM e0 WHERE vec_id % {STRIDE} = 0),
    m AS (SELECT greatest((max(vec_id) + 1) // {NLIST}, 1) AS md FROM e0),
    c AS (SELECT (e0.vec_id // m.md)::INT AS cid, e0.v AS cv
          FROM e0, m WHERE e0.vec_id % m.md = 0 AND e0.vec_id // m.md < {NLIST}),
    assigned AS (SELECT vec_id, v, cid AS cluster FROM (
        SELECT e.vec_id, e.v, c.cid, {_cos('e.v', 'c.cv')} AS cs,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos('e.v', 'c.cv')} DESC, c.cid) AS rn
        FROM e CROSS JOIN c) WHERE rn = 1),
    dups AS (
      SELECT b.vec_id AS yid, min(a.vec_id) AS dup_of
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {_cos('a.v', 'b.v')} >= {TAU}
      GROUP BY 1)
    SELECT a.vec_id, a.cluster, d.dup_of IS NULL AS keep,
           coalesce(d.dup_of, -1) AS dup_of
    FROM assigned a LEFT JOIN dups d ON d.yid = a.vec_id"""
    return fn, sql


def all_entries() -> Dict[str, Entry]:
    return {
        "docstats": q_docstats(),
        "dictionary": q_dictionary(),
        "tf_term_doc": q_tf_term_doc(),
        "corpus_stats": q_corpus_stats(),
        "bm25_topk": q_bm25_topk(),
        "bm25_topk_wand": q_bm25_topk_wand(),
        "bm25_topk_blockmax": q_bm25_topk_blockmax(),
        "topk_join_text": q_topk_join_text(),
        "accuracy_at_k": q_accuracy_at_k(),
        "union_dedup": q_union_dedup(),
        "id_prefix_slice": q_id_prefix_slice(),
        "normalize_em": q_normalize_em(),
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs(),
        "embedding_topk_cosine": q_embedding_topk_cosine(),
        "langid_quality": q_langid_quality(),
        "doc_fingerprint": q_doc_fingerprint(),
        "minhash_lsh": q_minhash_lsh(),
        "simhash_dedup": q_simhash_dedup(),
        "ann_lsh_topk": q_ann_lsh_topk(),
        "token_counts": q_token_counts(),
        "bpe_pair_counts": q_bpe_pair_counts(),
        "chunk_100w": q_chunk_100w(),
        "deterministic_shuffle": q_deterministic_shuffle(),
        "has_answer_kilt": q_has_answer_kilt(),
        "best_spans": q_best_spans(),
        "em_by_topk": q_em_by_topk(),
        "chunked_accuracy": q_chunked_accuracy(),
        "gold_passage_join": q_gold_passage_join(),
        "positive_ctx_filter": q_positive_ctx_filter(),
        "ngrams_view": q_ngrams_view(),
        "simhash_neardup": q_simhash_neardup(),
        "table_chunks": q_table_chunks(),
        "average_rank": q_average_rank(),
        "kilt_format": q_kilt_format(),
        "reader_samples": q_reader_samples(),
        "sharded_epoch": q_sharded_epoch(),
        "weighted_interleave": q_weighted_interleave(),
        "results_nested": q_results_nested(),
        "range_slice_events": q_range_slice_events(),
        "latest_events": q_latest_events(),
        "cap_per_source": q_cap_per_source(),
        "domain_stats": q_domain_stats(),
        "phrase_topk": q_phrase_topk(),
        "bool_topk": q_bool_topk(),
        "prefix_topk": q_prefix_topk(),
        "term_range_topk": q_term_range_topk(),
        "fuzzy_topk": q_fuzzy_topk(),
        "fuzzy_transpose_topk": q_fuzzy_transpose_topk(),
        "highlight_topk": q_highlight_topk(),
        "mlt_topk": q_mlt_topk(),
        "mlt_unlike_topk": q_mlt_unlike_topk(),
        "spell_suggest_popular": q_spell_suggest_popular(),
        "fix_mojibake": q_fix_mojibake(),
        "routed_shrink_topk": q_routed_shrink_topk(),
        "highlight_multi_topk": q_highlight_multi_topk(),
        "charset_sniff": q_charset_sniff(),
        "robots_allowed": q_robots_allowed(),
        "taxonomy_facets": q_taxonomy_facets(),
        "rm3_topk": q_rm3_topk(),
        "span_near_topk": q_span_near_topk(),
        "span_first_topk": q_span_first_topk(),
        "span_or_topk": q_span_or_topk(),
        "span_not_topk": q_span_not_topk(),
        "match_phrase_prefix": q_match_phrase_prefix(),
        "match_bool_prefix": q_match_bool_prefix(),
        "facet_counts": q_facet_counts(),
        "drill_sideways_facets": q_drill_sideways_facets(),
        "wildcard_topk": q_wildcard_topk(),
        "spell_suggest": q_spell_suggest(),
        "bm25f_topk": q_bm25f_topk(),
        "routed_topk": q_routed_topk(),
        "routed_dfs_topk": q_routed_dfs_topk(),
        "nested_topk": q_nested_topk(),
        "children_agg": q_children_agg(),
        "reverse_nested_agg": q_reverse_nested_agg(),
        "categorize_text_agg": q_categorize_text_agg(),
        "phrase_highlight_topk": q_phrase_highlight_topk(),
        "mmr_rerank_topk": q_mmr_rerank_topk(),
        "pruned_index_topk": q_pruned_index_topk(),
        "semdedup": q_semdedup(),
        "span_ordered_topk": q_span_ordered_topk(),
        "span_gap_topk": q_span_gap_topk(),
        "search_after_page2": q_search_after_page2(),
        "sliced_scroll": q_sliced_scroll(),
        "sort_by_field_topk": q_sort_by_field_topk(),
        "merged_index_topk": q_merged_index_topk(),
        "explain_topk": q_explain_topk(),
        "synonym_topk": q_synonym_topk(),
        "bool_msm_range": q_bool_msm_range(),
        "multi_segment_topk": q_multi_segment_topk(),
        "collapse_topk": q_collapse_topk(),
        "delete_live_topk": q_delete_live_topk(),
        "delete_purge_topk": q_delete_purge_topk(),
        "rescore_topk": q_rescore_topk(),
        "tfidf_topk": q_tfidf_topk(),
        "lmdirichlet_topk": q_lmdirichlet_topk(),
        "dismax_topk": q_dismax_topk(),
        "analyzed_topk": q_analyzed_topk(),
        "func_score_topk": q_func_score_topk(),
        "terms_agg_matches": q_terms_agg_matches(),
        "stats_agg_matches": q_stats_agg_matches(),
        "filters_agg": q_filters_agg(),
        "adjacency_matrix": q_adjacency_matrix(),
        "rare_terms_agg": q_rare_terms_agg(),
        "multi_terms_agg": q_multi_terms_agg(),
        "global_agg": q_global_agg(),
        "rank_eval": q_rank_eval(),
        "percolate_matches": q_percolate_matches(),
        "percolate_phrase_matches": q_percolate_phrase_matches(),
        "regexp_topk": q_regexp_topk(),
        "suggest_topn": q_suggest_topn(),
        "suggest_fuzzy_topn": q_suggest_fuzzy_topn(),
        "sorted_layout_topk": q_sorted_layout_topk(),
        "has_child_topk": q_has_child_topk(),
        "bool_tree_topk": q_bool_tree_topk(),
        "dedup_clusters": q_dedup_clusters(),
        "significant_terms": q_significant_terms(),
        "histogram_agg": q_histogram_agg(),
        "date_histogram_agg": q_date_histogram_agg(),
        "percentiles_agg": q_percentiles_agg(),
        "pipeline_aggs": q_pipeline_aggs(),
        "sibling_pipeline_aggs": q_sibling_pipeline_aggs(),
        "diversified_sampler": q_diversified_sampler(),
        "terms_set_topk": q_terms_set_topk(),
        "geo_distance_topk": q_geo_distance_topk(),
        "geo_distance_rings": q_geo_distance_rings(),
        "geotile_grid_agg": q_geotile_grid_agg(),
        "distance_feature_topk": q_distance_feature_topk(),
        "auto_date_histogram": q_auto_date_histogram(),
        "cardinality_agg": q_cardinality_agg(),
        "top_hits_agg": q_top_hits_agg(),
        "multi_match_best_fields": q_multi_match_best_fields(),
        "multi_match_cross_fields": q_multi_match_cross_fields(),
        "term_vectors": q_term_vectors(),
        "term_vectors_artificial": q_term_vectors_artificial(),
        "boosting_topk": q_boosting_topk(),
        "phrase_suggest": q_phrase_suggest(),
        "hybrid_rrf_topk": q_hybrid_rrf_topk(),
        "hybrid_linear_topk": q_hybrid_linear_topk(),
        "index_stats": q_index_stats(),
        "combined_fields_topk": q_combined_fields_topk(),
        "pinned_topk": q_pinned_topk(),
        "synonym_graph_topk": q_synonym_graph_topk(),
        "phrase_title_topk": q_phrase_title_topk(),
        "lm_perplexity": q_lm_perplexity(),
        "suggest_in_context": q_suggest_in_context(),
        "ltr_features": q_ltr_features(),
        "span_within_topk": q_span_within_topk(),
        "span_containing_topk": q_span_containing_topk(),
        "range_agg": q_range_agg(),
        "composite_agg": q_composite_agg(),
        "ann_filtered_topk": q_ann_filtered_topk(),
        "ann_ivf_topk": q_ann_ivf_topk(),
        "ann_ivfpq_topk": q_ann_ivfpq_topk(),
        "matched_queries_topk": q_matched_queries_topk(),
        "query_string_topk": q_query_string_topk(),
        "query_string_and_topk": q_query_string_and_topk(),
        "has_parent_topk": q_has_parent_topk(),
        "inner_hits": q_inner_hits(),
        "metric_aggs_misc": q_metric_aggs_misc(),
        "phrase_topk_shingled": q_phrase_topk_shingled(),
        "pagerank_topk": q_pagerank_topk(),
        "anchor_bm25f_topk": q_anchor_bm25f_topk(),
        "rank_feature_topk": q_rank_feature_topk(),
        "hits_topk": q_hits_topk(),
        "link_graph_stats": q_link_graph_stats(),
        "repetition_stats": q_repetition_stats(),
        "gopher_rules": q_gopher_rules(),
        "c4_clean": q_c4_clean(),
        "decontaminate_ngrams": q_decontaminate_ngrams(),
        "pii_redact": q_pii_redact(),
        "url_canonical_latest": q_url_canonical_latest(),
        "boilerplate_strip": q_boilerplate_strip(),
        "pipeline_e2e": q_pipeline_e2e(),
        "dup_span_strip": q_dup_span_strip(),
        "dup_spans_exact": q_dup_spans_exact(),
        "exact_substr_dedup": q_exact_substr_dedup(),
        "variable_width_histogram": q_variable_width_histogram(),
        "cumulative_cardinality": q_cumulative_cardinality(),
        "change_point": q_change_point(),
        "geo_line": q_geo_line(),
        "alpha_mix_targets": q_alpha_mix_targets(),
        "alpha_mix_sample": q_alpha_mix_sample(),
        "extended_stats": q_extended_stats(),
        "dist_aggs": q_dist_aggs(),
        "matrix_stats": q_matrix_stats(),
        "t_test_paired": q_t_test_paired(),
        "lmjm_topk": q_lmjm_topk(),
        "dfi_topk": q_dfi_topk(),
        "span_multi_topk": q_span_multi_topk(),
        "scripted_metric": q_scripted_metric(),
        "runtime_field_agg": q_runtime_field_agg(),
        "geo_bounding_box": q_geo_bounding_box(),
        "geo_bounds_centroid": q_geo_bounds_centroid(),
        "alias_rollover_topk": q_alias_rollover_topk(),
        "significant_terms_bg": q_significant_terms_bg(),
        "date_range_agg": q_date_range_agg(),
        "indices_boost_topk": q_indices_boost_topk(),
        "common_terms_topk": q_common_terms_topk(),
        "rollup_events_agg": q_rollup_events_agg(),
        "transform_pivot": q_transform_pivot(),
        "eql_sequence": q_eql_sequence(),
        "serial_diff_pct_bucket": q_serial_diff_pct_bucket(),
        "frequent_pairs": q_frequent_pairs(),
        "stratified_sample": q_stratified_sample(),
        "pack_sequences": q_pack_sequences(),
        "sparse_vector_topk": q_sparse_vector_topk(),
        "sessionize_events": q_sessionize_events(),
        "multivector_maxsim": q_multivector_maxsim(),
        "string_stats": q_string_stats(),
        "random_sampler_agg": q_random_sampler_agg(),
        "intervals_topk": q_intervals_topk(),
        "significant_text": q_significant_text(),
        "rate_agg": q_rate_agg(),
        "moving_percentiles": q_moving_percentiles(),
        "ip_range_agg": q_ip_range_agg(),
        "filter_context_topk": q_filter_context_topk(),
        "geohash_grid_agg": q_geohash_grid_agg(),
        "dsir_resample": q_dsir_resample(),
        "quality_clf_scores": q_quality_clf(),
    }
