"""Physical-plan shape assertions: the properties that make the engine
viable at 100 TB must be visible in EXPLAIN output, not just intended —
filter pushdown to the parquet scan, column pruning, broadcast joins on
small sides, pinned partition counts."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _explain(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def stored_blocks(spark, index, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blk") / "block_segments")
    from dpr_spark.query.blockmax import build_block_segments

    blocks, norms = build_block_segments(index, num_buckets=4)
    blocks.write.mode("overwrite").parquet(path)
    return path


def test_blocks_scan_pushes_term_filter(spark, stored_blocks):
    """The query path reads ONLY query-term blocks from storage: the
    term_id IN (...) filter must reach the parquet scan as a pushed
    filter, and the binary payload columns must not defeat pruning."""
    df = spark.read.parquet(stored_blocks).filter(F.col("term_id").isin([1, 2, 3]))
    plan = _explain(df)
    assert "PushedFilters" in plan
    assert "In(term_id" in plan.replace(" ", "")


def test_docs_scan_prunes_columns(spark, tmp_path):
    """prepare_docs without verify_extract must never read `html` (the
    widest column) — ReadSchema shows only what the build needs."""
    from dpr_spark.fixtures.corpus import gen_pages_pdf

    path = str(tmp_path / "pages.parquet")
    pdf = gen_pages_pdf(50, seed=9)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)

    from dpr_spark.index.build import prepare_docs

    docs = prepare_docs(pages)
    plan = _explain(docs)
    # the parquet scan schema must exclude html and warc_ts
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert all("html" not in ln for ln in read), read
    assert all("warc_ts" not in ln for ln in read), read


def test_scorer_uses_broadcast_joins(spark, index, queries_df):
    """J6: the dictionary and the query-term set are broadcast; postings
    are probed in place (no exchange repartitioning the postings table by
    term)."""
    from dpr_spark.query.scorer import score_exact

    plan = _explain(score_exact(queries_df, index))
    assert "BroadcastHashJoin" in plan
    # the big side must not be shuffled on the join key: no
    # hashpartitioning(term_id) exchange in the plan
    assert "hashpartitioning(term_id" not in plan


def test_build_partition_counts_pinned(spark, pages_df):
    """The tokenize layout is 3 tasks/core and the encode shuffle 2
    tasks/core, pinned explicitly so AQE cannot coalesce the expensive
    stages onto few cores."""
    from dpr_spark.plans.ids import ranged_parts

    par = spark.sparkContext.defaultParallelism
    cleanup = []
    parts, bc, total = ranged_parts(
        pages_df.select("url", "text"), "url", 3 * par, cleanup
    )
    assert parts.rdd.getNumPartitions() == 3 * par
    assert total == pages_df.count()
    for c in cleanup:
        c.unpersist(True)


def test_impact_segments_partitioned_by_bucket(spark, index):
    from dpr_spark.query.wand import build_impact_segments

    seg = build_impact_segments(index, num_buckets=8)
    plan = _explain(seg)
    assert "hashpartitioning(bucket" in plan


@pytest.fixture(scope="module")
def serving_layout(spark, index, tmp_path_factory):
    """Bucketed+sorted at-rest layout (small parquet row groups so the
    pruning claim is testable at fixture scale)."""
    path = str(tmp_path_factory.mktemp("serve"))
    from dpr_spark.query.blockmax import build_block_segments, save_serving_layout

    blocks, norms = build_block_segments(index, num_buckets=4)
    save_serving_layout(
        spark, blocks, norms, path, 4,
        write_options={"parquet.block.size": str(16 * 1024)},
    )
    return path


def test_serving_layout_no_bucket_exchange(spark, index, queries_df, serving_layout):
    """From-storage query: both bucketed scans feed the cogroup directly —
    the ONLY exchange in the plan is the final tiny result-row window on
    qid; blocks and norms are never reshuffled on bucket. Results stay
    bit-identical to the exact scorer. Registration survives a fresh
    session (tables dropped + re-registered from serving_meta.json)."""
    from dpr_spark.query.blockmax import _layout_tables, load_serving_layout, search_blocks
    from dpr_spark.query.scorer import search

    # simulate a fresh session: drop the catalog entries (external tables
    # keep their files), forcing load to re-register from the metadata
    for t in _layout_tables(serving_layout):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    blocks, norms = load_serving_layout(spark, serving_layout)
    res = search_blocks(spark, queries_df, index, blocks, norms, k=10)
    plan = _explain(res)
    assert "hashpartitioning(bucket" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan

    exact = sorted(
        (r.qid, r.rank, r.doc_id, r.score) for r in search(queries_df, index, k=10).collect()
    )
    got = sorted((r.qid, r.rank, r.doc_id, r.score) for r in res.collect())
    assert got == exact


def test_serving_layout_rowgroup_pruning_skips(spark, index, queries_df, serving_layout):
    """The term_id sort inside bucket files must make row-group pruning
    REAL: for an actual query's term set, most row groups' [min,max]
    term_id ranges exclude every query term — the same statistics parquet
    readers (Spark included) use to skip row groups, asserted on the
    storage artifact rather than plan text."""
    import glob

    import pyarrow.parquet as pq

    from dpr_spark.query.blockmax import _driver_query_terms_idf

    qterms = _driver_query_terms_idf(spark, queries_df.limit(5), index)
    tids = sorted({int(t) for _, ts, _ in qterms for t in ts})
    assert tids

    total = matched = 0
    for f in glob.glob(serving_layout + "/block_segments/part-*"):
        md = pq.ParquetFile(f).metadata
        names = [md.row_group(0).column(i).path_in_schema
                 for i in range(md.row_group(0).num_columns)]
        ti = names.index("term_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ti).statistics
            total += 1
            if any(st.min <= t <= st.max for t in tids):
                matched += 1
    assert total >= 8, f"too few row groups ({total}) to evidence pruning"
    assert matched < total, (matched, total)
    # the point of the sort: most row groups are skippable for a real query
    assert matched <= total * 0.7, (matched, total)


def test_phrase_index_plan_broadcasts_query_side(spark, index, tmp_path):
    """Phrase search probes the positions table in place: the (qid, off,
    term_id) side is broadcast, positions are never hash-exchanged on
    term_id, and a stored positions scan gets the term_id filter pushed."""
    from dpr_spark.query.phrase import build_positions, phrase_search_index

    pos = build_positions(
        index.docstats.select("doc_id", F.lit("word one word").alias("text")),
        index.dictionary,
    )
    plan = _explain(phrase_search_index(spark, index, pos, [(0, "word one")], k=5))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(term_id" not in plan


def test_fuzzy_expansion_stays_on_dictionary_scan(spark, index):
    """Fuzzy expansion is ONE vocab-sized pass: the clause side is
    broadcast into a nested-loop join over the dictionary (levenshtein
    is a theta predicate), and postings join the expansion by broadcast."""
    from dpr_spark.query.fuzzy import fuzzy_search

    plan = _explain(fuzzy_search(spark, [(0, "word")], index, k=5))
    assert "BroadcastNestedLoopJoin" in plan
    assert "levenshtein" in plan
    assert "hashpartitioning(term_id" not in plan


def test_fuzzy_length_band_prunes_dictionary(spark, index):
    """prefix_len=0 fuzzy (no literal prefix to push) still prunes: the
    dictionary scan filters length(term) to the clause set's global
    ±max_edits band BEFORE the broadcast nested-loop join, and the join
    tests the cheap per-pair length band before levenshtein."""
    from dpr_spark.query.fuzzy import fuzzy_search

    plan = _explain(fuzzy_search(spark, [(0, "word")], index, k=5))
    assert "BroadcastNestedLoopJoin" in plan
    # scan-side band: length(term) >= 3 AND <= 5 for a 4-char clause
    assert "length(term" in plan
    # per-pair band precedes levenshtein in the conjunction
    assert "abs((length(term" in plan.replace("#", "").split("levenshtein")[0]


def test_bool_exclusion_is_broadcast_anti_join(spark, index):
    """must_not exclusion: a left_anti join against only the exclusion
    terms' postings, broadcast (candidates x exclusions are both tiny
    relative to the corpus); postings never exchange on term_id."""
    from dpr_spark.query.boolquery import bool_search

    plan = _explain(bool_search(spark, [(0, ["word"], [], ["one"])], index, k=5))
    assert "LeftAnti" in plan
    assert "hashpartitioning(term_id" not in plan


def test_wildcard_expansion_stays_on_dictionary_scan(spark, index):
    from dpr_spark.query.boolquery import wildcard_search

    plan = _explain(wildcard_search(spark, [(0, "wo*")], index, k=5))
    assert "BroadcastNestedLoopJoin" in plan
    assert "hashpartitioning(term_id" not in plan


@pytest.fixture(scope="module")
def stored_index(spark, index, tmp_path_factory):
    """The session index saved + reloaded so its dictionary is a parquet
    scan (pushed filters only exist on file scans)."""
    from dpr_spark.index.build import InvertedIndex

    path = str(tmp_path_factory.mktemp("idx") / "stored")
    index.save(path)
    return InvertedIndex.load(spark, path)


def test_fuzzy_prefix_pushes_to_dictionary_scan(spark, stored_index):
    """r4 What's-wrong #1: with prefix_len > 0 the clause prefixes reach
    the parquet dictionary scan as StringStartsWith — the FST-seek
    analog — instead of a full-vocab levenshtein nested loop."""
    from dpr_spark.query.fuzzy import fuzzy_search

    plan = _explain(
        fuzzy_search(spark, [(0, "word")], stored_index, k=5, prefix_len=2)
    )
    assert "StringStartsWith(term,wo)" in plan, plan


def test_wildcard_leading_literal_pushes_to_dictionary_scan(spark, stored_index):
    """A leading-literal glob (`wo*`) prunes the dictionary scan with a
    pushed StringStartsWith before the RLIKE nested loop."""
    from dpr_spark.query.boolquery import wildcard_search

    plan = _explain(wildcard_search(spark, [(0, "wo*")], stored_index, k=5))
    assert "StringStartsWith(term,wo)" in plan, plan


def test_wildcard_trailing_literal_pushes_via_rterm(spark, stored_index):
    """A trailing-literal glob (`*rd`) prunes via the reversed-term
    dictionary column: StringStartsWith(rterm, 'dr') is pushable where a
    filter on reverse(term) computed at query time is not."""
    from dpr_spark.query.boolquery import wildcard_search

    assert "rterm" in stored_index.dictionary.columns
    plan = _explain(wildcard_search(spark, [(0, "*rd")], stored_index, k=5))
    assert "StringStartsWith(rterm,dr)" in plan, plan


def test_glob_literal_runs():
    from dpr_spark.query.boolquery import glob_literal_runs

    assert glob_literal_runs("wo*") == ("wo", "")
    assert glob_literal_runs("*ing") == ("", "ing")
    assert glob_literal_runs("w?rd") == ("w", "rd")
    assert glob_literal_runs("*") == ("", "")
    assert glob_literal_runs("word") == ("word", "word")
    assert glob_literal_runs("A*Z") == ("a", "z")


def test_mlt_tokenizes_only_seed_docs(spark, index, pages_df, tmp_path):
    """MoreLikeThis reads term vectors from stored text: the seed-id
    side is broadcast into the docs scan (no full-corpus tokenize
    shuffle), and postings are probed in place."""
    from dpr_spark.fixtures.corpus import assign_doc_ids, gen_pages_pdf
    from dpr_spark.query.morelikethis import more_like_this

    pw = assign_doc_ids(gen_pages_pdf(50, seed=3))
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    seeds = spark.createDataFrame([(0, 1)], "qid int, doc_id long")
    plan = _explain(more_like_this(spark, seeds, docs, index, k=5))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(term_id" not in plan
    # the seed-doc text join keys on doc_id with the tiny side broadcast
    assert "BroadcastExchange" in plan


def test_rm3_postings_probed_in_place(spark, index, pages_df):
    from dpr_spark.fixtures.corpus import assign_doc_ids, gen_pages_pdf
    from dpr_spark.query.rm3 import rm3_search

    pw = assign_doc_ids(gen_pages_pdf(50, seed=3))
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    qdf = spark.createDataFrame([(0, "word one")], ["qid", "question"])
    plan = _explain(rm3_search(spark, qdf, index, docs, k=5))
    assert "hashpartitioning(term_id" not in plan
    assert "BroadcastHashJoin" in plan


def test_aggs_match_set_probes_postings_in_place(spark, index, queries_df):
    """Match-set aggregations (query/aggs.py): the postings table is
    probed with the broadcast query-term set — no exchange on term_id —
    and the doc-values join does not broadcast the postings side."""
    from dpr_spark.query.aggs import stats_agg

    plan = _explain(stats_agg(queries_df, index, index.docstats, "doclen"))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(term_id" not in plan


def test_multimatch_broadcasts_query_side_only(spark, fielded_index_plans, queries_df):
    """multi_match (query/multimatch.py): the resolved query-term set
    broadcasts into the fielded postings probe; the dictionary/postings
    never appear as the broadcast side."""
    from dpr_spark.query.multimatch import multi_match_cross_fields

    plan = _explain(multi_match_cross_fields(queries_df, fielded_index_plans, k=5))
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(term_id" not in plan


@pytest.fixture(scope="module")
def fielded_index_plans(spark, pages_df):
    from dpr_spark.index.fielded import build_fielded_index

    docs = pages_df.selectExpr(
        "xxhash64(url) AS doc_id", "url", "text", "substr(text, 1, 30) AS title"
    )
    return build_fielded_index(
        spark, docs, fields=("text", "title"),
        weights={"text": 1.0, "title": 2.0},
    )


def test_hybrid_fusion_no_corpus_shuffle(spark, index, queries_df):
    """RRF fusion (query/hybrid.py) aggregates query×depth-sized
    rankings: the fused plan must contain no exchange keyed on term_id
    (the corpus-sized tables never re-shuffle for fusion)."""
    from dpr_spark.query.hybrid import hybrid_search_rrf

    emb = index.docstats.select(
        "doc_id",
        F.array(*[(F.col("doc_id") % (i + 3)).cast("double") for i in range(4)]).alias("v"),
    ).withColumnRenamed("doc_id", "vec_id").withColumnRenamed("v", "embedding")
    qvecs = spark.createDataFrame(
        [(0, [1.0, 2.0, 1.0, 0.5])], "qid long, qv array<double>"
    )
    plan = _explain(
        hybrid_search_rrf(queries_df.limit(1), index, emb, qvecs, k=5, depth=20)
    )
    assert "hashpartitioning(term_id" not in plan
    assert "BroadcastHashJoin" in plan


def test_phrase_suggest_lm_never_broadcasts(spark, index, pages_df):
    """Phrase suggester (query/phrasesuggest.py): the bigram/unigram LM
    tables are the big side — every LM join must broadcast the
    query-sized candidate/pair set, never the LM; the dictionary scan
    carries the pushed StartsWith prefix filter."""
    from dpr_spark.query.phrasesuggest import build_bigram_lm, suggest_phrases

    lm = build_bigram_lm(pages_df.selectExpr("text"))
    # materialize the cached LM first: its BUILD aggregation legitimately
    # shuffles on (w1, w2); the QUERY plan must not
    lm.bigrams.count()
    lm.unigrams.count()
    df = suggest_phrases(
        spark, [(0, "the spark windw")], index, lm, max_edits=1, topn=3
    )
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan
    # every LM lookup joins with the query-sized side broadcast — a
    # SortMergeJoin would mean the LM got shuffled against candidates
    # (the remaining (w1,w2) exchanges are the cached LM build and the
    # tiny candidate-distinct, both query- or build-side, not the join)
    assert "SortMergeJoin" not in plan
    assert "StartsWith" in plan


def test_term_range_envelope_pushes_to_dictionary_scan(spark, stored_index):
    """term_range_search's (min lo, max hi) envelope reaches the parquet
    dictionary scan as pushed >=/<= range filters — the FST range-seek
    analog (W88); the broadcast join condition then exacts per clause."""
    from dpr_spark.query.boolquery import term_range_search

    plan = _explain(
        term_range_search(spark, [(0, "ka", "wz")], stored_index, k=5)
    )
    assert "GreaterThanOrEqual(term,ka)" in plan, plan
    assert "LessThanOrEqual(term,wz)" in plan, plan


def test_prefix_search_pushes_literals_to_dictionary_scan(spark, stored_index):
    """expand_prefix's literal superset filter: the prefix reaches the
    parquet dictionary scan as StringStartsWith — no full-vocab
    nested loop for prefix queries."""
    from dpr_spark.query.boolquery import prefix_search

    plan = _explain(prefix_search(spark, [(0, "wo")], stored_index, k=5))
    assert "StringStartsWith(term,wo)" in plan, plan


def test_match_phrase_prefix_pushes_literal(spark, stored_index):
    from dpr_spark.query.phrase import (
        build_positions,
        match_phrase_prefix_search_index,
    )

    pos = build_positions(
        stored_index.docstats.select(
            "doc_id", F.lit("word one word").alias("text")
        ),
        stored_index.dictionary,
    )
    plan = _explain(
        match_phrase_prefix_search_index(
            spark, stored_index, pos, [(0, "word wo")], k=5
        )
    )
    assert "StringStartsWith(term,wo)" in plan, plan


def test_match_bool_prefix_pushes_literal(spark, stored_index):
    from dpr_spark.query.boolquery import match_bool_prefix_search

    plan = _explain(
        match_bool_prefix_search(spark, [(0, "word wo")], stored_index, k=5)
    )
    assert "StringStartsWith(term,wo)" in plan, plan


def test_suggest_pushes_literal(spark, stored_index):
    from dpr_spark.query.suggest import suggest_completions

    plan = _explain(suggest_completions(spark, [(0, "wo")], stored_index, n=5))
    assert "StringStartsWith(term,wo)" in plan, plan


def test_ivfpq_no_corpus_crossjoin_and_codegen_adc(spark):
    """IVF-PQ plan shape: candidates come from a broadcast equi-join on
    list_id (never a corpus cross join), and the ADC fold is Catalyst
    codegen over the codes array (no Python in the per-candidate path)."""
    import numpy as np

    from dpr_spark.extras.ann import (
        ivfpq_cosine_topk,
        sampled_centroids,
        sampled_pq_codebooks,
    )

    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((64, 16)).astype("float32")
    e = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, vecs[0].tolist())], "qid long, qv array<float>"
    )
    cent = sampled_centroids(e, nlist=4)
    books = sampled_pq_codebooks(e, m_sub=4, nbits=3)
    plan = _explain(ivfpq_cosine_topk(e, q, cent, books, k=5, nprobe=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "aggregate(" in plan  # the Catalyst ADC fold


def test_phrase_pushes_resolved_ids_into_stored_positions_scan(spark, tmp_path):
    """The dictionary-resolution collect feeds the positions scan an
    In(term_id, ...) filter: on the at-rest sorted layout that is
    row-group skipping — the .pos-seek analog (phrase._index_plumbing)."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import build_positions, phrase_search_index

    docs = spark.createDataFrame(
        [(i, "word one word two") for i in range(20)], "doc_id long, text string"
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False)
    pos = build_positions(docs, idx.dictionary)
    path = str(tmp_path / "pos")
    pos.write.parquet(path)
    stored = spark.read.parquet(path)
    df = phrase_search_index(spark, idx, stored, [(0, "word one")], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term_id" in plan
    assert df.count() > 0  # the filter prunes the scan, not the results


def test_shingled_pushes_resolved_gram_ids_into_stored_scan(spark, tmp_path):
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.shingled import (
        ShingleIndex,
        build_shingle_index,
        phrase_search_shingled,
    )

    docs = spark.createDataFrame(
        [(i, "word one word two") for i in range(20)], "doc_id long, text string"
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False)
    sidx = build_shingle_index(spark, docs)
    path = str(tmp_path / "gpos")
    sidx.positions.write.parquet(path)
    stored = ShingleIndex(
        n=2, grams=sidx.grams, positions=spark.read.parquet(path)
    )
    # a 3-token phrase resolves 2 grams -> a genuine In (a single id
    # folds to EqualTo, which also pushes)
    df = phrase_search_shingled(spark, idx, stored, [(0, "word one word")], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(gram_id" in plan
    assert df.count() > 0

def test_span_multi_plan_shapes(spark, index):
    """span_multi keeps the repo's probe discipline: the capped
    expansion set is broadcast and the positions side is probed in
    place (IN-pruned scan, never hash-exchanged on term_id); the glob's
    leading literal reaches the dictionary scan as a StartsWith."""
    from dpr_spark.query.phrase import build_positions, span_multi_search_index

    pos = build_positions(
        index.docstats.select("doc_id", F.lit("word one word").alias("text")),
        index.dictionary,
    )
    df = span_multi_search_index(
        spark, index, pos, [(0, ["wo*", "one"])], window=8, k=5
    )
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(term_id" not in plan
    # the IN-prune survived into the plan (Catalyst spells a large
    # literal list INSET, a small one IN)
    flat = plan.replace("#", " ")
    assert "INSET" in plan or " IN " in flat, plan[:2000]


def test_fuzzy_suggest_pushes_head_chars(spark, stored_index):
    """FuzzySuggester: the non-fuzzy head chars reach the dictionary
    scan as a pushed StringStartsWith disjunction (exact pruning — the
    contract fixes those chars), and short prefixes push their full
    literal."""
    from dpr_spark.query.suggest import suggest_completions_fuzzy

    plan = _explain(
        suggest_completions_fuzzy(
            spark, [(0, "word"), (1, "wo")], stored_index, n=5
        )
    )
    assert "StringStartsWith(term,w)" in plan, plan
    assert "StringStartsWith(term,wo)" in plan, plan


def test_robots_join_is_hash_keyed(spark):
    """robots_allowed: the urls×rules match is an equi-join on host
    with the LIKE as a residual — never a nested-loop over the cross
    product, so the rules side behaves like any dimension join at
    scale."""
    from dpr_spark.extras.robots import robots_allowed

    urls = spark.createDataFrame(
        [(0, "h1", "/a"), (1, "h2", "/b/c")], "uid long, host string, path string"
    )
    rules = spark.createDataFrame(
        [("h1", "*", "disallow", "/a*"), ("h2", "*", "allow", "/b/")],
        "host string, agent string, rule string, path string",
    )
    plan = _explain(robots_allowed(urls, rules, "bot"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
