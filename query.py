#!/usr/bin/env python
"""Query entry point (replaces dense_retriever.py, SURVEY.md §3.1).

    spark-submit --py-files dpr_spark.zip query.py \\
        --index /data/index --queries qa.tsv --k 100 \\
        --out /data/results [--engine segments|blockmax|exact] [--eval]

--queries accepts DPR QA TSV (question \\t python-literal answers) or a
parquet with (qid, question[, answers]). --eval adds has_answer +
accuracy@k (requires answers). Output: results parquet + nested
results.json (the reference's output format, dense_retriever.py:337-379).

--serve turns --queries into a DIRECTORY watched for query-batch files
(*.tsv / *.parquet): the index loads once and batches are answered until
a STOP file appears — the resident-retriever mode
(dense_retriever.py:183-298 DenseRPCRetriever analog); steady-state q/s
(excluding the warm-up batch) is reported and written to
out/serve_stats.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="index dir from build_index.py --out, OR a snapshot "
                         "catalog dir (contains snapshots.json)")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="time travel: load the index VERSION AS OF this snapshot")
    ap.add_argument("--as-of-ms", type=int, default=None,
                    help="time travel: load the index TIMESTAMP AS OF this epoch-ms")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--engine", choices=["exact", "segments", "blockmax", "phrase",
                                         "phrase_prefix"],
                    default="segments",
                    help="'phrase' treats each question as an exact phrase; "
                         "'phrase_prefix' additionally expands the LAST token "
                         "as a prefix (ES match_phrase_prefix / "
                         "search-as-you-type; both need an index built with "
                         "--positional)")
    ap.add_argument("--max-expansions", type=int, default=16,
                    help="dictionary terms the phrase_prefix last token "
                         "expands to (term order, Lucene TermEnum contract)")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--similarity",
                    choices=["bm25", "classic", "lmdirichlet",
                             "lmjelinekmercer", "dfi"],
                    default="bm25",
                    help="scoring formula (--engine exact only): Lucene "
                         "ClassicSimilarity / LMDirichletSimilarity / "
                         "LMJelinekMercerSimilarity / DFISimilarity analogs")
    ap.add_argument("--common-terms", type=float, default=None,
                    metavar="CUTOFF",
                    help="CommonTermsQuery: terms with df > CUTOFF*N are "
                         "scoring-only (candidates come from the rare "
                         "terms' short posting lists)")
    ap.add_argument("--intervals", action="store_true",
                    help="intervals mode: each question is an intervals "
                         "Match rule (minimal-interval semantics, needs a "
                         "positional index); rank = interval count")
    ap.add_argument("--intervals-ordered", action="store_true",
                    help="--intervals: require terms in order")
    ap.add_argument("--max-gaps", type=int, default=None,
                    help="--intervals: max internal gaps per interval")
    ap.add_argument("--regexp", action="store_true",
                    help="treat each question as an anchored regex over the "
                         "term dictionary (RegexpQuery rewrite; --engine "
                         "exact/segments result schema)")
    ap.add_argument("--term-range", action="store_true",
                    help="treat each question as a lexicographic term range "
                         "'LO..HI' over the dictionary (TermRangeQuery "
                         "rewrite; omit a side for an open bound, [ / ( "
                         "prefix and ] / ) suffix toggle inclusivity, "
                         "e.g. '[query..spark)' or 'table..')")
    ap.add_argument("--default-operator", choices=["or", "and"], default="or",
                    help="ES default_operator for --query-string: bare "
                         "(unprefixed) clauses are SHOULD under 'or', "
                         "MUST under 'and'")
    ap.add_argument("--query-string", action="store_true",
                    help='parse questions as the +must -not "phrase" glob* '
                         "fuzzy~N query-string language "
                         "(query/querystring.py; phrases need a "
                         "positional index)")
    ap.add_argument("--phrase-suggest", type=int, default=None, metavar="N",
                    help="top-N whole-query did-you-mean suggestions from "
                         "the bigram LM over --pages "
                         "(query/phrasesuggest.py)")
    ap.add_argument("--suggest", type=int, default=None, metavar="N",
                    help="autocomplete mode: treat each question as a prefix; "
                         "emit the top-N df-weighted vocabulary completions")
    ap.add_argument("--boost", default=None, metavar="FIELD:KIND:ORIGIN:SCALE",
                    help="function-score (exact engine): multiply BM25 by a "
                         "decay over a doc-values column, e.g. "
                         "n_chars:exp:0:500 (needs --doc-values or --pages)")
    ap.add_argument("--rm3", action="store_true",
                    help="BM25+RM3 pseudo-relevance feedback: the chosen "
                         "engine's top --rm3-fb-docs feed an RM1 expansion "
                         "and a weighted rescore (requires --pages for the "
                         "feedback docs' text)")
    ap.add_argument("--rm3-fb-docs", type=int, default=10)
    ap.add_argument("--rm3-fb-terms", type=int, default=10)
    ap.add_argument("--rm3-alpha", type=float, default=0.5)
    ap.add_argument("--sort-by", default=None,
                    help="sort-by-field mode: rank each query's matches by this "
                         "doc-values column instead of BM25 score (Lucene "
                         "Sort(SortField)); needs --doc-values or --pages")
    ap.add_argument("--sort-asc", action="store_true",
                    help="ascending field order for --sort-by (default desc)")
    ap.add_argument("--doc-values", default=None,
                    help="parquet with (doc_id|url, <field>) for --sort-by; "
                         "defaults to --pages")
    ap.add_argument("--deletes", default=None,
                    help="tombstone parquet with a doc_id (or url) column: "
                         "excluded live from segments/exact searches "
                         "(Lucene deleted-docs); purge via index.deletes")
    ap.add_argument("--pages", default=None, help="pages parquet (doc text for --eval)")
    ap.add_argument("--delta-dir", default=None,
                    help="streaming delta dir (streaming/refresh.py): serve "
                         "base+delta near-real-time (re-crawls override, new "
                         "vocabulary searchable; base must use hash doc ids). "
                         "Pre-built segments/blocks on disk are ignored — the "
                         "NRT index rebuilds impact segments in-session")
    ap.add_argument("--serve", action="store_true",
                    help="resident mode: --queries is a directory polled for "
                         "query-batch files until <dir>/STOP appears")
    ap.add_argument("--poll-sec", type=float, default=0.5)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from dpr_spark.session import get_spark

    spark = get_spark("dpr_spark_query", master=args.master)
    from dpr_spark.index.build import InvertedIndex

    if os.path.isfile(os.path.join(args.index, "snapshots.json")):
        from dpr_spark.index.snapshots import SnapshotCatalog, load_index_at

        idx = load_index_at(
            SnapshotCatalog(spark, args.index),
            snapshot_id=args.snapshot_id,
            as_of_ms=args.as_of_ms,
        )
    else:
        idx = InvertedIndex.load(spark, args.index)

    if args.delta_dir:
        from dpr_spark.streaming.refresh import StreamingIndexRefresher

        if args.engine == "blockmax":
            raise SystemExit("--delta-dir cannot serve blockmax (a live delta "
                             "invalidates the compressed block layout); "
                             "compact() the delta to restore it")
        if args.engine in ("phrase", "phrase_prefix") and idx.positions is None:
            raise SystemExit("--delta-dir phrase engines need a POSITIONAL "
                             "base index (the delta then carries fresh "
                             "positions, streaming/refresh.py NRT contract)")
        idx = StreamingIndexRefresher(spark, args.delta_dir).fresh_index(idx)

    if args.serve:
        from dpr_spark.serve import make_searcher, serve_loop

        searcher, close = make_searcher(
            spark, idx, engine=args.engine,
            # a live delta invalidates on-disk segment/block layouts
            index_dir=None if args.delta_dir else args.index, k=args.k,
        )
        serve_loop(
            spark, searcher, args.queries, args.out,
            poll_sec=args.poll_sec, max_batches=args.max_batches,
        )
        close()
        spark.stop()
        return

    if args.queries.endswith(".tsv"):
        from dpr_spark.sources.readers import read_qa_tsv

        queries = read_qa_tsv(spark, args.queries)
    else:
        queries = spark.read.parquet(args.queries)

    deletes = None
    if args.deletes:
        deletes = spark.read.parquet(args.deletes)
        if "doc_id" not in deletes.columns:
            from dpr_spark.index.deletes import deletes_for_urls

            deletes = deletes_for_urls(idx, deletes)
        if args.engine not in ("segments", "exact") or args.sort_by:
            raise SystemExit("--deletes applies live tombstones on "
                             "--engine segments/exact only; purge the "
                             "index for other engines")

    # search_after cursors ride in the query file as (after_score,
    # after_doc) columns — the client echoes its previous page's last row
    cursors = None
    if "after_score" in queries.columns:
        from pyspark.sql import functions as F

        rows = (
            queries.filter(F.col("after_score").isNotNull())
            .select("qid", "after_score", "after_doc")
            .collect()
        )
        cursors = {int(r.qid): (float(r.after_score), int(r.after_doc)) for r in rows} or None
        queries = queries.select("qid", "question")
        if cursors and args.engine != "segments" and not args.sort_by:
            raise SystemExit("search_after cursors need --engine segments "
                             "(or --sort-by field paging)")

    if args.suggest:
        from dpr_spark.query.suggest import suggest_completions

        prefixes = [
            (int(r.qid), r.question)
            for r in queries.select("qid", "question").collect()
        ]
        t0 = time.perf_counter()
        sugg = suggest_completions(spark, prefixes, idx, n=args.suggest).persist()
        n_res = sugg.count()
        wall = time.perf_counter() - t0
        sugg.write.mode("overwrite").parquet(os.path.join(args.out, "suggestions"))
        print(f"suggested for {len(prefixes)} prefixes ({n_res} rows) "
              f"in {wall:.2f}s [suggest]")
        spark.stop()
        return

    if args.phrase_suggest:
        if not args.pages:
            raise SystemExit("--phrase-suggest needs --pages (the bigram "
                             "LM counts the raw corpus token stream)")
        from dpr_spark.query.phrasesuggest import build_bigram_lm, suggest_phrases

        lm = build_bigram_lm(spark.read.parquet(args.pages).selectExpr("text"))
        qs = [(int(r.qid), r.question)
              for r in queries.select("qid", "question").collect()]
        t0 = time.perf_counter()
        sugg = suggest_phrases(spark, qs, idx, lm, topn=args.phrase_suggest).persist()
        n_res = sugg.count()
        wall = time.perf_counter() - t0
        sugg.write.mode("overwrite").parquet(os.path.join(args.out, "phrase_suggestions"))
        print(f"phrase-suggested for {len(qs)} queries ({n_res} rows) "
              f"in {wall:.2f}s [phrase-suggest]")
        spark.stop()
        return

    t0 = time.perf_counter()
    if args.query_string:
        from dpr_spark.query.querystring import query_string_search

        qs = [(int(r.qid), r.question)
              for r in queries.select("qid", "question").collect()]
        results = query_string_search(
            spark, qs, idx, positions=idx.positions, k=args.k,
            default_operator=args.default_operator,
        )
    elif args.regexp:
        from dpr_spark.query.boolquery import regexp_search

        patterns = [
            (int(r.qid), r.question)
            for r in queries.select("qid", "question").collect()
        ]
        results = regexp_search(spark, patterns, idx, k=args.k)
    elif args.term_range:
        from dpr_spark.query.boolquery import term_range_search

        def parse_range(s):
            s = s.strip()
            inc_lo, inc_hi = True, True
            if s.startswith(("[", "(")):
                inc_lo = s[0] == "["
                s = s[1:]
            if s.endswith(("]", ")")):
                inc_hi = s[-1] == "]"
                s = s[:-1]
            if ".." not in s:
                raise SystemExit(f"--term-range wants 'LO..HI', got {s!r}")
            lo, hi = s.split("..", 1)
            return lo or None, hi or None, inc_lo, inc_hi

        ranges = [
            (int(r.qid), *parse_range(r.question))
            for r in queries.select("qid", "question").collect()
        ]
        results = term_range_search(spark, ranges, idx, k=args.k)
    elif args.intervals:
        from pyspark.sql import functions as F

        from dpr_spark.query.intervals import Match, intervals_search_index

        if idx.positions is None:
            raise SystemExit("--intervals needs positional postings; "
                             "rebuild the index with build_index.py --positional")
        rules = [
            (int(r.qid),
             Match(r.question, ordered=args.intervals_ordered,
                   max_gaps=args.max_gaps))
            for r in queries.select("qid", "question").collect()
        ]
        results = intervals_search_index(
            spark, idx, idx.positions, rules, k=args.k
        ).withColumn("score", F.col("n_intervals").cast("double"))
    elif args.boost:
        from dpr_spark.query.funcscore import decay_expr, search_function_score

        parts = args.boost.split(":")
        if len(parts) < 4:
            raise SystemExit("--boost wants FIELD:KIND:ORIGIN:SCALE[:DECAY]")
        fld, kind, origin, scale = parts[0], parts[1], float(parts[2]), float(parts[3])
        decay = float(parts[4]) if len(parts) > 4 else 0.5
        dv_path = args.doc_values or args.pages
        if not dv_path:
            raise SystemExit("--boost needs --doc-values (or --pages) "
                             "carrying the field column")
        dv = spark.read.parquet(dv_path)
        if "doc_id" not in dv.columns:
            dv = idx.docstats.select("doc_id", "url").join(dv, "url")
        results = search_function_score(
            queries, idx, dv, fld,
            lambda c: decay_expr(c, kind, origin=origin, scale=scale, decay=decay),
            k=args.k, deletes=deletes,
        )
    elif args.common_terms is not None:
        from dpr_spark.query.commonterms import common_terms_search

        results = common_terms_search(
            queries, idx, cutoff=args.common_terms, k=args.k
        )
    elif args.similarity != "bm25":
        from dpr_spark.query.similarity import search_similarity

        results = search_similarity(queries, idx, similarity=args.similarity, k=args.k)
    elif args.sort_by:
        from dpr_spark.query.paging import search_sort_by_field

        dv_path = args.doc_values or args.pages
        if not dv_path:
            raise SystemExit("--sort-by needs --doc-values (or --pages) "
                             "carrying the field column")
        dv = spark.read.parquet(dv_path)
        if "doc_id" not in dv.columns:
            dv = idx.docstats.select("doc_id", "url").join(dv, "url")
        fcursors = (
            {q: (s, d) for q, (s, d) in cursors.items()} if cursors else None
        )
        results = search_sort_by_field(
            spark, queries, idx, dv, args.sort_by, k=args.k,
            ascending=args.sort_asc, salt_buckets=8, cursors=fcursors,
        )
    elif args.engine == "phrase":
        from dpr_spark.query.phrase import phrase_search_index

        if idx.positions is None:
            raise SystemExit("--engine phrase needs positional postings; "
                             "rebuild the index with build_index.py --positional")
        # phrase strings ride to the driver (~bytes/query, the same
        # boundary as the term-resolution wave payload)
        phrases = [(r.qid, r.question) for r in queries.select("qid", "question").collect()]
        results = phrase_search_index(spark, idx, idx.positions, phrases, k=args.k)
    elif args.engine == "phrase_prefix":
        from dpr_spark.query.phrase import match_phrase_prefix_search_index

        if idx.positions is None:
            raise SystemExit("--engine phrase_prefix needs positional postings; "
                             "rebuild the index with build_index.py --positional")
        phrases = [(r.qid, r.question) for r in queries.select("qid", "question").collect()]
        results = match_phrase_prefix_search_index(
            spark, idx, idx.positions, phrases,
            max_expansions=args.max_expansions, k=args.k,
        )
    elif args.engine == "segments":
        from dpr_spark.query.wand import build_impact_segments, search_segments

        seg_path = os.path.join(args.index, "segments")
        if os.path.isdir(seg_path) and not args.delta_dir:
            seg = spark.read.parquet(seg_path)
        else:
            seg = build_impact_segments(idx).persist()
            seg.count()
        results = search_segments(
            spark, queries, idx, seg, k=args.k, cursors=cursors, deletes=deletes
        )
    elif args.engine == "blockmax":
        from dpr_spark.query.blockmax import (
            build_block_segments,
            load_serving_layout,
            search_blocks,
        )

        bp = os.path.join(args.index, "block_segments")
        np_ = os.path.join(args.index, "block_norms")
        if os.path.isfile(os.path.join(args.index, "serving_meta.json")):
            # bucketed tables: cogroup runs with no exchange on bucket
            blocks, norms = load_serving_layout(spark, args.index)
        elif os.path.isdir(bp) and os.path.isdir(np_):
            blocks, norms = spark.read.parquet(bp), spark.read.parquet(np_)
        else:
            blocks, norms = build_block_segments(idx)
            blocks = blocks.persist(); norms = norms.persist()
            blocks.count(), norms.count()
        results = search_blocks(spark, queries, idx, blocks, norms, k=args.k)
    else:
        from dpr_spark.query.scorer import search

        results = search(queries, idx, k=args.k, deletes=deletes)
    if args.rm3:
        if args.engine in ("phrase", "phrase_prefix"):
            raise SystemExit("--rm3 expands term queries, not phrases")
        if not args.pages:
            raise SystemExit("--rm3 requires --pages (feedback docs' text)")
        from pyspark.sql import functions as F

        from dpr_spark.query.rm3 import rm3_search

        pages_df = spark.read.parquet(args.pages).select("url", "text")
        docs_text = idx.docstats.join(pages_df, "url").select("doc_id", "text")
        fb = results.filter(F.col("rank") <= args.rm3_fb_docs).select(
            "qid", "doc_id", "score"
        )
        results = rm3_search(
            spark, queries, idx, docs_text, k=args.k,
            fb_docs=args.rm3_fb_docs, fb_terms=args.rm3_fb_terms,
            alpha=args.rm3_alpha, first_pass=fb,
        )
    results = results.persist()
    n_res = results.count()
    wall = time.perf_counter() - t0
    n_q = queries.count()
    results.write.mode("overwrite").parquet(os.path.join(args.out, "results"))
    if args.query_string:
        engine_label = "query-string"
    elif args.intervals:
        engine_label = "intervals" + ("-ordered" if args.intervals_ordered else "")
    elif args.regexp:
        engine_label = "regexp"
    elif args.term_range:
        engine_label = "term-range"
    elif args.boost:
        engine_label = "exact+boost"
    elif args.common_terms is not None:
        engine_label = "common_terms"
    elif args.similarity != "bm25":
        engine_label = args.similarity
    else:
        engine_label = args.engine + ("+rm3" if args.rm3 else "")
    print(f"searched {n_q} queries (k={args.k}, {n_res} rows) in {wall:.2f}s "
          f"= {n_q / wall:.1f} q/s [{engine_label}]")

    if args.eval:
        if not args.pages:
            print("--eval requires --pages (the index stores no text)", file=sys.stderr)
            spark.stop()
            return
        from dpr_spark.eval.validation import accuracy_at_k, annotate_hits, results_json

        pages = spark.read.parquet(args.pages).select("url", "text")
        docs_text = idx.docstats.join(pages, "url").select("doc_id", "url", "text")
        hits = annotate_hits(results, docs_text, queries)
        acc = accuracy_at_k(hits, n_q, args.k)
        acc.write.mode("overwrite").parquet(os.path.join(args.out, "accuracy"))
        out = results_json(results, docs_text, queries)
        out.write.mode("overwrite").json(os.path.join(args.out, "results_json"))
        for r in acc.collect()[:5]:
            print(f"accuracy@{r.k} = {r.accuracy:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
