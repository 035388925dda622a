"""dpr_spark — a PySpark-native sparse-retrieval (inverted-index + BM25) engine.

Re-expresses the query semantics, data model and operator surface of
facebookresearch/DPR's retriever stage (see SURVEY.md) as an idiomatic
Spark DataFrame pipeline:

    pages (url, warc_ts, html, text, lang)
      -> extract_text / tokenize (Arrow-vectorized pandas UDFs)
      -> docstats / dictionary / postings tables (delta-gap varint, block-max)
      -> BM25 (k1=1.2, b=0.75) top-k query engine (exact + block-max WAND)
      -> has_answer validation + accuracy@k + nested-JSON results sink

Nothing here is a port: the reference's imperative sharding / pickle /
multiprocessing machinery collapses into Spark stages and shuffles.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_TOP_K = 100  # conf/dense_retriever.yaml `n_docs: 100`
