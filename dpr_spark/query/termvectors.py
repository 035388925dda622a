"""Term vectors — the ES `_termvectors` / Lucene `Terms getTermVector`
surface: for a requested set of documents, every indexed term with its
in-doc tf, corpus df/idf (term_statistics=true) and, when the index is
positional, the token positions (offsets-free variant; our postings
carry positions, not char offsets).

Everything is served FROM THE INDEX TABLES — no retokenization, exactly
like Lucene reading .tvd/.pos files instead of re-analyzing the stored
field (the same discipline as query/morelikethis.py's stored-fields
term pull).

Scale shape: the requested doc_ids are a tiny set — they broadcast into
the postings probe (postings are scanned in place, no shuffle); the
resulting per-doc term rows (≤ doclen rows per doc) are the SMALL side
and broadcast INTO the vocab-sized dictionary scan for the term string
+ df/idf decoration (the dictionary never broadcasts — the repo-wide
query-path contract). Positions attach from the positional table by the
same broadcast probe.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.index.build import InvertedIndex


def term_vectors(
    spark,
    index: InvertedIndex,
    doc_ids: Sequence[int],
    with_positions: bool = True,
) -> DataFrame:
    """(doc_id, term, tf, df, idf[, positions]) — one row per (requested
    doc, indexed term); `positions` is the ascending token-position
    array when the index is positional and with_positions=True."""
    ids = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    mine = index.postings.join(F.broadcast(ids), "doc_id").select(
        "doc_id", "term_id", "tf"
    )
    # per-doc rows are the small side; the dictionary scans in place
    out = index.dictionary.select("term", "term_id", "df", "idf").join(
        F.broadcast(mine), "term_id"
    )
    if with_positions and index.positions is not None:
        pos = index.positions.join(F.broadcast(ids), "doc_id").select(
            "doc_id", "term_id", F.sort_array("positions").alias("positions")
        )
        out = out.join(F.broadcast(pos), ["doc_id", "term_id"], "left")
        return out.select(
            "doc_id", "term", "tf", "df", "idf", "positions"
        )
    return out.select("doc_id", "term", "tf", "df", "idf")


def term_vectors_for_text(
    spark,
    texts: Sequence,
    index: InvertedIndex,
) -> DataFrame:
    """ES `_termvectors` with an ARTIFICIAL document (`doc:` body, no
    `_id`): analyze caller-supplied text with the index's analysis
    chain and decorate it with the INDEX's statistics — tf and
    positions from the text itself (position-increment gaps preserved,
    the W20 contract), df/idf from the live dictionary; terms absent
    from the index report df 0 with the df-0 idf. texts: [(tid, text)]
    -> (tid, term, tf, positions, df, idf).

    The "how would this doc score?" debugging surface: no index
    mutation, no retokenize of indexed docs. Scale shape: the supplied
    texts are a tiny driver-side set — their term rows broadcast into
    the ONE dictionary scan (left join keeps unindexed terms)."""
    import math

    from dpr_spark.functions.tokenizer import tokenize

    rows = []
    for tid, text in texts:
        toks = tokenize(text)
        if index.analyzer is not None:
            pairs = index.analyzer.analyze_with_positions(toks)
        else:
            pairs = list(enumerate(toks))
        per = {}
        for pos, t in pairs:
            per.setdefault(t, []).append(pos)
        for t, ps in sorted(per.items()):
            rows.append((int(tid), t, len(ps), ps))
    if not rows:
        raise ValueError("no tokenizable texts")
    tdf = spark.createDataFrame(
        rows, "tid long, term string, tf int, positions array<int>"
    )
    n = float(index.stats.n_docs)
    idf0 = math.log((n + 0.5) / 0.5 + 1.0)
    dic = index.dictionary.select("term", "df", "idf")
    return tdf.join(dic, "term", "left").select(
        "tid",
        "term",
        "tf",
        "positions",
        F.coalesce("df", F.lit(0)).cast("long").alias("df"),
        F.coalesce("idf", F.lit(idf0)).alias("idf"),
    )
