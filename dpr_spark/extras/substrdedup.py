"""ExactSubstr deduplication (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better") re-expressed as a Catalyst plan.

The reference method finds every substring of >= L units that occurs
more than once in the corpus (via a monolithic suffix array) and cuts
the duplicated bytes out of the training text. A suffix array does not
distribute; the standard scale-out equivalent — used here — is the
rolling-window fingerprint formulation:

    a character is DUPLICATED iff it is covered by at least one
    length-L window whose content occurs >= 2 times in the corpus
    (counting both cross-document and within-document repeats).

Every duplicated substring of length >= L contains at least one such
window, so coverage-union removal is a superset of suffix-array removal
with the same guarantee Lee et al. state: after removal no verbatim
duplicated run of >= 2L-1 characters survives. The contract is exact
and engine-independent, which is what the DuckDB oracle twins check.

Plan shape (100 TB audit):
  * window enumeration is a Generate (posexplode of a sequence) feeding
    a projection — no shuffle, no Python;
  * windows are fingerprinted with a 128-bit digest (unhex(md5)) so the
    only wide shuffle carries (16-byte key, doc_id, pos), never text —
    at 10^12 docs this is the honest O(total chars) cost the suffix
    array also pays, laid out as two hash shuffles instead of one
    global sort;
  * the repeated-key table comes from a map-side-combined groupBy count
    (hot boilerplate windows collapse to one row per partition before
    the exchange, so head-term skew is bounded by partition count);
  * span merging is a per-document gaps-and-islands window over the few
    surviving positions, keyed by doc_id — bounded per group;
  * text removal is a pure Catalyst fold (F.aggregate) over each
    document's sorted span array — no UDF anywhere in the module.

DPR analog: the passage-corpus preprocessing stage
(/root/reference/dpr/data/retriever_data.py:253-287 loads the cleaned
corpus; dedup happens upstream in its data pipeline) — this module is
the corpus-hygiene operator a web-scale rebuild of that pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Lee et al. use 50 BPE tokens (~200+ chars); the synthetic testdata
# documents are short, so entries use a smaller L. Callers pick.
DEFAULT_L = 50


def window_positions(
    docs: DataFrame, L: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, key): every length-L character window of every
    document, fingerprinted with a 128-bit digest. Generate-only — no
    shuffle happens here."""
    return docs.filter(F.length(text_col) >= L).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.sequence(F.lit(0), F.length(text_col) - L)).alias(
            "pos", "_i"
        ),
        F.unhex(F.md5(F.col(text_col).substr(F.col("_i") + 1, F.lit(L)))).alias(
            "key"
        ),
    ).select("doc_id", "pos", "key")


def duplicate_window_positions(
    docs: DataFrame, L: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos) of every window whose content occurs >= 2 times in
    the corpus (within- or cross-document)."""
    wins = window_positions(docs, L, text_col, id_col)
    # ONE window enumeration and ONE key shuffle: count-over-key keeps
    # every (doc_id, pos) row next to its key's count. The former
    # groupBy + left-semi shape enumerated (substr + md5 of every
    # window of every doc) TWICE — once under the count, once under the
    # probe side — and shuffled the probe rows by key anyway, so the
    # window form halves the dominant fingerprint cost at identical
    # skew exposure (a hot boilerplate key co-locates either way; the
    # sort-based window spills gracefully).
    return (
        wins.withColumn("_n", F.count("*").over(Window.partitionBy("key")))
        .filter(F.col("_n") > 1)
        .select("doc_id", "pos")
    )


def duplicate_spans(
    docs: DataFrame, L: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, start, end): maximal character spans covered by at least
    one duplicated length-L window — `end` exclusive. Two windows merge
    when their coverage is contiguous (next_pos <= prev_pos + L)."""
    dup = duplicate_window_positions(docs, L, text_col, id_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = (
        F.col("pos") > F.lag("pos", 1, -(1 << 30)).over(w) + L
    ).cast("int")
    gid = F.sum(brk).over(
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        dup.withColumn("gid", gid)
        .groupBy("doc_id", "gid")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + L).alias("end"),
        )
        .select("doc_id", "start", "end")
    )


def exact_substr_dedup(
    docs: DataFrame, L: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, clean_text, removed_chars): the corpus with every
    duplicated span (per `duplicate_spans`) cut out of every occurrence.

    Removal policy: ALL occurrences are cut (the strictest variant of
    Lee et al.'s ExactSubstr — their released tool cuts each flagged
    byte range; keeping one canonical copy is a caller-side choice of
    which doc to exempt). Removal is a Catalyst fold over the document's
    sorted span array: no UDF, no collect."""
    spans = duplicate_spans(docs, L, text_col, id_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("start", "end"))
        ).alias("spans"),
        F.sum(F.col("end") - F.col("start")).alias("removed_chars"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    joined = base.join(per_doc, "doc_id", "left")
    txt = F.col("_text")
    folded = F.aggregate(
        F.col("spans"),
        F.struct(F.lit("").alias("acc"), F.lit(0).alias("cur")),
        lambda a, s: F.struct(
            F.concat(
                a["acc"], txt.substr(a["cur"] + 1, s["start"] - a["cur"])
            ).alias("acc"),
            s["end"].alias("cur"),
        ),
        lambda a: F.concat(
            a["acc"], txt.substr(a["cur"] + 1, F.length(txt) - a["cur"])
        ),
    )
    return joined.select(
        "doc_id",
        F.when(F.col("spans").isNull(), txt).otherwise(folded).alias("clean_text"),
        F.coalesce(F.col("removed_chars"), F.lit(0)).cast("long").alias(
            "removed_chars"
        ),
    )
