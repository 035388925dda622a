"""Distributed BPE tokenizer training — the classic subword-vocabulary
learner (Sennrich et al. 2016) every LLM training-data pipeline runs
over its corpus before tensorization. The reference stops at wrapping a
pretrained HF BertTokenizer (`/root/reference/dpr/models/hf_models.py`,
out of scope per SURVEY S/T4); a 100 TB crawl pipeline also has to
TRAIN the tokenizer, and that is a corpus-scale counting problem Spark
is the right tool for.

Deterministic contract (pure-Python twin `bpe_train_local`, pytest in
tests/test_bpe.py; the iteration-0 statistics additionally have a
DuckDB twin via the `bpe_pair_counts` driver entry):

- pre-tokenization is the repo tokenizer (`functions/tokenizer.py`,
  lowercased SimpleTokenizer regex) — the same token stream the index
  sees, so the learned vocabulary and the search dictionary agree;
- a word starts as its character sequence plus a trailing ``</w>``
  end-of-word symbol (the Sennrich marker, kept as a SEPARATE symbol);
- each merge step picks the adjacent symbol pair with the highest
  corpus count, ties broken (left ASC, right ASC) — arrival order can
  never change the result, unlike hash-dict implementations;
- the merge rewrites every word left-to-right non-overlapping;
- training stops after ``num_merges`` steps or when the best pair's
  count drops below ``min_pair_count``.

Scale shape (the point of doing this in Spark):

- the corpus is touched ONCE: `word_counts` tokenizes with the
  Arrow-batched UDF and collapses to the distinct-word table with
  map-side combine — Zipf makes that table vocab-sized (10^7-10^9 rows
  at crawl scale), and every training iteration runs over IT, never
  the corpus;
- one iteration = one vocab-sized pair-explode + map-side-combined
  count, a single-row argmax reduce, and a Catalyst array fold rewrite
  gated by `array_contains` so untouched words skip the fold — no
  Python in the loop;
- `localCheckpoint` per iteration truncates lineage (the pagerank/HITS
  discipline in extras/graph.py) so the plan stays O(1) per step;
- ENCODING (applying thousands of merges to billions of docs) would be
  absurd as stacked Catalyst folds — `bpe_encode` broadcasts the merge
  ranks and applies the standard lowest-rank-first algorithm in one
  Arrow-batched pass, the UDF-is-the-right-tool case.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): corpus token occurrences, collapsed to the distinct
    vocabulary in one pass (Arrow tokenize + map-side combine)."""
    from dpr_spark.functions.tokenizer import tokenize_udf

    return (
        docs.select(F.explode(tokenize_udf()(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _symbols(word_col) -> "F.Column":
    # characters of the word plus the trailing end-of-word symbol
    return F.concat(
        F.split(word_col, ""),  # Spark: per-character split, no empty tail
        F.array(F.lit(END)),
    )


def initial_pair_counts(wc: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-symbol pair counts at iteration 0 —
    the SQL-replayable slice of training (driver entry
    `bpe_pair_counts`). For a word of n chars there are exactly n
    pairs: (c1,c2)..(c_{n-1},c_n),(c_n,</w>)."""
    syms = _symbols(F.col("word"))
    pairs = F.expr(
        "transform(slice(_syms, 1, size(_syms) - 1), "
        "(x, i) -> struct(x AS left, element_at(_syms, i + 2) AS right))"
    )
    return (
        wc.withColumn("_syms", syms)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(x, i) -> struct(x AS left, element_at(syms, i + 2) AS right))"
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def _merge_fold(left: str, right: str) -> "F.Column":
    """Left-to-right non-overlapping rewrite of adjacent (left, right)
    into the concatenated symbol, as a Catalyst array fold. Greedy
    correctness: once a merge fires, the accumulator's last element
    becomes left+right which can never equal `left` again (right is
    nonempty), so overlapping occurrences ('aaa' under (a,a)) resolve
    left-to-right exactly like the sequential twin."""
    merged = left + right
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    spark: SparkSession,
    docs_or_wc: DataFrame,
    num_merges: int = 100,
    min_pair_count: int = 1,
    text_col: str = "text",
) -> List[Tuple[int, str, str, int]]:
    """Learn `num_merges` BPE merges over a corpus (or a precomputed
    (word, cnt) table — detected by its columns). Returns
    [(step, left, right, pair_count)], step 1-based, in merge order."""
    cols = set(docs_or_wc.columns)
    wc = docs_or_wc if cols == {"word", "cnt"} else word_counts(
        docs_or_wc, text_col
    )
    words = wc.select(
        _symbols(F.col("word")).alias("syms"), F.col("cnt")
    ).localCheckpoint()
    merges: List[Tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append((step, left, right, int(cnt)))
        touched = F.array_contains("syms", left) & F.array_contains(
            "syms", right
        )
        words = words.withColumn(
            "syms",
            F.when(touched, _merge_fold(left, right)).otherwise(F.col("syms")),
        ).localCheckpoint()
    return merges


def bpe_train_resumable(
    spark: SparkSession,
    docs_or_wc: DataFrame,
    workdir: str,
    num_merges: int = 100,
    min_pair_count: int = 1,
    checkpoint_every: int = 20,
    text_col: str = "text",
) -> List[Tuple[int, str, str, int]]:
    """`bpe_train` with kill-and-resume (the manifest discipline of
    index/manifest.py, applied to the trainer): the symbol-table state
    checkpoints to parquet every `checkpoint_every` merges (tmp-write +
    atomic rename) and every chosen merge appends one JSONL line BEFORE
    it is applied. A restarted run loads the newest checkpoint, replays
    the ≤ checkpoint_every logged merges past it as Catalyst folds, and
    continues — the merge sequence is bit-identical to an uninterrupted
    run because every decision derives from the checkpointed state, not
    the input. Calling again with a larger `num_merges` on the same
    workdir EXTENDS the vocabulary without retraining."""
    import json
    import os

    os.makedirs(workdir, exist_ok=True)
    log_path = os.path.join(workdir, "merges.jsonl")
    merges: List[Tuple[int, str, str, int]] = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                d = json.loads(line)
                merges.append(
                    (d["step"], d["left"], d["right"], d["cnt"])
                )
    ckpts = sorted(
        int(n.split("_")[1])
        for n in os.listdir(workdir)
        if n.startswith("words_") and not n.endswith(".tmp")
    )
    if ckpts:
        at = max(s for s in ckpts if s <= len(merges))
        words = spark.read.parquet(
            os.path.join(workdir, f"words_{at:06d}")
        ).localCheckpoint()
    else:
        at = 0
        cols = set(docs_or_wc.columns)
        wc = docs_or_wc if cols == {"word", "cnt"} else word_counts(
            docs_or_wc, text_col
        )
        words = wc.select(
            _symbols(F.col("word")).alias("syms"), F.col("cnt")
        ).localCheckpoint()
        _ckpt_words(words, workdir, 0)
    # replay logged merges past the checkpoint (crash landed mid-window)
    for step, left, right, _ in merges[at:]:
        touched = F.array_contains("syms", left) & F.array_contains(
            "syms", right
        )
        words = words.withColumn(
            "syms",
            F.when(touched, _merge_fold(left, right)).otherwise(F.col("syms")),
        ).localCheckpoint()
    for step in range(len(merges) + 1, num_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        with open(log_path, "a") as f:
            f.write(
                json.dumps(
                    {"step": step, "left": left, "right": right,
                     "cnt": int(cnt)}
                )
                + "\n"
            )
        merges.append((step, left, right, int(cnt)))
        touched = F.array_contains("syms", left) & F.array_contains(
            "syms", right
        )
        words = words.withColumn(
            "syms",
            F.when(touched, _merge_fold(left, right)).otherwise(F.col("syms")),
        ).localCheckpoint()
        if step % checkpoint_every == 0:
            _ckpt_words(words, workdir, step)
    return merges[:num_merges]


def _ckpt_words(words: DataFrame, workdir: str, step: int) -> None:
    import os

    tmp = os.path.join(workdir, f"words_{step:06d}.tmp")
    dst = os.path.join(workdir, f"words_{step:06d}")
    words.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, dst)


def bpe_train_local(
    wc: Dict[str, int], num_merges: int = 100, min_pair_count: int = 1
) -> List[Tuple[int, str, str, int]]:
    """Pure-Python twin of `bpe_train` over a {word: count} dict — the
    Sennrich reference algorithm with the same deterministic tie-break;
    tests assert merge-sequence identity."""
    words: Dict[Tuple[str, ...], int] = {}
    for w, c in wc.items():
        words[tuple(list(w) + [END])] = words.get(tuple(list(w) + [END]), 0) + c
    merges: List[Tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((step, left, right, cnt))
        merged = left + right
        out: Dict[Tuple[str, ...], int] = {}
        for syms, c in words.items():
            res: List[str] = []
            for x in syms:
                if res and res[-1] == left and x == right:
                    res[-1] = merged
                else:
                    res.append(x)
            key = tuple(res)
            out[key] = out.get(key, 0) + c
        words = out
    return merges


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank adjacent pair (ties cannot occur — ranks are unique).
    Equivalent to replaying the merges in training order."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        # merge ALL occurrences of that pair left-to-right (they share
        # the same rank, so order among them cannot matter)
        left, right = syms[best_i], syms[best_i + 1]
        res: List[str] = []
        for x in syms:
            if res and res[-1] == left and x == right:
                res[-1] = left + right
            else:
                res.append(x)
        syms = res
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: Sequence[Tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, subwords array<string>, n_subwords): tokenize with the repo
    tokenizer, then BPE-encode every token with the broadcast merge
    ranks in one Arrow-batched pass (the scale path for applying
    thousands of merges — never stacked Catalyst folds)."""
    from pyspark.sql.functions import pandas_udf

    from dpr_spark.functions.tokenizer import tokenize_udf

    ranks = {(l, r): s for s, l, r, _ in merges}

    def enc(toks: pd.Series) -> pd.Series:
        cache: Dict[str, List[str]] = {}

        def one(ts):
            out: List[str] = []
            for t in ts:
                got = cache.get(t)
                if got is None:
                    got = cache[t] = encode_word(t, ranks)
                out.extend(got)
            return out

        return toks.map(one)

    enc_udf = pandas_udf(enc, "array<string>")
    toks = docs.select(
        F.col(id_col), tokenize_udf()(F.col(text_col)).alias("_toks")
    )
    return toks.select(
        id_col,
        enc_udf(F.col("_toks")).alias("subwords"),
    ).withColumn("n_subwords", F.size("subwords"))
