"""Vectorized (doc, n-gram) row generation — the mapInArrow twin of the
Catalyst shape

    transform(sequence(0, size(toks) - n),
              i -> concat_ws(' ', slice(toks, i + 1, n)))

whose per-element interpreted evaluation (higher-order functions do not
participate in whole-stage codegen) dominates every n-gram-shaped entry
at bench scale (guide §4.2: hand whole batches to vectorized native
code). Tokens come from the same ASCII Arrow fast path the index build
uses (tokenizer.tokenize_ascii_arrow — asserted token-identical to the
reference tokenizer); n-grams are built with TWO pyarrow C calls over
the flat token stream: n aligned slices joined element-wise, then a
doc-boundary mask (a gram is valid iff its first and last token fall in
the same document). Non-ASCII batches fall back to the regex-module
tokenizer twin.

Semantics knobs mirror the call sites they replace:
- mode="full": docs with len < n emit nothing (webclean._grams).
- mode="short_tail": docs with 1 <= len < n emit ONE gram joining all
  their tokens (dedup._shingles' slice-past-the-end behaviour).
- mode="uni_bi": every unigram plus every bigram (dsir's feature
  stream).
- distinct=True dedups (doc, gram) pairs inside the kernel
  (array_distinct / DISTINCT equivalents).
"""

from __future__ import annotations

import numpy as np


def _tokens_batch(texts_arr, lowercase_first: bool):
    """(flat pyarrow.StringArray, per-row counts int64) — the token
    stream of tokenize_col(text, lowercase_first=...)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dpr_spark.functions.tokenizer import (
        _all_ascii,
        _compiled_fast,
        tokenize_ascii_arrow,
    )

    if texts_arr.null_count:
        texts_arr = pc.fill_null(texts_arr, "")
    if _all_ascii(texts_arr):
        # on ASCII, lower-then-match == match-then-lower — one kernel
        # serves both lowercase_first settings
        return tokenize_ascii_arrow(texts_arr)
    pat = _compiled_fast()
    if lowercase_first:
        tok_lists = [pat.findall((t or "").lower()) for t in texts_arr.to_pylist()]
    else:
        tok_lists = [
            [m.lower() for m in pat.findall(t or "")] for t in texts_arr.to_pylist()
        ]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64, count=len(tok_lists))
    flat = pa.array(
        [tok for ts in tok_lists for tok in ts], type=pa.string(), size=int(lens.sum())
    )
    return flat, lens


def _grams_batch(flat, lens: np.ndarray, n: int, short_tail: bool):
    """(doc_row_idx int64, grams StringArray) for one batch's flat token
    stream. Full n-grams only; `short_tail` adds the one whole-doc gram
    for docs with 1 <= len < n."""
    import pyarrow as pa
    import pyarrow.compute as pc

    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), pa.array([], type=pa.string())
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    parts_idx, parts_gram = [], []
    if total >= n:
        m = total - n + 1
        cols = [flat.slice(j, m) for j in range(n)]
        grams_all = (
            pc.binary_join_element_wise(*cols, " ") if n > 1 else cols[0]
        )
        valid = doc_idx[:m] == doc_idx[n - 1 : n - 1 + m]
        sel = np.flatnonzero(valid)
        if len(sel):
            parts_idx.append(doc_idx[sel])
            parts_gram.append(grams_all.take(pa.array(sel)))
    if short_tail:
        # docs with 1 <= len < n emit ONE gram of all their tokens (the
        # slice-past-the-end behaviour of the Catalyst original); such
        # docs are rare, a per-doc join is fine
        short = np.flatnonzero((lens > 0) & (lens < n))
        if len(short):
            starts = np.r_[0, np.cumsum(lens)]
            g = [
                " ".join(flat.slice(starts[s], lens[s]).to_pylist())
                for s in short
            ]
            parts_idx.append(short.astype(np.int64))
            parts_gram.append(pa.array(g, type=pa.string()))
    if not parts_idx:
        return np.empty(0, np.int64), pa.array([], type=pa.string())
    if len(parts_idx) == 1:
        return parts_idx[0], parts_gram[0]
    return np.concatenate(parts_idx), pa.concat_arrays(
        [p.combine_chunks() if hasattr(p, "combine_chunks") else p for p in parts_gram]
    )


def repstat_rows(
    df,
    gram_ns,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
):
    """Per-document INTEGER repetition statistics in one Arrow pass —
    the kernel half of webclean.repetition_stats. Emits only integer
    counts (top-gram run/char-length, duplicated-gram chars, line dup
    stats, token chars); every division and round() stays in Spark so
    the final doubles are bit-identical to the pure-Catalyst fold it
    replaces (which re-built + array_sorted each gram array per row in
    interpreted HOF eval).

    Group-stat semantics mirror webclean._dup_group_stats /
    _top_group_stats: dupn/dupc = Σ count / Σ count·len over values with
    count > 1; best = max count, blen = max len among values with that
    count (the fold's longer-element tie-break). Both depend only on
    value multiplicities, so no sort is needed here.

    A null text row emits all-null stats (Catalyst's ANSI null
    propagation through split/tokenize does the same)."""
    import pyarrow as pa

    gram_ns = sorted(set(int(n) for n in gram_ns))
    fields = ["n_lines", "line_dupn", "line_dupc", "line_chars", "tok_chars"]
    for n in gram_ns:
        fields += [f"top{n}_best", f"top{n}_blen", f"dup{n}_dupc"]
    schema = "doc long, " + ", ".join(f"{f} long" for f in fields)

    def _dup_stats(vals):
        """(dupn, dupc) over a list of strings."""
        if not len(vals):
            return 0, 0
        import collections

        cnt = collections.Counter(vals)
        dupn = dupc = 0
        for v, c in cnt.items():
            if c > 1:
                dupn += c
                dupc += c * len(v)
        return dupn, dupc

    def _top_stats(vals):
        """(best, blen): max count; among those, max length."""
        if not len(vals):
            return 0, 0
        import collections

        cnt = collections.Counter(vals)
        best = max(cnt.values())
        blen = max(len(v) for v, c in cnt.items() if c == best)
        return best, blen

    def run(it):
        for batch in it:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            texts = batch.column(1).to_pylist()
            cols = {f: [] for f in fields}
            out_ids = []
            # tokens via the batch kernel (ASCII fast path); nulls
            # handled row-wise below
            tarr = batch.column(1)
            flat, lens = _tokens_batch(tarr, True)
            starts = np.r_[0, np.cumsum(lens)]
            toks_py = flat.to_pylist()
            for i, t in enumerate(texts):
                out_ids.append(int(ids[i]))
                if t is None:
                    for f in fields:
                        cols[f].append(None)
                    continue
                lines = t.split(line_sep)
                ldupn, ldupc = _dup_stats(lines)
                cols["n_lines"].append(len(lines))
                cols["line_dupn"].append(ldupn)
                cols["line_dupc"].append(ldupc)
                cols["line_chars"].append(sum(len(x) for x in lines))
                toks = toks_py[starts[i] : starts[i + 1]]
                cols["tok_chars"].append(
                    sum(len(x) for x in toks) + max(len(toks) - 1, 0)
                )
                for n in gram_ns:
                    grams = (
                        [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
                        if len(toks) >= n
                        else []
                    )
                    best, blen = _top_stats(grams)
                    dupn, dupc = _dup_stats(grams)
                    cols[f"top{n}_best"].append(best)
                    cols[f"top{n}_blen"].append(blen)
                    cols[f"dup{n}_dupc"].append(dupc)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64())]
                + [pa.array(cols[f], type=pa.int64()) for f in fields],
                names=["doc"] + fields,
            )

    return df.select(id_col, text_col).mapInArrow(run, schema)


def ngram_rows(
    df,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase_first: bool = True,
    mode: str = "full",
    distinct: bool = False,
    out_id: str = "doc",
    out_gram: str = "gram",
):
    """df(id_col, text_col) -> (out_id <id type>, out_gram string) rows
    — one Arrow pass, no shuffle, no interpreted HOF eval. The id
    column keeps its source type (long doc ids, string url keys in the
    streaming ledgers, ...)."""
    import pandas as pd
    import pyarrow as pa

    if mode not in ("full", "short_tail", "uni_bi"):
        raise ValueError(mode)
    id_type = df.schema[id_col].dataType.simpleString()

    def run(it):
        for batch in it:
            id_arr = batch.column(0)
            flat, lens = _tokens_batch(batch.column(1), lowercase_first)
            if mode == "uni_bi":
                i1, g1 = _grams_batch(flat, lens, 1, False)
                i2, g2 = _grams_batch(flat, lens, 2, False)
                sel = np.concatenate([i1, i2])
                grams = pa.concat_arrays([g1, g2])
            else:
                sel, grams = _grams_batch(
                    flat, lens, n, short_tail=(mode == "short_tail")
                )
            if not len(sel):
                continue
            out_ids = id_arr.take(pa.array(sel))
            if distinct:
                pdf = pd.DataFrame(
                    {"i": out_ids.to_pandas(), "g": grams.to_pandas()}
                )
                pdf = pdf.drop_duplicates()
                out_ids = pa.array(pdf["i"], type=id_arr.type)
                grams = pa.array(pdf["g"], type=pa.string())
            yield pa.RecordBatch.from_arrays(
                [out_ids, grams], names=[out_id, out_gram]
            )

    return df.select(id_col, text_col).mapInArrow(
        run, f"{out_id} {id_type}, {out_gram} string"
    )
