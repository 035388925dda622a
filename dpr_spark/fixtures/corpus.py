"""Deterministic synthetic fixtures (FIXTURES.md §1-2). No external data.

Generates the engine's input table of Common-Crawl-style pages
(url, warc_ts, html, text, lang) — the shape pinned by
BASELINE.json:input_hint — plus an NQ-style query set mirroring DPR's QA
TSV (`/root/reference/dpr/data/retriever_data.py:99-124`: question \\t
answers, answers a Python-literal list).

Everything is a pure function of (seed, n_docs): numpy PCG64 streams, a
fixed epoch for warc_ts (no wall clock), Zipf(1.2) vocabulary of ~10k
terms with real head-term skew, and unicode sprinkles (’, accents, CJK,
NFD-sensitive chars) to exercise tokenizer fidelity
(`dpr/utils/tokenizers.py:157-199`).
"""

from __future__ import annotations

import ast
from typing import List, Optional

import numpy as np
import pandas as pd


EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

_STOPHEAD = (
    "the of and to a in is was for on as with by at from it his he that her "
    "she an are were be this which or had not have but what when who where"
).split()

# placed at moderately-hot ranks so they occur in many docs — exercises
# the \p{L}\p{M} classes, IGNORECASE, NFD answer-matching and ’-normalization
_UNICODE_WORDS = [
    "café",
    "naïve",
    "zürich",
    "señor",
    "éclair",
    "o’brien",
    "d’art",
    "日本語",
    "东京",
    "москва",
    "ελλάδα",
    "crème-brûlée",
    "mañana",
    "über",
    "cœur",
    "won’t",
]

_CONS = list("bcdfghjklmnprstvwz")
_VOWS = list("aeiou")


def gen_vocab(size: int = 10_000, seed: int = 42) -> List[str]:
    """Deterministic vocabulary: stopword head, unicode sprinkles at ranks
    40..40+len, then pronounceable CV-syllable words (unique)."""
    rng = np.random.default_rng(seed)
    vocab: List[str] = list(_STOPHEAD)
    vocab += _UNICODE_WORDS
    seen = set(vocab)
    while len(vocab) < size:
        nsyl = int(rng.integers(2, 5))
        w = "".join(
            _CONS[int(rng.integers(len(_CONS)))] + _VOWS[int(rng.integers(len(_VOWS)))]
            for _ in range(nsyl)
        )
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab[:size]


def _zipf_probs(size: int, exponent: float = 1.2) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks**-exponent
    return p / p.sum()


def gen_pages_pdf(n_docs: int, seed: int = 42, vocab_size: int = 10_000) -> pd.DataFrame:
    """The `pages` table: url, warc_ts, html(binary), text, lang.

    text: 50-300 Zipf-sampled words; html rendered FROM text (so the
    byte-identity invariant extract_text(html)==text holds by
    construction); lang: 95% en, rest de/fr/es/zh.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from dpr_spark.functions.textextract import PARA_WORDS

    rng = np.random.default_rng(seed)
    vocab = gen_vocab(vocab_size, seed)
    probs = _zipf_probs(vocab_size)

    # RNG draw order/sizes are FROZEN (doclens, choice, random, integers):
    # the corpus bytes are pinned by tests/test_fixture_corpus_golden.py —
    # everything after the draws is deterministic vectorized rendering.
    doclens = rng.integers(50, 301, size=n_docs)
    total = int(doclens.sum())
    codes = rng.choice(vocab_size, size=total, p=probs)
    offsets = np.concatenate([[0], np.cumsum(doclens)])

    # Arrow-native rendering: one take + list-joins over the flat word
    # stream (byte-identical to the former per-row " ".join/render_html
    # loops, ~3x faster — the old path built 10^8 Python string objects)
    flat = pa.array(vocab, type=pa.string()).take(pa.array(codes, type=pa.int64()))
    texts = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat), " "
    ).to_pylist()

    langs = np.where(
        rng.random(n_docs) < 0.95,
        "en",
        np.array(["de", "fr", "es", "zh"], dtype=object)[rng.integers(0, 4, n_docs)],
    )
    urls = [f"https://site{i % 997}.example/{i}" for i in range(n_docs)]
    titles = [f"page {i}" for i in range(n_docs)]

    # render_html vectorized: paragraphs are PARA_WORDS-word slices of the
    # SAME flat word stream (paragraph joins never cross a doc boundary
    # because each doc's paragraph grid starts at its own offset); escape
    # is html.escape(quote=False)'s replacement chain in the same order.
    nparas = -(-doclens // PARA_WORDS)
    doc_para_off = np.concatenate([[0], np.cumsum(nparas)])
    pidx = np.arange(int(doc_para_off[-1])) - np.repeat(doc_para_off[:-1], nparas)
    para_starts = np.repeat(offsets[:-1], nparas) + pidx * PARA_WORDS
    paras = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.concatenate([para_starts, [total]]), type=pa.int64()), flat
        ),
        " ",
    )

    def _esc(arr):
        for pat, rep in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
            arr = pc.replace_substring(arr, pattern=pat, replacement=rep)
        return arr

    bodies = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(doc_para_off, type=pa.int64()),
            pc.binary_join_element_wise("<p>", _esc(paras), "</p>", ""),
        ),
        "",
    )
    htmls = (
        pc.binary_join_element_wise(
            "<html><head><title>",
            _esc(pa.array(titles, type=pa.string())),
            "</title></head><body>",
            bodies,
            "</body></html>",
            "",
        )
        .cast(pa.binary())
        .to_pylist()
    )
    ts = EPOCH + np.arange(n_docs).astype("timedelta64[s]").astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def assign_doc_ids(pages: pd.DataFrame) -> pd.DataFrame:
    """doc_id = dense rank of url (stable, FIXTURES.md §1) — the same rule
    the engine applies; oracle and Spark must agree."""
    out = pages.sort_values("url", kind="mergesort").reset_index(drop=True)
    out.insert(0, "doc_id", np.arange(len(out), dtype=np.int64))
    return out


def gen_queries_pdf(
    pages: pd.DataFrame, n_queries: int = 200, seed: int = 43
) -> pd.DataFrame:
    """NQ-style query set: qid, question (3-12 corpus terms, some with ’),
    answers (1-3 verbatim spans of some document's text)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(gen_vocab(seed=42), dtype=object)
    probs = _zipf_probs(len(vocab))
    texts = pages["text"].tolist()

    qids, questions, answers_col = [], [], []
    for qid in range(n_queries):
        nterms = int(rng.integers(3, 13))
        terms = list(vocab[rng.choice(len(vocab), size=nterms, p=probs)])
        q = " ".join(terms)
        if rng.random() < 0.15:
            q = q.replace("'", "’") if "'" in q else q + " o’brien"
        n_ans = int(rng.integers(1, 4))
        answers = []
        for _ in range(n_ans):
            words = texts[int(rng.integers(len(texts)))].split(" ")
            span = int(rng.integers(1, 4))
            start = int(rng.integers(0, max(1, len(words) - span)))
            answers.append(" ".join(words[start : start + span]))
        qids.append(qid)
        questions.append(q)
        answers_col.append(answers)
    return pd.DataFrame({"qid": qids, "question": questions, "answers": answers_col})


# ------------------------------------------------------------------ writers


def write_pages_parquet(path: str, n_docs: int, seed: int = 42) -> pd.DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = gen_pages_pdf(n_docs, seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # small row groups: a single-row-group file is read by ONE Spark task
    # (a row group is assigned to the split holding its midpoint), which
    # would serialize the scan + first shuffle write regardless of cores
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        path,
        row_group_size=max(1024, n_docs // 64),
    )
    return pdf


def write_queries_tsv(path: str, queries: pd.DataFrame) -> None:
    """DPR QA TSV: question \\t python-literal answers list (S2 format,
    `retriever_data.py:99-124` — parsed there with eval())."""
    with open(path, "w", encoding="utf-8") as f:
        for _, row in queries.iterrows():
            f.write("%s\t%s\n" % (row["question"], repr(list(row["answers"]))))


def read_queries_tsv(path: str) -> pd.DataFrame:
    """Oracle-side reader using ast.literal_eval (safe twin of the
    reference's eval)."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for qid, line in enumerate(f):
            q, ans = line.rstrip("\n").split("\t", 1)
            rows.append((qid, q, ast.literal_eval(ans)))
    return pd.DataFrame(rows, columns=["qid", "question", "answers"])


def write_passages_tsv(path: str, pages_with_ids: pd.DataFrame) -> None:
    """DPR passage TSV: id \\t text \\t title, header row 'id' (S1 format,
    `retriever_data.py:253-287`)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("id\ttext\ttitle\n")
        for _, row in pages_with_ids.iterrows():
            f.write("%d\t%s\t%s\n" % (row["doc_id"], row["text"], row["url"]))
