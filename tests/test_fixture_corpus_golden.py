"""The bench/fixture corpus bytes are FROZEN: gen_pages_pdf feeds the
frozen bench.py's index-build timings, so its output must never drift
(an accidentally easier corpus would fake a speedup). The hashes were
captured from the row-wise render loop the vectorized Arrow path
replaced; the per-row twin (render_html / " ".join) is asserted
row-identical too."""

import hashlib

from dpr_spark.fixtures.corpus import gen_pages_pdf
from dpr_spark.functions.textextract import render_html

GOLDEN = {
    (3000, 42): "ea99cb91a91d61e4a7305d269c8229fb39262a10c6dd35fcc4cff8725d63ece6",
    (1500, 7): "767369e49e1b3d38ff66707f47dbdd5d8114f63f11b63113ef7fbe420bcb65fd",
}


def _digest(pdf) -> str:
    h = hashlib.sha256()
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        for v in pdf[col].tolist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def test_corpus_bytes_pinned():
    for (n, seed), want in GOLDEN.items():
        pdf = gen_pages_pdf(n, seed=seed)
        assert _digest(pdf) == want, (n, seed)
        assert [str(d) for d in pdf.dtypes] == [
            "object", "datetime64[us]", "object", "object", "object"
        ]


def test_vectorized_html_matches_rowwise_twin():
    pdf = gen_pages_pdf(800, seed=13)
    titles = [f"page {i}" for i in range(len(pdf))]
    for got, text, title in zip(pdf["html"], pdf["text"], titles):
        assert got == render_html(text, title)
