"""HTML-token table parsing + linearization (T6/T7):
the Spark analog of NQTableParser
(`/root/reference/dpr/data/biencoder_data.py:252-337`) and
split_tables_to_chunks (`biencoder_data.py:467-501,563-580`).

Input is NQ's token-stream form: parallel arrays (tokens, is_html_mask)
where masked tokens are HTML tags (<Table>, <Tr>, <Td>/<Th> + closers)
and unmasked tokens are cell content. The parser is a small stack
machine (nested tables attach to the parent's current cell and inherit
its caption path); linearization emits one header-prefixed chunk per
~max_length words, rows joined ", " per cell and "\\n" per row.

The parse is per-document Python (a stack machine has no Catalyst
spelling) but rows are independent — tables_to_chunks is a narrow
mapInPandas over the storage partitioning, no shuffle.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame


class _Cell:
    __slots__ = ("value_tokens", "nested_tables")

    def __init__(self):
        self.value_tokens: List[str] = []
        self.nested_tables: List["_Table"] = []


class _Row:
    __slots__ = ("cells",)

    def __init__(self):
        self.cells: List[_Cell] = []


class _Table:
    __slots__ = ("caption", "body")

    def __init__(self, caption: str = ""):
        self.caption = caption
        self.body: List[_Row] = []

    def to_dict(self) -> dict:
        return {
            "caption": self.caption,
            "rows": [
                {
                    "row": i,
                    "columns": [
                        {"col": j, "value": " ".join(c.value_tokens)}
                        for j, c in enumerate(r.cells)
                    ],
                }
                for i, r in enumerate(self.body)
            ],
        }


def parse_nq_tables(
    tokens: Sequence[str], is_html_mask: Sequence[bool], title: str
) -> List[dict]:
    """NQTableParser.parse (`biencoder_data.py:264-290`) as a pure
    function: token stream -> list of table dicts (nested tables are
    separate entries, captions chain parent caption | parent cell)."""
    all_tables: List[_Table] = []
    stack: List[_Table] = []
    current: Optional[_Table] = None

    for t, is_html in zip(tokens, is_html_mask):
        if not is_html:
            if current is None:
                continue  # stray content before any <Table>
            if current.body:
                row = current.body[-1]
                if row.cells:
                    row.cells[-1].value_tokens.append(t)
                    continue
            current.caption += " " + t
            continue
        if "<Table" in t:
            caption = title
            if current is not None:
                stack.append(current)
                caption = current.caption
                if current.body and current.body[-1].cells:
                    cell = current.body[-1].cells[-1]
                    caption += " | " + " ".join(cell.value_tokens)
            nt = _Table()
            nt.caption = caption
            current = nt
            all_tables.append(nt)
        elif t == "</Table>":
            if current is not None and stack:
                inner = current
                current = stack.pop()
                if current.body and current.body[-1].cells:
                    current.body[-1].cells[-1].nested_tables.append(inner)
        elif "<Tr" in t:
            if current is not None:
                current.body.append(_Row())
        elif "<Td" in t or "<Th" in t:
            if current is not None and current.body:
                current.body[-1].cells.append(_Cell())
        # closers </Tr> </Td> </Th> are no-ops, like the reference
    return [t.to_dict() for t in all_tables]


def linearize_row(row: dict):
    """`JsonLTablesQADataset._linearize_row` (`biencoder_data.py:555-559`):
    ', '-joined cell values + the summed whitespace word count."""
    values = [c["value"] for c in row["columns"]]
    total_words = sum(len(v.split(" ")) for v in values)
    return ", ".join(values), total_words


def split_table(table: dict, max_length: int) -> List[str]:
    """`JsonLTablesQADataset.split_table` (`biencoder_data.py:467-501`):
    header = first non-empty row, repeated at the top of every chunk;
    rows accumulate until max_length words, '\\n'-joined + trailing
    '\\n'."""
    rows = table["rows"]
    header = None
    header_len = 0
    start_row = 0
    for i, r in enumerate(rows):
        row_lin, row_len = linearize_row(r)
        if len(row_lin) > 1:
            header = row_lin
            header_len += row_len
            start_row = i
            break
    if header is None:
        return []
    chunks: List[str] = []
    current_rows = [header]
    current_len = header_len
    for i in range(start_row + 1, len(rows)):
        row_lin, row_len = linearize_row(rows[i])
        if len(row_lin) > 1:
            current_rows.append(row_lin)
            current_len += row_len
        if current_len >= max_length:
            chunks.append("\n".join(current_rows) + "\n")
            current_rows = [header]
            current_len = header_len
    if len(current_rows) > 1:
        chunks.append("\n".join(current_rows) + "\n")
    return chunks


TABLE_CHUNKS_SCHEMA = (
    "doc_id long, table_idx int, chunk_idx int, text string, title string"
)


def tables_to_chunks(df: DataFrame, max_table_len: int = 100) -> DataFrame:
    """df(doc_id, tokens array<string>, html_mask array<boolean>, title)
    -> one row per linearized chunk (`split_tables_to_chunks`,
    `biencoder_data.py:563-580`; title = the table's caption chain).
    Narrow mapInPandas — each document parses independently."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "table_idx", "chunk_idx", "text", "title")}
            for r in pdf.itertuples():
                tables = parse_nq_tables(list(r.tokens), list(r.html_mask), r.title)
                for ti, t in enumerate(tables):
                    for ci, chunk in enumerate(split_table(t, max_table_len)):
                        out["doc_id"].append(r.doc_id)
                        out["table_idx"].append(ti)
                        out["chunk_idx"].append(ci)
                        out["text"].append(chunk)
                        out["title"].append(t["caption"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "tokens", "html_mask", "title").mapInPandas(
        run, TABLE_CHUNKS_SCHEMA
    )
