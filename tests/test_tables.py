"""NQ table parsing + linearization (T6): hand-built token-stream
fixtures mirroring NQTableParser semantics
(`biencoder_data.py:252-337`, `:467-501`)."""


def _stream(*items):
    """items: (token, is_html) pairs."""
    return [t for t, _ in items], [m for _, m in items]


def _simple_table():
    return _stream(
        ("<Table>", True),
        ("intro", False),  # pre-row content -> caption
        ("<Tr>", True),
        ("<Td>", True), ("name", False), ("</Td>", True),
        ("<Td>", True), ("age", False), ("</Td>", True),
        ("</Tr>", True),
        ("<Tr>", True),
        ("<Td>", True), ("ada", False), ("lovelace", False), ("</Td>", True),
        ("<Td>", True), ("36", False), ("</Td>", True),
        ("</Tr>", True),
        ("</Table>", True),
    )


def test_parse_simple_table():
    from dpr_spark.functions.tables import parse_nq_tables

    toks, mask = _simple_table()
    tables = parse_nq_tables(toks, mask, "Page Title")
    assert len(tables) == 1
    t = tables[0]
    assert t["caption"] == "Page Title intro"
    assert [[c["value"] for c in r["columns"]] for r in t["rows"]] == [
        ["name", "age"],
        ["ada lovelace", "36"],
    ]


def test_parse_nested_table_caption_chain():
    from dpr_spark.functions.tables import parse_nq_tables

    toks, mask = _stream(
        ("<Table>", True),
        ("<Tr>", True),
        ("<Td>", True), ("outer", False), ("cell", False),
        ("<Table>", True),  # nested inside the cell
        ("<Tr>", True),
        ("<Td>", True), ("inner", False), ("</Td>", True),
        ("</Tr>", True),
        ("</Table>", True),
        ("</Td>", True),
        ("</Tr>", True),
        ("</Table>", True),
    )
    tables = parse_nq_tables(toks, mask, "T")
    assert len(tables) == 2
    outer, inner = tables
    assert inner["caption"] == "T | outer cell"
    assert inner["rows"][0]["columns"][0]["value"] == "inner"
    assert outer["rows"][0]["columns"][0]["value"] == "outer cell"


def test_split_table_header_repeat():
    from dpr_spark.functions.tables import split_table

    table = {
        "caption": "c",
        "rows": [
            {"row": 0, "columns": [{"col": 0, "value": "h1"}, {"col": 1, "value": "h2"}]},
        ]
        + [
            {"row": i, "columns": [{"col": 0, "value": f"a{i} b{i}"}]}
            for i in range(1, 7)
        ],
    }
    chunks = split_table(table, max_length=6)
    assert len(chunks) >= 2
    for c in chunks:
        assert c.startswith("h1, h2\n")  # header repeated per chunk
        assert c.endswith("\n")
    # every data row appears exactly once across chunks
    body = "".join(chunks)
    for i in range(1, 7):
        assert body.count(f"a{i} b{i}") == 1


def test_split_table_empty():
    from dpr_spark.functions.tables import split_table

    assert split_table({"caption": "c", "rows": []}, 10) == []
    assert (
        split_table({"caption": "c", "rows": [{"row": 0, "columns": [{"col": 0, "value": ""}]}]}, 10)
        == []
    )


def test_tables_to_chunks_spark(spark):
    from dpr_spark.functions.tables import tables_to_chunks

    toks, mask = _simple_table()
    df = spark.createDataFrame(
        [(7, toks, mask, "Page Title")],
        "doc_id long, tokens array<string>, html_mask array<boolean>, title string",
    )
    rows = tables_to_chunks(df, max_table_len=100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.table_idx, r.chunk_idx) == (7, 0, 0)
    assert r.text == "name, age\nada lovelace, 36\n"
    assert r.title == "Page Title intro"
