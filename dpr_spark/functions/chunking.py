"""T5: 100-word passage chunking — the reference corpus preprocessing
("splitting all pages into 100-word segments (no overlap)",
`/root/reference/dpr/data/download_data.py:31-36`; in-repo analog
`dpr/data/biencoder_data.py:467-501`, `:563-580`).

Pure Catalyst (split + sequence + slice + concat_ws — codegen, no UDF):
a page of W whitespace words becomes ceil(W/100) chunk rows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    max_words: int = 100,
) -> DataFrame:
    """-> (id_col, chunk_id int, chunk string, n_words int); chunk_id is
    0-based position within the source doc (stable, no window)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.ceil(n / F.lit(float(max_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(words, i * max_words + 1, max_words)).alias("chunk"),
        ),
    )
    out = df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
    )
    return out.withColumn("n_words", F.size(F.split(F.col("chunk"), " ")))


def chunk_sql(table: str, text_col: str = "text", id_col: str = "url", max_words: int = 100) -> str:
    """DuckDB twin of chunk_text for oracle checks."""
    return f"""
      WITH w AS (SELECT {id_col}, string_split({text_col}, ' ') AS words FROM {table}),
      c AS (SELECT {id_col}, i AS chunk_id,
                   array_to_string(words[i * {max_words} + 1 : (i + 1) * {max_words}], ' ') AS chunk
            FROM w, unnest(range(0, greatest(ceil(len(words) / {max_words}.0)::INT, 1))) AS u(i))
      SELECT {id_col}, chunk_id::INT AS chunk_id, chunk,
             len(string_split(chunk, ' '))::INT AS n_words
      FROM c"""


def shuffle_key(id_col, seed: int, portable: bool = False):
    """The K4 permutation key: a pure function of (id, seed). Default
    xxhash64 (fast, JVM-side); portable=True derives it from md5 so SQL
    engines can replay the identical permutation (the DuckDB oracle
    does)."""
    if isinstance(id_col, str):
        id_col = F.col(id_col)
    if not portable:
        return F.xxhash64(id_col, F.lit(seed))
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int, portable: bool = False
) -> DataFrame:
    """K4: seeded resumable shuffle (`dpr/utils/data_utils.py:271-278`
    uses random.Random(seed+epoch).shuffle) — Spark form: stable order by
    shuffle_key(id, seed); same seed -> same permutation on any cluster,
    any partitioning."""
    return df.orderBy(shuffle_key(id_col, seed, portable), F.col(id_col))


def weighted_interleave(dfs, rates, id_col: str, seed: int = 42) -> DataFrame:
    """D3 weighted multi-set interleave (`data_utils.py:342-451`
    MultiSetDataIterator with sampling_rates): per-epoch each source
    contributes ~rate fraction of its rows, union-interleaved. Selection
    is a pure function of (id, seed) — md5(id:seed) mod 10^6 under the
    rate threshold — so the same seed picks the same rows on any cluster,
    any partitioning, any row order (df.sample is partition-deterministic
    only: a repartition changes the picks; the K4 bar forbids that).
    No shuffle: the hash filter is partition-local."""
    out = None
    for i, (df, rate) in enumerate(zip(dfs, rates)):
        if rate >= 1.0:
            part = df
        else:
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col(id_col).cast("string"), F.lit(str(seed + i))
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            part = df.filter(h % F.lit(1_000_000) < F.lit(int(rate * 1_000_000)))
        out = part if out is None else out.unionByName(part)
    return out


def kilt_provenance_join(results: DataFrame, mapping: DataFrame) -> DataFrame:
    """J5: KILT provenance (`dpr/data/retriever_data.py:313-325`):
    doc_id -> (wikipedia_id, end_paragraph_id) broadcast map join."""
    return results.join(
        F.broadcast(mapping.select("doc_id", "wikipedia_id", "end_paragraph_id")),
        "doc_id",
        "left",
    )


def kilt_contains(text_col, answer_col):
    """V3: normalized substring containment (`qa_validation.py:288-294`)
    after the P9 answer-normalization chain."""
    from dpr_spark.functions.normalize import normalize_answer_col

    return F.contains(normalize_answer_col(text_col), normalize_answer_col(answer_col))
