"""Source scans S1-S4 (SURVEY.md §2.1) — the reference's ingest formats
re-expressed as Spark readers with explicit schemas (never inferred;
the reference is fixed-positional, `retriever_data.py:253-267`).
"""

from __future__ import annotations

import ast

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dpr_spark.functions.normalize import normalize_passage_col

PASSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

QA_SCHEMA = T.StructType(
    [
        T.StructField("question", T.StringType()),
        T.StructField("answers_raw", T.StringType()),
    ]
)


def read_passages_tsv(
    spark: SparkSession,
    path: str,
    id_prefix: str | None = None,
    normalize: bool = False,
) -> DataFrame:
    """S1: CsvCtxSrc (`retriever_data.py:253-287`) — tab-separated
    id/text/title with a header row 'id' (P1), optional id prefix (P2),
    quote strip (P3) and passage normalization (P4)."""
    df = spark.read.csv(path, sep="\t", header=True, schema=PASSAGE_SCHEMA, quote="")
    df = df.filter(F.col("id") != "id")  # P1 belt-and-braces like the ref
    text = F.regexp_replace(F.regexp_replace(F.col("text"), '^"', ""), '"$', "")  # P3
    df = df.withColumn("text", text)
    if normalize:
        df = df.withColumn("text", normalize_passage_col(F.col("text")))  # P4
    if id_prefix:
        df = df.withColumn("id", F.concat(F.lit(id_prefix), F.col("id")))  # P2
    return df


def read_qa_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S2: CsvQASrc (`retriever_data.py:99-124`) — question \\t answers
    where answers is a PYTHON-literal list (the reference eval()s it;
    we parse the same surface safely: single-quoted python repr ->
    JSON -> array<string>).

    The python-literal -> JSON rewrite handles the repr() forms our
    fixture writer (and DPR's datasets) emit: single quotes with
    backslash-escaped quotes/backslashes inside.
    """
    df = spark.read.csv(path, sep="\t", schema=QA_SCHEMA, quote="")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _parse(ans: pd.Series) -> pd.Series:
        return ans.map(lambda s: list(ast.literal_eval(s)) if s else [])

    return (
        df.withColumn("answers", _parse(F.col("answers_raw")))
        .withColumn("qid", F.monotonically_increasing_id())
        .select("qid", "question", "answers")
    )


def read_json_dataset(spark: SparkSession, *paths: str) -> DataFrame:
    """S3: whole-file JSON arrays (`data_utils.py:41-49`) — multiLine."""
    return spark.read.json(list(paths), multiLine=True)


def read_jsonl_dataset(spark: SparkSession, *paths: str, renames: dict | None = None) -> DataFrame:
    """S4: JSONL (`data_utils.py:52-60`; attr remapping
    `retriever_data.py:143-154`)."""
    df = spark.read.json(list(paths))
    for old, new in (renames or {}).items():
        df = df.withColumnRenamed(old, new)
    return df


def union_sources(*dfs: DataFrame) -> DataFrame:
    """J7: multi-source ctx union (`dense_retriever.py:461-469`)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
