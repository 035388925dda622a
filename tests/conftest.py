import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dpr_spark.session import get_spark

    s = get_spark("dpr_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from dpr_spark.fixtures.corpus import gen_pages_pdf

    return gen_pages_pdf(300, seed=42)


@pytest.fixture(scope="session")
def queries_pdf(pages_pdf):
    from dpr_spark.fixtures.corpus import gen_queries_pdf

    return gen_queries_pdf(pages_pdf, n_queries=40, seed=43)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf)


@pytest.fixture(scope="session")
def queries_df(spark, queries_pdf):
    return spark.createDataFrame(queries_pdf[["qid", "question"]])


@pytest.fixture(scope="session")
def oracle(pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.oracle.bm25 import BM25Oracle

    pw = assign_doc_ids(pages_pdf)
    o = BM25Oracle()
    for d, t in zip(pw.doc_id, pw.text):
        o.add(int(d), t)
    o.build()
    return o


@pytest.fixture(scope="session")
def index(spark, pages_df):
    from dpr_spark.index.build import build_index

    idx = build_index(spark, pages_df, build_blocks=True, verify_extract=True)
    idx.postings.persist().count()
    return idx
