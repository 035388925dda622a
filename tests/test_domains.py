"""Per-domain crawl operators: host extraction, URL canonicalization,
domain stats, and the skew-safe exact per-domain cap."""

import pandas as pd
from pyspark.sql import functions as F


def test_domain_of(spark):
    from dpr_spark.extras.domains import domain_of

    rows = [
        ("https://www.Example.COM/path?q=1", "example.com"),
        ("http://user:pw@sub.site.org:8080/x", "sub.site.org"),
        ("https://news.site.co.uk/a/b", "news.site.co.uk"),
        ("ftp://Mirror.Net", "mirror.net"),
        ("not a url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r[0] for r in df.select(domain_of(F.col("url"))).collect()]
    assert got == [d for _, d in rows]


def test_canonical_url(spark):
    from dpr_spark.extras.domains import canonical_url

    rows = [
        # host lowercased, path case kept
        ("HTTPS://Example.com/KeepCase?x=1", "https://example.com/KeepCase?x=1"),
        # default ports dropped; non-default kept
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:80/x", "http://a.com/x"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        # fragment gone
        ("https://a.com/p#sec", "https://a.com/p"),
        # tracking params removed, real ones kept
        ("https://a.com/p?utm_source=x&id=7&fbclid=zz", "https://a.com/p?id=7"),
        ("https://a.com/p?utm_campaign=x", "https://a.com/p"),
        ("https://a.com/p?gclid=1&utm_medium=m", "https://a.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [c for _, c in rows]


def test_per_domain_stats(spark):
    from dpr_spark.extras.domains import per_domain_stats

    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "xxxx"),
            ("https://www.a.com/2", "xx"),
            ("https://b.org/1", "xxx"),
        ],
        "url string, text string",
    )
    got = {r.domain: (r.n_pages, r.total_chars) for r in per_domain_stats(pages).collect()}
    assert got == {"a.com": (2, 6), "b.org": (1, 3)}


def _twin_cap(pdf, n):
    out = pdf.sort_values(["d", "len", "url"], ascending=[True, False, True])
    return set(out.groupby("d").head(n)["url"])


def test_cap_per_key_plain_equals_salted(spark):
    """The two-level salted cap returns EXACTLY the plain window's rows
    on a skewed key distribution (one hot domain, many cold)."""
    from dpr_spark.extras.domains import cap_per_key

    rows = []
    for i in range(200):  # hot domain
        rows.append((f"https://hot.com/{i:03d}", "hot.com", "y" * (i % 37 + 1)))
    for i in range(20):
        rows.append((f"https://cold{i}.net/x", f"cold{i}.net", "z" * (i + 1)))
    df = spark.createDataFrame(rows, "url string, d string, text string")
    order = [F.length("text").desc(), F.col("url").asc()]
    plain = {r.url for r in cap_per_key(df, ["d"], order, 7).collect()}
    salted = {r.url for r in cap_per_key(df, ["d"], order, 7, salt_buckets=8).collect()}
    assert plain == salted
    pdf = pd.DataFrame(
        [(u, d, len(t)) for u, d, t in rows], columns=["url", "d", "len"]
    )
    assert plain == _twin_cap(pdf, 7)
    # cold domains with < n rows keep everything
    assert sum(1 for u in plain if "cold" in u) == 20


def test_cap_per_domain_fixture(spark, pages_df):
    from dpr_spark.extras.domains import cap_per_domain, domain_of

    capped = cap_per_domain(pages_df, 3, salt_buckets=4)
    per = (
        capped.select(domain_of(F.col("url")).alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    assert all(r["count"] <= 3 for r in per)
    # deterministic: same rows on a second run
    again = cap_per_domain(pages_df, 3, salt_buckets=4)
    assert {r.url for r in capped.select("url").collect()} == {
        r.url for r in again.select("url").collect()
    }
