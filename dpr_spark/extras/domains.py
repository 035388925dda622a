"""Per-domain operators for a web-crawl corpus (url, warc_ts, html,
text, lang — BASELINE.json:input_hint).

A webtext training pipeline rations documents BY DOMAIN: a handful of
hosts contribute most of a crawl, and uncapped they dominate the
training mix (the C4/RefinedWeb-style per-host cap). Everything here is
Catalyst column math except the cap, which is a two-level exact top-N
built for the domain skew a window alone cannot survive.

No counterpart in the reference (DPR's corpus is pre-curated Wikipedia);
these extend the LLM-data-pipeline family (exact/MinHash/SimHash dedup,
ANN, text stats) that a 100 TB crawl needs before indexing/training.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme://host[:port]/...  -> host (captures up to the first /?#)
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def domain_of(url: Column) -> Column:
    """Registrable-host extraction, pure Catalyst: lowercase host, user
    credentials and port stripped, leading `www.` dropped. (True eTLD+1
    needs the public-suffix list — out of scope; `www.` covers the
    overwhelmingly common alias.)"""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^[^@]*@", "")  # user:pass@
    host = F.regexp_replace(host, r":\d+$", "")  # :8080
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-keyed dedup: lowercase scheme+host, default
    ports and fragments dropped, tracking query params (utm_*, gclid,
    fbclid) removed, trailing `?`/`&` tidied. Deterministic string
    rewriting only — layout-independent, safe as a dedup key at any
    scale."""
    # lowercase ONLY the scheme://host[:port] prefix, keep path case
    prefix = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(prefix, rest)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    # tracking params anywhere in the query string
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"[?&]+$", "")  # dangling separators
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&{2,}", "&")
    return u


def per_domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_pages, total_chars, avg_chars) — one map-side-combined
    aggregation; the usual first look at a crawl's host distribution."""
    return (
        pages.select(
            domain_of(F.col(url_col)).alias("domain"),
            F.length("text").alias("_chars"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("_chars").alias("total_chars"),
            F.round(F.avg("_chars"), 4).alias("avg_chars"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Exact top-N rows per key (the per-domain document cap).

    Plain form: one window `row_number() <= n` — every row of a key
    passes through ONE task's sort. A mega-domain (10^8 pages of one
    host in a 100 TB crawl) makes that task the straggler, so
    salt_buckets=S runs a TWO-LEVEL exact cap: top-N within each of S
    deterministic hash-salted sub-buckets (partitions bounded by
    rows/S), then the final top-N over the S·N survivors. The global
    top-N is contained in the union of per-salt top-Ns, so the result
    is EXACT — same rows as the plain window, provided `order_cols`
    gives a total order (tie-break on a unique column).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    if not salt_buckets:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )
    # salt from the whole row: deterministic and balanced even when a
    # single key dominates (the exact case the two-level form is for)
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    ws = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    pre = (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_salt")
    )
    return (
        pre.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def cap_per_domain(
    pages: DataFrame,
    n: int,
    url_col: str = "url",
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Keep at most n pages per domain, preferring longer documents
    (length desc, url asc tie-break — deterministic). The C4-style
    anti-boilerplate ration."""
    out = pages.withColumn("_domain", domain_of(F.col(url_col)))
    out = cap_per_key(
        out,
        ["_domain"],
        [F.length("text").desc(), F.col(url_col).asc()],
        n,
        salt_buckets=salt_buckets,
    )
    return out.drop("_domain")
