"""Web-corpus cleaning operators for LLM training-data pipelines:
Gopher-style intra-document repetition statistics, benchmark n-gram
decontamination, PII redaction, URL canonicalization with latest-wins
dedup, and cross-document boilerplate-line stripping.

All five are Spark-first designs for the 100 TB case:

- `repetition_stats` is PURE per-row column math (array sort + one
  Catalyst fold per metric) — zero shuffle, scans the corpus once, and
  whole-stage-codegens; the Gopher paper (Rae et al. 2021, §A1.1)
  computes the same duplicate-line / duplicate-paragraph / top-n-gram
  character fractions with a per-document pass.
- `ngram_decontaminate` broadcasts the benchmark side (benchmark suites
  are tiny next to the corpus) and makes ONE pass over corpus n-grams;
  the corpus side never shuffles raw text, only (doc, gram-hash) pairs
  when `join_on="hash"`.
- `pii_redact` is per-row `regexp_replace` / `regexp_extract_all`
  (JVM codegen; regexes restricted to the Java∩RE2 dialect so DuckDB
  oracles can twin them).
- `canonical_url` is a per-row expression; `latest_by_canonical_url`
  shuffles once on the canonical key with a map-side-combining
  `max_by` (same plan family as plans/latest.py).
- `strip_boilerplate` shuffles (group, line-hash) pairs — never the
  64-bit-hashed line text on the counting side — then a co-partitioned
  join back; the reassembly is a single groupBy with an array fold.

Reference parity: the reference cleans its corpora offline (DPR's
wiki split preprocessing, `/root/reference/dpr/data/retriever_data.py`
normalizes and filters rows at load); these operators are the
corpus-scale generalization a web crawl needs before indexing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import tokenize_col

# ---------------------------------------------------------------------------
# Gopher repetition statistics
# ---------------------------------------------------------------------------


def _dup_group_stats(sorted_arr: Column) -> Column:
    """Fold a SORTED string array into struct(dupn, dupc): the number of
    elements belonging to groups of size >1 and the character count of
    those elements (each occurrence counts its own length)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dupn"),
        F.lit(0).cast("long").alias("dupc"),
    )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        close_n = F.when(acc["run"] > 1, acc["dupn"] + acc["run"]).otherwise(acc["dupn"])
        close_c = F.when(
            acc["run"] > 1, acc["dupc"] + acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["dupc"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["dupn"]).otherwise(close_n).alias("dupn"),
            F.when(same, acc["dupc"]).otherwise(close_c).alias("dupc"),
        )

    def finish(acc):
        return F.struct(
            F.when(acc["run"] > 1, acc["dupn"] + acc["run"]).otherwise(acc["dupn"]).alias("dupn"),
            F.when(acc["run"] > 1, acc["dupc"] + acc["run"] * F.length(acc["prev"]))
            .otherwise(acc["dupc"])
            .alias("dupc"),
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def _top_group_stats(sorted_arr: Column) -> Column:
    """Fold a SORTED string array into struct(best, blen): occurrence
    count and character length of the most frequent element (ties break
    to the longer element, then the lexicographically first — the tie
    key never changes the count*len product, but keeps the fold
    deterministic)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("blen"),
    )

    def _better(acc):
        return acc["prev"].isNotNull() & (
            (acc["run"] > acc["best"])
            | ((acc["run"] == acc["best"]) & (F.length(acc["prev"]) > acc["blen"]))
        )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        better = _better(acc)
        close_best = F.when(better, acc["run"]).otherwise(acc["best"])
        close_blen = F.when(better, F.length(acc["prev"])).otherwise(acc["blen"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["best"]).otherwise(close_best).alias("best"),
            F.when(same, acc["blen"]).otherwise(close_blen).alias("blen"),
        )

    def finish(acc):
        better = _better(acc)
        return F.struct(
            F.when(better, acc["run"]).otherwise(acc["best"]).alias("best"),
            F.when(better, F.length(acc["prev"])).otherwise(acc["blen"]).alias("blen"),
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def _grams(toks: Column, n: int) -> Column:
    """Space-joined n-grams of a token array (empty when len(toks)<n)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (2, 3),
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style intra-document repetition metrics (Rae et al. 2021
    §A1.1), one row per document, all computed per-row with NO shuffle:

    - n_lines, dup_line_frac, dup_line_char_frac: lines = text split on
      `line_sep`; a line is "duplicate" when it occurs more than once in
      the document (every occurrence counts); char fractions are over
      the summed line lengths.
    - top{n}gram_char_frac (n in top_ns): occurrences of the single most
      frequent token n-gram × the n-gram's character length, over the
      character length of the space-joined token stream. Overlapping
      occurrences count, so the fraction can exceed 1 on degenerate
      repetition — exactly the signal the filter thresholds on.
    - dup{n}gram_char_frac (n in dup_ns): same denominator, numerator =
      characters of ALL n-gram occurrences whose gram occurs >1 time.
    """
    # integer stats come from ONE Arrow pass (functions/ngrams_fast.py
    # repstat_rows — the pure-Catalyst fold re-built and sorted every
    # gram array per row in interpreted HOF eval); every division and
    # round() below stays in Spark, so the output doubles are
    # bit-identical to the previous formulation
    from dpr_spark.functions.ngrams_fast import repstat_rows

    gram_ns = sorted(set(top_ns) | set(dup_ns))
    d = repstat_rows(
        df, gram_ns, id_col=id_col, text_col=text_col, line_sep=line_sep
    )
    cols = [
        F.col("doc"),
        F.col("n_lines"),
        F.round(
            F.col("line_dupn") / F.greatest(F.col("n_lines"), F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.col("line_dupc") / F.greatest(F.col("line_chars"), F.lit(1)), 6
        ).alias("dup_line_char_frac"),
    ]
    denom = F.greatest(F.col("tok_chars"), F.lit(1))
    for n in top_ns:
        cols.append(
            F.round(
                (F.col(f"top{n}_best") * F.col(f"top{n}_blen")) / denom, 6
            ).alias(f"top{n}gram_char_frac")
        )
    for n in dup_ns:
        cols.append(
            F.round(F.col(f"dup{n}_dupc") / denom, 6).alias(f"dup{n}gram_char_frac")
        )
    return d.select(*cols)


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "‣", "▪", "-", "*")


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_word_hits: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher non-repetition quality rules (Rae et al. 2021 §A1.1 —
    MassiveText filtering; the repetition half is `repetition_stats`).
    One row per document with the raw metrics, one boolean per rule,
    and `gopher_pass` = AND of all rules. Default thresholds are the
    paper's. Pure per-row Catalyst column math — zero shuffle, one
    corpus scan, whole-stage-codegen — so at 100 TB the filter costs
    exactly one pass over the pages it reads.

    Word = whitespace-delimited run (the paper's notion, punctuation
    attached); metric definitions:
    - n_words in [min_words, max_words]
    - mean_word_len in [min_mean_word_len, max_mean_word_len]
    - symbol_word_ratio: (count '#' + count ellipsis '…'/'...') /
      n_words <= max_symbol_word_ratio
    - bullet_line_frac: lines whose lstrip starts with a bullet glyph
      (• ‣ ▪ - *) <= max_bullet_line_frac of lines
    - ellipsis_line_frac: lines whose rstrip ends with '…' or '...'
      <= max_ellipsis_line_frac
    - alpha_word_frac: words containing >=1 [a-zA-Z] >=
      min_alpha_word_frac
    - stop_word_hits: distinct members of the paper's 8-word stop set
      present (lowercased word match) >= min_stop_word_hits
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    lines = F.split(F.col(text_col), line_sep)
    # two-step select: ws/ls once per row, then the derived arrays the
    # metrics reference repeatedly (lowercased words feed the stop-word
    # lambda 8x per row; the re-joined text feeds 4 length probes) are
    # ALSO named columns so they evaluate once per row, not per use
    d = df.select(
        F.col(id_col).alias("doc"), words.alias("ws"), lines.alias("ls")
    ).select(
        "doc",
        "ws",
        "ls",
        F.transform("ws", F.lower).alias("_lws"),
        F.concat_ws(" ", F.col("ws")).alias("_tc"),
    )
    n_words = F.size("ws").cast("long")
    word_chars = F.aggregate(
        "ws", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = word_chars / F.greatest(n_words, F.lit(1)).cast("double")
    n_hash = F.aggregate(
        "ws",
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w) - F.length(F.replace(w, F.lit("#"))),
    )
    # ellipses: unicode '…' anywhere + literal '...' runs (count
    # non-overlapping '...' occurrences via length arithmetic)
    text_c = F.col("_tc")
    n_uni_ell = F.length(text_c) - F.length(F.replace(text_c, F.lit("…")))
    n_dot_ell = (
        F.length(text_c) - F.length(F.regexp_replace(text_c, r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_uni_ell + n_dot_ell) / F.greatest(
        n_words, F.lit(1)
    ).cast("double")
    bullet_rx = "^[•‣▪*-]"
    n_bullet = F.size(
        F.filter("ls", lambda l: F.ltrim(l).rlike(bullet_rx))
    ).cast("long")
    n_ell_end = F.size(
        F.filter(
            "ls",
            lambda l: F.rtrim(l).endswith("…") | F.rtrim(l).endswith("..."),
        )
    ).cast("long")
    n_lines = F.greatest(F.size("ls"), F.lit(1)).cast("double")
    n_alpha = F.size(
        F.filter("ws", lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    alpha_frac = n_alpha / F.greatest(n_words, F.lit(1)).cast("double")
    lower_ws = F.col("_lws")
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
            lambda s: F.array_contains(lower_ws, s),
        )
    ).cast("long")
    m = d.select(
        "doc",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(n_bullet / n_lines, 6).alias("bullet_line_frac"),
        F.round(n_ell_end / n_lines, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_word_hits"),
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "rule_bullet_lines": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "rule_ellipsis_lines": F.col("ellipsis_line_frac")
        <= max_ellipsis_line_frac,
        "rule_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "rule_stop_words": F.col("stop_word_hits") >= min_stop_word_hits,
    }
    out = m
    passing = None
    for name, c in rules.items():
        out = out.withColumn(name, c)
        passing = c if passing is None else (passing & c)
    return out.withColumn("gopher_pass", passing)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    badwords: Sequence[str] = (),
    line_sep: str = "\n",
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the "Colossal
    Clean Crawled Corpus" rules), one row per document, pure per-row
    Catalyst column math (zero shuffle, one corpus scan):

    - line filter: keep only lines that end in terminal punctuation
      (. ! ? ") after rtrim AND contain >= min_line_words
      whitespace-words; `clean_text` = kept lines re-joined in order.
    - n_sentences: terminal-punctuation marks ([.!?]) in the KEPT text
      (the paper's sentence heuristic); rule_min_sentences compares to
      min_sentences.
    - rule_no_lorem_ipsum: the ORIGINAL text (lowercased) does not
      contain "lorem ipsum"; rule_no_brace: it does not contain "{"
      (the paper drops code-looking pages).
    - rule_no_badword: no lowercased word of the original text is in
      `badwords` (the paper uses a public blocklist; parameterized
      here, empty default = rule passes).
    - c4_keep = AND of the four rules.

    The paper's fourth stage (three-sentence-span dedup across the
    corpus) is the separate `dup_span_strip` operator."""
    lines = F.split(F.col(text_col), line_sep)
    line_words = lambda l: F.size(  # noqa: E731
        F.filter(F.split(l, r"\s+"), lambda w: w != "")
    )
    keep_line = lambda l: F.rtrim(l).rlike('[.!?"]$') & (  # noqa: E731
        line_words(l) >= min_line_words
    )
    # two-step select: the kept-lines filter, the re-joined clean text
    # and the lowercased text each feed several downstream metrics —
    # named columns evaluate them once per row instead of once per use
    d = df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_t"), lines.alias("ls")
    ).select(
        "doc",
        "_t",
        "ls",
        F.filter("ls", keep_line).alias("_kept"),
        F.lower(F.col("_t")).alias("_low"),
    )
    kept = F.col("_kept")
    clean_text = F.concat_ws(line_sep, kept)
    n_sent = (
        F.length(clean_text)
        - F.length(F.regexp_replace(clean_text, r"[.!?]", ""))
    ).cast("long")
    low = F.col("_low")
    words_low = F.filter(F.split(low, r"\s+"), lambda w: w != "")
    if badwords:
        bad = F.arrays_overlap(
            words_low, F.array(*[F.lit(b.lower()) for b in badwords])
        )
    else:
        bad = F.lit(False)
    out = d.select(
        "doc",
        clean_text.alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.size("ls").cast("long").alias("n_lines"),
        n_sent.alias("n_sentences"),
        (n_sent >= min_sentences).alias("rule_min_sentences"),
        (~low.contains("lorem ipsum")).alias("rule_no_lorem_ipsum"),
        (~low.contains("{")).alias("rule_no_brace"),
        (~bad).alias("rule_no_badword"),
    )
    return out.withColumn(
        "c4_keep",
        F.col("rule_min_sentences")
        & F.col("rule_no_lorem_ipsum")
        & F.col("rule_no_brace")
        & F.col("rule_no_badword"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_col: str = "gram",
    join_on: str = "hash",
) -> DataFrame:
    """Benchmark decontamination: (doc, n_hits) for every document whose
    token stream contains at least one of the benchmark's n-grams
    (n_hits = DISTINCT benchmark grams present; the GPT-3/PaLM-style
    13-gram overlap rule). `bench[gram_col]` holds space-joined n-grams.

    Scale shape: the benchmark side is tiny (test suites, not corpora)
    and broadcasts; the corpus is scanned once; with join_on="hash" the
    join carries only 64-bit gram hashes, never gram text (a hash
    collision can only ADD a spurious flag — fail-closed for
    decontamination). join_on="text" gives the exact contract the
    DuckDB oracle twins.
    """
    # tokens into a NAMED column first: the tokenizer expression inside
    # _grams' transform() lambda re-runs per array element otherwise
    # (interpreted HOF eval; measured 10x on the n-gram shape)
    # vectorized Arrow n-gram kernel (functions/ngrams_fast.py): same
    # (doc, gram) rows as the interpreted transform/concat_ws shape,
    # built with two pyarrow C calls per batch instead of per-element
    # interpreted eval
    from dpr_spark.functions.ngrams_fast import ngram_rows

    dg = ngram_rows(
        docs, n, id_col=id_col, text_col=text_col,
        lowercase_first=True, mode="full",
    )
    bg = bench.select(F.col(gram_col).alias("gram")).distinct()
    if join_on == "hash":
        dg = dg.select("doc", F.xxhash64("gram").alias("gk"))
        bg = bg.select(F.xxhash64("gram").alias("gk"))
        key = "gk"
    else:
        key = "gram"
    # broadcast-filter FIRST, dedup the (tiny) survivor set after: the
    # former (doc, gram).distinct() before the join shuffled EVERY n-gram
    # string of every document; the benchmark probe drops ~all of them
    # map-side, so countDistinct over the survivors computes the same
    # n_hits with a match-sized shuffle (guide §2.3 "aggregate before
    # you shuffle" / §3.2 pre-filtering).
    hits = dg.join(F.broadcast(bg), key)
    return hits.groupBy("doc").agg(
        F.countDistinct(key).cast("long").alias("n_hits")
    )


def decontaminated(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_col: str = "gram",
) -> DataFrame:
    """The clean split: documents with NO benchmark n-gram overlap."""
    flagged = ngram_decontaminate(
        docs, bench, n=n, text_col=text_col, id_col=id_col, gram_col=gram_col
    ).select(F.col("doc").alias(id_col))
    return docs.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact-substring (duplicated-span) stripping
# ---------------------------------------------------------------------------


def dup_span_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring dedup in the Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better") family: a token is
    COVERED when some k-token window containing it occurs in ≥ min_docs
    distinct documents; covered spans are stripped from EVERY occurrence
    (the memorization-kill contract — keeping one canonical copy is the
    document-level dedup family's job, extras/dedup.py). Returns
    (doc, n_tokens, n_covered, dup_span_frac, clean_text).

    Scale shape (vs the paper's suffix array, which needs the corpus in
    one address space): k-gram occurrence rows carry (doc, start,
    xxhash64(gram)) — 24 bytes, never gram text; the hot-gram aggregate
    and the semi-join back are both keyed on the 8-byte hash (a
    collision can only over-strip, fail-closed like decontamination);
    per-doc coverage is a row-local fold over the doc's own duplicated
    starts (usually few), so nothing quadratic leaves a row."""
    toks = tokenize_col(text_col, lowercase_first=True)
    d = df.select(F.col(id_col).alias("doc"), toks.alias("toks"))
    g = d.select(
        "doc",
        F.explode(
            F.when(
                F.size("toks") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - k),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.xxhash64(F.concat_ws(" ", F.slice("toks", i + 1, k))).alias(
                            "gh"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<s:int,gh:long>>"))
        ).alias("sg"),
    ).select("doc", F.col("sg.s").alias("s"), F.col("sg.gh").alias("gh"))
    hot = (
        g.groupBy("gh")
        .agg(F.count_distinct("doc").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )
    starts = (
        g.join(hot, "gh", "left_semi")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list("s")).alias("starts"))
    )
    joined = d.join(starts, "doc", "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    covered = F.filter(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda i: (F.size("toks") > 0)
        & F.exists("starts", lambda s: (s <= i) & (i < s + k)),
    )
    kept = F.filter(
        "toks",
        lambda t, i: ~F.exists("starts", lambda s: (s <= i) & (i < s + k)),
    )
    return joined.select(
        "doc",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(covered).cast("long").alias("n_covered"),
        F.round(
            F.size(covered) / F.greatest(F.size("toks"), F.lit(1)), 6
        ).alias("dup_span_frac"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Java∩RE2 dialect only (no lookaround) so DuckDB oracles can twin them.
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RX = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, n_email, n_ip, n_phone, redacted): count then mask emails,
    IPv4 addresses and phone-shaped numbers with typed placeholders.
    Counts come from the ORIGINAL text; masking applies email → ip →
    phone in that order (the patterns are disjoint on well-formed text;
    the order pins behavior when they are not). Pure per-row regexp
    column math — no shuffle, no UDF."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RX), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(IPV4_RX), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(t, F.lit(PHONE_RX), F.lit(0)))
    red = F.regexp_replace(t, EMAIL_RX, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RX, "<IP>")
    red = F.regexp_replace(red, PHONE_RX, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc"),
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ip"),
        n_phone.cast("long").alias("n_phone"),
        red.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + latest-wins
# ---------------------------------------------------------------------------

_TRACKING_RX = r"(utm_[a-z0-9]+|fbclid|gclid)=[^&#]*&?"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL, as a per-row expression: lowercase, drop
    fragment, scheme and leading www., strip tracking params
    (utm_*/fbclid/gclid), tidy dangling ?/&, drop trailing slashes.
    Every regex is in the Java∩RE2 shared dialect (oracle-portable,
    unlike extras/domains.py's lookahead-using canonical_url)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, _TRACKING_RX, "")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


def latest_by_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Latest-wins per CANONICAL url: one `max_by` aggregation keyed on
    the canonical form (map-side combining collapse — same shuffle
    shape as plans/latest.py; never a window over every version).
    Ties on ts break to the larger kept tuple (max_by on a (ts, cols)
    struct), keeping the operator deterministic."""
    keep = list(keep_cols)
    packed = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in keep])
    out = (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"), packed.alias("p"))
        .groupBy("canonical_url")
        .agg(F.max("p").alias("p"))
    )
    cols = [F.col("canonical_url"), F.col("p.ts").alias(ts_col)]
    cols += [F.col(f"p.{c}").alias(c) for c in keep]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# boilerplate-line stripping
# ---------------------------------------------------------------------------


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    min_docs: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Strip boilerplate lines — lines occurring in ≥ min_docs DISTINCT
    documents of the same group (site headers/footers/nav) — and
    reassemble the cleaned text preserving line order. Returns
    (doc, group, n_lines, n_removed, clean_text).

    Scale shape: the counting aggregation shuffles (group, xxhash64(line))
    — 12-byte keys, never line text; the flagging join back onto the
    exploded lines co-partitions on the same key. A 64-bit hash collision
    could strip one extra line per colliding pair — acceptable for a
    cleaning op and documented here (the oracle twins the text-keyed
    contract, identical in the collision-free regime)."""
    lines = df.select(
        F.col(id_col).alias("doc"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    boiler = (
        lines.groupBy("grp", "lh")
        .agg(F.count_distinct("doc").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("grp", "lh", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(boiler, ["grp", "lh"], "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False))
    )
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("line"), F.col("is_boiler")))
    )
    return (
        flagged.groupBy("doc", "grp")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("is_boiler").cast("long")).alias("n_removed"),
            packed.alias("packed"),
        )
        .select(
            "doc",
            F.col("grp").alias(group_col),
            "n_lines",
            "n_removed",
            F.concat_ws(
                line_sep,
                F.transform(
                    F.filter("packed", lambda s: ~s["is_boiler"]),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
    )
