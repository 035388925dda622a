"""robots.txt evaluation at corpus scale — RFC 9309 (the Robots
Exclusion Protocol, public spec) as a DataFrame join:

    urls ⋈ per-host rule groups -> allowed / matched rule per url

A crawl pipeline holds millions of parsed robots.txt files and needs
"may I fetch/keep this url?" for billions of urls. The spec's decision
procedure (RFC 9309 §2.2):

- pick the rule GROUP for the most specific matching user-agent (exact
  product token match, else the ``*`` group; no group -> allowed);
- within the group, the rule whose path pattern is the LONGEST match
  wins (octet length of the pattern); an allow and disallow of equal
  length -> allow wins;
- patterns are prefix matches with ``*`` (any run) and a trailing
  ``$`` (end anchor); no matching rule -> allowed.

Spark-first shape: patterns compile ONCE on the rules side to SQL LIKE
patterns (prefix match -> trailing ``%``; ``*`` -> ``%``; ``$`` drops
the trailing ``%``; literal ``%_\\`` escaped) — LIKE with a non-foldable
pattern runs JVM-side, so the urls×rules match is pure Catalyst with no
Python and no regex compilation per row. The join is host-keyed: urls
shuffle once on host (or the rules side broadcasts when tiny); the
longest-match/allow-wins pick is one window over matched rows. The
same LIKE compilation runs verbatim in DuckDB, so the oracle twin is
the identical decision procedure, not a reimplementation.

The reference has no crawler (its corpus is pre-fetched Wikipedia);
this is the ingestion gate a Common-Crawl-style pipeline applies before
the text ever reaches the index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def like_pattern(path_col: Column) -> Column:
    """Compile a robots.txt path pattern to a SQL LIKE pattern (shared
    Spark/DuckDB semantics): escape ``\\ % _``, map ``*`` -> ``%``, a
    trailing ``$`` anchors (no trailing ``%``), else prefix-match."""
    anchored = path_col.endswith("$")
    body = F.when(
        anchored, F.substring(path_col, F.lit(1), F.length(path_col) - 1)
    ).otherwise(path_col)
    esc = F.replace(body, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))


LIKE_PATTERN_SQL = (
    "CASE WHEN path LIKE '%$' THEN "
    "replace(replace(replace(replace("
    "substring(path, 1, length(path) - 1),"
    " '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') "
    "ELSE replace(replace(replace(replace(path,"
    " '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') || '%' END"
)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """urls(host, path, ...) × rules(host, agent, rule, path) ->
    urls columns + (allowed boolean, matched_rule, matched_path).

    rules: one row per Allow/Disallow line, ``rule`` in
    {"allow", "disallow"}, ``agent`` the group's user-agent token
    (lowercased; ``*`` for the catch-all group). Decision per RFC 9309:
    agent-specific group if the host has one, else ``*``; longest
    pattern wins; ties -> allow; no match / no group -> allowed."""
    a = agent.lower()
    r = rules.select(
        F.col("host").alias("_rhost"),
        F.lower(F.col("agent")).alias("_ragent"),
        F.lower(F.col("rule")).alias("_rule"),
        F.col("path").alias("_rpath"),
        like_pattern(F.col("path")).alias("_rlike"),
        F.length("path").alias("_rlen"),
    ).filter(F.col("_ragent").isin(a, "*"))
    # group selection: hosts with any agent-specific rule use ONLY that
    # group; others use the * group
    has_specific = (
        r.filter(F.col("_ragent") == a).select("_rhost").distinct()
        .withColumn("_specific", F.lit(True))
    )
    r = (
        r.join(has_specific, "_rhost", "left")
        .filter(
            F.when(F.coalesce("_specific", F.lit(False)), F.col("_ragent") == a)
            .otherwise(F.col("_ragent") == "*")
        )
        .drop("_specific", "_ragent")
    )
    u = urls.withColumn("_uid", F.monotonically_increasing_id())
    matched = u.join(
        r,
        (u[host_col] == r["_rhost"])
        & F.expr(f"{path_col} LIKE _rlike"),
        "left",
    )
    w = Window.partitionBy("_uid").orderBy(
        F.desc("_rlen"),
        F.desc(F.col("_rule") == "allow"),
        F.asc("_rpath"),
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *urls.columns,
            F.coalesce(F.col("_rule") != "disallow", F.lit(True)).alias(
                "allowed"
            ),
            F.col("_rule").alias("matched_rule"),
            F.col("_rpath").alias("matched_path"),
        )
    )
