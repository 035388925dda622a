"""robots.txt evaluation (RFC 9309) vs a regex-based pure-Python twin
(dpr_spark/extras/robots.py)."""

import re

import pytest


def _twin_decide(rules, agent, host, path):
    """(allowed, matched_rule, matched_path) per RFC 9309: agent group
    else *, longest raw-pattern match wins, allow wins ties."""
    agent = agent.lower()
    mine = [
        (a.lower(), r.lower(), p)
        for h, a, r, p in rules
        if h == host and a.lower() in (agent, "*")
    ]
    groups = {a for a, _r, _p in mine}
    use = agent if agent in groups else "*"
    best = None
    for a, r, p in mine:
        if a != use:
            continue
        anchored = p.endswith("$")
        body = p[:-1] if anchored else p
        rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
        if anchored:
            rx += "$"
        if re.search(rx, path):
            key = (len(p), r == "allow", [-ord(c) for c in p])
            if best is None or key > best[0]:
                best = (key, r, p)
    if best is None:
        return True, None, None
    return best[1] != "disallow", best[1], best[2]


RULES = [
    # host, agent, rule, path
    ("a.com", "*", "disallow", "/"),
    ("a.com", "*", "allow", "/public*"),
    ("a.com", "*", "disallow", "/public/private"),
    ("a.com", "*", "disallow", "/*.pdf$"),
    ("b.com", "mybot", "disallow", "/only-mybot"),
    ("b.com", "*", "disallow", "/"),
    # equal-length allow/disallow tie -> allow
    ("c.com", "*", "allow", "/tie/x"),
    ("c.com", "*", "disallow", "/tie/y"),
    ("c.com", "*", "allow", "/dir/"),
    ("c.com", "*", "disallow", "/dir/"),
]

PATHS = [
    ("a.com", "/"),
    ("a.com", "/public/page"),
    ("a.com", "/public/private/x"),
    ("a.com", "/docs/file.pdf"),
    ("a.com", "/docs/file.pdfx"),
    ("a.com", "/axbyb.pdf"),
    ("b.com", "/only-mybot/sub"),
    ("b.com", "/anything"),
    ("c.com", "/tie/x"),
    ("c.com", "/dir/page"),
    ("d.com", "/no-rules-at-all"),
]


@pytest.mark.parametrize("agent", ["mybot", "otherbot"])
def test_robots_vs_twin(spark, agent):
    from dpr_spark.extras.robots import robots_allowed

    urls = spark.createDataFrame(
        [(i, h, p) for i, (h, p) in enumerate(PATHS)],
        "uid long, host string, path string",
    )
    rules = spark.createDataFrame(RULES, "host string, agent string, rule string, path string")
    got = {
        r.uid: (r.allowed, r.matched_rule, r.matched_path)
        for r in robots_allowed(urls, rules, agent).collect()
    }
    assert len(got) == len(PATHS)
    for i, (h, p) in enumerate(PATHS):
        assert got[i] == _twin_decide(RULES, agent, h, p), (agent, h, p)


def test_robots_spot_semantics(spark):
    """Pin the headline RFC behaviors explicitly (not just twin-equal)."""
    from dpr_spark.extras.robots import robots_allowed

    urls = spark.createDataFrame(
        [(i, h, p) for i, (h, p) in enumerate(PATHS)],
        "uid long, host string, path string",
    )
    rules = spark.createDataFrame(RULES, "host string, agent string, rule string, path string")
    got = {r.uid: r for r in robots_allowed(urls, rules, "mybot").collect()}
    # longest match: /public* (allow) beats / (disallow)
    assert got[1].allowed and got[1].matched_path == "/public*"
    # even longer disallow beats the allow
    assert not got[2].allowed and got[2].matched_path == "/public/private"
    # $ anchor blocks .pdf exactly; .pdfx only hits the generic "/"
    assert not got[3].allowed and got[3].matched_path == "/*.pdf$"
    assert not got[4].allowed and got[4].matched_path == "/"
    # LIKE semantics (not greedy-earliest): /axbyb.pdf must match /*.pdf$
    assert not got[5].allowed
    # agent-specific group REPLACES * for that host
    assert not got[6].allowed and got[6].matched_path == "/only-mybot"
    assert got[7].allowed and got[7].matched_rule is None
    # equal-length tie -> allow
    assert got[9].allowed and got[9].matched_rule == "allow"
    # no rules for host -> allowed, no match columns
    assert got[10].allowed and got[10].matched_rule is None


# --------------------------- property test ---------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SEGS = ["", "a", "bb", "c1", "*", "x*y", "*.pdf"]

pattern_strategy = st.builds(
    lambda segs, anchor: "/" + "/".join(segs) + ("$" if anchor else ""),
    st.lists(st.sampled_from(_SEGS), min_size=0, max_size=3),
    st.booleans(),
)
path_strategy = st.builds(
    lambda segs: "/" + "/".join(segs),
    st.lists(st.sampled_from(["a", "bb", "c1", "xzy", "b.pdf"]),
             min_size=0, max_size=4),
)
rule_strategy = st.tuples(
    st.sampled_from(["h1", "h2"]),
    st.sampled_from(["*", "mybot"]),
    st.sampled_from(["allow", "disallow"]),
    pattern_strategy,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rules=st.lists(rule_strategy, min_size=0, max_size=8),
    paths=st.lists(
        st.tuples(st.sampled_from(["h1", "h2", "h3"]), path_strategy),
        min_size=1,
        max_size=8,
    ),
    agent=st.sampled_from(["mybot", "other"]),
)
def test_robots_property_vs_twin(spark, rules, paths, agent):
    from dpr_spark.extras.robots import robots_allowed

    urls = spark.createDataFrame(
        [(i, h, p) for i, (h, p) in enumerate(paths)],
        "uid long, host string, path string",
    )
    if rules:
        rules_df = spark.createDataFrame(
            rules, "host string, agent string, rule string, path string"
        )
    else:
        rules_df = spark.createDataFrame(
            [], "host string, agent string, rule string, path string"
        )
    got = {
        r.uid: r.allowed for r in robots_allowed(urls, rules_df, agent).collect()
    }
    assert len(got) == len(paths)
    for i, (h, p) in enumerate(paths):
        want_allowed, _r, _p = _twin_decide(rules, agent, h, p)
        assert got[i] == want_allowed, (h, p, rules)
