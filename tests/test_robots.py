"""robots.txt parse + decision semantics (operators/robots.py) — RFC
9309 group rules, longest-match decision, Allow-wins ties."""

from dss_plugin_nlp_analysis_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)

BODY = (
    "# top comment\n"
    "User-Agent: *\n"
    "Disallow: /private # trailing comment\n"
    "Allow: /private/ok\n"
    "Disallow:\n"                      # empty value → no rule
    "User-agent: evilbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: other\n"
    "User-agent: *\n"                  # multi-UA group incl. *
    "Allow: /shared\n"
)


def _rules(spark):
    df = spark.createDataFrame([("h1", BODY)], "host string, body string")
    return parse_robots(df)


def test_parse_star_groups_only(spark):
    rules = {(r["rule_path"], r["allow"]) for r in _rules(spark).collect()}
    assert rules == {
        ("/private", False),
        ("/private/ok", True),
        ("/shared", True),
    }


def test_decision_longest_match_and_default_allow(spark):
    urls = spark.createDataFrame(
        [
            ("http://h1/private/ok/page",),
            ("http://h1/private/secret",),
            ("http://h1/shared/x",),
            ("http://h1/other",),
            ("http://h1",),                 # empty path → '/'
            ("http://unknown.example/a",),  # host with no rules
        ],
        "url string",
    )
    out = {r["url"]: r for r in robots_allowed(urls, _rules(spark)).collect()}
    assert out["http://h1/private/ok/page"]["allowed"] is True
    assert out["http://h1/private/ok/page"]["rule_path"] == "/private/ok"
    assert out["http://h1/private/secret"]["allowed"] is False
    assert out["http://h1/private/secret"]["rule_path"] == "/private"
    assert out["http://h1/shared/x"]["allowed"] is True
    assert out["http://h1/other"]["allowed"] is True
    assert out["http://h1/other"]["rule_path"] is None
    assert out["http://h1"]["path"] == "/"
    assert out["http://unknown.example/a"]["allowed"] is True


def test_tie_allow_wins(spark):
    df = spark.createDataFrame(
        [("h2", "User-agent: *\nDisallow: /p\nAllow: /p\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame([("http://h2/p/x",)], "url string")
    row = robots_allowed(urls, parse_robots(df)).collect()[0]
    assert row["allowed"] is True and row["rule_path"] == "/p"


def test_rules_before_any_group_ignored(spark):
    df = spark.createDataFrame(
        [("h3", "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n")],
        "host string, body string",
    )
    rules = {r["rule_path"] for r in parse_robots(df).collect()}
    assert rules == {"/x"}
