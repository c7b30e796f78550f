"""robots.txt parser + longest-match apply semantics (RFC 9309 subset,
functions/robots.py)."""

import pyspark.sql.functions as F

from html5ever_elixir_spark.functions.robots import (
    apply_robots,
    parse_robots_body,
    path_of,
    robots_rules,
)


def test_parse_groups_and_agent_selection():
    body = (
        "User-agent: BadBot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
    )
    assert parse_robots_body(body) == [
        (False, "/private"),
        (True, "/private/ok"),
    ]
    # the specific agent gets ITS group, not *'s
    assert parse_robots_body(body, agent="BadBot") == [(False, "/")]
    # unknown agent falls back to *
    assert parse_robots_body(body, agent="OtherBot") == [
        (False, "/private"),
        (True, "/private/ok"),
    ]


def test_parse_consecutive_agents_share_group():
    body = "User-agent: A\nUser-agent: B\nDisallow: /x\n"
    assert parse_robots_body(body, agent="B") == [(False, "/x")]
    assert parse_robots_body(body, agent="A") == [(False, "/x")]
    # no * group anywhere → unknown agent is unrestricted
    assert parse_robots_body(body, agent="C") == []


def test_parse_merges_same_agent_groups():
    body = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert parse_robots_body(body) == [(False, "/a"), (False, "/b")]


def test_parse_edge_cases():
    # empty value = no rule; comments stripped; case-insensitive keys;
    # unknown directives don't end the group; rules before any UA dropped
    body = (
        "Disallow: /orphan\n"
        "USER-AGENT: *\n"
        "disallow:\n"
        "Crawl-delay: 5\n"
        "DISALLOW: /secret # internal\n"
        "Sitemap: https://x.example/s.xml\n"
        "allow: /secret/pub\n"
    )
    assert parse_robots_body(body) == [(False, "/secret"), (True, "/secret/pub")]
    assert parse_robots_body("") == []
    assert parse_robots_body(None) == []


def test_apply_longest_match_allow_wins_ties(spark):
    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: *\nDisallow: /p\nAllow: /pq\nDisallow: /pq\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [("https://h.example/pq1",), ("https://h.example/pz",),
         ("https://h.example/ok",), ("https://other.example/p",)],
        "url string",
    ).withColumn("host", F.expr("parse_url(url, 'HOST')")).withColumn(
        "path", path_of(F.col("url"))
    )
    out = {r.url: (r.allowed, r.match_len)
           for r in apply_robots(urls, rules).collect()}
    # /pq1: Allow:/pq and Disallow:/pq tie at len 3 → allow wins
    assert out["https://h.example/pq1"] == (True, 3)
    assert out["https://h.example/pz"] == (False, 2)
    assert out["https://h.example/ok"] == (True, 0)  # no match → allowed
    assert out["https://other.example/p"] == (True, 0)  # no rules for host
