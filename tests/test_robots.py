"""Differential tests: robots parser vs stdlib urllib.robotparser.

The reference vendors CPython's RobotFileParser (darc/_robotparser.py),
so stdlib IS the semantic oracle.
"""

from __future__ import annotations

import urllib.robotparser

import pandas as pd
import pytest

from darc_spark.functions.robots import can_fetch_batch, parse_robots, robots_rules_rows

ROBOTS_CASES = [
    # (robots_txt, [(agent, url, path)])
    (
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok.html\n",
        "darc",
        ["/", "/private/x", "/private/ok.html", "/public"],
    ),
    (
        "User-agent: *\nAllow: /private/ok.html\nDisallow: /private/\n",
        "darc",
        ["/private/x", "/private/ok.html", "/private/ok.html?q=1"],
    ),
    ("User-agent: *\nDisallow: /\n", "darc", ["/", "/x", "/a/b"]),
    ("User-agent: *\nDisallow:\n", "darc", ["/x", "/a/b"]),
    ("", "darc", ["/x"]),
    (
        "User-agent: googlebot\nDisallow: /g/\n\nUser-agent: *\nDisallow: /all/\n",
        "googlebot",
        ["/g/x", "/all/x", "/y"],
    ),
    (
        "User-agent: googlebot\nDisallow: /g/\n\nUser-agent: *\nDisallow: /all/\n",
        "otherbot",
        ["/g/x", "/all/x", "/y"],
    ),
    (
        "# comment\nUser-agent: * # trailing\nDisallow: /a # path comment\n",
        "darc",
        ["/a", "/ab", "/b"],
    ),
    (
        "User-agent: *\nCrawl-delay: 5\nRequest-rate: 3/15\nDisallow: /slow/\n",
        "darc",
        ["/slow/x", "/fast"],
    ),
    (
        "User-agent: a\nUser-agent: b\nDisallow: /ab/\n",
        "b/1.0",
        ["/ab/x", "/c"],
    ),
    (
        "User-agent: *\nDisallow: /%7Ejoe/\n",
        "darc",
        ["/~joe/x", "/%7Ejoe/y", "/other"],
    ),
    (
        "User-agent: *\nDisallow: /a\nDisallow: /b\nAllow: /b/ok\n",
        "darc",
        ["/a", "/b/ok", "/b/no"],
    ),
    # no blank line between entries — UA line resets
    (
        "User-agent: x\nDisallow: /x/\nUser-agent: *\nDisallow: /star/\n",
        "x",
        ["/x/1", "/star/1", "/free"],
    ),
]


def _stdlib(robots_txt: str) -> urllib.robotparser.RobotFileParser:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(robots_txt.splitlines())
    return rp


@pytest.mark.parametrize("robots_txt,agent,paths", ROBOTS_CASES)
def test_can_fetch_matches_stdlib(robots_txt, agent, paths):
    rp = _stdlib(robots_txt)
    pol = parse_robots(robots_txt)
    for path in paths:
        url = f"http://h.example{path}"
        assert pol.can_fetch(agent, url) == rp.can_fetch(agent, url), (
            robots_txt,
            agent,
            path,
        )


def test_crawl_delay_and_rate():
    txt = "User-agent: *\nCrawl-delay: 7\nRequest-rate: 3/15\nDisallow: /x/\n"
    rp = _stdlib(txt)
    pol = parse_robots(txt)
    assert pol.crawl_delay("darc") == rp.crawl_delay("darc") == 7
    rr = rp.request_rate("darc")
    assert pol.request_rate("darc") == rr.requests / rr.seconds


def test_sitemaps_collected():
    txt = "Sitemap: http://h/s1.xml\nUser-agent: *\nDisallow: /x\nSitemap: /s2.xml\n"
    pol = parse_robots(txt)
    assert pol.sitemaps == ["http://h/s1.xml", "/s2.xml"]


def test_rules_rows_status_semantics():
    hosts = pd.Series(["a", "b", "c"])
    texts = pd.Series(["User-agent: *\nDisallow: /x/\n", "irrelevant", ""])
    codes = pd.Series([200, 403, 404])
    rows = robots_rules_rows(hosts, texts, codes)
    a = rows[rows.hostname == "a"]
    assert list(a.path_prefix) == ["/x/"] and list(a.allow) == [False]
    b = rows[rows.hostname == "b"]
    assert list(b.path_prefix) == ["*"] and list(b.allow) == [False]
    assert rows[rows.hostname == "c"].empty  # 404 → allow all → no rows


def test_can_fetch_batch_root_always_allowed():
    urls = pd.Series(
        ["http://h/", "http://h", "http://h/blocked/x", "http://h/free"]
    )
    policy = "User-agent: *\nDisallow: /blocked/\n"
    out = can_fetch_batch(urls, pd.Series([policy] * 4))
    assert list(out) == [True, True, False, True]


def test_can_fetch_batch_missing_policy_allows():
    out = can_fetch_batch(
        pd.Series(["http://h/deep/path"]), pd.Series([None], dtype=object)
    )
    assert list(out) == [True]
