from __future__ import annotations

import gzip

import pandas as pd

from darc_spark.functions.extract import (
    extract_hrefs_one,
    extract_links_batch,
    extract_text_urls_one,
)
from darc_spark.functions.hosts import extract_i2p_hosts
from darc_spark.functions.sitemap import parse_sitemap_one, parse_sitemaps_batch


def test_extract_hrefs_absolutizes():
    html = (
        '<a href="/rel">r</a> <a href=\'http://abs.example/x\'>a</a>'
        '<img src="img/pic.png"> <script src=bare.js></script>'
    )
    out = extract_hrefs_one("http://base.example/dir/page.html", html)
    assert out == [
        "http://base.example/rel",
        "http://abs.example/x",
        "http://base.example/dir/img/pic.png",
        "http://base.example/dir/bare.js",
    ]


def test_extract_text_urls_schemes_added():
    text = "visit www.example.com or mail bob@corp.example now"
    out = extract_text_urls_one(text)
    assert "http:www.example.com" in out  # reference prefixes bare scheme name
    assert any(u.startswith("mailto:") and "bob@corp.example" in u for u in out)


def test_extract_text_bitcoin_ethereum():
    text = "pay 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa or 0x32Be343B94f860124dC4fEe278FDCBD38C102D88"
    out = extract_text_urls_one(text)
    assert any(u.startswith("bitcoin:1A1zP1") for u in out)
    assert any(u.startswith("ethereum:0x32Be") for u in out)


def test_extract_links_batch_combined():
    urls = pd.Series(["http://h/p"])
    htmls = pd.Series(['<a href="/x">see www.other.example/y</a>'])
    out = extract_links_batch(urls, htmls)[0]
    assert "http://h/x" in out
    assert any("www.other.example/y" in u for u in out)


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.example/a</loc></url>
  <url><loc>/rel/b</loc></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.example/s1.xml</loc></sitemap>
  <sitemap><loc>s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_urlset():
    pages, children = parse_sitemap_one("http://h.example/sitemap.xml", SITEMAP)
    assert pages == ["http://h.example/a", "http://h.example/rel/b"]
    assert children == []


def test_parse_sitemap_index_and_gzip():
    gz = gzip.compress(SITEMAP_INDEX.encode())
    pages, children = parse_sitemap_one("http://h.example/sitemap.xml", gz)
    assert pages == []
    assert children == ["http://h.example/s1.xml", "http://h.example/s2.xml"]


def test_parse_sitemap_garbage():
    assert parse_sitemap_one("http://h/x.xml", "<<<not xml") == ([], [])


def test_parse_sitemaps_batch():
    out = parse_sitemaps_batch(
        pd.Series(["http://h/s.xml", "http://h/i.xml"]),
        pd.Series([SITEMAP, SITEMAP_INDEX]),
    )
    assert len(out) == 4
    assert set(out[out.is_index]["loc"]) == {
        "http://h.example/s1.xml",  # absolute loc kept as-is
        "http://h/s2.xml",  # relative loc joined against the index URL
    }


HOSTS_TXT = """# I2P hosts
good.i2p=b64keydata
bad.example.com=key
  spaced.i2p=xx
plain-no-eq.i2p
#comment.i2p=zz

"""


def test_extract_i2p_hosts_native(spark):
    df = spark.createDataFrame([(HOSTS_TXT,)], "text string")
    rows = extract_i2p_hosts(df).select("host", "url").collect()
    got = {(r["host"], r["url"]) for r in rows}
    assert got == {
        ("good.i2p", "http://good.i2p"),
        ("spaced.i2p", "http://spaced.i2p"),
        ("plain-no-eq.i2p", "http://plain-no-eq.i2p"),
    }
    # and the plan is UDF-free
    plan = extract_i2p_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_synthweb_sitemapindex_recursion(spark, tmp_path):
    """hosts[0] serves a sitemapindex; the new-host gate must fetch the
    child sitemaps BY THEIR URL (darc/proxy/null.py:329) — regression for
    the bug where every BFS level re-fetched the host's root document."""
    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    hot = web.hosts[0]
    st, xml = web.sitemap_xml(f"http://{hot}/sitemap.xml")
    assert st == 200 and "<sitemapindex>" in xml
    st0, xml0 = web.sitemap_xml(f"http://{hot}/sitemap-0.xml")
    assert st0 == 200 and "<urlset>" in xml0

    crawler = Crawler(
        spark,
        str(tmp_path / "s"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, selenium_enabled=False),
    )
    crawler.seed(web.seeds())
    crawler.run(1)
    rows = crawler.store.read("sitemaps").filter(f"hostname = '{hot}'").collect()
    urls = {r["sitemap_url"] for r in rows}
    # pages came from BOTH children, none attributed to the index itself
    assert urls == {f"http://{hot}/sitemap-0.xml", f"http://{hot}/sitemap-1.xml"}
    # and each child contributed its own locs (not duplicates of one doc)
    locs0 = {r["loc"] for r in rows if r["sitemap_url"].endswith("-0.xml")}
    locs1 = {r["loc"] for r in rows if r["sitemap_url"].endswith("-1.xml")}
    assert locs0 and locs1 and locs0 != locs1


def test_extract_conformance_corpus():
    """html5lib-parity corpus (darc/parse.py:322-329 contract):
    commented-out markup and script/style text are NOT elements;
    <base href> is extracted as a link but NOT used as the join base;
    malformed/bare attributes still harvest."""
    page = "http://h.example/dir/page.html"
    html = """
    <html><head>
      <base href="/other/">
      <!-- <a href="/commented-out">dead</a> -->
      <style>body { background: url('/style-bg.png'); }</style>
      <script src="/real-script.js">
        var fake = '<a href="/script-string">x</a>'; var u = "href=/also-fake";
      </script>
    </head><body>
      <a href="/x">ok</a>
      <a href = 'single.html'>q</a>
      <img src=bare.png>
      <a href="">empty</a>
    </body></html>"""
    out = extract_hrefs_one(page, html)
    assert "http://h.example/commented-out" not in out
    assert not any("script-string" in u or "also-fake" in u for u in out)
    assert not any("style-bg" in u for u in out)
    assert "http://h.example/real-script.js" in out  # the src ATTR survives
    # base href: extracted as a link, but relative links join page_url
    assert "http://h.example/other/" in out
    assert "http://h.example/x" in out
    assert "http://h.example/dir/single.html" in out
    assert "http://h.example/dir/bare.png" in out
    assert page in out  # href="" joins to the page itself (urljoin contract)


def test_extract_unclosed_script_keeps_rest():
    """An unclosed <script> never swallows the rest of the document
    (the strip regex requires a matching close tag)."""
    out = extract_hrefs_one(
        "http://h/", '<script>var x = 1;<a href="/after">a</a>'
    )
    assert "http://h/after" in out
