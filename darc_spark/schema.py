"""Declared StructTypes for every engine table.

The reference's schema is fixed/declared (peewee models under
``darc/model/`` + pydantic JSON schemas ``demo/schema/*.schema.json``);
ours is too. One StructType per table, no inference anywhere.

Scale note: the binary ``bytes`` column lives ONLY in the ``fetches``
table — it is written straight out of the fetch UDF and never shuffled
(SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Parsed link — darc.link.Link flattened (darc/link.py:155-225).
# `host` is darc's returned host (nullable, may be synthetic "(data)");
# `hostname` is the partition/base hostname (never null, "(null)" fallback).
LINK = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("scheme", T.StringType(), True),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("name", T.StringType(), False),  # sha256(url) hex
        T.StructField("backref", T.StringType(), True),  # extracting page URL
    ]
)

# Struct returned by the vectorized classifier UDF (name/base added natively).
LINK_PARTS = T.StructType(
    [
        T.StructField("scheme", T.StringType(), True),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("hostname", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Frontier — the priority queue (darc queue_requests/queue_selenium,
# darc/model/tasks/requests.py:31-42). Pickled Link payload → plain columns.
# not_before/priority replace the Redis sorted-set score (darc/db.py:16-31):
#   * claimable when not_before <= current round
#   * lower priority first; ties by enqueue_round then url (deterministic,
#     SURVEY.md §7 hard part (a))
FRONTIER = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("scheme", T.StringType(), True),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("backref", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("not_before", T.LongType(), False),  # round number lease
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("enqueue_round", T.LongType(), False),
        # monotonic per-store event sequence: resolves same-round
        # drop/re-add races deterministically (program order)
        T.StructField("event_seq", T.LongType(), False),
    ]
)

# hostname_state — per-host once-only gate (darc/db.py:222-318,
# darc/model/tasks/hostname.py:29-35)
HOSTNAME_STATE = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("first_seen_round", T.LongType(), False),
        T.StructField("last_fetch_round", T.LongType(), False),
    ]
)

# url_seen — exact ground truth behind the bloom prefilter (ZADD-NX dedup,
# darc/db.py:555-568,644-651)
URL_SEEN = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("seen_round", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Image+caption payload (BASELINE.json input_hint) — the page payload of
# this graft; darc analogues: RequestsModel.document
# (darc/model/web/requests.py:50), SeleniumModel.screenshot
# (darc/model/web/selenium.py:40).
IMAGE = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# redirect chain entry — one hop of response.history
# (darc/model/web/requests.py:66-103, darc/submit.py:545-557)
HISTORY_HOP = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
    ]
)

# fetches — one row per completed fetch (darc's save.py artifacts +
# RequestsModel, darc/save.py:63-133, darc/model/web/requests.py:36-103),
# carrying the image payload columns plus response headers/cookies
# (save_headers, darc/save.py:136-220) and the redirect history chain.
FETCHES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("fetch_round", T.LongType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("cookies", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("history", T.ArrayType(HISTORY_HOP), True),
        T.StructField("is_html", T.BooleanType(), True),
        T.StructField("n_links", T.IntegerType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("fetch_partition", T.IntegerType(), True),
        T.StructField("fetch_batch_ms", T.DoubleType(), True),
    ]
)

# edges — the link graph (URLThroughModel, darc/model/web/url.py:111-123)
EDGES = T.StructType(
    [
        T.StructField("parent_name", T.StringType(), False),
        T.StructField("child_name", T.StringType(), False),
        T.StructField("parent_url", T.StringType(), False),
        T.StructField("child_url", T.StringType(), False),
        T.StructField("round", T.LongType(), False),
    ]
)

# metrics — per-round/per-partition crawl metrics (north rule; reference
# analogue: pool-count logging darc/db.py:900-901,1012-1013)
METRICS = T.StructType(
    [
        T.StructField("round", T.LongType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# special_links — bitcoin/eth/ed2k/magnet/mail/tel/irc/ws/data/invalid
# sinks collapsed into one table partitioned by kind
# (darc/proxy/bitcoin.py:27-42 pattern ×9 modules)
SPECIAL_LINKS = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("backref", T.StringType(), True),
        T.StructField("round", T.LongType(), False),
    ]
)

# robots rules — parsed robots.txt (darc/_robotparser.py:87-158)
ROBOTS_RULES = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("agent", T.StringType(), False),
        T.StructField("rule_index", T.IntegerType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("crawl_delay", T.IntegerType(), True),
        T.StructField("request_rate", T.DoubleType(), True),
    ]
)

SITEMAPS = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("loc", T.StringType(), False),
        T.StructField("is_index", T.BooleanType(), False),
    ]
)

# fetches_selenium — the render stage's fetches: same shape PLUS the
# screenshot PNG as a DISTINCT artifact from the document payload
# (SeleniumModel.document + .screenshot, darc/model/web/selenium.py:31-40)
FETCHES_SELENIUM = T.StructType(
    FETCHES.fields + [T.StructField("screenshot", T.BinaryType(), True)]
)

TABLES = {
    "frontier_requests": FRONTIER,
    "frontier_selenium": FRONTIER,
    "hostname_state": HOSTNAME_STATE,
    "url_seen": URL_SEEN,
    "fetches": FETCHES,
    "fetches_selenium": FETCHES_SELENIUM,
    "edges": EDGES,
    "metrics": METRICS,
    "special_links": SPECIAL_LINKS,
    "robots_rules": ROBOTS_RULES,
    "sitemaps": SITEMAPS,
}
