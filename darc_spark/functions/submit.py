"""Submission payload rendering — S11 parity (``darc/submit.py``).

The reference POSTs three JSON event shapes to a backend API
(``submit_new_host`` ``darc/submit.py:249-391``, ``submit_requests``
``:394-603``, ``submit_selenium`` ``:606-754``; JSON Schemas under
``demo/schema/*.schema.json``). Here the archive IS the store's tables,
but downstream consumers of the reference's API contract can get the
same JSON documents rendered column-natively (``to_json(struct(...))``
— JVM-side, no UDF) from the fetches/hostname tables.

Field mapping (reference schema → columns):
``$PARTIAL/$RELOAD`` flags are crawl-config constants; ``Timestamp`` →
fetch_round (the engine's logical clock); ``URL`` → url; ``Base64``
document → base64(bytes); metadata block → the parsed-link columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _b64(col: Column) -> Column:
    """Unwrapped base64: Spark's ``base64`` chunks with CRLF every 76
    chars (RFC 2045); the reference uses ``base64.b64encode`` (no
    wrapping, darc/submit.py) — strip the line breaks for parity."""
    return F.regexp_replace(F.base64(col), "\r\n", "")


def _metadata() -> F.Column:
    # base = <proxy>/<scheme>/<hostname> path (darc/link.py:393); the
    # fetches table has no scheme column, so derive it from the URL
    scheme = F.split(F.col("url"), ":").getItem(0)
    return F.struct(
        F.col("url").alias("url"),
        F.col("proxy").alias("proxy"),
        F.col("hostname").alias("host"),
        F.concat_ws("/", F.col("proxy"), scheme, F.col("hostname")).alias("base"),
        F.col("name").alias("name"),
    )


def new_host_payloads(hostname_state: DataFrame, partial: bool = False) -> DataFrame:
    """One JSON document per discovered host (new_host.schema.json)."""
    return hostname_state.select(
        F.col("hostname"),
        F.to_json(
            F.struct(
                F.lit(partial).alias("$PARTIAL$"),
                F.lit(False).alias("$FORCE$"),
                F.col("first_seen_round").alias("Timestamp"),
                F.col("hostname").alias("URL"),
                F.col("proxy").alias("Proxy"),
            )
        ).alias("payload"),
    )


def requests_payloads(fetches: DataFrame) -> DataFrame:
    """One JSON document per crawler fetch (requests.schema.json)."""
    return fetches.select(
        F.col("name"),
        F.to_json(
            F.struct(
                F.lit(False).alias("$PARTIAL$"),
                F.col("fetch_round").alias("Timestamp"),
                F.col("url").alias("URL"),
                F.struct(
                    F.col("status_code").alias("StatusCode"),
                    F.col("content_type").alias("ContentType"),
                    F.col("is_html").alias("HTML"),
                    # save_headers parity (darc/save.py:136-220)
                    F.col("headers").alias("Headers"),
                    F.col("cookies").alias("Cookies"),
                    F.col("history").alias("History"),
                ).alias("Response"),
                _metadata().alias("Metadata"),
                _b64(F.col("bytes")).alias("Document"),
            )
        ).alias("payload"),
    )


def selenium_payloads(fetches_selenium: DataFrame) -> DataFrame:
    """One JSON document per rendered page (selenium.schema.json);
    the DISTINCT screenshot artifact rides as base64 like the
    reference's PNG (``darc/crawl.py:333-341``)."""
    return fetches_selenium.select(
        F.col("name"),
        F.to_json(
            F.struct(
                F.col("fetch_round").alias("Timestamp"),
                F.col("url").alias("URL"),
                _metadata().alias("Metadata"),
                _b64(F.col("bytes")).alias("Document"),
                _b64(F.col("screenshot")).alias("Screenshot"),
            )
        ).alias("payload"),
    )
