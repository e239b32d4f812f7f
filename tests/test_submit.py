from __future__ import annotations

import base64
import json

from darc_spark.functions.submit import (
    new_host_payloads,
    requests_payloads,
    selenium_payloads,
)


def test_requests_payload_shape(spark):
    df = spark.createDataFrame(
        [
            (
                "n1",
                "http://h.example/p",
                "h.example",
                "null",
                3,
                200,
                "text/html",
                True,
                bytearray(b"\x89PNGxx"),
                {"server": "s1"},
                {"sid": "abcd"},
                [("http://h.example/r/1", 301)],
            )
        ],
        "name string, url string, hostname string, proxy string, "
        "fetch_round long, status_code int, content_type string, "
        "is_html boolean, bytes binary, "
        "headers map<string,string>, cookies map<string,string>, "
        "history array<struct<url:string,status:int>>",
    )
    row = requests_payloads(df).head()
    doc = json.loads(row["payload"])
    assert doc["URL"] == "http://h.example/p"
    assert doc["Timestamp"] == 3
    assert doc["Response"]["StatusCode"] == 200
    assert doc["Response"]["Headers"] == {"server": "s1"}
    assert doc["Response"]["History"][0]["status"] == 301
    assert doc["Metadata"]["proxy"] == "null"
    assert doc["Metadata"]["base"] == "null/http/h.example"
    assert base64.b64decode(doc["Document"]) == b"\x89PNGxx"
    assert doc["$PARTIAL$"] is False


def test_new_host_and_selenium_payloads(spark):
    hosts = spark.createDataFrame(
        [("h.onion", "tor", 0, 2)],
        "hostname string, proxy string, first_seen_round long, last_fetch_round long",
    )
    doc = json.loads(new_host_payloads(hosts).head()["payload"])
    assert doc["Proxy"] == "tor" and doc["URL"] == "h.onion"

    sel = spark.createDataFrame(
        [("n1", "http://h/p", "h", "null", 1, bytearray(b"doc"), bytearray(b"shot"))],
        "name string, url string, hostname string, proxy string, "
        "fetch_round long, bytes binary, screenshot binary",
    )
    doc = json.loads(selenium_payloads(sel).head()["payload"])
    assert base64.b64decode(doc["Document"]) == b"doc"
    assert base64.b64decode(doc["Screenshot"]) == b"shot"
