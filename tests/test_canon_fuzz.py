"""Property-based differential fuzzing of the URL classifier.

hypothesis generates URLs (structured and adversarial); the vectorized
classifier must agree with the stdlib-urlparse oracle on every one and
never throw (darc's never-throw contract, darc/link.py:40-152).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from darc_spark.functions.canon import classify_batch
from tests.oracle_link import oracle_parse

scheme = st.sampled_from(
    ["http", "https", "ftp", "ws", "wss", "irc", "mailto", "bitcoin", "data",
     "javascript", "magnet", "ed2k", "tel", "eth", "HTTP", "HtTpS", ""]
)
hostpart = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-.", min_size=1, max_size=12
)
tld = st.sampled_from([".com", ".onion", ".onion.sh", ".i2p", ".example", ""])
port = st.sampled_from(["", ":80", ":43110", ":8888", ":7657", ":7658"])
hostname = st.sampled_from(["", "localhost", "127.0.0.1"]) | st.builds(
    lambda h, t: h + t, hostpart, tld
)
path = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789/._-~%", max_size=20
)
query = st.sampled_from(["", "?a=1", "?q=%20x", "#frag", "?a=1#f"])

structured_url = st.builds(
    lambda s, h, p, pa, q: (f"{s}://" if s else "") + h + p + ("/" + pa if pa or h else pa) + q,
    scheme,
    hostname,
    port,
    path,
    query,
)
adversarial = st.text(max_size=40)


@settings(max_examples=400, deadline=None)
@given(structured_url | adversarial)
# regression pins: root-equivalent zeronet/freenet paths (the reference
# IndexErrors on "//"; contract is root → null) and "."-segment collapse
@example("http://localhost:43110//")
@example("http://127.0.0.1:8888///")
@example("http://localhost:43110/./")
@example("http://localhost:43110/./site/x")
@example("http://127.0.0.1:8888/.././x")
@example("http://localhost:43110/..")
def test_classifier_matches_oracle_fuzz(url: str) -> None:
    got = classify_batch(pd.Series([url])).iloc[0]
    want = oracle_parse(url)
    assert got["scheme"] == want["scheme"], url
    assert got["proxy"] == want["proxy"], url
    assert (got["host"] if got["host"] is not None else None) == want["host"], url
    assert got["hostname"] == want["hostname"], url
