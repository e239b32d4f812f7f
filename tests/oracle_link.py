"""Single-row oracle for link classification, built on stdlib urlparse.

Implements the documented 16-case spec of the reference's ``parse_link``
(``darc/link.py:246-313``) independently (stdlib ``urllib.parse``), so the
vectorized engine implementation is differential-tested against a second,
structurally different implementation of the same contract.
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse
from pathlib import PurePosixPath

ZERONET = {"127.0.0.1:43110", "localhost:43110"}
FREENET = {"127.0.0.1:8888", "localhost:8888"}
I2P = {"127.0.0.1:7657", "127.0.0.1:7658", "localhost:7657", "localhost:7658"}

SCHEME_MAP = {
    "data": ("data", "(data)"),
    "javascript": ("script", "(script)"),
    "bitcoin": ("bitcoin", "(bitcoin)"),
    "btc": ("bitcoin", "(bitcoin)"),
    "ethereum": ("ethereum", "(ethereum)"),
    "eth": ("ethereum", "(ethereum)"),
    "ed2k": ("ed2k", "(ed2k)"),
    "magnet": ("magnet", "(magnet)"),
    "mailto": ("mail", "(mail)"),
    "tel": ("tel", "(tel)"),
    "irc": ("irc", "(irc)"),
    "ws": ("ws", "(ws)"),
    "wss": ("wss", "(ws)"),
}


def oracle_parse(url: str) -> dict:
    try:
        parse = urllib.parse.urlparse(url)
    except ValueError:
        parse = urllib.parse.ParseResult("", "", url, "", "", "")
    host = parse.netloc or parse.hostname
    if host == "":
        host = None
    hostname = host or "(null)"
    scheme = parse.scheme.casefold()

    if scheme in SCHEME_MAP:
        proxy, host = SCHEME_MAP[scheme]
        if scheme in ("ws", "wss"):
            proxy = scheme
    elif scheme not in ("http", "https"):
        proxy = scheme
    elif host is None:
        hostname = "(null)"
        proxy = "null"
    elif re.fullmatch(r".*?\.onion", host):
        proxy = "tor"
    elif re.fullmatch(r".*?\.onion\.sh", host):
        proxy = "tor2web"
    elif re.fullmatch(r".*?\.i2p", host) or host in I2P:
        proxy = "i2p"
    elif host in ZERONET:
        # PurePosixPath collapses duplicate slashes and "." segments;
        # drop the absolute-path anchor ("/" or "//"). Root-equivalent
        # paths ("", "/", "//", "/./") → null (the reference crashes on
        # "//", darc/link.py:380 — defined here as root → null).
        segs = [p for p in PurePosixPath(parse.path).parts if p not in ("/", "//")]
        if not segs:
            proxy = "null"
        else:
            proxy = "zeronet"
            hostname = segs[0]
    elif host in FREENET:
        segs = [p for p in PurePosixPath(parse.path).parts if p not in ("/", "//")]
        if not segs:
            proxy = "null"
        else:
            proxy = "freenet"
            hostname = segs[0]
    else:
        proxy = "null"

    return {
        "url": url,
        "scheme": scheme,
        "proxy": proxy,
        "host": host,
        "hostname": hostname,
        "name": hashlib.sha256(url.encode()).hexdigest(),
    }
