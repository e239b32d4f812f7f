"""URL canonicalization + proxy classification, vectorized.

Re-implements the *semantics* of the reference's ``parse_link``
(``darc/link.py:228-404`` — scheme dispatch ``darc/link.py:327-357``,
hostname dispatch ``darc/link.py:360-390``) as a pure pandas batch
function. It is a pure function of the URL string, so it runs as an
Arrow-batched pandas UDF — no per-row Python on the Spark side, and no
exceptions ever (the reference's tolerant urlparse wrappers,
``darc/link.py:40-152``, suppress all errors; our regex-based parser
cannot throw by construction).

Classification contract (the 16-case spec, ``darc/link.py:246-313``):

==================================  =========  ==================
condition                           proxy      host column
==================================  =========  ==================
scheme data                         data       (data)
scheme javascript                   script     (script)
scheme bitcoin|btc                  bitcoin    (bitcoin)
scheme ethereum|eth                 ethereum   (ethereum)
scheme ed2k                         ed2k       (ed2k)
scheme magnet                       magnet     (magnet)
scheme mailto                       mail       (mail)
scheme tel                          tel        (tel)
scheme irc                          irc        (irc)
scheme ws|wss                       ws|wss     (ws)
other non-http(s) scheme            <scheme>   netloc or null
no netloc                           null       null ("(null)" hostname)
host ~ .onion                       tor        netloc
host ~ .onion.sh                    tor2web    netloc
host ~ .i2p / localhost:7657|7658   i2p        netloc
localhost:43110 + non-root path     zeronet    netloc (hostname=seg1)
localhost:8888 + non-root path      freenet    netloc (hostname=seg1)
else                                null       netloc
==================================  =========  ==================

``name`` (sha256 of the URL, ``darc/link.py:394``) and ``base``
(``<proxy>/<scheme>/<hostname>``, ``darc/link.py:393``) are computed
natively in Spark (``sha2``, ``concat_ws``) — JVM-side, codegen'd.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from darc_spark.schema import LINK_PARTS

ZERONET_PORT = 43110  # darc/proxy/zeronet.py:40
FREENET_PORT = 8888  # darc/proxy/freenet.py:46

# scheme → (proxy, synthetic host) — darc/link.py:327-357
_SCHEME_PROXY: dict[str, str] = {
    "data": "data",
    "javascript": "script",
    "bitcoin": "bitcoin",
    "btc": "bitcoin",
    "ethereum": "ethereum",
    "eth": "ethereum",
    "ed2k": "ed2k",
    "magnet": "magnet",
    "mailto": "mail",
    "tel": "tel",
    "irc": "irc",
    "ws": "ws",
    "wss": "wss",
}
_SCHEME_HOST: dict[str, str] = {
    "data": "(data)",
    "javascript": "(script)",
    "bitcoin": "(bitcoin)",
    "btc": "(bitcoin)",
    "ethereum": "(ethereum)",
    "eth": "(ethereum)",
    "ed2k": "(ed2k)",
    "magnet": "(magnet)",
    "mailto": "(mail)",
    "tel": "(tel)",
    "irc": "(irc)",
    "ws": "(ws)",
    "wss": "(ws)",
}

_I2P_HOSTS = frozenset(
    {"127.0.0.1:7657", "127.0.0.1:7658", "localhost:7657", "localhost:7658"}
)
_ZERONET_HOSTS = frozenset({f"127.0.0.1:{ZERONET_PORT}", f"localhost:{ZERONET_PORT}"})
_FREENET_HOSTS = frozenset({f"127.0.0.1:{FREENET_PORT}", f"localhost:{FREENET_PORT}"})


def classify_batch(urls: pd.Series) -> pd.DataFrame:
    """Vectorized parse+classify of a batch of URL strings.

    Returns a DataFrame with columns ``scheme, proxy, host, hostname``
    (object dtype; None where darc's Link carries None).
    """
    s = urls.astype("object").fillna("").astype(str)
    sp = pd.Series(s, dtype="string")

    # --- minimal urlparse (RFC 3986 component split, tolerant) -----------
    scheme = sp.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*):", expand=False)
    has_scheme = scheme.notna()
    scheme_lower = scheme.str.lower()
    # strip "<scheme>:" where present
    rest = sp.copy()
    rest[has_scheme] = sp[has_scheme].str.replace(
        r"^[A-Za-z][A-Za-z0-9+.\-]*:", "", regex=True, n=1
    )
    # netloc only exists after "//"
    netloc = rest.str.extract(r"^//([^/?#]*)", expand=False)  # <NA> if no //
    tail = rest.copy()
    has_netloc = netloc.notna()
    tail[has_netloc] = rest[has_netloc].str.replace(
        r"^//[^/?#]*", "", regex=True, n=1
    )
    path = tail.str.extract(r"^([^?#]*)", expand=False).fillna("")

    # darc: host = parse.netloc or parse.hostname → None when netloc empty
    host = netloc.where(netloc.notna() & (netloc != ""), None).astype("object")
    scheme_out = scheme_lower.fillna("").astype("object")

    # hostname = host or '(null)'  (darc/link.py:323)
    hostname = host.copy()
    hostname[pd.isna(hostname)] = "(null)"

    # --- classification (order matters; darc/link.py:327-390) ------------
    sch = scheme_out.astype("string")
    proxy = pd.Series(np.full(len(s), None, dtype=object), index=s.index)
    host_out = host.copy()

    special = sch.map(_SCHEME_PROXY)
    is_special = special.notna()
    proxy[is_special] = special[is_special].astype(object)
    host_out[is_special] = sch[is_special].map(_SCHEME_HOST).astype(object)

    undecided = ~is_special
    is_http = sch.isin(["http", "https"])
    other_scheme = undecided & ~is_http  # incl. empty scheme → proxy ""
    proxy[other_scheme] = scheme_out[other_scheme]
    undecided &= is_http

    host_str = pd.Series(host, dtype="string")
    no_host = undecided & host_str.isna()
    proxy[no_host] = "null"
    hostname[no_host] = "(null)"
    undecided &= ~no_host

    hs = host_str.fillna("")
    tor = undecided & hs.str.fullmatch(r".*?\.onion", na=False)
    proxy[tor] = "tor"
    undecided &= ~tor

    tor2web = undecided & hs.str.fullmatch(r".*?\.onion\.sh", na=False)
    proxy[tor2web] = "tor2web"
    undecided &= ~tor2web

    i2p = undecided & (hs.str.fullmatch(r".*?\.i2p", na=False) | hs.isin(_I2P_HOSTS))
    proxy[i2p] = "i2p"
    undecided &= ~i2p

    # First *meaningful* path segment, with PurePosixPath semantics
    # (reference: PosixPath(path).parts[1], darc/link.py:380): duplicate
    # slashes collapse and "." segments are skipped, so root-equivalent
    # paths ("", "/", "//", "/./") classify as null instead of crashing
    # (the reference IndexErrors on "//"; defined here as root → null).
    # lookahead keeps backtracking from capturing a bare "." segment
    first_seg = path.str.extract(
        r"^/+(?:\.(?:/+|$))*((?!\.(?:/|$))[^/]+)", expand=False
    )

    zn = undecided & hs.isin(_ZERONET_HOSTS)
    zn_site = zn & first_seg.notna()
    proxy[zn & ~zn_site] = "null"
    proxy[zn_site] = "zeronet"
    hostname[zn_site] = first_seg[zn_site].astype(object)
    undecided &= ~zn

    fn = undecided & hs.isin(_FREENET_HOSTS)
    fn_site = fn & first_seg.notna()
    proxy[fn & ~fn_site] = "null"
    proxy[fn_site] = "freenet"
    hostname[fn_site] = first_seg[fn_site].astype(object)
    undecided &= ~fn

    proxy[undecided] = "null"  # fallback (darc/link.py:388-390)

    def _clean(col: pd.Series) -> pd.Series:
        col = col.astype(object)
        return col.where(pd.notna(col), None)

    return pd.DataFrame(
        {
            "scheme": _clean(scheme_out),
            "proxy": _clean(proxy),
            "host": _clean(host_out),
            "hostname": _clean(hostname),
        }
    )


@F.pandas_udf(LINK_PARTS)
def parse_link_udf(urls: pd.Series) -> pd.DataFrame:
    """Arrow-batched UDF: url string → struct<scheme,proxy,host,hostname>."""
    return classify_batch(urls)


def link_name(url_col: Column | str) -> Column:
    """Canonical URL key: sha256 hex of the URL (darc/link.py:394) — native."""
    return F.sha2(F.col(url_col) if isinstance(url_col, str) else url_col, 256)


def with_parsed_link(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach parsed-link columns to ``df``.

    Only the classification runs in Python (one vectorized UDF); ``name``
    and ``base`` stay JVM-side (``sha2``/``concat_ws`` inside whole-stage
    codegen).
    """
    parsed = df.withColumn("_lp", parse_link_udf(F.col(url_col)))
    return (
        parsed.withColumn("scheme", F.col("_lp.scheme"))
        .withColumn("proxy", F.col("_lp.proxy"))
        .withColumn("host", F.col("_lp.host"))
        .withColumn("hostname", F.col("_lp.hostname"))
        .withColumn("name", link_name(url_col))
        .withColumn(
            "base", F.concat_ws("/", F.col("proxy"), F.col("scheme"), F.col("hostname"))
        )
        .drop("_lp")
    )
