"""Deterministic synthetic web — the sandbox's network stand-in.

A pure function ``url → page`` (seeded, no I/O, no RNG state): the same
URL always yields the same status / content-type / HTML / image+caption
payload, so fetch is **idempotent and resumable** (SURVEY.md §7 hard
part (c)) and the e2e oracle simulator sees the identical web.

The graph is implicit: a page's outlinks are hash-derived, so the "web"
needs no materialized table and scales to any frontier size for
benchmarks. Shape knobs mirror what the reference must handle:

* a **hot host** receiving ~half of all cross-host links (skew → salted
  politeness window),
* `.onion` / `.i2p` hosts (proxy classification + hosts.txt path),
* robots.txt with disallowed ``/private/`` subtrees + crawl-delay,
* sitemap.xml per host, hosts.txt on the i2p host,
* 404s / 500s (requeue), empty bodies, non-HTML content types,
* special-scheme links in text (mailto/bitcoin/data) for the sinks,
* an image+caption payload on most 200-HTML pages (png lossless or
  qpng lossy exercising the PSNR≥40 dB invariant).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

from darc_spark.functions.images import (
    encode_lossy,
    encode_png,
    phash64,
    smooth_pixels,
)


def image_payload(ih: int, side: int) -> tuple[np.ndarray, str, bytes]:
    """(pixels, fmt, encoded bytes) for payload hash ``ih`` — the shared
    pure function behind page payloads, the image_table corpus, and the
    PSNR oracle (original pixels re-derivable from ih alone).

    Five codec classes, round-robin by hash: deterministic-lossy qpng
    and lossless PNG over noise content, REAL baseline JPEG (the
    pure-Python codec, darc_spark/functions/jpeg.py) over smooth
    low-frequency content — the class real photographs belong to, where
    the PSNR≥40dB invariant is meaningful (JPEG on pure noise cannot
    exceed ~36dB at any sane quality, by design of the codec) — REAL
    progressive JPEG (SOF2, darc_spark/functions/jpeg_progressive.py:
    spectral selection + successive approximation, the shape most large
    web sites serve) over the same smooth class, and REAL GIF89a
    (darc_spark/functions/gif.py) over palette-native content, where
    GIF is lossless (exact roundtrip).
    """
    from darc_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(ih)
    sel = (ih >> 8) % 5
    if sel == 4:
        from darc_spark.functions.jpeg_progressive import (
            encode_jpeg_progressive,
        )

        arr = smooth_pixels(rng, side)
        # same q97 rationale as the baseline class; identical quantized
        # coefficients ⇒ identical PSNR floor
        return arr, "jpeg", encode_jpeg_progressive(arr, quality=97)
    if sel == 3:
        from darc_spark.functions.gif import encode_gif

        # palette-native: indices into a 64-color deterministic palette
        pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
        arr = pal[rng.integers(0, 64, size=(side, side))]
        return arr, "gif", encode_gif(arr)
    if sel == 2:
        arr = smooth_pixels(rng, side)
        # q97: the PSNR≥40dB invariant must hold for EVERY row, and the
        # smallest payload tiles (16px) are proportionally blockier —
        # measured worst case over 1000+ seeds/sides: q95→38.9dB,
        # q97→42.2dB. Archival-quality JPEG is the honest setting for a
        # hard per-row fidelity bound.
        return arr, "jpeg", encode_jpeg(arr, quality=97)
    arr = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
    if sel == 0:
        return arr, "qpng", encode_lossy(arr)
    return arr, "png", encode_png(arr)

VOCAB = (
    "amber basalt cobalt dune ember fjord garnet harbor iris juniper krill "
    "lumen mesa nadir onyx prism quartz reef sable tundra umbra vortex wharf "
    "xenon yarrow zephyr"
).split()

DEFAULT_HOSTS = (
    "hot.example",
    "alpha.example",
    "beta.example",
    "gamma.onion",
    "delta.i2p",
    "epsilon.example",
)


class SynthWeb:
    def __init__(
        self,
        seed: int = 42,
        hosts: tuple[str, ...] = DEFAULT_HOSTS,
        pages_per_host: int = 400,
        branching: int = 4,
        hot_share: int = 50,  # % of cross-host links going to hosts[0]
        heavy_decode_px: int = 0,  # >0: bench mode, see page()
    ) -> None:
        self.seed = seed
        self.hosts = hosts
        self.pages_per_host = pages_per_host
        self.branching = branching
        self.hot_share = hot_share
        self.heavy_decode_px = heavy_decode_px
        # test hook: host → (status, text) served INSTEAD of the derived
        # robots.txt; mutated between rounds to exercise the TIME_CACHE
        # force-refetch lease (closures re-ship per round, so updates
        # propagate to executors)
        self.robots_override: dict[str, tuple[int, str]] = {}

    # -- hashing --------------------------------------------------------------
    def _h(self, *parts: object) -> int:
        data = ("|".join(str(p) for p in parts)).encode()
        digest = hashlib.blake2b(data, digest_size=8, key=struct.pack("<q", self.seed)).digest()
        return int.from_bytes(digest, "little")

    # -- URL space ------------------------------------------------------------
    def url(self, host: str, page_id: int, private: bool = False) -> str:
        kind = "private" if private else "p"
        return f"http://{host}/{kind}/{page_id}"

    def seeds(self, k: int = 3) -> list[str]:
        return [self.url(h, 0) for h in self.hosts[: max(1, k)]]

    def _parse(self, url: str) -> tuple[str, str, int] | None:
        """url → (host, kind, page_id) if it's inside this web."""
        if not url.startswith("http://"):
            return None
        rest = url[7:]
        host, _, path = rest.partition("/")
        if host not in self.hosts:
            return None
        path = path.split("?")[0].split("#")[0]
        segs = [s for s in path.split("/") if s]
        if len(segs) == 2 and segs[0] in ("p", "private") and segs[1].isdigit():
            pid = int(segs[1])
            if 0 <= pid < self.pages_per_host:
                return host, segs[0], pid
        if len(segs) == 0:
            return host, "p", 0  # root == page 0
        if segs == ["hosts.txt"] and host.endswith(".i2p"):
            return host, "hosts", 0
        return None

    # -- per-host artifacts -----------------------------------------------------
    def robots_txt(self, host: str) -> tuple[int, str]:
        """(status_code, text) — even-indexed hosts ship robots rules."""
        if host in self.robots_override:
            return self.robots_override[host]
        idx = self.hosts.index(host) if host in self.hosts else -1
        if idx < 0 or idx % 2 == 1:
            return 404, ""
        delay = "Crawl-delay: 2\n" if idx == 2 else ""
        return 200, (
            "User-agent: *\n"
            "Disallow: /private/\n" + delay + f"Sitemap: http://{host}/sitemap.xml\n"
        )

    def sitemap_xml(self, url_or_host: str) -> tuple[int, str]:
        """Sitemap document by URL (or bare host ⇒ /sitemap.xml).

        hosts[0] serves a **sitemapindex** at /sitemap.xml whose two
        children (/sitemap-0.xml, /sitemap-1.xml) are urlsets — the
        recursive-fetch path (darc/proxy/null.py:329) is only exercised
        if the fetcher requests child sitemaps by THEIR url.
        """
        if "://" in url_or_host:
            rest = url_or_host.split("://", 1)[1]
            host, _, path = rest.partition("/")
            path = "/" + path
        else:
            host, path = url_or_host, "/sitemap.xml"
        if host not in self.hosts:
            return 404, ""
        if host == self.hosts[0]:
            if path == "/sitemap.xml":
                children = "".join(
                    f"<sitemap><loc>http://{host}/sitemap-{i}.xml</loc></sitemap>"
                    for i in range(2)
                )
                return 200, (
                    f'<?xml version="1.0"?><sitemapindex>{children}</sitemapindex>'
                )
            if path in ("/sitemap-0.xml", "/sitemap-1.xml"):
                part = int(path[len("/sitemap-")])
                locs = "".join(
                    f"<url><loc>{self.url(host, self._h(host, 'sm', part, i) % self.pages_per_host)}</loc></url>"
                    for i in range(3)
                )
                return 200, f'<?xml version="1.0"?><urlset>{locs}</urlset>'
            return 404, ""
        if path != "/sitemap.xml":
            return 404, ""
        locs = "".join(
            f"<url><loc>{self.url(host, self._h(host, 'sm', i) % self.pages_per_host)}</loc></url>"
            for i in range(3)
        )
        return 200, f'<?xml version="1.0"?><urlset>{locs}</urlset>'

    def hosts_txt(self, host: str) -> tuple[int, str]:
        if not host.endswith(".i2p"):
            return 404, ""
        lines = [f"peer{i}.i2p=b64key{i}" for i in range(2)]
        return 200, "\n".join(lines) + "\nnot-i2p.example=zz\n"

    # -- pages ---------------------------------------------------------------
    def _meta(self, h: int) -> tuple[int, str, bool]:
        """(status, content_type, empty_body) — shared by page() and head()."""
        roll = h % 100
        if roll < 78:
            status = 200
        elif roll < 88:
            status = 404
        elif roll < 94:
            status = 500
        else:
            return 200, "text/html", True
        ct_roll = (h >> 8) % 100
        if ct_roll < 80:
            content_type = "text/html"
        elif ct_roll < 90:
            content_type = "text/plain"
        else:
            content_type = "image/png"
        return status, content_type, False

    def head(self, url: str) -> tuple[int, str]:
        """HEAD-equivalent: (status, content_type) with no body work."""
        parsed = self._parse(url)
        if parsed is None:
            return 404, "text/plain"
        host, kind, pid = parsed
        if kind == "hosts":
            return 200, "text/plain"
        status, ct, _ = self._meta(self._h(host, kind, pid, "meta"))
        return status, ct

    def heads_batch(self, urls: pd.Series) -> pd.DataFrame:
        rows = [dict(zip(("status_code", "content_type"), self.head(u))) for u in urls.astype(str)]
        return pd.DataFrame(rows, index=urls.index)

    def _child_urls(self, host: str, kind: str, pid: int) -> list[str]:
        out = []
        for j in range(self.branching):
            h = self._h(host, kind, pid, "child", j)
            target_pid = h % self.pages_per_host
            r = (h >> 32) % 100
            if r < 60:
                target_host = host  # same-host link
            elif r < 60 + (self.hot_share * 40) // 100:
                target_host = self.hosts[0]  # hot host
            else:
                target_host = self.hosts[(h >> 16) % len(self.hosts)]
            private = (h >> 48) % 10 == 0  # ~10% links into robots-blocked space
            out.append(self.url(target_host, target_pid, private))
        return out

    def _response_meta(self, host: str, pid: int, h: int, content_type: str) -> dict:
        """Deterministic response headers / cookies / redirect history —
        the reference persists all three per fetch (darc/save.py:136-220,
        response.history darc/submit.py:545-557)."""
        headers = {
            "server": f"synthweb/{self.hosts.index(host) if host in self.hosts else 9}",
            "content-type": content_type,
            "etag": f"{h & 0xFFFFFFFF:08x}",
        }
        cookies = {"sid": f"{(h >> 12) & 0xFFFF:04x}"} if (h >> 12) % 3 == 0 else {}
        # ~1/7 pages arrive via a 301 hop from a /r/<pid> shortlink
        history = (
            [{"url": f"http://{host}/r/{pid}", "status": 301}]
            if (h >> 20) % 7 == 0
            else []
        )
        return {"headers": headers, "cookies": cookies, "history": history}

    def page(self, url: str) -> dict:
        """The pure fetch function. Never throws."""
        null = {
            "status_code": 404,
            "content_type": "text/plain",
            "html": "",
            "headers": {},
            "cookies": {},
            "history": [],
            "image_id": None,
            "bytes": None,
            "w": None,
            "h": None,
            "fmt": None,
            "caption": None,
            "phash": None,
        }
        parsed = self._parse(url)
        if parsed is None:
            return null
        host, kind, pid = parsed
        if kind == "hosts":
            _, text = self.hosts_txt(host)
            return {**null, "status_code": 200, "content_type": "text/plain", "html": text}

        h = self._h(host, kind, pid, "meta")
        status, content_type, empty = self._meta(h)
        resp = self._response_meta(host, pid, h, content_type)
        if empty:
            return {
                **null,
                **resp,
                "status_code": 200,
                "content_type": "text/html",
                "html": "",
            }

        if content_type == "image/png":
            return {
                **null,
                **resp,
                "status_code": status,
                "content_type": "image/png",
                "html": "",
            }

        children = self._child_urls(host, kind, pid)
        anchors = "".join(f'<a href="{c}">{c.split("/")[-1]}</a> ' for c in children)
        rel = f'<a href="/p/{self._h(host, pid, "rel") % self.pages_per_host}">rel</a>'
        extras = ""
        if (h >> 16) % 5 == 0:
            extras += f" contact admin{pid}@{host} "
        if (h >> 24) % 11 == 0:
            extras += " donate 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa "
        if (h >> 32) % 13 == 0:
            extras += f' <img src="data:image/png;base64,QUJD{pid}">'
        body = f"<html><body>{anchors}{rel}{extras}</body></html>"
        if content_type == "text/plain":
            body = " ".join(children)

        out = {
            **null,
            **resp,
            "status_code": status,
            "content_type": content_type,
            "html": body,
        }
        # image+caption payload on HTML pages (input_hint schema)
        if content_type == "text/html" and (h >> 40) % 4 != 0:
            ih = self._h(host, kind, pid, "img")
            rng = np.random.default_rng(ih)
            words = [VOCAB[(ih >> (4 * k)) % len(VOCAB)] for k in range(6)]
            if self.heavy_decode_px:
                # bench mode: realistic payload pipeline — fetch a large
                # image, PNG-encode ("the wire bytes"), decode-validate,
                # store a 32px thumbnail (decode→resize→store is the
                # standard training-ingest shape; keeps stored bytes small
                # while the per-URL decode work is real)
                from darc_spark.functions.images import decode_png

                px = self.heavy_decode_px
                big = rng.integers(0, 256, size=(px, px, 3), dtype=np.uint8)
                wire = encode_png(big)
                dec = decode_png(wire)
                ys = (np.arange(32) * px) // 32
                thumb = dec[ys][:, ys]
                out.update(
                    image_id=f"img-{host}-{kind}-{pid}",
                    bytes=encode_png(thumb),
                    w=32,
                    h=32,
                    fmt="png",
                    caption=" ".join(words),
                    phash=phash64(big),
                )
                return out
            side = 16 + int(ih % 3) * 8
            arr, fmt, data = image_payload(ih, side)
            out.update(
                image_id=f"img-{host}-{kind}-{pid}",
                bytes=data,
                w=side,
                h=side,
                fmt=fmt,
                caption=" ".join(words),
                phash=phash64(arr),
            )
        return out

    def original_pixels(self, image_id: str) -> np.ndarray:
        """Oracle access to pre-encode pixels (for the PSNR invariant)."""
        _, host, kind, pid = image_id.split("-")
        ih = self._h(host, kind, int(pid), "img")
        side = 16 + int(ih % 3) * 8
        return image_payload(ih, side)[0]

    def image_row(self, i: int) -> dict:
        """One input_hint image row — a pure function of (seed, i), so
        the driver-side oracle export can enumerate the exact payloads
        the distributed :meth:`image_table` generates."""
        from darc_spark.functions.images import phash64

        ih = self._h("imgtable", i)
        side = 16 + (ih % 3) * 8
        arr, fmt, data = image_payload(ih, side)
        words = [VOCAB[(ih >> (4 * k)) % len(VOCAB)] for k in range(6)]
        return {
            "image_id": f"img{i:08d}",
            "bytes": data,
            "w": side,
            "h": side,
            "fmt": fmt,
            "caption": " ".join(words),
            "phash": phash64(arr),
        }

    def image_table(self, spark, n: int = 1000, partitions: int | None = None):
        """The BASELINE.json input table, exactly the input_hint shape:
        ``(image_id string, bytes binary, w int, h int, fmt string,
        caption string, phash long)`` — synthesized deterministically,
        distributed (no driver-side image generation).
        """
        from pyspark.sql import functions as F

        from darc_spark.functions.images import encode_lossy, encode_png, phash64
        from darc_spark.schema import IMAGE

        image_row = self.image_row

        def gen(batches):
            for pdf in batches:
                rows = [image_row(int(i)) for i in pdf["id"]]
                out = pd.DataFrame(rows, columns=[f.name for f in IMAGE.fields])
                out["phash"] = pd.array([r["phash"] for r in rows], dtype="Int64")
                yield out

        base = spark.range(n)
        if partitions:
            base = base.repartition(partitions)
        return base.mapInPandas(gen, IMAGE)

    def render_batch(self, urls: pd.Series) -> pd.DataFrame:
        """Loader-stage fetch: pages + a rendered screenshot PNG per
        non-empty HTML page — a DISTINCT artifact from the page payload
        (darc/crawl.py:333-341 saves both document and screenshot)."""
        df = self.pages_batch(urls)
        shots: list[bytes | None] = []
        for u, ct, html in zip(urls.astype(str), df["content_type"], df["html"]):
            if isinstance(ct, str) and ct.startswith("text/html") and html:
                ih = self._h(u, "shot")
                rng = np.random.default_rng(ih)
                arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                shots.append(encode_png(arr))
            else:
                shots.append(None)
        df["screenshot"] = shots
        return df

    def pages_batch(self, urls: pd.Series) -> pd.DataFrame:
        rows = [self.page(u) for u in urls.astype(str)]
        df = pd.DataFrame(rows, index=urls.index)
        # pandas infers float64 for an int column containing None, which
        # silently destroys the low bits of 63-bit phashes — pin Int64
        df["phash"] = pd.array(
            [r["phash"] for r in rows], dtype="Int64"
        )
        df.index = urls.index
        return df
