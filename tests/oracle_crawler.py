"""Single-threaded oracle simulator of the darc crawl loop.

Implements the reference's round semantics (``darc/process.py:78-167``,
``darc/crawl.py:44-354``) with plain dicts — no Spark — over the same
:class:`SynthWeb`, under the same config knobs as the engine's
:class:`~darc_spark.operators.crawl.Crawler`. The e2e test asserts the
engine and this simulator produce the same fetch set per round (crawl
ordering), the same final URL-seen sets, the same edges and special-link
sinks.

Link parsing uses the independent stdlib oracle
(:mod:`tests.oracle_link`); robots decisions use the engine's parser,
itself differential-tested against stdlib ``urllib.robotparser``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from darc_spark.functions.extract import extract_hrefs_one, extract_text_urls_one
from darc_spark.functions.robots import parse_robots
from darc_spark.functions.sitemap import parse_sitemap_one
from darc_spark.operators.crawl import CRAWLABLE_PROXIES, CRAWLABLE_SCHEMES, CrawlConfig
from darc_spark.sources.synth import SynthWeb
from tests.oracle_link import oracle_parse

_HTML_TYPES = ("text/html", "application/xhtml+xml")


@dataclass
class Rec:
    url: str
    host: str | None
    hostname: str
    proxy: str
    scheme: str
    priority: int = 0
    not_before: int = 0
    retry: int = 0
    enqueue_round: int = 0


def _fullmatch_any(patterns, value) -> bool:
    return any(re.fullmatch(p, value) for p in patterns)


class SimFrontier:
    def __init__(self) -> None:
        self.frontier: dict[str, Rec] = {}
        self.seen: set[str] = {}
        self.seen = set()
        self.done: dict[str, int] = {}
        self.leases: dict[str, int] = {}

    def enqueue_nx(self, name: str, rec: Rec) -> None:
        if name in self.seen:
            return
        self.seen.add(name)
        self.frontier[name] = rec

    def requeue(self, name: str, r: int, delay: int = 1) -> None:
        rec = self.frontier[name]
        rec.retry += 1
        rec.not_before = r + delay
        rec.enqueue_round = r

    def drop(self, name: str) -> None:
        self.frontier.pop(name, None)
        self.seen.discard(name)

    def mark_done(self, name: str, revisit_after: int) -> None:
        # latest fetch pushes the deadline forward (darc/db.py:970-972)
        self.done[name] = revisit_after

    def claim(
        self,
        r: int,
        per_host: int,
        lease: int,
        delays: dict[str, int],
        last_fetch: dict[str, int],
        restrict: set[str] | None = None,
    ) -> list[tuple[str, Rec]]:
        claimable = []
        for name, rec in self.frontier.items():
            if restrict is not None and name not in restrict:
                continue
            if rec.not_before > r:
                continue
            if name in self.done and r < self.done[name]:
                continue
            if name in self.leases and self.leases[name] > r:
                continue
            d = delays.get(rec.hostname)
            if d is not None and rec.hostname in last_fetch and r - last_fetch[rec.hostname] < d:
                continue
            claimable.append((name, rec))
        by_host: dict[str, list[tuple[str, Rec]]] = {}
        for name, rec in claimable:
            by_host.setdefault(rec.hostname, []).append((name, rec))
        batch = []
        for host, rows in by_host.items():
            rows.sort(key=lambda nr: (nr[1].priority, nr[1].enqueue_round, nr[1].url))
            batch.extend(rows[:per_host])
        for name, _ in batch:
            self.leases[name] = r + lease
        return batch


class SimCrawler:
    def __init__(self, web: SynthWeb, cfg: CrawlConfig) -> None:
        self.web = web
        self.cfg = cfg
        self.fr_req = SimFrontier()
        self.fr_sel = SimFrontier()
        self.hostname_state: dict[str, int] = {}  # host → last_fetch_round
        self.known_hosts: set[str] = set()
        self.robots_fetch_round: dict[str, int] = {}  # host → last robots fetch
        self.robots: dict[str, tuple[int, str]] = {}
        # (round, hostname, url, status, is_html, n_links) — n_links
        # matches the engine's fetches.n_links (size of the extracted
        # array: 0 for non-HTML and empty bodies)
        self.fetches: list[tuple[int, str, str, int, bool, int]] = []
        self.fetches_sel: list[tuple[int, str, str, int, bool, int]] = []
        self.edges: set[tuple[str, str]] = set()
        self.special: set[tuple[str, str]] = set()
        self.round = 0

    # -- helpers ---------------------------------------------------------------
    def _match_proxy_drop(self, proxy: str) -> bool:
        cfg = self.cfg
        if proxy == "script":
            return True
        if proxy in cfg.proxy_black:
            return True
        if proxy in cfg.proxy_white:
            return False
        return cfg.proxy_fallback

    def _match_host_drop(self, host: str | None) -> bool:
        cfg = self.cfg
        if host is None:
            return True
        if _fullmatch_any(cfg.host_black, host):
            return True
        if _fullmatch_any(cfg.host_white, host):
            return False
        return cfg.host_fallback

    def _match_mime_drop(self, mime: str) -> bool:
        cfg = self.cfg
        if _fullmatch_any(cfg.mime_black, mime):
            return True
        if _fullmatch_any(cfg.mime_white, mime):
            return False
        return cfg.mime_fallback

    def _rec(self, parsed: dict, r: int) -> Rec:
        return Rec(
            url=parsed["url"],
            host=parsed["host"],
            hostname=parsed["hostname"],
            proxy=parsed["proxy"],
            scheme=parsed["scheme"],
            not_before=r,
            enqueue_round=r,
        )

    def _route(self, urls: list[str], r: int, parent: dict | None = None) -> None:
        """_enqueue_extracted mirror: special sinks vs filtered enqueue."""
        for u in urls:
            p = oracle_parse(u)
            crawlable = (
                p["proxy"] in CRAWLABLE_PROXIES and p["scheme"] in CRAWLABLE_SCHEMES
            )
            if not crawlable:
                self.special.add((p["proxy"] or "invalid", u))
                continue
            if self._match_proxy_drop(p["proxy"]) or self._match_host_drop(p["host"]):
                continue
            if parent is not None:
                self.edges.add((parent["name"], p["name"]))
            self.fr_req.enqueue_nx(p["name"], self._rec(p, r))

    def _robots_allowed(self, rec: Rec, url: str) -> bool:
        import urllib.parse

        path = urllib.parse.urlparse(url).path
        if path in ("", "/"):
            return True
        doc = self.robots.get(rec.hostname)
        if doc is None:
            return True
        status, text = doc
        if status in (401, 403):
            return False
        if 400 <= status < 500 or not text:
            return True
        return parse_robots(text).can_fetch(self.cfg.user_agent, url)

    def _delays(self) -> dict[str, int]:
        out = {}
        for h, (status, text) in self.robots.items():
            if status != 200 or not text:
                continue
            d = parse_robots(text).crawl_delay(self.cfg.user_agent)
            if d:
                out[h] = int(math.ceil(d / self.cfg.seconds_per_round))
        return out

    def _new_host_gate(
        self,
        batch: list[tuple[str, Rec]],
        r: int,
        route_buffer: list,
    ) -> None:
        hosts = {}
        for _, rec in batch:
            hosts.setdefault(rec.hostname, rec.proxy)
        tc = self.cfg.time_cache_rounds
        for h, proxy in sorted(hosts.items()):
            self.hostname_state[h] = r
            if h in self.known_hosts:
                # TIME_CACHE force-refetch: lease keyed on the last ACTUAL
                # robots fetch, bumped only on fetch (darc/db.py:293-318)
                if tc is None or self.robots_fetch_round.get(h, r) >= r - tc:
                    continue
            self.known_hosts.add(h)
            self.robots_fetch_round[h] = r
            status, text = self.web.robots_txt(h)
            self.robots[h] = (status, text)
            if proxy not in ("zeronet", "freenet"):
                sm_urls = (
                    parse_robots(text).sitemaps if status == 200 and text else []
                ) or [f"http://{h}/sitemap.xml"]
                queue = list(dict.fromkeys(sm_urls))
                visited, depth = set(queue), 0
                while queue and depth < 3:
                    nxt = []
                    for sm in queue:
                        st, xml = self.web.sitemap_xml(sm)
                        if st != 200:
                            continue
                        pages, children = parse_sitemap_one(sm, xml)
                        route_buffer.append((pages, None))
                        for child in children:
                            if child not in visited:
                                visited.add(child)
                                nxt.append(child)
                    queue, depth = nxt, depth + 1
            if proxy == "i2p":
                status, text = self.web.hosts_txt(h)
                if status == 200 and text:
                    route_buffer.append((self._read_i2p_hosts(text), None))

    # -- the round --------------------------------------------------------------
    def seed(self, urls: list[str]) -> None:
        for u in urls:
            p = oracle_parse(u)
            self.fr_req.enqueue_nx(p["name"], self._rec(p, self.round))

    def _read_i2p_hosts(self, text: str) -> list[str]:
        found = []
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            host = line.split("=", 1)[0]
            if re.fullmatch(r".*?\.i2p", host):
                found.append(f"http://{host}")
        return found

    def run_round(self) -> dict[str, float]:
        """Mirrors the ENGINE's batch phase order exactly: claim-filter
        drops → new-host gate → fetch all → no-return/mime drops →
        buffered routing flushed as ONE enqueue batch → done marks →
        failure requeues/drops LAST. (Per-link interleaving would make
        same-round drop/re-add order-dependent — the engine is batch.)"""
        r = self.round
        cfg = self.cfg
        m: dict[str, float] = {}
        # engine commits at round end: pages promoted to the render queue
        # during round r only become claimable in r+1 — snapshot mirrors that
        sel_snapshot = set(self.fr_sel.frontier.keys())

        # ---- requests stage
        claimed = self.fr_req.claim(
            r, cfg.per_host, cfg.lease, self._delays() if cfg.robots_enabled else {},
            self.hostname_state,
        )
        m["claimed_requests"] = float(len(claimed))
        keep = []
        for name, rec in claimed:
            if self._match_proxy_drop(rec.proxy) or self._match_host_drop(rec.host):
                self.fr_req.drop(name)
            else:
                keep.append((name, rec))
        route_buffer: list[tuple[list[str], dict | None]] = []
        self._new_host_gate(keep, r, route_buffer)
        allowed = [
            (n, rec)
            for n, rec in keep
            if not cfg.robots_enabled or self._robots_allowed(rec, rec.url)
        ]
        mime_drops: list[str] = []
        generic_done: list[str] = []
        ok_done: list[tuple[str, Rec]] = []
        failures: list[str] = []
        for name, rec in allowed:
            page = self.web.page(rec.url)
            status = page["status_code"]
            ct = (page["content_type"] or "").lower().split(";")[0].strip()
            html = page["html"] or ""
            is_html = ct in _HTML_TYPES
            links: list[str] = []
            if is_html and html:
                links = extract_hrefs_one(rec.url, html)
                links.extend(extract_text_urls_one(re.sub(r"<[^>]*>", " ", html)))
            self.fetches.append(
                (r, rec.hostname, rec.url, status, is_html, len(links))
            )
            if not is_html:
                if self._match_mime_drop(ct):
                    mime_drops.append(name)
                    continue
                if rec.proxy == "i2p" and ct in ("text/plain", "text/text") and html:
                    route_buffer.append((self._read_i2p_hosts(html), None))
                generic_done.append(name)
                continue
            if not html:
                failures.append(name)
                continue
            route_buffer.append((links, {"name": name, "url": rec.url}))
            if status < 400:
                ok_done.append((name, rec))
            else:
                failures.append(name)
        # engine phase order
        for name in mime_drops:
            self.fr_req.drop(name)
        for name in generic_done:
            self.fr_req.mark_done(name, r + cfg.revisit)
        for urls, parent in route_buffer:
            self._route(urls, r, parent=parent)
        for name, rec in ok_done:
            self.fr_req.mark_done(name, r + cfg.revisit)
            if cfg.selenium_enabled:
                p = oracle_parse(rec.url)
                self.fr_sel.enqueue_nx(p["name"], self._rec(p, r))
        for name in failures:
            self._retry_or_drop(self.fr_req, name, r)

        # ---- selenium stage
        if cfg.selenium_enabled:
            claimed_sel = self.fr_sel.claim(
                r, cfg.per_host, cfg.lease, {}, {}, restrict=sel_snapshot
            )
            m["claimed_selenium"] = float(len(claimed_sel))
            sel_routes: list[list[str]] = []
            sel_done: list[str] = []
            sel_failures: list[str] = []
            for name, rec in claimed_sel:
                if self._match_proxy_drop(rec.proxy) or self._match_host_drop(rec.host):
                    self.fr_sel.drop(name)
                    continue
                page = self.web.page(rec.url)
                ct = (page["content_type"] or "").lower().split(";")[0].strip()
                html = page["html"] or ""
                is_html = ct in _HTML_TYPES
                links = []
                if is_html and html:
                    links = extract_hrefs_one(rec.url, html)
                    links.extend(extract_text_urls_one(re.sub(r"<[^>]*>", " ", html)))
                self.fetches_sel.append(
                    (r, rec.hostname, rec.url, page["status_code"], is_html, len(links))
                )
                if is_html and html:
                    sel_routes.append(links)
                    sel_done.append(name)
                else:
                    sel_failures.append(name)
            for links in sel_routes:
                self._route(links, r)
            for name in sel_done:
                self.fr_sel.mark_done(name, r + cfg.revisit)
            for name in sel_failures:
                self._retry_or_drop(self.fr_sel, name, r)

        self.round = r + 1
        return m

    def _retry_or_drop(self, fr: SimFrontier, name: str, r: int) -> None:
        if fr.frontier[name].retry < self.cfg.max_retries:
            fr.requeue(name, r, delay=1)
        else:
            fr.drop(name)

    def run(self, rounds: int) -> None:
        for _ in range(rounds):
            m = self.run_round()
            if m.get("claimed_requests", 0) == 0 and m.get("claimed_selenium", 0) == 0:
                break
