"""robots.txt → rules rows, and a vectorized can-fetch gate.

Reference behavior: the vendored CPython ``RobotFileParser``
(``darc/_robotparser.py:87-212``) consulted per link in ``check_robots``
(``darc/parse.py:158-183``) with two extra rules: the **root path is
always allowed** (darc/parse.py:171-173) and a missing/unfetched
robots.txt allows everything.

Spark-first shape: robots documents are parsed ONCE per host by a
batched function into ``(hostname, agent, rule_index, path_prefix,
allow, crawl_delay, request_rate)`` rows (table ``robots_rules``), the
rules relevant to the crawler's user-agent are collapsed to a per-host
``array<struct<prefix,allow>>`` policy dim, and the frontier gate is a
**broadcast join** on hostname + a vectorized prefix evaluator — the
robots dim is tiny next to a 10^10-row frontier, so the gate costs no
shuffle (SURVEY.md §2.2 F4, §2.3 J4).

This parser is written fresh against the published robots.txt protocol
with CPython-compatible semantics: first matching user-agent entry
wins, rule lines evaluated in file order, first prefix match decides,
empty-Disallow means allow-all, ``*`` path matches everything.
Differentially tested against stdlib ``urllib.robotparser``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import quote, unquote, urlparse, urlunparse

import pandas as pd


@dataclass
class RobotsEntry:
    agents: list[str] = field(default_factory=list)
    # (path_prefix, allow) in file order; prefix already re-quoted
    rules: list[tuple[str, bool]] = field(default_factory=list)
    crawl_delay: int | None = None
    request_rate: float | None = None  # requests per second


@dataclass
class RobotsPolicy:
    entries: list[RobotsEntry] = field(default_factory=list)
    default: RobotsEntry | None = None
    sitemaps: list[str] = field(default_factory=list)
    disallow_all: bool = False
    allow_all: bool = False

    def _entry_for(self, useragent: str) -> RobotsEntry | None:
        ua = useragent.split("/")[0].lower()
        for entry in self.entries:
            for agent in entry.agents:
                if agent == "*" or agent.lower() in ua:
                    return entry
        return self.default

    def can_fetch(self, useragent: str, url: str) -> bool:
        if self.disallow_all:
            return False
        if self.allow_all:
            return True
        path = _norm_path(url)
        entry = self._entry_for(useragent)
        if entry is None:
            return True
        return _allowance(entry.rules, path)

    def crawl_delay(self, useragent: str) -> int | None:
        entry = self._entry_for(useragent)
        return entry.crawl_delay if entry else None

    def request_rate(self, useragent: str) -> float | None:
        entry = self._entry_for(useragent)
        return entry.request_rate if entry else None


def _norm_path(url: str) -> str:
    try:
        parsed = urlparse(unquote(url))
        path = urlunparse(("", "", parsed.path, parsed.params, parsed.query, parsed.fragment))
        path = quote(path)
    except ValueError:
        path = url
    return path or "/"


def _norm_rule_path(path: str) -> str:
    try:
        parsed = urlparse(path)
        path = urlunparse(("", "", parsed.path, parsed.params, parsed.query, parsed.fragment))
        return quote(path)
    except ValueError:
        return path


def _allowance(rules: list[tuple[str, bool]], path: str) -> bool:
    for prefix, allow in rules:
        if prefix == "*" or path.startswith(prefix):
            return allow
    return True


def parse_robots(text: str) -> RobotsPolicy:
    """State-machine parse of one robots.txt document."""
    policy = RobotsPolicy()
    state = 0  # 0 start, 1 saw UA, 2 saw rule
    entry = RobotsEntry()

    def flush(e: RobotsEntry) -> None:
        if "*" in e.agents:
            if policy.default is None:
                policy.default = e
        else:
            policy.entries.append(e)

    for raw in (text or "").splitlines():
        line = raw
        if not line.strip():
            if state == 1:
                entry = RobotsEntry()
                state = 0
            elif state == 2:
                flush(entry)
                entry = RobotsEntry()
                state = 0
        i = line.find("#")
        if i >= 0:
            line = line[:i]
        line = line.strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = unquote(value.strip())
        if key == "user-agent":
            if state == 2:
                flush(entry)
                entry = RobotsEntry()
            entry.agents.append(value)
            state = 1
        elif key == "disallow" and state != 0:
            # empty Disallow == allow everything (protocol)
            if value == "":
                entry.rules.append(("", True))
            else:
                entry.rules.append((_norm_rule_path(value), False))
            state = 2
        elif key == "allow" and state != 0:
            entry.rules.append((_norm_rule_path(value), True))
            state = 2
        elif key == "crawl-delay" and state != 0:
            if value.strip().isdigit():
                entry.crawl_delay = int(value)
            state = 2
        elif key == "request-rate" and state != 0:
            parts = value.split("/")
            if len(parts) == 2 and parts[0].strip().isdigit() and parts[1].strip().isdigit():
                denom = int(parts[1])
                if denom:
                    entry.request_rate = int(parts[0]) / denom
            state = 2
        elif key == "sitemap":
            policy.sitemaps.append(value)
    if state == 2:
        flush(entry)
    return policy


def robots_rules_rows(
    hostnames: pd.Series, texts: pd.Series, status_codes: pd.Series | None = None
) -> pd.DataFrame:
    """Batch: robots documents → ``robots_rules`` rows (schema.ROBOTS_RULES).

    HTTP-status semantics mirror stdlib/reference ``read()``: 401/403 →
    disallow all; 4xx else → allow all (no rules rows); non-text content
    handled upstream (content-type gate, darc/proxy/null.py:264-270).
    """
    out: list[dict] = []
    n = len(hostnames)
    codes = status_codes if status_codes is not None else pd.Series([200] * n)
    for host, text, code in zip(hostnames.astype(str), texts, codes):
        code = int(code) if pd.notna(code) else 200
        if code in (401, 403):
            out.append(
                {
                    "hostname": host,
                    "agent": "*",
                    "rule_index": 0,
                    "path_prefix": "*",
                    "allow": False,
                    "crawl_delay": None,
                    "request_rate": None,
                }
            )
            continue
        if 400 <= code < 500:
            continue  # allow-all: no rows
        policy = parse_robots(text if isinstance(text, str) else "")
        entries = policy.entries + ([policy.default] if policy.default else [])
        for entry in entries:
            for agent in entry.agents:
                for idx, (prefix, allow) in enumerate(entry.rules):
                    out.append(
                        {
                            "hostname": host,
                            "agent": agent,
                            "rule_index": idx,
                            "path_prefix": prefix,
                            "allow": allow,
                            "crawl_delay": entry.crawl_delay,
                            "request_rate": entry.request_rate,
                        }
                    )
                if not entry.rules:
                    # keep delay/rate-only entries visible
                    if entry.crawl_delay is not None or entry.request_rate is not None:
                        out.append(
                            {
                                "hostname": host,
                                "agent": agent,
                                "rule_index": 0,
                                "path_prefix": "",
                                "allow": True,
                                "crawl_delay": entry.crawl_delay,
                                "request_rate": entry.request_rate,
                            }
                        )
    df = pd.DataFrame(
        out,
        columns=[
            "hostname",
            "agent",
            "rule_index",
            "path_prefix",
            "allow",
            "crawl_delay",
            "request_rate",
        ],
    )
    # Pin dtypes: pandas infers int+None as float64, which the declared
    # IntegerType rejects at createDataFrame (2.0 is not an int). Nullable
    # Int32 round-trips through Arrow and schema verification cleanly.
    return df.astype(
        {
            "rule_index": "int32",
            "allow": "bool",
            "crawl_delay": "Int32",
            "request_rate": "float64",
        }
    )


def can_fetch_batch(
    urls: pd.Series,
    policies: pd.Series,
    useragent: str = "*",
    statuses: pd.Series | None = None,
) -> pd.Series:
    """Vectorized gate: (url, per-host policy text[, fetch status]) → allowed?

    ``policies`` carries the raw robots text per row (joined in from the
    per-host dim; None/NaN ⇒ no robots ⇒ allowed). Root path is always
    allowed — checked BEFORE everything else (darc/parse.py:171-173).
    Status semantics mirror ``read()``: 401/403 ⇒ disallow all, other
    4xx ⇒ allow all. Policies are parsed once per unique text within the
    batch — one host's policy never reparses per row.
    """
    cache: dict[str, RobotsPolicy] = {}
    codes = statuses if statuses is not None else pd.Series([200] * len(urls))
    res = []
    for url, text, code in zip(urls.astype(str), policies, codes):
        try:
            path = urlparse(url).path
        except ValueError:
            path = ""
        if path in ("", "/"):
            res.append(True)
            continue
        code = int(code) if pd.notna(code) else 200
        if code in (401, 403):
            res.append(False)
            continue
        if 400 <= code < 500 or not isinstance(text, str) or not text:
            res.append(True)
            continue
        policy = cache.get(text)
        if policy is None:
            policy = cache[text] = parse_robots(text)
        res.append(policy.can_fetch(useragent, url))
    return pd.Series(res, index=urls.index, dtype=bool)
