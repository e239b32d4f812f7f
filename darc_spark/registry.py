"""Extension registry — Spark-native equivalent of darc's plugin API.

Reference surface (``darc/__init__.py:47-55``):

* ``register_sites(site, *hostnames)`` (``darc/sites/__init__.py:61-76``)
  — per-host crawler/loader overrides. Here: a host→callable map that the
  fetch UDF consults (broadcast to executors as a plain dict captured in
  the UDF closure; entries must be picklable pure functions).
* ``register_proxy(proxy, ...)`` (``darc/proxy/__init__.py:38-50``) —
  proxy-type→fetch-config map (e.g. tor SOCKS port). Here: config rows
  joined map-side against the frontier's ``proxy`` column.
* ``register_hooks(fn)`` (``darc/process.py:45-75``) — between-round
  driver callbacks; a hook may raise :class:`WorkerBreak` to stop the loop
  (reference: ``darc/error.py:69``).
"""

from __future__ import annotations

from typing import Any, Callable


class WorkerBreak(Exception):
    """Raised by a hook to request a graceful stop after this round."""


class LinkNoReturn(Exception):
    """A site handler signals the link must be dropped permanently.

    Mirrors ``darc/error.py:40-55``: ``drop=True`` removes the link from
    the frontier; ``drop=False`` leaves it leased (retried after expiry).
    """

    def __init__(self, link: Any = None, *, drop: bool = True) -> None:
        super().__init__(link)
        self.link = link
        self.drop = drop


# host → site handler: fn(batch: "pd.DataFrame") -> "pd.DataFrame"
SITE_MAP: dict[str, Callable[..., Any]] = {}
# proxy type → config dict (ports etc.; informational in the sandbox)
PROXY_MAP: dict[str, dict[str, Any]] = {
    "null": {},
    "tor": {"socks_port": 9050},
    "i2p": {"http_proxy_port": 4444},
    "zeronet": {"port": 43110},
    "freenet": {"port": 8888},
}
# between-round driver callbacks: fn(round_index: int, crawler: Any) -> None
HOOKS: list[Callable[..., Any]] = []


def register_sites(site: Callable[..., Any], *hostnames: str) -> None:
    """Register a per-host site handler (cf. ``darc/sites/__init__.py:61-76``)."""
    for hostname in hostnames:
        SITE_MAP[hostname.casefold()] = site


def register_proxy(proxy: str, config: dict[str, Any] | None = None) -> None:
    """Register a proxy-type fetch config (cf. ``darc/proxy/__init__.py:38-50``)."""
    PROXY_MAP[proxy] = dict(config or {})


def register_hooks(fn: Callable[..., Any]) -> None:
    """Register a between-round hook (cf. ``darc/process.py:45-75``)."""
    HOOKS.append(fn)
