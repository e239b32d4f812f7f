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
* ``register_signal(signum, handler)`` (``darc/signal.py:35-63``) —
  driver-side OS-signal handlers. Signals only ever reach the driver
  process (executor tasks are idempotent and replayed), so this is a
  thin registry over :func:`signal.signal` dispatching to every handler
  registered for that signum. :func:`graceful_stop_handler` is the
  SIGTERM-style default: it requests a stop AFTER the current committed
  round (the atomic-commit resume makes anything harsher unnecessary).
"""

from __future__ import annotations

import signal as _signal
from collections import defaultdict
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


# signum → registered handlers, dispatched in order by _generic_handler
SIGNAL_REGISTRY: dict[int, list[Callable[..., Any]]] = defaultdict(list)
# signum → the pre-registry disposition, captured when _generic_handler is
# first installed; later register_signal calls return THIS (the reference's
# signal.signal contract), never _generic_handler itself
_ORIGINAL_DISPOSITION: dict[int, Any] = {}


def _generic_handler(signum: int, frame: Any) -> None:
    """Fan one OS signal out to every registered handler
    (cf. ``darc/signal.py:66-98``; the reference's cross-process forward
    is unnecessary here — Spark work happens in driver-managed tasks)."""
    for fn in SIGNAL_REGISTRY[int(signum)]:
        fn(signum, frame)


def register_signal(
    signum: int, handler: Callable[..., Any], *, _index: int | None = None
) -> Any:
    """Register a driver-side signal handler (cf. ``darc/signal.py:35-63``).

    Returns the pre-registry :func:`signal.signal` disposition, like the
    reference — installing :func:`_generic_handler` only once per signum
    so a second registration doesn't observe (and hand back) the
    registry's own dispatcher as "previous". Handlers receive
    ``(signum, frame)``.
    """
    sigint = int(getattr(signum, "value", signum))
    if _index is None:
        SIGNAL_REGISTRY[sigint].append(handler)
    else:
        SIGNAL_REGISTRY[sigint].insert(_index, handler)
    if _signal.getsignal(sigint) is not _generic_handler:
        # first install — or someone re-bound the signal after us, in
        # which case THEIR handler is the new pre-registry disposition
        _ORIGINAL_DISPOSITION[sigint] = _signal.signal(sigint, _generic_handler)
    return _ORIGINAL_DISPOSITION[sigint]


def graceful_stop_handler(crawler: Any) -> Callable[..., Any]:
    """Handler factory: stop ``crawler`` after the current committed round.

    The crawl loop checks ``break_requested`` between rounds
    (``operators/crawl.py`` ``run()``), so a SIGTERM/SIGINT registered
    with this handler never tears a round — the store resumes exactly.
    """

    def handler(signum: int, frame: Any) -> None:
        crawler.break_requested = True

    return handler
