"""The crawl loop — darc's two-worker round pipeline, Spark-first.

One round = one deterministic batch pipeline over snapshot state
(reference: ``process_crawler``/``process_loader`` round loops,
``darc/process.py:78-167``; per-link flow ``darc/crawl.py:44-354``):

  claim (politeness window) → claim-time filters (drop) → new-host gate
  (robots/sitemap/hosts.txt) → robots gate → fetch+extract (mapInPandas)
  → route extracted links (special sinks / filters / enqueue-NX) →
  done / requeue / drop → lineage edges + metrics → snapshot commit.

Stage 2 (``selenium``/loader queue) mirrors darc's render worker: pages
promoted on HTTP-ok re-fetch, their extractions feed back into the
requests queue (``darc/crawl.py:349``).

Semantic equivalences vs the reference (asserted by the e2e oracle):

* success leaves the row invisible until ``revisit`` rounds pass — the
  reference never marks "done"; its claim lease (re-score to
  now+TIME_CACHE, ``darc/db.py:970-972``) IS the done state.
* failed HTML responses still extract + enqueue links (the reference
  extracts before the ``response.ok`` check, ``darc/crawl.py:222-230``).
* robots-disallowed rows are neither requeued nor dropped — they stay
  leased and retry after expiry (``darc/crawl.py:168-170`` just returns).
* special-scheme links go to their sink and never enter the queue
  (net-equivalent to the reference's enqueue→claim→LinkNoReturn→drop
  cycle; final queue/seen state identical, one round earlier).
* every mutation of one round commits atomically; a killed run resumes
  at the last committed round with identical state (north rule).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from darc_spark.functions.canon import with_parsed_link
from darc_spark.functions.robots import can_fetch_batch, parse_robots, robots_rules_rows
from darc_spark.functions.sitemap import parse_sitemap_one
from darc_spark.operators.fetch import run_fetch
from darc_spark.operators.filters import (
    match_host_drop,
    match_mime_drop,
    match_proxy_drop,
)
from darc_spark.operators.frontier import Frontier
from darc_spark.registry import HOOKS, WorkerBreak
from darc_spark.schema import EDGES, FETCHES, HOSTNAME_STATE, METRICS, SPECIAL_LINKS
from darc_spark.sources.store import SnapshotStore
from darc_spark.sources.synth import SynthWeb

ROBOTS_DOCS = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("fetch_round", T.LongType(), False),
    ]
)

CRAWLABLE_PROXIES = ("null", "tor", "tor2web", "i2p", "zeronet", "freenet")
CRAWLABLE_SCHEMES = ("http", "https")


@dataclass
class CrawlConfig:
    per_host: int = 8  # politeness budget per round (MAX_POOL analogue)
    lease: int = 3  # visibility-timeout rounds (TIME_CACHE analogue)
    revisit: int = 1 << 40  # rounds before a fetched page is re-fetched
    max_retries: int = 3  # engine termination guard (darc retries forever)
    salt_shards: int = 8
    # hot-host salt escalation: hosts with more pending rows than this get
    # proportionally more phase-1 shards (north rule skew handling);
    # result-identical for any threshold, so on by default. "auto" derives
    # the threshold each round from the PREVIOUS round's host-pending
    # metrics in the commit manifest (8× the mean pending per host,
    # floored at per_host·salt_shards) — a host that becomes hot
    # mid-crawl escalates with no config change.
    escalate_above: "int | str | None" = 1 << 16
    robots_enabled: bool = True  # FORCE=0 (darc/const.py)
    # hostname-gate lease (darc TIME_CACHE, darc/db.py:293-318): hosts whose
    # last robots/sitemap/hosts.txt fetch is older than this many rounds are
    # force-refetched on next claim. None = never (reference TIME_CACHE=None).
    time_cache_rounds: int | None = None
    # wall-clock lease mode (darc's TIME_CACHE is seconds-denominated,
    # darc/const.py:134-139; deployments set 30-day leases,
    # docker-compose.yml:103). "time" makes the staleness cutoff a real
    # timestamp comparison: each round records its wall-clock start in
    # the commit manifest, and a host is stale when its last fetch
    # happened in a round that STARTED more than time_cache_seconds ago.
    # Rounds stay the event-log denomination — no schema change; the
    # manifest provides the round→timestamp mapping (resume-safe).
    lease_mode: str = "round"  # "round" | "time"
    time_cache_seconds: float | None = None
    # injectable clock for tests; None = time.time
    clock: "Callable[[], float] | None" = None
    user_agent: str = "darc-spark"
    seconds_per_round: int = 1  # maps robots Crawl-delay seconds → rounds
    selenium_enabled: bool = True
    proxy_white: tuple = ()
    proxy_black: tuple = ()
    proxy_fallback: bool = False
    host_white: tuple = ()
    host_black: tuple = ()
    host_fallback: bool = False
    mime_white: tuple = ()
    mime_black: tuple = ()
    mime_fallback: bool = False
    filter_kind: str = "cuckoo"
    n_filter_buckets: int = 8
    use_seen_filter: bool = True
    compact_every: int = 0  # 0 = never
    extract_from_failed: bool = True
    check_ng: bool = False  # HEAD content-type precheck of extracted links


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        web: SynthWeb | None = None,
        config: CrawlConfig | None = None,
        poster: "Callable | None" = None,
    ) -> None:
        self.spark = spark
        self.web = web or SynthWeb()
        self.cfg = config or CrawlConfig()
        self.store = SnapshotStore(spark, root)
        # optional API-submit sink (darc/submit.py): when a poster is
        # given, each round renders and POSTs the three event domains
        # with bounded retry + spill/replay. None (default) = archive-only
        # deployment, zero extra jobs per round.
        self.submit_sink = None
        if poster is not None:
            from darc_spark.operators.submit_sink import SubmitSink

            self.submit_sink = SubmitSink(self.store, poster)
        self.store.schemas.setdefault("robots_docs", ROBOTS_DOCS)
        self.fr_req = Frontier(
            self.store,
            "requests",
            n_filter_buckets=self.cfg.n_filter_buckets,
            filter_kind=self.cfg.filter_kind,
        )
        self.fr_sel = Frontier(
            self.store,
            "selenium",
            n_filter_buckets=self.cfg.n_filter_buckets,
            filter_kind=self.cfg.filter_kind,
        )
        self.round = int(self.store.latest_meta().get("round", -1)) + 1
        # wall-clock lease support: round → wall-clock start, rebuilt
        # from committed manifest metas so a resumed run keeps the full
        # timeline (time-mode leases survive a kill exactly like state)
        import time as _time

        self.clock = self.cfg.clock or _time.time
        self._round_ts: dict[int, float] = {}
        # stale_floor: every round below it is KNOWN-stale (its ts aged
        # past the TIME_CACHE window before being pruned from round_ts)
        # — carried like round_ts so the history stays bounded without
        # ever un-staling a pruned round
        self._stale_floor: int | None = None
        for meta in self._all_manifest_metas():
            # each commit carries the live round→ts history ("round_ts"),
            # so lease decisions survive expire_snapshots dropping the
            # old manifests that originally recorded those rounds; the
            # per-manifest ("round", "ts") pair covers pre-history
            # manifests. Later manifests win on merge (sorted order).
            for rr, ts in meta.get("round_ts", {}).items():
                self._round_ts[int(rr)] = float(ts)
            if "round" in meta and "ts" in meta:
                self._round_ts[int(meta["round"])] = float(meta["ts"])
            if meta.get("stale_floor") is not None:
                sf = int(meta["stale_floor"])
                if self._stale_floor is None or sf > self._stale_floor:
                    self._stale_floor = sf

    def _commit(self, meta: dict) -> None:
        """Commit with the round→ts history attached — EVERY manifest
        this class writes must carry the live ``round_ts`` map, or a
        later ``expire_snapshots`` surviving only that manifest would
        erase the lease timeline (hosts fetched in expired rounds would
        permanently escape TIME_CACHE refetch).

        The map is BOUNDED (round-5 demerit: O(rounds) manifest growth):
        in wall-clock lease mode, rounds whose timestamp has already
        aged past the TIME_CACHE window are pruned and replaced by the
        scalar ``stale_floor`` — "every round below this is stale" —
        which :meth:`_time_cache_cutoff` folds back in, so lease
        decisions are identical while each manifest carries only the
        rounds still inside the window."""
        cfg = self.cfg
        if (
            cfg.lease_mode == "time"
            and cfg.time_cache_seconds is not None
            and hasattr(self, "_round_now")
        ):
            cutoff = self._time_cache_cutoff(self.round)
            if cutoff is not None:
                pruned = {
                    rr: ts for rr, ts in self._round_ts.items() if rr >= cutoff
                }
                if len(pruned) < len(self._round_ts):
                    self._round_ts = pruned
                if self._stale_floor is None or cutoff > self._stale_floor:
                    self._stale_floor = cutoff
        if self._round_ts:
            meta = {
                **meta,
                "round_ts": {str(rr): ts for rr, ts in self._round_ts.items()},
            }
        if self._stale_floor is not None:
            meta = {**meta, "stale_floor": self._stale_floor}
        self.store.commit(meta)

    def _all_manifest_metas(self) -> list[dict]:
        import json as _json
        import os as _os
        import re as _re

        out = []
        mdir = _os.path.join(self.store.root, "_manifests")
        for fn in sorted(_os.listdir(mdir)):
            if not _re.match(r"^v\d{6}\.json$", fn):
                continue
            # tolerate a torn/corrupt historical manifest exactly like
            # _load_latest does — one unreadable file must not make the
            # crawler unconstructable (the latest good manifest still
            # defines state; a skipped meta only loses optional history)
            try:
                with open(_os.path.join(mdir, fn)) as f:
                    out.append(_json.load(f).get("meta", {}))
            except (OSError, ValueError):
                continue
        return out

    def _escalation_threshold(self) -> int | None:
        """Resolve the hot-host salt-escalation threshold for this round.

        Static int/None pass through. "auto" reads the previous round's
        ``host_pending_mean`` from the last commit manifest: a host is
        escalated when its pending exceeds 8× the fleet mean (floored at
        per_host·salt_shards so quiet crawls never escalate). Escalation
        is result-identical for ANY threshold (politeness.per_host_top_k
        phase 2 re-ranks with the full total order), so the derived value
        only shapes phase-1 task sizes — there is no correctness risk in
        the heuristic."""
        cfg = self.cfg
        if cfg.escalate_above != "auto":
            return cfg.escalate_above
        floor = max(1, cfg.per_host * cfg.salt_shards)
        mean = self.store.latest_meta().get("metrics", {}).get(
            "host_pending_mean"
        )
        if not mean:
            return floor * 4  # cold start: no history yet
        return max(floor, int(mean * 8))

    def _time_cache_cutoff(self, r: int) -> int | None:
        """The round below which a host's last robots fetch counts as
        stale, or None when TIME_CACHE is off. Round mode: r − k.
        Time mode: the smallest recorded round whose wall-clock start is
        still inside the window (timestamps are monotone in round, so
        "fetched before that round" ⇔ "fetched more than
        time_cache_seconds ago")."""
        cfg = self.cfg
        if cfg.lease_mode == "time":
            if cfg.time_cache_seconds is None:
                return None
            horizon = self._round_now - cfg.time_cache_seconds
            # stale ⇔ KNOWN older than the window: the cutoff is one past
            # the newest recorded round already outside it (rounds below
            # are at least as old — monotone). Rounds with no recorded
            # timestamp (pre-feature manifests, expired history) above
            # that point count as FRESH: unknown age must not trigger a
            # fleet-wide robots refetch storm on resume.
            stale = [
                rr for rr, ts in self._round_ts.items() if ts < horizon
            ]
            cut = max(stale) + 1 if stale else None
            # fold in the carried floor: rounds pruned from round_ts
            # were stale when pruned and stay stale forever
            if self._stale_floor is not None:
                cut = (
                    self._stale_floor
                    if cut is None
                    else max(cut, self._stale_floor)
                )
            return cut
        if cfg.time_cache_rounds is not None:
            return r - cfg.time_cache_rounds
        return None

    # -- seeding ---------------------------------------------------------------
    def seed(self, urls: list[str]) -> None:
        """CLI-seed ingest (darc/__main__.py:145-161): parse → enqueue NX."""
        df = self.spark.createDataFrame([(u,) for u in urls], "url string")
        links = with_parsed_link(df).withColumn("backref", F.lit(None).cast("string"))
        self.fr_req.enqueue_nx(links, self.round, use_filter=self.cfg.use_seen_filter)
        # the filter add is deferred by enqueue_nx; flush before commit
        # so the seed segment and its filter entries publish atomically
        self.fr_req.flush_filter_updates()
        self._commit({"round": self.round - 1, "op": "seed"})

    # -- state dims --------------------------------------------------------------
    def _hostname_state(self, include_staged: bool = False) -> DataFrame:
        """Aggregate the hostname_state event log to one row per host.

        ``include_staged=True`` gives read-your-writes within the round
        (needed by the submit stage: round r's first-seen rows are staged
        until the end-of-round commit, so a committed-only read would
        never see a new host in round r).
        """
        ev = (
            self.store.read_all("hostname_state")
            if include_staged
            else self.store.read("hostname_state")
        )
        return ev.groupBy("hostname").agg(
            F.first("proxy", ignorenulls=True).alias("proxy"),
            F.min("first_seen_round").alias("first_seen_round"),
            F.max("last_fetch_round").alias("last_fetch_round"),
        )

    def _robots_docs(self, extra: DataFrame | None = None) -> DataFrame:
        docs = self.store.read_all("robots_docs")
        if extra is not None:
            docs = docs.unionByName(extra)
        return docs.groupBy("hostname").agg(
            F.max_by("text", "fetch_round").alias("robots_txt"),
            F.max_by("status_code", "fetch_round").alias("robots_status"),
        )

    def _robots_delays(self) -> DataFrame | None:
        # latest doc per host: TIME_CACHE force-refetch appends a new row
        # per re-fetch, and a duplicate hostname here would fan out the
        # claim join
        docs = (
            self.store.read("robots_docs")
            .groupBy("hostname")
            .agg(
                F.max_by("text", "fetch_round").alias("text"),
                F.max_by("status_code", "fetch_round").alias("status_code"),
            )
        )
        ua, spr = self.cfg.user_agent, self.cfg.seconds_per_round

        def derive(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for _, r in pdf.iterrows():
                    if r["status_code"] != 200 or not r["text"]:
                        continue
                    delay = parse_robots(r["text"]).crawl_delay(ua)
                    if delay:
                        rows.append(
                            {
                                "hostname": r["hostname"],
                                "crawl_delay_rounds": int(math.ceil(delay / spr)),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=["hostname", "crawl_delay_rounds"]
                )

        return docs.mapInPandas(derive, "hostname string, crawl_delay_rounds int")

    def _rules_rows_df(self, docs: DataFrame) -> DataFrame:
        """robots docs → parsed rules rows (schema.ROBOTS_RULES)."""

        def derive(pdf_iter):
            for pdf in pdf_iter:
                yield robots_rules_rows(
                    pdf["hostname"], pdf["text"], pdf["status_code"]
                )

        return docs.mapInPandas(derive, self.store.schemas["robots_rules"])

    # -- new-host gate ---------------------------------------------------------
    def _new_host_gate(
        self,
        batch: DataFrame,
        r: int,
        kept_acc: list[DataFrame],
        special_acc: list[DataFrame],
    ) -> DataFrame | None:
        """robots/sitemap/hosts.txt for first-seen OR expired hosts
        (darc/crawl.py:141-166 gated by have_hostname, darc/db.py:293-318).

        "Expired" is the TIME_CACHE lease: the last actual robots fetch
        (max ``fetch_round`` in robots_docs — bumped only on fetch, like
        the reference's redis score) is older than
        ``cfg.time_cache_rounds``. Returns this round's fresh robots docs
        (also appended to the store) so the robots gate sees them before
        commit.
        """
        hosts = batch.select("hostname", "proxy").dropDuplicates(["hostname"])
        last_fetch = (
            self.store.read_all("robots_docs")
            .groupBy("hostname")
            .agg(F.max("fetch_round").alias("_lf"))
        )
        stale = F.col("_lf").isNull()  # never fetched ⇒ new host
        cutoff = self._time_cache_cutoff(r)
        if cutoff is not None:
            stale = stale | (F.col("_lf") < F.lit(cutoff))
        cand = (
            hosts.join(last_fetch, "hostname", "left")
            .filter(stale)
            .select("hostname", "proxy")
        )
        # hostname_state: first_seen for new, last_fetch bump for all claimed
        self.store.append(
            "hostname_state",
            hosts.select(
                "hostname",
                "proxy",
                F.lit(r).cast("long").alias("first_seen_round"),
                F.lit(r).cast("long").alias("last_fetch_round"),
            ),
        )
        # ONE agg drives the early-exit and the i2p sub-branch; the
        # scratch materialization only happens when there ARE new hosts
        # (steady-state rounds pay one probe job, not probe + write)
        nh = cand.agg(
            F.count("*").alias("n"),
            F.sum((F.col("proxy") == "i2p").cast("int")).alias("n_i2p"),
        ).head()
        if int(nh["n"] or 0) == 0:
            return None
        new_hosts = self.store.write_scratch("new_hosts", cand)
        web = self.web

        def fetch_robots(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for h in pdf["hostname"]:
                    status, text = web.robots_txt(h)
                    rows.append(
                        {
                            "hostname": h,
                            "status_code": status,
                            "text": text,
                            "fetch_round": r,
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=["hostname", "status_code", "text", "fetch_round"]
                )

        fresh_docs = self.store.write_scratch(
            "robots_fresh", new_hosts.mapInPandas(fetch_robots, ROBOTS_DOCS)
        )
        self.store.append("robots_docs", fresh_docs)
        # parsed rules rows (queryable artifact, schema.ROBOTS_RULES)
        self.store.append("robots_rules", self._rules_rows_df(fresh_docs))

        # sitemaps: robots Sitemap: lines, else /sitemap.xml fallback
        # (darc/proxy/null.py:169-170); recursion over sitemapindex is a
        # bounded driver BFS, each level parallel (darc/proxy/null.py:329)
        def fetch_sitemaps(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for h, proxy, text, status in zip(
                    pdf["hostname"], pdf["proxy"], pdf["text"], pdf["status_code"]
                ):
                    if proxy in ("zeronet", "freenet"):  # darc/crawl.py:146
                        continue
                    sm_urls = (
                        parse_robots(text).sitemaps
                        if status == 200 and text
                        else []
                    ) or [f"http://{h}/sitemap.xml"]
                    # BFS over sitemapindex children, fetched by THEIR
                    # url (darc/proxy/null.py:329 fetch_sitemap(link));
                    # visited-dedup so shared children fetch once
                    queue = list(dict.fromkeys(sm_urls))
                    visited = set(queue)
                    depth = 0
                    while queue and depth < 3:
                        next_queue = []
                        for sm in queue:
                            st, xml = web.sitemap_xml(sm)
                            if st != 200:
                                continue
                            pages, children = parse_sitemap_one(sm, xml)
                            rows.extend(
                                {"hostname": h, "sitemap_url": sm, "loc": p, "is_index": False}
                                for p in pages
                            )
                            for child in children:
                                if child not in visited:
                                    visited.add(child)
                                    next_queue.append(child)
                        queue, depth = next_queue, depth + 1
                yield pd.DataFrame(
                    rows, columns=["hostname", "sitemap_url", "loc", "is_index"]
                )

        new_with_proxy = new_hosts.join(
            fresh_docs.select("hostname", "status_code", "text"), "hostname", "left"
        )
        sitemap_rows = self.store.write_scratch(
            "sitemap_rows",
            new_with_proxy.mapInPandas(
                fetch_sitemaps, self.store.schemas["sitemaps"]
            ),
        )
        self.store.append("sitemaps", sitemap_rows)
        sitemap_links = with_parsed_link(
            sitemap_rows.select(F.col("loc").alias("url"))
        ).withColumn("backref", F.col("url"))
        k, sp = self._route_links(sitemap_links, r)
        kept_acc.append(k)
        special_acc.append(sp)

        # i2p new hosts: hosts.txt subscription (darc/crawl.py:156-161)
        i2p_new = new_hosts.filter(F.col("proxy") == "i2p")
        if int(nh["n_i2p"] or 0):
            def fetch_hosts_txt(pdf_iter):
                for pdf in pdf_iter:
                    rows = []
                    for h in pdf["hostname"]:
                        status, text = web.hosts_txt(h)
                        if status == 200 and text:
                            rows.append({"hostname": h, "text": text})
                    yield pd.DataFrame(rows, columns=["hostname", "text"])

            docs = i2p_new.mapInPandas(
                fetch_hosts_txt, "hostname string, text string"
            )
            from darc_spark.functions.hosts import extract_i2p_hosts

            found = extract_i2p_hosts(docs, text_col="text", src_col="hostname")
            hosts_links = with_parsed_link(
                found.select(
                    "url",
                    F.concat(
                        F.lit("http://"), F.col("hostname"), F.lit("/")
                    ).alias("backref_url"),
                )
            ).withColumn("backref", F.col("backref_url")).drop("backref_url")
            k, sp = self._route_links(hosts_links, r)
            kept_acc.append(k)
            special_acc.append(sp)
        return fresh_docs

    def _route_links(self, links: DataFrame, r: int) -> tuple[DataFrame, DataFrame]:
        """Route parsed links (pure, no writes): (kept_crawlable, special).

        Special-scheme links go to their sink rows; crawlable links pass
        the F1/F2 extraction filters (darc/parse.py:244-273). Callers
        batch many routings into ONE special-sink append and ONE
        enqueue-NX per stage — a handful of Spark jobs per round instead
        of one per link source.
        """
        is_crawlable = F.col("proxy").isin(*CRAWLABLE_PROXIES) & F.col(
            "scheme"
        ).isin(*CRAWLABLE_SCHEMES)
        special = links.filter(~is_crawlable).select(
            F.when(F.col("proxy") == "", "invalid")
            .otherwise(F.col("proxy"))
            .alias("kind"),
            "url",
            "backref",
            F.lit(r).cast("long").alias("round"),
        )
        keep = links.filter(is_crawlable).filter(
            ~match_proxy_drop(
                F.col("proxy"),
                list(self.cfg.proxy_white),
                list(self.cfg.proxy_black),
                self.cfg.proxy_fallback,
            )
            & ~match_host_drop(
                F.col("host"),
                list(self.cfg.host_white),
                list(self.cfg.host_black),
                self.cfg.host_fallback,
            )
        )
        if self.cfg.check_ng:
            # F6: concurrent HEAD precheck of extracted links — drop MIME
            # mismatches before they ever enter the queue
            # (darc/parse.py:186-241, CHECK_NG)
            web = self.web

            def head_check(pdf_iter):
                for pdf in pdf_iter:
                    heads = web.heads_batch(pdf["url"])
                    out = pdf.copy()
                    out["head_ct"] = (
                        heads["content_type"].fillna("").str.lower().str.split(";").str[0].str.strip()
                    )
                    yield out

            schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in keep.schema.fields
            ) + ", head_ct string"
            keep = keep.mapInPandas(head_check, schema).filter(
                ~match_mime_drop(
                    F.col("head_ct"),
                    list(self.cfg.mime_white),
                    list(self.cfg.mime_black),
                    self.cfg.mime_fallback,
                )
            ).drop("head_ct")
        return keep, special

    _LINK_SELECT = ["name", "url", "scheme", "proxy", "host", "hostname", "backref"]

    def _flush_links(
        self,
        fr: Frontier,
        kept: list[DataFrame],
        special: list[DataFrame],
        r: int,
    ) -> None:
        """One special-sink append + one enqueue-NX for a whole stage."""
        if special:
            out = special[0]
            for d in special[1:]:
                out = out.unionByName(d)
            self.store.append("special_links", out)
        if kept:
            out = kept[0].select(*self._LINK_SELECT)
            for d in kept[1:]:
                out = out.unionByName(d.select(*self._LINK_SELECT))
            fr.enqueue_nx(out, r, use_filter=self.cfg.use_seen_filter)

    # -- round stages ---------------------------------------------------------
    def _claim_filters(
        self, claimed: DataFrame, fr: Frontier, r: int
    ) -> tuple[DataFrame, int]:
        """Claim-time F1/F2 (darc/crawl.py:117-124): violators are dropped.

        Returns (kept rows, total claimed count) from ONE aggregate job
        — replaces the separate count() + isEmpty() probes (driver
        job-count is the engine's largest per-round fixed cost)."""
        drop_cond = match_proxy_drop(
            F.col("proxy"),
            list(self.cfg.proxy_white),
            list(self.cfg.proxy_black),
            self.cfg.proxy_fallback,
        ) | match_host_drop(
            F.col("host"),
            list(self.cfg.host_white),
            list(self.cfg.host_black),
            self.cfg.host_fallback,
        )
        row = claimed.agg(
            F.count("*").alias("n"),
            F.sum(drop_cond.cast("int")).alias("n_drop"),
        ).head()
        n, n_drop = int(row["n"] or 0), int(row["n_drop"] or 0)
        if n_drop:
            fr.drop(claimed.filter(drop_cond), r, reason="filtered")
        return claimed.filter(~drop_cond), n

    def _raw_stats(self, raw: DataFrame, cfg: CrawlConfig) -> dict[str, int]:
        """ONE aggregate job over the materialized fetch batch drives all
        branch decisions for the round (replaces per-branch isEmpty jobs)."""
        mime_drop = match_mime_drop(
            F.col("content_type"),
            list(cfg.mime_white),
            list(cfg.mime_black),
            cfg.mime_fallback,
        )
        row = raw.agg(
            F.count("*").alias("n"),
            F.sum(F.col("no_return").cast("int")).alias("n_noreturn"),
            F.sum((~F.col("no_return") & ~F.col("is_html") & mime_drop).cast("int")).alias(
                "n_mimedrop"
            ),
            F.sum(
                (
                    ~F.col("no_return")
                    & ~F.col("is_html")
                    & (F.col("proxy") == "i2p")
                    & F.col("content_type").isin("text/plain", "text/text")
                    & F.col("body_text").isNotNull()
                ).cast("int")
            ).alias("n_i2p_plain"),
            F.sum(
                (~F.col("no_return") & F.col("is_html") & F.col("empty_body")).cast("int")
            ).alias("n_html_empty"),
            F.sum(
                (
                    ~F.col("no_return")
                    & F.col("is_html")
                    & ~F.col("empty_body")
                    & (F.col("status_code") < 400)
                ).cast("int")
            ).alias("n_ok"),
            F.sum(
                (
                    ~F.col("no_return")
                    & F.col("is_html")
                    & ~F.col("empty_body")
                    & (F.col("status_code") >= 400)
                ).cast("int")
            ).alias("n_failed"),
            F.sum(
                F.when(
                    ~F.col("no_return") & F.col("is_html") & ~F.col("empty_body"),
                    F.coalesce(F.size("links"), F.lit(0)),
                ).otherwise(0)
            ).alias("n_extracted"),
            # retry/give-up splits for BOTH stage shapes, so the failure
            # path needs no isEmpty probes (requests failure = bad HTML;
            # selenium failure = anything that did not render)
            *[
                F.sum((pred & rc).cast("int")).alias(name)
                for (label, pred) in (
                    (
                        "req",
                        ~F.col("no_return")
                        & F.col("is_html")
                        & (F.col("empty_body") | (F.col("status_code") >= 400)),
                    ),
                    (
                        "sel",
                        ~F.col("no_return")
                        & ~(F.col("is_html") & ~F.col("empty_body")),
                    ),
                )
                for (kind, rc) in (
                    ("retry", F.col("retry_count") < cfg.max_retries),
                    ("giveup", F.col("retry_count") >= cfg.max_retries),
                )
                for name in (f"n_{kind}_{label}",)
            ],
        ).head()
        return {k: int(row[k] or 0) for k in row.asDict()}

    def _fetches_rows(
        self, raw: DataFrame, r: int, screenshot: bool = False
    ) -> DataFrame:
        extra = ["screenshot"] if screenshot else []
        return raw.select(
            "name",
            "url",
            "hostname",
            "proxy",
            F.lit(r).cast("long").alias("fetch_round"),
            "status_code",
            "content_type",
            "headers",
            "cookies",
            "history",
            "is_html",
            F.coalesce(F.size("links"), F.lit(0)).alias("n_links"),
            "image_id",
            "bytes",
            "w",
            "h",
            "fmt",
            "caption",
            "phash",
            "fetch_partition",
            "fetch_batch_ms",
            *extra,
        )

    def _requests_stage(self, r: int) -> dict[str, float]:
        # sub-stage wall attribution (rides the metrics/manifest like
        # the run_round stage timings): claim window, robots/new-host
        # gate, the fetch materialization (the scalable W), and the
        # post-fetch route+flush tail — the non-fetch buckets are the
        # per-round fixed cost candidates
        import time as _time

        cfg = self.cfg
        _t0 = _time.perf_counter()
        self._label(r, "requests:claim")
        claimed = self.fr_req.claim(
            r,
            per_host=cfg.per_host,
            lease=cfg.lease,
            salt_shards=cfg.salt_shards,
            robots_delays=self._robots_delays() if cfg.robots_enabled else None,
            hostname_state=self._hostname_state(),
            escalate_above=self._round_escalate,
        )
        keep, n_claimed = self._claim_filters(claimed, self.fr_req, r)
        m = {"claimed_requests": float(n_claimed)}
        m["sec_req_claim"] = round(_time.perf_counter() - _t0, 3)
        if n_claimed == 0:
            return m
        _t0 = _time.perf_counter()
        self._label(r, "requests:gate")
        kept_acc: list[DataFrame] = []
        special_acc: list[DataFrame] = []
        fresh_docs = self._new_host_gate(keep, r, kept_acc, special_acc)

        if cfg.robots_enabled:
            docs = self._robots_docs(extra=fresh_docs)
            ua = cfg.user_agent
            gate = F.pandas_udf(
                lambda u, p: can_fetch_batch(u, p, useragent=ua), "boolean"
            )
            gated = keep.join(F.broadcast(docs), "hostname", "left").withColumn(
                "_allowed", gate("url", "robots_txt")
            )
            # disallowed rows: neither requeued nor dropped — they stay
            # leased (darc/crawl.py:168-170 returns without action)
            allowed = gated.filter(F.col("_allowed")).drop(
                "_allowed", "robots_txt", "robots_status"
            )
        else:
            allowed = keep
        m["sec_req_gate"] = round(_time.perf_counter() - _t0, 3)

        _t0 = _time.perf_counter()
        self._label(r, "requests:fetch")
        raw = self.store.write_scratch(
            "fetch_raw_requests",
            run_fetch(allowed, self.web.pages_batch, n_rows=n_claimed),
        )
        m["sec_req_fetch"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()
        self._label(r, "requests:route")
        st = self._raw_stats(raw, cfg)
        m["fetched_requests"] = float(st["n"])

        # fetches table — every response row (headers/doc sink, S9/S10/S13)
        fetches_rows = self._fetches_rows(raw, r)
        self.store.append("fetches", fetches_rows)
        # this round's rows, kept for the submit stage: re-deriving from
        # the scratch parquet is O(round), vs filtering the whole fetches
        # archive by round (a full segment listing per round at scale)
        self._round_fetches = fetches_rows

        # LinkNoReturn from site hooks → permanent drop
        if st["n_noreturn"]:
            self.fr_req.drop(raw.filter(F.col("no_return")), r, reason="no-return")
        live = raw.filter(~F.col("no_return"))
        html = live.filter(F.col("is_html"))
        generic = live.filter(~F.col("is_html"))

        # generic branch (darc/crawl.py:196-213)
        mime_drop = match_mime_drop(
            F.col("content_type"),
            list(cfg.mime_white),
            list(cfg.mime_black),
            cfg.mime_fallback,
        )
        if st["n_mimedrop"]:
            self.fr_req.drop(generic.filter(mime_drop), r, reason="mime-filtered")
        generic_kept = generic.filter(~mime_drop)
        # i2p hosts.txt bodies feed the queue (darc/crawl.py:203-206)
        if st["n_i2p_plain"]:
            from darc_spark.functions.hosts import extract_i2p_hosts

            i2p_plain = generic_kept.filter(
                (F.col("proxy") == "i2p")
                & F.col("content_type").isin("text/plain", "text/text")
                & F.col("body_text").isNotNull()
            )
            found = extract_i2p_hosts(
                i2p_plain.select(
                    F.col("body_text").alias("text"),
                    F.col("url").alias("backref_url"),
                ),
                text_col="text",
                src_col="backref_url",
            )  # → (backref_url, host, url)
            hosts_links = with_parsed_link(
                found.select("url", "backref_url")
            ).withColumn("backref", F.col("backref_url")).drop("backref_url")
            k, sp = self._route_links(hosts_links, r)
            kept_acc.append(k)
            special_acc.append(sp)
        if st["n"] - st["n_noreturn"] - st["n_html_empty"] - st["n_ok"] - st[
            "n_failed"
        ] - st["n_mimedrop"]:
            self.fr_req.mark_done(generic_kept, r, revisit_after=r + cfg.revisit)

        # HTML branch
        solid = html.filter(~F.col("empty_body"))

        # extraction (even for !ok responses — darc/crawl.py:222-230):
        # explode→classify→route runs lazily inside ONE materialization
        exploded = solid.select(
            F.col("name").alias("parent_name"),
            F.col("url").alias("parent_url"),
            F.explode_outer("links").alias("child_url"),
        ).filter(F.col("child_url").isNotNull())
        m["extracted"] = float(st["n_extracted"])
        child_links = with_parsed_link(
            exploded.select(F.col("child_url").alias("url"), "parent_name", "parent_url")
        ).withColumn("backref", F.col("parent_url"))
        kept_children, sp = self._route_links(child_links, r)
        # materialize once: feeds both the enqueue union and the edges rows
        kept_children = self.store.write_scratch("kept_children_requests", kept_children)
        kept_acc.append(kept_children)
        special_acc.append(sp)
        self.store.append(
            "edges",
            kept_children.select(
                F.col("parent_name"),
                F.col("name").alias("child_name"),
                F.col("parent_url"),
                F.col("url").alias("child_url"),
                F.lit(r).cast("long").alias("round"),
            ),
        )
        self._flush_links(self.fr_req, kept_acc, special_acc, r)

        if st["n_ok"]:
            ok = solid.filter(F.col("status_code") < 400)
            self.fr_req.mark_done(ok, r, revisit_after=r + cfg.revisit)
            if cfg.selenium_enabled:
                # promote ok pages to the render queue (darc/crawl.py:233)
                self.fr_sel.enqueue_nx(ok, r, use_filter=cfg.use_seen_filter)
        failures = html.filter(
            F.col("empty_body") | (~F.col("empty_body") & (F.col("status_code") >= 400))
        )
        self._retry_or_drop(
            self.fr_req,
            failures,
            r,
            reason="fetch-failed",
            n_retry=st["n_retry_req"],
            n_giveup=st["n_giveup_req"],
        )
        m["ok_requests"] = float(st["n_ok"])
        m["sec_req_route"] = round(_time.perf_counter() - _t0, 3)
        return m

    def _label(self, r: int, stage: str) -> None:
        """Guide §1.5: label the bucket's jobs so event-log profiles
        (bench_extra.py jobs) attribute wall time without guesswork.
        Observability-only — thread-local description, no plan effect."""
        self.spark.sparkContext.setJobDescription(f"crawl r{r} {stage}")

    def _selenium_stage(self, r: int) -> dict[str, float]:
        cfg = self.cfg
        self._label(r, "selenium:claim")
        claimed = self.fr_sel.claim(
            r,
            per_host=cfg.per_host,
            lease=cfg.lease,
            salt_shards=cfg.salt_shards,
            escalate_above=self._round_escalate,
        )
        keep, n_claimed = self._claim_filters(claimed, self.fr_sel, r)
        m = {"claimed_selenium": float(n_claimed)}
        if n_claimed == 0:
            return m
        # loader-stage fetch: render_batch adds the screenshot artifact
        # (falls back to pages_batch for web doubles without a renderer)
        fetch_fn = getattr(self.web, "render_batch", self.web.pages_batch)
        self._label(r, "selenium:render")
        raw = self.store.write_scratch(
            "fetch_raw_selenium", run_fetch(keep, fetch_fn, n_rows=n_claimed)
        )
        self._label(r, "selenium:route")
        st = self._raw_stats(raw, cfg)
        sel_rows = self._fetches_rows(raw, r, screenshot=True)
        self.store.append("fetches_selenium", sel_rows)
        self._round_fetches_sel = sel_rows
        # LinkNoReturn from site hooks → permanent drop BEFORE extraction
        # (reference loader drops on LinkNoReturn, darc/crawl.py:303-309 —
        # mirrors the requests stage; no_return pages neither extract nor
        # requeue)
        if st["n_noreturn"]:
            self.fr_sel.drop(raw.filter(F.col("no_return")), r, reason="no-return")
        live = raw.filter(~F.col("no_return"))
        # rendered-page extraction feeds the REQUESTS queue (darc/crawl.py:349)
        solid = live.filter(F.col("is_html") & ~F.col("empty_body"))
        exploded = solid.select(
            F.col("url").alias("parent_url"),
            F.explode_outer("links").alias("child_url"),
        ).filter(F.col("child_url").isNotNull())
        child_links = with_parsed_link(
            exploded.select(F.col("child_url").alias("url"), "parent_url")
        ).withColumn("backref", F.col("parent_url"))
        k, sp = self._route_links(child_links, r)
        self._flush_links(self.fr_req, [k], [sp], r)
        n_rendered = st["n_ok"] + st["n_failed"]  # html & nonempty
        if n_rendered:
            self.fr_sel.mark_done(solid, r, revisit_after=r + cfg.revisit)
        # empty render → requeue (SE_EMPTY sentinel, darc/crawl.py:327-330)
        failed = live.filter(~(F.col("is_html") & ~F.col("empty_body")))
        self._retry_or_drop(
            self.fr_sel, failed, r, reason="render-failed",
            n_retry=st["n_retry_sel"], n_giveup=st["n_giveup_sel"],
        )
        m["rendered"] = float(n_rendered)
        return m

    def _retry_or_drop(
        self,
        fr: Frontier,
        rows: DataFrame,
        r: int,
        reason: str,
        n_retry: int,
        n_giveup: int,
    ) -> None:
        """Failure path: requeue now (darc requeues forever); cap for
        termination via max_retries (engine extension). Counts come from
        the stage's ``_raw_stats`` aggregate — no extra probe jobs."""
        if n_retry:
            fr.requeue(
                rows.filter(F.col("retry_count") < self.cfg.max_retries), r, delay=1
            )
        if n_giveup:
            fr.drop(
                rows.filter(F.col("retry_count") >= self.cfg.max_retries),
                r,
                reason=f"{reason}-max-retries",
            )

    def _submit_stage(self, r: int) -> dict[str, float]:
        """API submission (darc/submit.py:249-754): render this round's
        three event domains (new_host / requests / selenium) and push
        them through the retry/spill sink; spilled payloads from earlier
        rounds replay first."""
        from darc_spark.functions.submit import (
            new_host_payloads,
            requests_payloads,
            selenium_payloads,
        )

        sink = self.submit_sink
        self._label(r, "submit")
        m: dict[str, float] = {}
        # read-your-writes: round r's hostname_state rows are staged until
        # the end-of-round commit — a committed-only read would make this
        # filter always empty and silently submit no new_host events
        hosts_r = self._hostname_state(include_staged=True).filter(
            F.col("first_seen_round") == r
        )
        res_h = sink.submit(new_host_payloads(hosts_r), "new_host", r)
        # this round's rows, captured by the stages (derived from scratch
        # parquet) — never a filter over the whole fetches archive
        fetches_r = getattr(self, "_round_fetches", None)
        if fetches_r is None:
            fetches_r = self.store.read_all("fetches").filter(
                F.col("fetch_round") == r
            )
        res_q = sink.submit(requests_payloads(fetches_r), "requests", r)
        res_s = {"submitted": 0, "spilled": 0}
        if self.cfg.selenium_enabled:
            sel_r = getattr(self, "_round_fetches_sel", None)
            if sel_r is None:
                sel_r = self.store.read_all("fetches_selenium").filter(
                    F.col("fetch_round") == r
                )
            res_s = sink.submit(selenium_payloads(sel_r), "selenium", r)
        self._round_fetches = None
        self._round_fetches_sel = None
        m["submitted"] = float(
            res_h["submitted"] + res_q["submitted"] + res_s["submitted"]
        )
        m["submit_spilled"] = float(
            res_h["spilled"] + res_q["spilled"] + res_s["spilled"]
        )
        return m

    # -- round driver ---------------------------------------------------------
    def run_round(self) -> dict[str, float]:
        r = self.round
        # wall-clock round start: drives time-mode leases and rides in
        # the commit manifest so a resumed run keeps the timeline
        self._round_now = self.clock()
        self._round_ts[r] = self._round_now
        # one resolved escalation threshold per round (both stages)
        self._round_escalate = self._escalation_threshold()
        # per-stage wall timings ride in the metrics (and thus the
        # manifest meta): the per-round fixed cost C in t = W/p + C is
        # what caps N→4N scaling efficiency, and attributing it to a
        # stage needs no profiler run — it's in every committed round
        import time as _time

        _t0 = _time.perf_counter()
        metrics = self._requests_stage(r)
        metrics["sec_requests"] = round(_time.perf_counter() - _t0, 3)
        if self.cfg.selenium_enabled:
            _t0 = _time.perf_counter()
            metrics.update(self._selenium_stage(r))
            metrics["sec_selenium"] = round(_time.perf_counter() - _t0, 3)
        if self.submit_sink is not None:
            _t0 = _time.perf_counter()
            metrics.update(self._submit_stage(r))
            metrics["sec_submit"] = round(_time.perf_counter() - _t0, 3)
        _t_tail = _time.perf_counter()
        self._label(r, "tail")
        # metrics ride in the manifest meta (no extra write job); the
        # metrics() accessor rebuilds the table from manifests on demand
        if self.cfg.compact_every and (r + 1) % self.cfg.compact_every == 0:
            self.fr_req.compact(r)
            self.fr_sel.compact(r)
            # state-table rollups: hostname_state and robots_docs grow one
            # event row per claimed host per round; both gates only consume
            # an aggregate (min/max per host, latest doc), so folding to
            # the aggregate is state-transparent — without it a long crawl
            # re-aggregates an ever-growing event log every round
            # rollups are derived from read_all (committed + this round's
            # staged appends), so the replacement must supersede the staged
            # appends (drop_staged=True) — otherwise commit re-applies them
            # on top and hosts fetched in a compaction round are duplicated
            self.store.replace(
                "hostname_state",
                self._hostname_state(include_staged=True),
                drop_staged=True,
            )
            latest_docs = self.store.write_scratch(
                "robots_docs_compact",
                self.store.read_all("robots_docs")
                .groupBy("hostname")
                .agg(
                    F.max_by("status_code", "fetch_round").alias("status_code"),
                    F.max_by("text", "fetch_round").alias("text"),
                    F.max("fetch_round").alias("fetch_round"),
                )
                .select("hostname", "status_code", "text", "fetch_round"),
            )
            self.store.replace("robots_docs", latest_docs, drop_staged=True)
            # robots_rules likewise accumulates one rule set per fetch
            # (TIME_CACHE re-fetches included, with no epoch column) —
            # re-derive from the SAME deduplicated latest-per-host docs
            # used for the robots_docs replacement, so the queryable
            # artifact has exactly one rule set per host
            self.store.replace(
                "robots_rules", self._rules_rows_df(latest_docs), drop_staged=True
            )
        if self.cfg.escalate_above == "auto":
            # host-pending stats for NEXT round's threshold: one columnar
            # scan+agg over the frontier event log (hostname column only)
            st = (
                self.store.read_all(self.fr_req.t_frontier)
                .groupBy("hostname")
                .count()
                .agg(F.avg("count").alias("m"), F.max("count").alias("x"))
                .head()
            )
            metrics["host_pending_mean"] = float(st["m"] or 0.0)
            metrics["host_pending_max"] = float(st["x"] or 0.0)
            metrics["escalate_threshold"] = float(self._round_escalate)
        # compaction + escalation stats; the commit (which materializes
        # any deferred appends) is timed into the NEXT round's manifest
        # via self._last_commit_sec because metrics must be inside it
        # deferred filter maintenance (enqueue adds + drop deletes):
        # one cogroup+replace per frontier per round, inside the commit
        self.fr_req.flush_filter_updates()
        self.fr_sel.flush_filter_updates()
        metrics["sec_round_tail"] = round(_time.perf_counter() - _t_tail, 3)
        if hasattr(self, "_last_commit_sec"):
            metrics["sec_prev_commit"] = self._last_commit_sec
        _t0 = _time.perf_counter()
        self._label(r, "commit")
        self._commit({"round": r, "metrics": metrics, "ts": self._round_now})
        self._last_commit_sec = round(_time.perf_counter() - _t0, 3)
        self.spark.sparkContext.setJobDescription(None)
        self.round = r + 1
        # between-round hooks (darc/process.py:45-75); WorkerBreak requests
        # a graceful stop AFTER this committed round — metrics are kept.
        # Preserve a break already requested mid-round by a registered
        # signal handler (registry.graceful_stop_handler).
        self.break_requested = getattr(self, "break_requested", False)
        for hook in HOOKS:
            try:
                hook(r, self)
            except WorkerBreak:
                self.break_requested = True
        return metrics

    def metrics_table(self) -> DataFrame:
        """Per-round metrics reconstructed from manifest metas (A5)."""
        import json as _json
        import os as _os
        import re as _re

        rows = []
        mdir = _os.path.join(self.store.root, "_manifests")
        for fn in sorted(_os.listdir(mdir)):
            if not _re.match(r"^v\d{6}\.json$", fn):
                continue
            with open(_os.path.join(mdir, fn)) as f:
                meta = _json.load(f).get("meta", {})
            if "metrics" in meta:
                for k, v in meta["metrics"].items():
                    rows.append((int(meta["round"]), k, float(v)))
        return self.spark.createDataFrame(rows, METRICS)

    def run(self, rounds: int) -> list[dict[str, float]]:
        out = []
        self.break_requested = False  # a previous run's break is consumed
        for _ in range(rounds):
            out.append(self.run_round())
            if getattr(self, "break_requested", False):
                break  # graceful hook-requested stop (WorkerBreak)
            if out[-1].get("claimed_requests", 0) == 0 and out[-1].get(
                "claimed_selenium", 0
            ) == 0:
                break  # frontier drained (DARC_WAIT idle analogue)
        return out


def main() -> None:  # pragma: no cover - manual drive
    import tempfile

    from darc_spark.session import get_spark

    spark = get_spark("darc-spark-crawl", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    web = SynthWeb()
    crawler = Crawler(spark, tempfile.mkdtemp(prefix="crawl-"), web)
    crawler.seed(web.seeds())
    for m in crawler.run(3):
        print(m)
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
