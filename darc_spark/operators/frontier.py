"""The frontier: priority queue + URL-seen dedup + lease claims.

Re-expresses the reference's queue semantics (``darc/db.py:16-31``) as
append-only event tables over :class:`~darc_spark.sources.store.SnapshotStore`
— the Spark-idiomatic shape (immutable segments + merge-on-read +
compaction) instead of Redis in-place re-scoring:

=====================  =====================================================
reference semantic      here
=====================  =====================================================
ZADD NX enqueue         bloom/cuckoo prefilter + ``left_anti`` vs url_seen
(darc/db.py:555-568)    then append (insert-if-absent, exact)
min-score batch claim   per-host deterministic top-k window (politeness)
(darc/db.py:926-977)
visibility lease        ``claims`` event (lease_until round); expired lease
(darc/db.py:970-972)    ⇒ re-claimable (at-least-once)
requeue on failure      new attempt event, retry_count+1, not_before bumped
(darc/crawl.py:227-230)
TIME_CACHE re-fetch     ``done`` event with revisit_after round
(darc/const.py:134-139)
drop (LinkNoReturn)     ``dropped`` event + url_seen tombstone + cuckoo
(darc/db.py:321-467)    delete (URL may legitimately reappear later)
=====================  =====================================================

State resolution is merge-on-read: the *latest attempt per name* wins,
computed with one window per claim; ``compact()`` folds events down so
read cost stays bounded (the Iceberg-MERGE equivalent).

Scale: every per-name resolution partitions by ``name`` (uniform sha256
— no skew); per-host operations go through the salted politeness window
(:mod:`darc_spark.operators.politeness`). The url_seen prefilter avoids
joining the 10^10-row seen set for the typical all-new extraction batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from darc_spark.operators import politeness
from darc_spark.operators.approx_filter import (
    BloomFilter,
    CuckooFilter,
    load_filter,
)
from darc_spark.schema import FRONTIER
from darc_spark.sources.store import SnapshotStore

CLAIMS = T.StructType(
    FRONTIER.fields
    + [
        T.StructField("claim_round", T.LongType(), False),
        T.StructField("lease_until", T.LongType(), False),
    ]
)
DONE = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("round", T.LongType(), False),
        T.StructField("revisit_after", T.LongType(), False),
    ]
)
DROPPED = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("round", T.LongType(), False),
        T.StructField("reason", T.StringType(), True),
        T.StructField("event_seq", T.LongType(), False),
    ]
)
URL_SEEN_EVENTS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("seen_round", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("event_seq", T.LongType(), False),
    ]
)
SEEN_FILTER = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)

_LINK_COLS = ["name", "url", "scheme", "proxy", "host", "hostname", "backref"]

# darc defaults: MAX_POOL=100 (darc/db.py:99-101), TIME_CACHE lease
DEFAULT_POOL = 100
DEFAULT_LEASE = 3  # rounds; reference: 60 s default / 30 d deployed
NEVER = 1 << 60


class Frontier:
    """One staged queue (requests or selenium) over a SnapshotStore."""

    def __init__(
        self,
        store: SnapshotStore,
        stage: str = "requests",
        n_filter_buckets: int = 16,
        filter_kind: str = "cuckoo",
        filter_capacity_per_bucket: int = 1 << 16,
        broadcast_max_bytes: int = 64 << 20,
    ) -> None:
        self.store = store
        self.stage = stage
        self.t_frontier = f"frontier_{stage}"
        self.t_claims = f"claims_{stage}"
        self.t_done = f"done_{stage}"
        self.t_dropped = f"dropped_{stage}"
        self.t_seen = f"url_seen_{stage}"
        self.t_filter = f"seen_filter_{stage}"
        store.schemas.setdefault(self.t_frontier, FRONTIER)
        store.schemas.setdefault(self.t_claims, CLAIMS)
        store.schemas.setdefault(self.t_done, DONE)
        store.schemas.setdefault(self.t_dropped, DROPPED)
        store.schemas.setdefault(self.t_seen, URL_SEEN_EVENTS)
        store.schemas.setdefault(self.t_filter, SEEN_FILTER)
        self.n_filter_buckets = n_filter_buckets
        self.filter_kind = filter_kind
        self.filter_capacity = filter_capacity_per_bucket
        # membership-check strategy switch (broadcast vs cogroup) — the
        # analogue of spark.sql.autoBroadcastJoinThreshold
        self.broadcast_max_bytes = broadcast_max_bytes
        self._seq_in_version = 0

    def _next_seq(self) -> int:
        """Monotonic event sequence: program order within a round, and
        strictly above any committed event after resume (version bump)."""
        self._seq_in_version += 1
        return (self.store.version + 1) * 1_000_000 + self._seq_in_version

    # -- seen-set ------------------------------------------------------------
    def seen(self) -> DataFrame:
        """Names currently in the seen set (tombstone-resolved).

        The seen set is a VIEW over three event sources — no write on the
        enqueue hot path: frontier attempt events are implicit "adds",
        ``dropped`` events are tombstones, and the ``url_seen`` table only
        holds compaction snapshots. Latest event per name (by event_seq)
        wins. Reads committed + staged segments so a second enqueue within
        the same (uncommitted) round still observes NX semantics.
        """
        adds = self.store.read_all(self.t_frontier).select(
            "name",
            "url",
            "hostname",
            F.col("enqueue_round").alias("seen_round"),
            F.lit(False).alias("deleted"),
            "event_seq",
        )
        snap = self.store.read_all(self.t_seen).select(
            "name", "url", "hostname", "seen_round", "deleted", "event_seq"
        )
        tombs = self.store.read_all(self.t_dropped).select(
            "name",
            F.lit("").alias("url"),
            F.lit("").alias("hostname"),
            F.col("round").alias("seen_round"),
            F.lit(True).alias("deleted"),
            "event_seq",
        )
        ev = adds.unionByName(snap).unionByName(tombs)
        # latest event per name via max_by (hash aggregate with map-side
        # partial agg) instead of a row_number window (exchange + full
        # sort): event_seq is unique per (name, event), so the winner is
        # identical — but the sort disappears and pre-shuffle partial
        # aggregation shrinks the exchange (guide §2.3)
        return (
            ev.groupBy("name")
            .agg(
                F.max_by(
                    F.struct("url", "hostname", "seen_round", "deleted", "event_seq"),
                    "event_seq",
                ).alias("_s")
            )
            .filter(~F.col("_s.deleted"))
            .select(
                "name",
                F.col("_s.url").alias("url"),
                F.col("_s.hostname").alias("hostname"),
                F.col("_s.seen_round").alias("seen_round"),
                F.col("_s.event_seq").alias("event_seq"),
            )
        )

    def _split_by_filter(self, candidates: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(definitely_new, maybe_seen) via the per-bucket approx filter.

        ADAPTIVE strategy, the same small/large split Spark applies to
        joins (broadcast-hash vs shuffle):

        * filter table ≤ ``broadcast_max_bytes`` (the common case until
          the seen set is huge) → :meth:`_check_broadcast`: payloads
          ship ONCE per executor as a Spark broadcast variable and the
          check is a no-shuffle pandas UDF over the candidate batch.
        * larger → :meth:`_check_cogroup`: candidates shuffle to their
          bucket and meet that bucket's payload row — no payload ever
          reaches the driver (at 10^10 seen URLs payloads total ~10 GB).

        The strategy probe reads only (bucket, octet_length(payload)) —
        a handful of rows, never the payloads themselves.
        """
        keyed = candidates.withColumn("_key", F.xxhash64("name")).withColumn(
            "_bucket",
            F.pmod(F.xxhash64("name"), F.lit(self.n_filter_buckets)).cast("int"),
        )
        current = self.store.read_all(self.t_filter).select("bucket", "payload")
        meta = current.select(
            "bucket", F.octet_length("payload").alias("nbytes")
        ).collect()
        total_bytes = sum(r["nbytes"] or 0 for r in meta)
        if len(meta) == 0:
            # no filter yet: everything definitely new, zero extra jobs
            plain = keyed.drop("_key", "_bucket")
            return plain, plain.limit(0)
        if total_bytes <= self.broadcast_max_bytes:
            return self._check_broadcast(keyed, current)
        return self._check_cogroup(keyed, current)

    def _check_broadcast(
        self, keyed: DataFrame, current: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Small-filter fast path: payloads ride a broadcast VARIABLE
        (one copy per executor — not a closure capture serialized into
        every task, the round-1 bug) and the check never shuffles.

        The broadcast is cached keyed by the filter table's segment set
        and the stale one unpersisted on rebuild — otherwise every
        enqueue_nx call would leak a new broadcast's blocks on driver
        and executors for the life of a long crawl."""
        spark = keyed.sparkSession
        token = self.store.version_token(self.t_filter)
        cached = getattr(self, "_bc_filter", None)
        if cached is not None and cached[0] == token:
            bc = cached[1]
        else:
            if cached is not None:
                # async executor-side delete; a late re-execution would
                # transparently re-fetch from the driver
                cached[1].unpersist()
            filters = {
                int(r["bucket"]): bytes(r["payload"]) if r["payload"] is not None else None
                for r in current.collect()
            }
            bc = spark.sparkContext.broadcast(filters)
            self._bc_filter = (token, bc)

        @F.pandas_udf("boolean")
        def maybe_seen(keys: pd.Series, buckets: pd.Series) -> pd.Series:
            import numpy as np

            flts = bc.value
            out = np.empty(len(keys), dtype=bool)
            kv = keys.to_numpy(dtype="int64").view("uint64")
            bv = buckets.to_numpy(dtype="int64")
            for b in np.unique(bv):
                mask = bv == b
                if int(b) not in flts:
                    out[mask] = False  # bucket never written: new
                    continue
                payload = flts[int(b)]
                if payload is None:
                    out[mask] = True  # saturated: exact join decides
                    continue
                out[mask] = load_filter(payload).might_contain(kv[mask])
            return pd.Series(out, index=keys.index)

        flagged = keyed.withColumn("_maybe", maybe_seen("_key", "_bucket"))
        new = flagged.filter(~F.col("_maybe")).drop("_key", "_bucket", "_maybe")
        maybe = flagged.filter(F.col("_maybe")).drop("_key", "_bucket", "_maybe")
        return new, maybe

    def _check_cogroup(
        self, keyed: DataFrame, current: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Scale path: bucket-cogroup membership, the same shape as
        ``_update_filter``. No payload reaches the driver or a closure.
        Parallelism equals ``n_filter_buckets`` — size it to the cluster
        at deployment, the way ``spark.sql.shuffle.partitions`` is.

        Bucket semantics: no payload row ⇒ definitely new (the filter is
        authoritative for every key ever enqueued with ``use_filter``);
        payload None ⇒ bucket saturated, everything stays "maybe" and
        the exact anti-join decides.
        """
        out_schema = T.StructType(
            [f for f in keyed.schema.fields if f.name not in ("_key", "_bucket")]
            + [T.StructField("_maybe", T.BooleanType(), False)]
        )
        out_cols = [f.name for f in out_schema.fields]

        def check(fdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
            if len(cdf) == 0:
                return pd.DataFrame(columns=out_cols)
            out = cdf.drop(columns=["_bucket"])
            if len(fdf) == 0:
                out["_maybe"] = False  # bucket never written: definitely new
            else:
                payload = fdf["payload"].iloc[0]
                if payload is None:
                    out["_maybe"] = True  # saturated: exact join decides
                else:
                    flt = load_filter(bytes(payload))
                    keys = out["_key"].to_numpy(dtype="int64").view("uint64")
                    out["_maybe"] = flt.might_contain(keys)
            return out.drop(columns=["_key"])

        flagged = (
            current.groupBy("bucket")
            .cogroup(keyed.groupBy("_bucket"))
            .applyInPandas(check, out_schema)
        )
        new = flagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
        return new, maybe

    def _update_filter(self, added: DataFrame, removed: DataFrame | None = None) -> None:
        """Distributed per-bucket filter maintenance via cogroup.

        Deferred deletes staged by :meth:`drop` ride along with the next
        update (see :meth:`flush_filter_removes`)."""
        pend = getattr(self, "_pending_filter_removes", None)
        if pend:
            for d in pend:
                removed = d if removed is None else removed.unionByName(d)
            self._pending_filter_removes = []
        kind, capacity = self.filter_kind, self.filter_capacity
        deltas = added.select(
            F.pmod(F.xxhash64("name"), F.lit(self.n_filter_buckets))
            .cast("int")
            .alias("bucket"),
            F.xxhash64("name").alias("key"),
            F.lit(False).alias("remove"),
        )
        if removed is not None:
            deltas = deltas.unionByName(
                removed.select(
                    F.pmod(F.xxhash64("name"), F.lit(self.n_filter_buckets))
                    .cast("int")
                    .alias("bucket"),
                    F.xxhash64("name").alias("key"),
                    F.lit(True).alias("remove"),
                )
            )
        current = self.store.read_all(self.t_filter)

        def update(fdf: pd.DataFrame, kdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            if len(kdf) == 0:
                return fdf[["bucket", "payload", "n"]] if len(fdf) else pd.DataFrame(
                    columns=["bucket", "payload", "n"]
                )
            bucket = int(kdf["bucket"].iloc[0])
            payload = None
            n = 0
            if len(fdf):
                payload = fdf["payload"].iloc[0]
                n = int(fdf["n"].iloc[0])
                flt = load_filter(bytes(payload)) if payload is not None else None
            elif kind == "cuckoo":
                # new bucket: auto-scale capacity to the first batch so a
                # large initial seed doesn't saturate a default-sized filter
                flt = CuckooFilter.for_capacity(max(capacity, 2 * len(kdf)))
            else:
                flt = BloomFilter.for_capacity(max(capacity, 2 * len(kdf)))
            keys = kdf["key"].to_numpy(dtype="int64").view("uint64")
            rem = kdf["remove"].to_numpy(dtype=bool)
            ok = True
            if flt is not None:
                add_keys = keys[~rem]
                if len(add_keys):
                    if isinstance(flt, CuckooFilter):
                        ok = flt.insert(add_keys)
                    else:
                        flt.add(add_keys)
                del_keys = keys[rem]
                if len(del_keys):
                    if isinstance(flt, CuckooFilter):
                        flt.delete(del_keys)
                    else:
                        ok = False  # bloom cannot delete → degrade bucket
            n += int((~rem).sum()) - int(rem.sum())
            out_payload = flt.to_bytes() if (flt is not None and ok) else None
            return pd.DataFrame(
                [{"bucket": bucket, "payload": out_payload, "n": n}]
            )

        updated = (
            current.groupBy("bucket")
            .cogroup(deltas.groupBy("bucket"))
            .applyInPandas(update, SEEN_FILTER)
        )
        self.store.replace(self.t_filter, updated)

    # -- queue ops -------------------------------------------------------------
    def enqueue_nx(
        self,
        links: DataFrame,
        current_round: int,
        priority: int = 0,
        use_filter: bool = True,
    ) -> None:
        """Insert-if-absent (ZADD NX semantics, darc/db.py:555-568)."""
        candidates = links.select(*_LINK_COLS).dropDuplicates(["name"])
        if use_filter:
            definitely_new, maybe = self._split_by_filter(candidates)
            # names whose filter ADD is still deferred (enqueued earlier
            # this round, or dropped since) are invisible to the
            # prefilter — route them to the MAYBE side, exactly as a
            # filter hit would, so the exact seen() check decides
            # (tombstoned names must still be re-addable); NX stays
            # EXACT between flushes
            pend = getattr(self, "_pending_filter_adds", None) or []
            if pend:
                pend_names = pend[0]
                for seg in pend[1:]:
                    pend_names = pend_names.unionByName(seg)
                maybe = maybe.unionByName(
                    definitely_new.join(pend_names, "name", "left_semi").select(
                        *maybe.columns
                    )
                )
                definitely_new = definitely_new.join(
                    pend_names, "name", "left_anti"
                )
            confirmed_new = maybe.join(self.seen().select("name"), "name", "left_anti")
            fresh = definitely_new.unionByName(confirmed_new)
        else:
            fresh = candidates.join(self.seen().select("name"), "name", "left_anti")
        rows = (
            fresh.withColumn("priority", F.lit(priority).cast("int"))
            .withColumn("not_before", F.lit(current_round).cast("long"))
            .withColumn("retry_count", F.lit(0).cast("int"))
            .withColumn("enqueue_round", F.lit(current_round).cast("long"))
            .withColumn("event_seq", F.lit(self._next_seq()).cast("long"))
            .select([f.name for f in FRONTIER.fields])
        )
        self.store.append(self.t_frontier, rows)
        # the frontier segment IS the url_seen add event (seen() is a
        # view); filter updates read the *written* segment — one
        # computation of the anti-join, no recompute divergence.
        # The filter ADD itself is DEFERRED to one end-of-round flush
        # (like the drop-side deletes): between enqueues the filter can
        # miss this batch's names, so a same-round re-extraction may
        # append a duplicate attempt row — but that row is IDENTICAL
        # (same round ⇒ same not_before/enqueue_round) and every
        # latest-per-name resolution (pending/seen/claim) is unchanged,
        # while each round pays ONE cogroup+replace instead of one per
        # enqueue, and the broadcast filter-check cache stays valid
        # across the round's enqueues.
        if use_filter:
            written = self._staged_tail(self.t_frontier)
            self._pending_filter_adds = getattr(
                self, "_pending_filter_adds", []
            )
            self._pending_filter_adds.append(written.select("name"))

    def _staged_tail(self, table: str) -> DataFrame:
        import os

        self.store.ensure_written(table)
        rel = self.store._staged_appends[table][-1]
        return self.store.spark.read.schema(self.store.schemas[table]).parquet(
            os.path.join(self.store.root, rel)
        )

    def requeue(
        self, batch: DataFrame, current_round: int, delay: int = 1
    ) -> None:
        """Failure retry (darc/crawl.py:227-230): new attempt, later round."""
        rows = (
            batch.select(*_LINK_COLS, "priority", "retry_count")
            .withColumn("retry_count", F.col("retry_count") + 1)
            .withColumn(
                "not_before", F.lit(current_round + delay).cast("long")
            )
            .withColumn("enqueue_round", F.lit(current_round).cast("long"))
            .withColumn("event_seq", F.lit(self._next_seq()).cast("long"))
            .select([f.name for f in FRONTIER.fields])
        )
        self.store.append(self.t_frontier, rows)

    def pending(
        self,
        current_round: int,
        ignore_leases: bool = False,
        ignore_not_before: bool = False,
        ignore_done: bool = False,
    ) -> DataFrame:
        """Claimable rows now: latest attempt, not done/dropped/leased."""
        ev = self.store.read(self.t_frontier)
        # latest attempt per name: max_by hash aggregate, not a window —
        # same winner (event_seq unique per attempt), no sort, map-side
        # partial aggregation before the exchange (guide §2.3)
        others = [f.name for f in FRONTIER.fields if f.name != "name"]
        latest = (
            ev.groupBy("name")
            .agg(F.max_by(F.struct(*others), "event_seq").alias("_s"))
            .select("name", *[F.col(f"_s.{c}").alias(c) for c in others])
        )
        if not ignore_done:
            # LATEST done event per name wins: each fetch pushes the
            # revisit deadline forward (reference TIME_CACHE re-score,
            # darc/db.py:970-972). min() would let the first deadline win
            # forever — a page re-fetched once would become claimable
            # every round after its first revisit cycle.
            done = self.store.read(self.t_done).groupBy("name").agg(
                F.max_by(
                    "revisit_after", F.struct(F.col("round"), F.col("revisit_after"))
                ).alias("revisit_after")
            )
            latest = latest.join(done, "name", "left").filter(
                F.col("revisit_after").isNull()
                | (F.lit(current_round) >= F.col("revisit_after"))
            ).drop("revisit_after")
        dropped = self.store.read(self.t_dropped).groupBy("name").agg(
            F.max("event_seq").alias("drop_seq")
        )
        latest = latest.join(dropped, "name", "left").filter(
            F.col("drop_seq").isNull() | (F.col("event_seq") > F.col("drop_seq"))
        ).drop("drop_seq")
        if not ignore_leases:
            leases = self.store.read(self.t_claims).groupBy("name").agg(
                F.max("lease_until").alias("lease_until")
            )
            latest = latest.join(leases, "name", "left").filter(
                F.col("lease_until").isNull() | (F.col("lease_until") <= current_round)
            ).drop("lease_until")
        if ignore_not_before:
            return latest
        return latest.filter(F.col("not_before") <= current_round)

    def claim(
        self,
        current_round: int,
        per_host: int = DEFAULT_POOL,
        lease: int = DEFAULT_LEASE,
        salt_shards: int = 8,
        robots_delays: DataFrame | None = None,
        hostname_state: DataFrame | None = None,
        escalate_above: int | None = None,
    ) -> DataFrame:
        """Claim a politeness-bounded batch and lease it (darc/db.py:944-977).

        Returns the claimed batch as re-read from its committed-staging
        segment, so downstream stages see exactly what was leased.
        ``escalate_above`` forwards the hot-host salt escalation threshold
        to the politeness window (result-identical; bounds phase-1 tasks).
        """
        p = self.pending(current_round)
        if robots_delays is not None and hostname_state is not None:
            p = politeness.crawl_delay_gate(
                p, hostname_state, robots_delays, current_round
            )
        host_counts = None
        if escalate_above is not None:
            # cheap over-estimate for salt escalation: raw frontier event
            # counts per host (plain scan+agg — avoids re-executing the
            # merge-on-read pending() plan; over-escalating is harmless)
            host_counts = (
                self.store.read(self.t_frontier)
                .groupBy("hostname")
                .agg(F.count("*").alias("_host_n"))
            )
        batch = politeness.per_host_top_k(
            p,
            per_host,
            salt_shards=salt_shards,
            escalate_above=escalate_above,
            host_counts=host_counts,
        )
        rows = batch.withColumn(
            "claim_round", F.lit(current_round).cast("long")
        ).withColumn("lease_until", F.lit(current_round + lease).cast("long"))
        self.store.append(self.t_claims, rows.select([f.name for f in CLAIMS.fields]))
        return self._staged_tail(self.t_claims)

    def mark_done(
        self, names: DataFrame, current_round: int, revisit_after: int = NEVER
    ) -> None:
        self.store.append(
            self.t_done,
            names.select("name")
            .withColumn("round", F.lit(current_round).cast("long"))
            .withColumn("revisit_after", F.lit(revisit_after).cast("long")),
        )

    def drop(
        self,
        names: DataFrame,
        current_round: int,
        reason: str = "no-return",
        update_filter: bool = True,
    ) -> None:
        """Permanent drop (LinkNoReturn → drop_requests, darc/db.py:406-417).

        Tombstones url_seen and deletes from the cuckoo filter so a later
        legitimate re-extraction can re-enqueue the URL (reference DELETEs
        the name key, darc/db.py:435-440).
        """
        d = names.select("name", "url", "hostname")
        seq = self._next_seq()
        self.store.append(
            self.t_dropped,
            d.select("name")
            .withColumn("round", F.lit(current_round).cast("long"))
            .withColumn("reason", F.lit(reason))
            .withColumn("event_seq", F.lit(seq).cast("long")),
        )
        if update_filter and self.filter_kind == "cuckoo":
            # DEFER the cuckoo delete: a stale filter entry is only ever
            # a false positive (the exact seen() anti-join still sees
            # the tombstone and decides correctly), so the delete can
            # ride the next filter update instead of paying a full
            # cogroup+replace job per drop call. Flushed at the latest
            # by :meth:`flush_filter_removes` (end of round).
            self._pending_filter_removes = getattr(
                self, "_pending_filter_removes", []
            )
            self._pending_filter_removes.append(d.select("name"))

    def flush_filter_updates(self) -> None:
        """Apply the round's deferred filter maintenance — enqueue-side
        adds and drop-side cuckoo deletes — as ONE cogroup+replace (or
        nothing when the round had neither)."""
        adds = getattr(self, "_pending_filter_adds", None) or []
        removes = getattr(self, "_pending_filter_removes", None) or []
        if not adds and not removes:
            return
        self._pending_filter_adds = []
        added = None
        for d in adds:
            added = d if added is None else added.unionByName(d)
        if added is None:
            added = removes[0].limit(0)
        self._update_filter(added=added)

    # backwards-compatible alias (pre-round-6 name)
    flush_filter_removes = flush_filter_updates

    # -- maintenance -------------------------------------------------------------
    def rebuild_filter(self, seen: DataFrame | None = None) -> None:
        """Rebuild every filter bucket from the exact seen set.

        This is how capacity auto-scales: each bucket's filter is sized
        ``max(configured, 2 × actual keys in bucket)``, so a bucket that
        saturated (degraded to exact-join-only) comes back at the right
        size. Fully distributed — one ``applyInPandas`` task per bucket.
        Called from :meth:`compact` (the Iceberg-maintenance analogue).
        """
        kind, cfg_capacity = self.filter_kind, self.filter_capacity
        # a rebuild from the exact seen set subsumes ALL deferred
        # maintenance: staged adds are in seen() (read_all view), and
        # tombstoned names are already absent from it; applying stale
        # deletes afterwards could evict another key sharing the
        # fingerprint slot — discard both
        self._pending_filter_removes = []
        self._pending_filter_adds = []
        src = seen if seen is not None else self.seen()
        keyed = src.select(
            F.pmod(F.xxhash64("name"), F.lit(self.n_filter_buckets))
            .cast("int")
            .alias("bucket"),
            F.xxhash64("name").alias("key"),
        )

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["bucket"].iloc[0])
            keys = pdf["key"].to_numpy(dtype="int64").view("uint64")
            capacity = max(cfg_capacity, 2 * len(keys))
            if kind == "cuckoo":
                flt = CuckooFilter.for_capacity(capacity)
                ok = flt.insert(keys)
            else:
                flt = BloomFilter.for_capacity(capacity)
                flt.add(keys)
                ok = True
            return pd.DataFrame(
                [{"bucket": bucket, "payload": flt.to_bytes() if ok else None,
                  "n": len(keys)}]
            )

        rebuilt = keyed.groupBy("bucket").applyInPandas(build, SEEN_FILTER)
        self.store.replace(self.t_filter, rebuilt)

    def filter_stats(self) -> dict[str, float]:
        """Prefilter health: bucket count, saturated buckets, keyed rows.

        Collects only (bucket, is_saturated, n) — never payload bytes.
        A rising ``saturated`` count means the prefilter is silently
        degrading to exact-join-only; ``rebuild_filter``/compaction
        restores it at auto-scaled capacity.
        """
        rows = (
            self.store.read_all(self.t_filter)
            .select(F.isnull("payload").alias("sat"), "n")
            .collect()
        )
        return {
            "filter_buckets": float(len(rows)),
            "filter_saturated": float(sum(1 for r in rows if r["sat"])),
            "filter_keys": float(sum(r["n"] for r in rows)),
        }

    def compact(self, current_round: int) -> None:
        """Fold event history into single segments (Iceberg compaction).

        Keeps every undone/undropped latest attempt (including rows under
        an active lease) and keeps active lease rows, so compaction is
        state-transparent at any point in the crawl.
        """
        survivors = self.pending(
            current_round,
            ignore_leases=True,
            ignore_not_before=True,
            ignore_done=True,  # done rows stay: finite revisit_after must fire
        )
        self.store.replace(
            self.t_frontier, survivors.select([f.name for f in FRONTIER.fields])
        )
        seen_now = self.seen()
        self.store.replace(
            self.t_seen,
            seen_now.select("name", "url", "hostname", "seen_round")
            .withColumn("deleted", F.lit(False))
            .withColumn("event_seq", F.lit(self._next_seq()).cast("long")),
        )
        # re-key the prefilter from the exact seen set at auto-scaled
        # capacity (un-saturates degraded buckets)
        self.rebuild_filter(seen_now)
        active = self.store.read(self.t_claims).filter(
            F.col("lease_until") > current_round
        )
        self.store.replace(self.t_claims, active)

    def metrics(self, current_round: int) -> dict[str, float]:
        return {
            "pending": float(self.pending(current_round).count()),
            "seen": float(self.seen().count()),
            **self.filter_stats(),
        }
