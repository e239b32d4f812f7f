"""API-submit sink: bounded retry + spill-to-store replay.

Reference contract (``darc/submit.py:225-246``): each JSON payload is
POSTed up to ``API_RETRY``+1 times; if every attempt fails the payload
is spilled to disk (``save_submit``, ``darc/submit.py:72``,
``PATH_DB/api``) so no submission is ever lost. Here the spill is a
**store table** — checkpointed with the snapshot like every other
table, so a killed run resumes with its unsent payloads intact — and
the next :meth:`SubmitSink.submit` call for the domain replays spilled
payloads ahead of the new batch (the replay the reference leaves to
operators).

Scale shape: attempts run inside ``mapInPandas`` on the payload
partitions (each executor drains its own slice against the API — the
distributed analogue of the reference's per-worker session), only
(key, ok) booleans come back, and the spill table is the failure set,
which is small unless the API is down — in which case it is exactly
the durable queue you want.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from darc_spark.sources.store import SnapshotStore

SUBMIT_SPILL = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),
        T.StructField("spill_round", T.LongType(), False),
        T.StructField("attempts", T.IntegerType(), False),
    ]
)

_RESULT = "key string, payload string, ok boolean, attempts int"


class SubmitSink:
    """POST rendered payloads with retry; spill failures for replay.

    ``post_fn``: pd.Series of payload JSON strings → iterable of bools
    (one per payload; True = accepted). The synthetic double in tests; a
    requests session pool against API_NEW_HOST/API_REQUESTS/API_SELENIUM
    on a real deployment.
    """

    def __init__(
        self,
        store: SnapshotStore,
        post_fn: Callable[[pd.Series], "pd.Series | list[bool]"],
        max_retries: int = 3,  # API_RETRY (darc/submit.py:238)
    ) -> None:
        self.store = store
        self.post_fn = post_fn
        self.max_retries = max_retries
        store.schemas.setdefault("submit_spill", SUBMIT_SPILL)

    def submit(self, payloads: DataFrame, domain: str, r: int) -> dict[str, int]:
        """Submit (key, payload) rows for ``domain``; returns counts.

        Spilled payloads from earlier rounds replay FIRST (dedup by key:
        a payload re-rendered this round supersedes its spilled copy).
        Staged, not committed — the caller's round commit publishes the
        new spill set atomically with the rest of the snapshot.
        """
        post_fn, retries = self.post_fn, self.max_retries

        spilled = self.store.read_all("submit_spill").filter(
            F.col("domain") == domain
        )
        fresh = payloads.select(
            F.col(payloads.columns[0]).cast("string").alias("key"),
            F.col("payload"),
        )
        todo = fresh.unionByName(
            spilled.select("key", "payload").join(fresh, "key", "left_anti")
        )

        def attempt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ok = pd.Series(False, index=pdf.index)
                tries = pd.Series(0, index=pdf.index)
                pending = ~ok
                for _ in range(retries + 1):
                    if not pending.any():
                        break
                    res = pd.Series(
                        list(post_fn(pdf.loc[pending, "payload"])),
                        index=pdf.index[pending],
                    ).fillna(False)
                    tries[pending] += 1
                    # positional numpy assignment: an index-aligned Series
                    # here flips ok to object dtype on PARTIAL success
                    # (alignment fills the unmasked rest with NaN), after
                    # which ~ok yields -1/-2 integer labels and .loc dies
                    ok.loc[pending] = res.astype(bool).to_numpy()
                    pending = ~ok
                out = pdf[["key", "payload"]].copy()
                out["ok"] = ok
                out["attempts"] = tries.astype("int32")
                yield out

        results = self.store.write_scratch(
            f"submit_attempts_{domain}", todo.mapInPandas(attempt, _RESULT)
        )
        agg = results.agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("int")).alias("n_ok"),
        ).head()
        n, n_ok = int(agg["n"] or 0), int(agg["n_ok"] or 0)

        # carry cumulative retry history through the replay: a payload
        # that keeps failing keeps its ORIGINAL spill round and its
        # attempts counter accumulates across rounds, so operators can
        # identify long-stuck payloads instead of every spill row reading
        # attempts=max_retries+1 with this round's stamp
        # aggregate prior per key BEFORE the join: if the spill table ever
        # holds duplicate rows for a key (e.g. the same key spilled twice
        # in one round's fresh batch), a plain left join would fan results
        # out and compound duplicate spill rows every subsequent round
        prior = spilled.groupBy("key").agg(
            F.max("attempts").alias("_prior_attempts"),
            F.min("spill_round").alias("_prior_spill_round"),
        )
        failed = (
            results.filter(~F.col("ok"))
            .join(prior, "key", "left")
            .select(
                F.lit(domain).alias("domain"),
                "key",
                "payload",
                F.coalesce(
                    "_prior_spill_round", F.lit(r).cast("long")
                ).alias("spill_round"),
                (
                    F.col("attempts") + F.coalesce("_prior_attempts", F.lit(0))
                )
                .cast("int")
                .alias("attempts"),
            )
        )
        other_domains = self.store.read_all("submit_spill").filter(
            F.col("domain") != domain
        )
        self.store.replace(
            "submit_spill", other_domains.unionByName(failed)
        )
        return {"submitted": n_ok, "spilled": n - n_ok, "total": n}
