"""Per-host politeness budget: deterministic salted top-k claim window.

The reference's implicit politeness is MAX_POOL per round + serial
per-link fetching inside a worker (``darc/db.py:926-934,966-968``,
``darc/process.py:97-98``) — one hot host can starve a round, and
nothing bounds per-host concurrency. Here politeness is an **explicit
window**: at most ``k`` URLs per hostname per round (SURVEY.md §2.4 A3),
ordered by the *defined* total order ``(priority, enqueue_round, url)``
so claim batches are identical across parallelism levels (SURVEY.md §7
hard part (a) — crawl-ordering equivalence).

Skew (north rule): a hot host with millions of pending URLs would make
``Window.partitionBy(hostname)`` a single giant task. The claim is
two-phase — phase 1 computes top-k *per (hostname, salt)* over R salt
shards (hash of url → shard, deterministic), phase 2 re-ranks the
≤ k·R survivors per host. Phase-1 tasks are bounded by the shard size,
so the hot host fans out over R tasks; phase 2 sees at most k·R rows
per host. Both windows use the same total order, so the result equals
the unsalted window exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CLAIM_ORDER = ("priority", "enqueue_round", "url")


def claim_order_cols() -> list[Column]:
    return [F.col(c).asc() for c in CLAIM_ORDER]


def per_host_top_k(
    df: DataFrame,
    k: int,
    host_col: str = "hostname",
    salt_shards: int = 8,
    escalate_above: int | None = None,
    max_shards: int = 256,
    host_counts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic top-k rows per host under the claim order.

    ``escalate_above``: when set, hosts with more pending rows than this
    threshold get their phase-1 shard count escalated proportionally
    (capped at ``max_shards``) — the north rule's hot-host salt
    escalation. Escalation only changes phase-1 task sizing; phase 2
    re-ranks with the same total order, so the result is identical for
    any shard counts (asserted by tests).

    ``host_counts``: optional precomputed (host_col, _host_n) dim. When
    the caller has a cheap OVER-estimate of per-host pending (e.g. raw
    frontier event counts, no merge-on-read joins), passing it avoids
    re-executing ``df``'s full plan for the count — over-escalation only
    adds phase-1 shards, never changes the result. Hosts absent from the
    dim fall back to ``salt_shards``.
    """
    order = claim_order_cols()
    if salt_shards > 1:
        if escalate_above is not None:
            counts = (
                host_counts
                if host_counts is not None
                else df.groupBy(host_col).agg(F.count("*").alias("_host_n"))
            )
            shards_for = F.when(
                F.col("_host_n") > escalate_above,
                F.least(
                    F.ceil(F.col("_host_n") / F.lit(escalate_above)).cast("int")
                    * F.lit(salt_shards),
                    F.lit(max_shards),
                ),
            ).otherwise(F.lit(salt_shards))
            df = df.join(
                F.broadcast(counts.withColumn("_shards", shards_for)).drop("_host_n"),
                host_col,
                "left",
            ).withColumn(
                "_shards", F.coalesce(F.col("_shards"), F.lit(salt_shards))
            )
            shard = F.pmod(F.xxhash64(F.col("url")), F.col("_shards"))
        else:
            shard = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_shards))
        w1 = Window.partitionBy(F.col(host_col), shard).orderBy(*order)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= k)
            .drop("_rn1")
        )
        if escalate_above is not None:
            df = df.drop("_shards")
    w2 = Window.partitionBy(F.col(host_col)).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def crawl_delay_gate(
    pending: DataFrame,
    hostname_state: DataFrame,
    robots_delays: DataFrame | None,
    current_round: int,
    host_col: str = "hostname",
) -> DataFrame:
    """Drop hosts still inside their robots crawl-delay window.

    ``robots_delays``: (hostname, crawl_delay_rounds). A host with delay
    d is claimable only when current_round - last_fetch_round >= d.
    Both dims are per-host small → broadcast joins, no shuffle of the
    frontier side.
    """
    if robots_delays is None:
        return pending
    state = hostname_state.select(host_col, "last_fetch_round")
    delays = robots_delays.select(host_col, "crawl_delay_rounds")
    gated = (
        pending.join(F.broadcast(delays), host_col, "left")
        .join(F.broadcast(state), host_col, "left")
        .filter(
            F.col("crawl_delay_rounds").isNull()
            | F.col("last_fetch_round").isNull()
            | (
                F.lit(current_round) - F.col("last_fetch_round")
                >= F.col("crawl_delay_rounds")
            )
        )
        .drop("crawl_delay_rounds", "last_fetch_round")
    )
    return gated
