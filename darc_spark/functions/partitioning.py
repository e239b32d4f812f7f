"""Scan-parallelism guard for expensive per-row expressions.

The engine's corpora arrive as parquet; a small table (or one written
with a single row group) scans as ONE input split, so any expensive
per-row expression computed before the first exchange — signature
planes, per-dimension hash projections, per-token hashing — runs on a
single core regardless of cluster size (guide §2.5: input skew, "one
huge unsplittable file").

:func:`fanout` inserts a round-robin repartition ONLY when the scan's
partition count is below the cluster's parallelism, so:

* small/single-row-group inputs fan out to every core before the heavy
  expression (the shuffle moves the raw rows — tiny next to the work);
* at scale the input already has more splits than cores and the call is
  a no-op — no extra exchange on the 100-TB path.

Result-transparent: every consumer is an aggregation, join or exact
two-stage top-k whose output is independent of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(
    df: DataFrame, min_parts: int | None = None, barrier: bool = False
) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when
    its current partitioning is narrower; identity otherwise.

    ``barrier=True`` additionally ``cache()``s the repartitioned frame —
    needed when the downstream work is an expensive DETERMINISTIC
    FILTER: Catalyst pushes such predicates back through a plain
    repartition into the (serial) scan, undoing the fanout; an
    InMemoryRelation is a pushdown boundary. cache (not localCheckpoint)
    keeps the logical-plan identity stable, so repeated invocations of
    the same query reuse one materialization. The barrier only fires
    when the fanout actually repartitioned, so a wide (at-scale) input
    is never cached.
    """
    sc = df.sparkSession.sparkContext
    target = int(min_parts) if min_parts else sc.defaultParallelism
    if target <= 1:
        return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning-only failure
        return df
    if cur >= target:
        return df
    wide = df.repartition(target)
    return wide.cache() if barrier else wide
