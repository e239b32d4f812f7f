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
    df: DataFrame,
    min_parts: int | None = None,
    barrier: bool = False,
    min_bytes: int = 0,
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

    ``min_bytes > 0`` makes the fanout size-adaptive (guide §2:
    "derive partitioning from input size, not a constant"): when the
    optimizer's size estimate for ``df`` is below the threshold, the
    exchange is skipped — at local scale a repartition of a sub-MB
    frame costs a fixed ~0.2-1 s (extra AQE stage + task waves) that
    exceeds the serial evaluation it would parallelize (measured:
    ann_lsh 0.63 s serial vs 1.22 s fanned on a 0.8 MB corpus).
    Callers set the threshold from their per-row cost model — only
    cheap-per-byte paths (vector arithmetic) should pass one;
    expensive-per-row paths (document tokenization) should not. When
    the estimate is unavailable the fanout proceeds (the safe direction
    at scale). At 100-TB scale the whole function is a no-op either
    way: real inputs carry more splits than cores.
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
    if min_bytes > 0:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # pragma: no cover - internal-API drift
            est = None
        if est is not None and 0 <= est < min_bytes:
            return df
    wide = df.repartition(target)
    return wide.cache() if barrier else wide
