"""darc_spark — a brand-new PySpark-native URL-frontier + fetch-scheduler.

A from-scratch rebuild (NOT a port) of the query/data-processing
capabilities of JarryShaw/darc (reference at ``/root/reference``), designed
Spark-first:

* darc's Redis/RDBMS task queues (``darc/db.py:16-31``) become snapshot-
  committed Parquet "frontier" tables (Iceberg-style manifests, see
  :mod:`darc_spark.sources.store`) of image+caption payloads.
* darc's per-link imperative loop (``darc/crawl.py:44-251``) becomes a
  declarative per-round DataFrame pipeline: claim (window top-k per host) →
  fetch+extract (Arrow ``mapInPandas``) → dedup (bloom prefilter +
  ``left_anti`` join) → enqueue-NX (MERGE-like union) → commit snapshot.
* darc's URL canonicalization/classification (``darc/link.py:228-404``)
  becomes a vectorized pandas UDF + native-SQL expressions.

Public extension surface mirrors the reference's plugin API
(``darc/__init__.py:47-55``): :func:`register_sites`,
:func:`register_proxy`, :func:`register_hooks`.
"""

from darc_spark.registry import (  # noqa: F401
    register_hooks,
    register_proxy,
    register_sites,
)

__version__ = "0.1.0"
