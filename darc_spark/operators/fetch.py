"""Vectorized fetch+extract — the engine's S4/S5 stage.

Reference: per-link serial ``crawler_hook`` GET + bs4 extraction
(``darc/sites/default.py:29-45``, ``darc/crawl.py:186-225``). Here one
Arrow ``mapInPandas`` pass per claimed batch does fetch AND extraction,
so HTML bodies never leave the Python worker and never enter a shuffle
— only the (small) extracted-URL arrays and the image payload columns
come back to the JVM (SURVEY.md §7 hard part (d): keep bytes out of
shuffles; payload bytes are written straight to the fetches table).

The batch is repartitioned by hostname first: one task sees one host's
(politeness-bounded, ≤k rows) slice — the distributed analogue of the
reference's per-host serial worker loop (``darc/process.py:97-98``).

Site hooks (``register_sites``) are consulted per hostname inside the
UDF, mirroring darc's SITEMAP dispatch (``darc/sites/__init__.py:79-102``).
A hook may set ``no_return=True`` (LinkNoReturn, ``darc/error.py:40-55``).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from darc_spark.functions.extract import extract_links_batch
from darc_spark.registry import SITE_MAP
from darc_spark.schema import HISTORY_HOP

_PASS_THROUGH = [
    "name",
    "url",
    "scheme",
    "proxy",
    "host",
    "hostname",
    "backref",
    "priority",
    "retry_count",
    "enqueue_round",
]

FETCH_RESULT = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("scheme", T.StringType(), True),
        T.StructField("proxy", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("backref", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("enqueue_round", T.LongType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("cookies", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("history", T.ArrayType(HISTORY_HOP), True),
        # render stage only: the screenshot PNG, distinct from the page
        # payload (darc/model/web/selenium.py:40); null in requests stage
        T.StructField("screenshot", T.BinaryType(), True),
        T.StructField("is_html", T.BooleanType(), False),
        T.StructField("empty_body", T.BooleanType(), False),
        T.StructField("no_return", T.BooleanType(), False),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("body_text", T.StringType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        # per-partition lineage (north rule): which executor task slice
        # produced this row, and the batch's fetch wall-time
        T.StructField("fetch_partition", T.IntegerType(), True),
        T.StructField("fetch_batch_ms", T.DoubleType(), True),
    ]
)

_HTML_TYPES = ("text/html", "application/xhtml+xml")  # darc/crawl.py:199


def run_fetch(
    claimed: DataFrame,
    fetch_fn: Callable[[pd.Series], pd.DataFrame],
    extract: bool = True,
    keep_plain_body: bool = True,
    fetch_salt: int = 8,
    n_rows: int | None = None,
) -> DataFrame:
    """claimed batch → FETCH_RESULT rows via one mapInPandas pass.

    ``fetch_fn``: pd.Series of URLs → page DataFrame (the synthetic web's
    ``pages_batch`` in this sandbox; a requests/Tor session pool on a real
    deployment — the UDF shape is identical).
    """
    site_map = dict(SITE_MAP)  # captured → shipped to executors once

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t0 = time.perf_counter()
            pages = fetch_fn(pdf["url"])
            if "no_return" not in pages.columns:
                pages["no_return"] = False
            for hostname in pdf["hostname"].unique():
                hook = site_map.get(str(hostname).casefold())
                if hook is not None:
                    mask = (pdf["hostname"] == hostname).to_numpy()
                    res = hook(pdf[mask], pages[mask])
                    # column-wise positional assignment: hooks may add
                    # columns (e.g. no_return) or reset the index
                    for col in res.columns:
                        if col not in pages.columns:
                            pages[col] = None
                        pages.loc[mask, col] = res[col].to_numpy()
            out = pdf[_PASS_THROUGH].reset_index(drop=True)
            pages = pages.reset_index(drop=True)
            html = pages["html"].fillna("")
            raw_ct = pages["content_type"]
            # missing Content-Type header → body sniff (get_content_type,
            # darc/parse.py:276-302); cold path, runs on the missing
            # subset only
            missing = raw_ct.isna() | (raw_ct.astype("string").str.strip().fillna("") == "")
            if bool(missing.any()):
                from darc_spark.functions.sniff import sniff_mime

                raw_ct = raw_ct.copy()
                raw_ct[missing] = sniff_mime(
                    html[missing],
                    pages["bytes"][missing] if "bytes" in pages.columns else None,
                )
            ct = raw_ct.fillna("").str.lower().str.split(";").str[0].str.strip()
            is_html = ct.isin(_HTML_TYPES)
            out["status_code"] = pages["status_code"]
            out["content_type"] = ct
            # response metadata (headers/cookies/redirect history) — dict/
            # list cells transfer as Arrow map/struct columns; absent ⇒ null
            for c in ("headers", "cookies", "history", "screenshot"):
                out[c] = pages[c] if c in pages.columns else None
            out["is_html"] = is_html
            out["empty_body"] = html.str.len() == 0
            out["no_return"] = pages.get(
                "no_return", pd.Series(False, index=pages.index)
            ).fillna(False)
            if extract:
                links = pd.Series([[]] * len(out), index=out.index, dtype=object)
                if is_html.any():
                    links[is_html] = extract_links_batch(
                        out.loc[is_html, "url"], html[is_html]
                    )
                out["links"] = links
            else:
                out["links"] = pd.Series([None] * len(out), dtype=object)
            # non-HTML text bodies are kept for the i2p hosts.txt path
            # (darc/crawl.py:203-206); HTML bodies stay executor-side
            plain = (~is_html) & (ct.str.startswith("text/")) & keep_plain_body
            out["body_text"] = html.where(plain, None)
            for c in ("image_id", "fmt", "caption"):
                out[c] = pages[c]
            out["bytes"] = pages["bytes"]
            for c in ("w", "h"):
                out[c] = pages[c].astype("Int32")
            out["phash"] = pages["phash"].astype("Int64")
            out["fetch_partition"] = pid
            out["fetch_batch_ms"] = (time.perf_counter() - t0) * 1000.0
            yield out

    # Hash-partition by (hostname, salt) with an EXPLICIT partition count:
    #
    # * explicit count — AQE would otherwise coalesce this exchange to ~1
    #   partition because claim rows are tiny; it optimizes bytes and
    #   cannot see that the downstream fetch UDF is the expensive part
    #   (measured: the whole fetch ran in ONE task without this).
    # * salt — politeness is enforced by the claim window (per-host
    #   budget), not by fetch serialization; pinning a whole host to one
    #   task makes task balance host-granular and leaves stragglers in
    #   the last wave. Salting splits hot hosts across `fetch_salt`
    #   shards while batches stay mostly host-local (session reuse).
    spark = claimed.sparkSession
    # fine-grained fetch tasks (up to 12 waves' worth): per-URL work is
    # heavy and uneven (decode pipelines, page size mix), so the stage
    # ends on its slowest last-wave task — smaller tasks shrink that
    # straggler tail, which is what sub-linear N→4N scaling is made of.
    # When the caller knows the batch size (the claim stage counts it
    # anyway), the task count is additionally bounded at ~64 rows/task:
    # a small round does not pay 12×cores near-empty Python tasks, and a
    # large round keeps the full 12-wave straggler protection.
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism * 12,
    )
    if n_rows is not None:
        n_parts = min(
            n_parts,
            max(
                int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
                -(-int(n_rows) // 64),
            ),
        )
    batch = claimed.repartition(
        n_parts,
        F.col("hostname"),
        F.pmod(F.xxhash64("url"), F.lit(fetch_salt)),
    )
    return batch.mapInPandas(fn, FETCH_RESULT)
