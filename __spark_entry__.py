"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship frontier-scheduling query on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2
plus the training-data pipeline ops); each callable is (spark, sf_dir)
→ DataFrame built from darc_spark library functions.
``oracle_sql()`` — the equivalent DuckDB SQL per query. Column names and
numeric types are aligned on both sides (BIGINT/DOUBLE, rounded floats).
Queries with no SQL-expressible form (the crawl loop itself, image
codecs) are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the darc_spark package to executor Python workers.

    The driver harness creates its own SparkSession, so the package is
    importable on the driver (sys.path) but NOT in worker processes.
    Zipping the package and ``addPyFile``-ing it is exactly the
    spark-submit --py-files deployment path, done lazily. Idempotent.
    """
    import os
    import zipfile

    import darc_spark

    if getattr(spark, "_darc_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(darc_spark.__file__))
    zip_path = os.path.join(
        "/tmp", f"darc_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "darc_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._darc_spark_shipped = True


def _load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    _ensure_shipped(spark)
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def _ann_index(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    """Build-or-reuse a materialized ANN index table for ``sf_dir``.

    The serving contract of every ANN family is a PRECOMPUTED index
    table (cell-partitioned assignment / code parquet) probed per
    query — never a per-query re-run of assignment/encoding over the
    corpus. Index tables live under a deterministic temp path keyed by
    (source dir, kind): the first query of a session builds one
    (offline index-build step), later queries and bench repeats reuse
    it, which is exactly the compute-once/lookup-thereafter shape of
    the reference's disk-cached per-host artifacts
    (darc/proxy/null.py:110-141)."""
    import hashlib
    import os
    import shutil
    import tempfile

    # key on the source table's CONTENT fingerprint (size + mtime), not
    # just its path: a regenerated corpus at the same path must rebuild,
    # never serve a stale index
    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        fp = "nosrc"
    # v3: index tables are written fanned-out (multiple files) so the
    # serving scan parallelizes — invalidate any v2 single-file layout
    key = hashlib.md5(
        f"ann-v3|{os.path.abspath(sf_dir)}|{fp}|{kind}".encode()
    ).hexdigest()[:16]
    path = os.path.join(
        tempfile.gettempdir(), "darc_ann_index", f"{kind}_{key}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # build into a private dir, publish by atomic rename: two
        # concurrent processes can't interleave writes into one target
        tmp = f"{path}.tmp-{os.getpid()}"
        build(tmp)
        try:
            os.rename(tmp, path)
        except OSError:  # another process published first — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
    from darc_spark.functions.similarity import read_ann_index

    return read_ann_index(spark, path)


# ---------------------------------------------------------------------------
# URL corpus: deterministic URLs derived from documents.doc_id, covering
# every proxy class. The Spark side classifies with the REAL vectorized
# parser (darc_spark.functions.canon); the oracle classifies this closed
# corpus with an independent SQL CASE.
_URL_CASE_SPARK = """
CASE CAST(doc_id % 12 AS INT)
  WHEN 0 THEN 'http://site' || CAST(doc_id % 7 AS STRING) || '.example/p/' || CAST(doc_id AS STRING)
  WHEN 1 THEN 'https://hidden' || CAST(doc_id % 5 AS STRING) || '.onion/page/' || CAST(doc_id AS STRING)
  WHEN 2 THEN 'http://x' || CAST(doc_id % 5 AS STRING) || '.onion.sh/q'
  WHEN 3 THEN 'http://mud' || CAST(doc_id % 3 AS STRING) || '.i2p/idx'
  WHEN 4 THEN 'http://127.0.0.1:43110/1Site' || CAST(doc_id % 9 AS STRING) || '/x'
  WHEN 5 THEN 'http://127.0.0.1:8888/USK@key' || CAST(doc_id % 9 AS STRING) || '/sub'
  WHEN 6 THEN 'mailto:user' || CAST(doc_id AS STRING) || '@mail.example'
  WHEN 7 THEN 'bitcoin:1A1zP' || CAST(doc_id AS STRING)
  WHEN 8 THEN 'data:text/plain;base64,QUJD'
  WHEN 9 THEN 'javascript:void(' || CAST(doc_id AS STRING) || ')'
  WHEN 10 THEN 'ftp://files' || CAST(doc_id % 4 AS STRING) || '.example/f'
  ELSE 'wss://socket.example/ws/' || CAST(doc_id AS STRING)
END
"""

_URL_CASE_DUCK = """
CASE CAST(doc_id % 12 AS INT)
  WHEN 0 THEN 'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR)
  WHEN 1 THEN 'https://hidden' || CAST(doc_id % 5 AS VARCHAR) || '.onion/page/' || CAST(doc_id AS VARCHAR)
  WHEN 2 THEN 'http://x' || CAST(doc_id % 5 AS VARCHAR) || '.onion.sh/q'
  WHEN 3 THEN 'http://mud' || CAST(doc_id % 3 AS VARCHAR) || '.i2p/idx'
  WHEN 4 THEN 'http://127.0.0.1:43110/1Site' || CAST(doc_id % 9 AS VARCHAR) || '/x'
  WHEN 5 THEN 'http://127.0.0.1:8888/USK@key' || CAST(doc_id % 9 AS VARCHAR) || '/sub'
  WHEN 6 THEN 'mailto:user' || CAST(doc_id AS VARCHAR) || '@mail.example'
  WHEN 7 THEN 'bitcoin:1A1zP' || CAST(doc_id AS VARCHAR)
  WHEN 8 THEN 'data:text/plain;base64,QUJD'
  WHEN 9 THEN 'javascript:void(' || CAST(doc_id AS VARCHAR) || ')'
  WHEN 10 THEN 'ftp://files' || CAST(doc_id % 4 AS VARCHAR) || '.example/f'
  ELSE 'wss://socket.example/ws/' || CAST(doc_id AS VARCHAR)
END
"""


def _url_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _load(spark, sf_dir, "documents")
    return docs.selectExpr("doc_id", f"({_URL_CASE_SPARK}) AS url")


# -- shared SQL fragments (DuckDB dialect) -----------------------------------
_TOKS_DUCK = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')"
)
_H64_DUCK = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_STOP_DUCK = "['the','a','of','to','and','in','is','for','on','with']"


# ---------------------------------------------------------------------------
# queries
def q_link_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: vectorized parse_link classification (SURVEY §2.7)."""
    from darc_spark.functions.canon import with_parsed_link

    urls = _url_corpus(spark, sf_dir)
    parsed = with_parsed_link(urls)
    return (
        parsed.groupBy("proxy")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("hostname").cast("long").alias("n_hosts"),
        )
        .orderBy("proxy")
    )


def q_url_name_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: canonical URL key = sha256 (darc/link.py:394)."""
    from darc_spark.functions.canon import link_name

    urls = _url_corpus(spark, sf_dir)
    return urls.select(
        "doc_id", link_name("url").alias("name")
    ).orderBy("doc_id").limit(200)


def q_frontier_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/A3/W1: politeness top-k claim window over an event frontier."""
    from darc_spark.operators.politeness import per_host_top_k

    (events,) = _load(spark, sf_dir, "events")
    frontier = events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("string").alias("hostname"),
        F.lit(0).cast("int").alias("priority"),
        F.col("event_id").cast("long").alias("enqueue_round"),
        F.concat(F.lit("u"), F.col("user_id"), F.lit("/"), F.col("event_id")).alias(
            "url"
        ),
    )
    return per_host_top_k(frontier, 3, salt_shards=4).select(
        "hostname", "event_id", "url"
    )


def q_url_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: ZADD-NX dedup as left_anti join (url_seen semantics).

    Key = (user_id, props.k) — a fine-grained "URL" stand-in so the
    fresh set is non-empty at every scale factor; threshold at the 80th
    percentile of event_id splits seen vs new batch."""
    (events,) = _load(spark, sf_dir, "events")
    keyed = events.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.regexp_extract(F.col("props"), r"(\d+)", 1).cast("long").alias("k"),
    )
    threshold = keyed.agg(F.max("event_id")).head()[0] * 4 // 5
    seen = keyed.filter(F.col("event_id") < threshold).select("user_id", "k").distinct()
    batch = keyed.filter(F.col("event_id") >= threshold).select("user_id", "k").distinct()
    return batch.join(seen, ["user_id", "k"], "left_anti")


def q_stream_url_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2.8 streaming: stateful URL-seen dedup end state == batch DISTINCT.

    The events table is folded into URLs with natural duplicates
    (user_id % 41 hosts × event_id % 500 paths), written as 4 text part
    files, and drained by the ``applyInPandasWithState`` streaming dedup
    one file per micro-batch (availableNow) — so seen-state must carry
    across 4 real micro-batches. The emitted (url, name) set is compared
    to the SQL ``SELECT DISTINCT`` ground truth: any state loss between
    batches re-emits duplicates and breaks the row count; any over-eager
    state drops fresh URLs and breaks it the other way. Reference:
    ZADD-NX on the url-seen zset (darc/db.py:555-568)."""
    import os
    import tempfile

    from darc_spark.streaming.stream import url_seen_dedup_stream

    (events,) = _load(spark, sf_dir, "events")
    urls = events.select(
        F.concat(
            F.lit("http://h"),
            (F.col("user_id") % 41).cast("string"),
            F.lit(".example/p"),
            (F.col("event_id") % 500).cast("string"),
        ).alias("value")
    )
    root = tempfile.mkdtemp(prefix="stream_seen_")
    seed_dir = os.path.join(root, "seeds")
    urls.repartition(4).write.mode("overwrite").text(seed_dir)
    q = url_seen_dedup_stream(
        spark,
        seed_dir,
        os.path.join(root, "ckpt"),
        os.path.join(root, "out"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert q.lastProgress is None or not q.isActive
    return spark.read.parquet(os.path.join(root, "out")).select("url", "name")


def q_hostname_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: hostname alive=any(ok), since=min(ts) rollup."""
    (events,) = _load(spark, sf_dir, "events")
    return events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max(F.when(F.col("event_type") != "error", 1).otherwise(0))
        .cast("long")
        .alias("alive"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("since"),
        F.count("*").cast("long").alias("n_urls"),
    )


def q_link_graph_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: FK joins — revenue per nation (broadcast dims)."""
    nation, customer, orders, lineitem = _load(
        spark, sf_dir, "nation", "customer", "orders", "lineitem"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        # per-row integer scaling before the sum: floor is exact on doubles,
        # so the aggregate is order-independent (no float-sum nondeterminism)
        .withColumn(
            "rev_e2",
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5),
        )
        .groupBy("n_name")
        .agg(
            F.sum("rev_e2").cast("long").alias("revenue_e2"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def _fetch_corpus(spark: SparkSession) -> DataFrame:
    """Enumerated SynthWeb URL space pushed through the REAL distributed
    fetch path (run_fetch mapInPandas) — the input for the response-
    metadata queries (headers / redirect history)."""
    from darc_spark.functions.canon import with_parsed_link
    from darc_spark.operators.fetch import run_fetch
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=42, pages_per_host=60, branching=3)
    urls = [web.url(h, p) for h in web.hosts for p in range(web.pages_per_host)]
    links = with_parsed_link(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).withColumn("backref", F.lit(None).cast("string"))
    claimed = (
        links.withColumn("priority", F.lit(0).cast("int"))
        .withColumn("retry_count", F.lit(0).cast("int"))
        .withColumn("enqueue_round", F.lit(0).cast("long"))
    )
    return run_fetch(claimed, web.pages_batch)


def q_redirect_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: REAL per-fetch redirect chains with hop index, via the
    distributed fetch path (response.history persistence,
    darc/model/web/requests.py:66-103, darc/submit.py:545-557)."""
    raw = _fetch_corpus(spark)
    return raw.select(
        "url", F.posexplode("history").alias("pos", "hop")
    ).select(
        "url",
        F.col("pos").cast("long").alias("pos"),
        F.col("hop.url").alias("hop_url"),
        F.col("hop.status").cast("int").alias("hop_status"),
    )


def q_fetch_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: response headers/cookies persisted per fetch
    (save_headers, darc/save.py:136-220) — exploded to rows."""
    raw = _fetch_corpus(spark)
    headers = raw.select("url", F.explode("headers").alias("hkey", "hval"))
    cookies = raw.select(
        "url",
        F.explode("cookies").alias("ckey", "hval"),
    ).select("url", F.concat(F.lit("cookie:"), F.col("ckey")).alias("hkey"), "hval")
    return headers.unionByName(cookies)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog sessionization: lag + gap>600s cumsum."""
    from pyspark.sql import Window

    (events,) = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.withColumn(
        "new_session",
        F.when(
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_timestamp(F.col("ts").cast("timestamp"))).over(w)
            > 600,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    return gaps.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        (F.sum("new_session") + 1).cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog tumbling window aggregation (hourly buckets)."""
    (events,) = _load(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("sum_value_e2"),
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    scaled = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .withColumn("qty_e2", F.floor(F.col("l_quantity") * 100 + 0.5))
        .withColumn("price_e2", F.floor(F.col("l_extendedprice") * 100 + 0.5))
        .withColumn(
            "disc_price_e2",
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5),
        )
        .withColumn(
            "charge_e2",
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
                + 0.5
            ),
        )
        .withColumn("disc_e6", F.floor(F.col("l_discount") * 1000000 + 0.5))
    )
    return (
        scaled.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_e2").cast("long").alias("sum_qty_e2"),
            F.sum("price_e2").cast("long").alias("sum_base_price_e2"),
            F.sum("disc_price_e2").cast("long").alias("sum_disc_price_e2"),
            F.sum("charge_e2").cast("long").alias("sum_charge_e2"),
            F.floor(F.sum("qty_e2").cast("double") * 10000 / F.count("*"))
            .cast("long")
            .alias("avg_qty_e6"),
            F.floor(F.sum("price_e2").cast("double") * 10000 / F.count("*"))
            .cast("long")
            .alias("avg_price_e6"),
            F.floor(F.sum("disc_e6").cast("double") / F.count("*"))
            .cast("long")
            .alias("avg_disc_e6"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + single agg (pushdown showcase)."""
    (lineitem,) = _load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .withColumn(
            "rev_e2",
            F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5),
        )
        .agg(
            F.sum("rev_e2").cast("long").alias("revenue_e2"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


def q_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-sets coverage)."""
    (events,) = _load(spark, sf_dir, "events")
    return (
        events.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .rollup("event_type", "user_bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("sum_value_e2"),
        )
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer bucket by price desc (W1 desc variant)."""
    from pyspark.sql import Window

    (orders,) = _load(spark, sf_dir, "orders")
    return (
        orders.withColumn("bucket", (F.col("o_custkey") % 25).cast("long"))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("bucket").orderBy(
                F.col("o_totalprice").desc(), F.col("o_orderkey")
            )
        ).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "bucket",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("price_e2"),
            "rank",
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup. The sf documents table has no exact duplicates, so a
    bare run is vacuous (0=0 proves nothing); inject deterministic copies
    of doc_id<10 (mirrored in the oracle) so the digest grouping,
    n_copies and canonical-id=min choice are actually value-checked."""
    from darc_spark.functions.dedup import exact_dedup

    (docs,) = _load(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text").union(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return exact_dedup(docs).select(
        "digest",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.dedup import minhash_lsh_pairs

    (docs,) = _load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.col("n_bands").cast("long").alias("n_bands"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.dedup import simhash_dup_groups

    (docs,) = _load(spark, sf_dir, "documents")
    # bits=16 explicitly: the oracle SQL enumerates per-bit conditional
    # sums, which is only tractable at 16; the engine default is 64
    return simhash_dup_groups(docs, bits=16).select(
        F.col("simhash").cast("long").alias("simhash"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.dedup import ngram_jaccard_pairs

    (docs,) = _load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.3).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.floor(F.col("jaccard") * 1000000 + 0.5).cast("long").alias("jaccard_e6"),
    )


def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of document length per language —
    the data-quality distribution report of a corpus pipeline. Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the standard
    (n−1)·p linear-interpolation definition."""
    (docs,) = _load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("_p50"),
        F.expr("percentile(n_chars, 0.9)").alias("_p90"),
        F.count("*").cast("long").alias("n_docs"),
    ).select(
        "lang",
        F.floor(F.col("_p50") * 1000000 + 0.5).cast("long").alias("p50_e6"),
        F.floor(F.col("_p90") * 1000000 + 0.5).cast("long").alias("p90_e6"),
        "n_docs",
    )


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning pipeline (quality ≥ 0.5 → lang-ID
    'en' → exact dedup → MinHash near-dup keep-canonical) reported as
    the per-language kept-document count and token budget. Exact-dup
    copies of doc_id<10 are injected so the dedup stages are
    value-checked, not vacuously passed through. The oracle re-runs the
    whole pipeline in SQL (recursive-CTE connected components for the
    near-dup clustering), composed from the per-stage oracle pieces."""
    from darc_spark.functions.pipeline import clean_corpus

    (docs,) = _load(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text", "lang").union(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
        )
    )
    cleaned = clean_corpus(docs)
    return cleaned.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.ceil(F.length("text") / F.lit(4.0)).cast("long"))
        .cast("long")
        .alias("total_bpe_tokens"),
    )


def q_quality_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB-appropriate percentile path, value-checked: exact
    ``percentile`` needs a global sort per group, so at scale the report
    runs on ``approx_percentile`` (t-digest-style sketch, one pass,
    mergeable). approx_percentile(x, p, acc) guarantees rank error
    ≤ n/acc, i.e. its result lies between the exact quantiles at
    p ± 1/acc — this query verifies that bound IN-PLAN (with a 2×
    margin bracket, floor/ceil-widened because the approx result is an
    actual data value while the interpolated exact one is fractional)
    and returns the per-language verdict; the oracle expects TRUE for
    every language."""
    (docs,) = _load(spark, sf_dir, "documents")
    acc = 1000
    # the guarantee is a RANK bound, so verify in rank space: the approx
    # result (an actual data value) occupies 0-based ranks [lt, le-1]
    # (lt = #values strictly below it, le = #values ≤ it); that interval
    # must overlap [p·n − err, p·n + err] with err = n/acc + 1 (the +1
    # absorbs the target-rank definition offset)
    agg = docs.groupBy("lang").agg(
        F.expr(f"approx_percentile(n_chars, 0.5, {acc})").alias("a50"),
        F.expr(f"approx_percentile(n_chars, 0.9, {acc})").alias("a90"),
    )
    joined = docs.join(F.broadcast(agg), "lang")
    rk = joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("n_chars") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("n_chars") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("n_chars") < F.col("a90")).cast("long")).alias("lt90"),
        F.sum((F.col("n_chars") <= F.col("a90")).cast("long")).alias("le90"),
    )

    def ok(p: float, lt: str, le: str) -> F.Column:
        target = F.col("n_docs").cast("double") * p
        err = F.col("n_docs").cast("double") / acc + 1.0
        return (F.col(lt).cast("double") <= target + err) & (
            F.col(le).cast("double") - 1.0 >= target - err
        )

    return rk.select(
        "lang",
        "n_docs",
        (ok(0.5, "lt50", "le50") & ok(0.9, "lt90", "le90")).alias(
            "within_bound"
        ),
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    pair graph (cluster → keep canonical copy), labels = min member id.
    Iterative min-label propagation on DataFrames; the oracle computes
    the same components with a recursive reachability CTE."""
    from darc_spark.functions.dedup import connected_components, minhash_lsh_pairs

    (docs,) = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    return connected_components(pairs).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: cluster the MinHash pair graph and
    emit the kept corpus — each component's minimum-id member plus every
    unpaired document."""
    from darc_spark.functions.dedup import keep_canonical, minhash_lsh_pairs

    (docs,) = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    return keep_canonical(docs.select("doc_id", "lang"), pairs).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.text import lang_id

    (docs,) = _load(spark, sf_dir, "documents")
    return lang_id(docs).groupBy("lang", "lang_pred").agg(
        F.count("*").cast("long").alias("n_docs")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.text import quality_score

    (docs,) = _load(spark, sf_dir, "documents")
    return quality_score(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("punct_ratio") * 1000000 + 0.5).cast("long").alias("punct_e6"),
        F.floor(F.col("stop_ratio") * 1000000 + 0.5).cast("long").alias("stop_e6"),
        F.floor(F.col("quality") * 1000000 + 0.5).cast("long").alias("quality_e6"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.text import token_stats

    (docs,) = _load(spark, sf_dir, "documents")
    return token_stats(docs).groupBy("source").agg(
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_tokens_bpe").cast("long").alias("total_bpe_tokens"),
        F.count("*").cast("long").alias("n_docs"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.text import fingerprint

    (docs,) = _load(spark, sf_dir, "documents")
    return fingerprint(docs).groupBy("lang").agg(
        F.countDistinct("fingerprint").cast("long").alias("n_fingerprints"),
        F.count("*").cast("long").alias("n_docs"),
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.similarity import cosine_topk

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    return cosine_topk(emb, qvec, k=5, exclude_id=0).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("cosine") * 1000000 + 0.5).cast("long").alias("cosine_e6"),
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.similarity import lsh_signatures

    (emb,) = _load(spark, sf_dir, "embeddings")
    return (
        lsh_signatures(emb, n_bits=8, dims=64)
        .groupBy("sig")
        .agg(F.count("*").cast("long").alias("n_vectors"))
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN end-to-end: exact cosine re-rank restricted to the query's
    LSH bucket (the 10^10-scale path — bucket join replaces full scan).

    n_bits=4 (16 buckets over 500 vectors → ~31 per bucket): at n_bits=8
    the query's bucket was empty and the check was vacuous (0=0 rows)."""
    from darc_spark.functions.similarity import ann_lsh_topk

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    return ann_lsh_topk(emb, qvec, k=5, n_bits=4, dims=64, exclude_id=0).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("cosine") * 1000000 + 0.5).cast("long").alias("cosine_e6"),
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN end-to-end over a MATERIALIZED index: the inverted file
    (assignment, seeded literal codebook — the trainer is ``ivf_build``,
    separately unit-tested) is persisted once as cell-partitioned
    parquet; the query probes the 2 nearest cells by reading ONLY those
    partitions (partition-pruned — asserted in test_plans.py) and
    exact-cosine re-ranks. The serving shape at 10^10 rows: index built
    offline, per-query cost = probed partitions only."""
    from darc_spark.functions.similarity import (
        ivf_cells,
        ivf_topk_from_index,
        write_ivf_index,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    cells = ivf_cells(8, 64)
    idx = _ann_index(
        spark, sf_dir, "ivf8", lambda p: write_ivf_index(emb, p, cells)
    )
    return ivf_topk_from_index(
        idx, qvec, cells, k=5, n_probe=2, exclude_id=0
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("cosine") * 1000000 + 0.5).cast("long").alias("cosine_e6"),
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k over a MATERIALIZED code table —
    the 10^10-scale MEMORY path at standard parameters: m=8, ksub=256
    (byte codes; a 64-dim float vector → 8 bytes, 32× smaller). Codes
    are encoded once offline (``write_pq_codes``); the query scans ONLY
    the code table with literal-LUT lookup sums — no embedding reads,
    no per-query re-encode. ksub=256 is compilable because the
    codebook rides as one nested-array Literal (plan size O(1) in
    ksub; the per-codeword expression trees of round 4 capped it at
    16). Seeded codebooks (trainer ``pq_build`` separately
    unit-tested); the oracle re-runs encode + ADC in SQL with the same
    literals and the same subspace-ordered accumulation."""
    from darc_spark.functions.similarity import (
        pq_adc_topk_from_codes,
        pq_codebooks,
        write_pq_codes,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    books = pq_codebooks(8, 256, 64)
    codes = _ann_index(
        spark, sf_dir, "pq8x256", lambda p: write_pq_codes(emb, p, books)
    )
    return pq_adc_topk_from_codes(
        codes, qvec, books, k=5, exclude_id=0
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("adc_dist") * 1000000 + 0.5)
        .cast("long")
        .alias("adc_e6"),
    )


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over a MATERIALIZED ``(id, codes, cell)`` index: coarse
    inverted-file pruning (probe the 2 nearest of 8 cells — partition-
    pruned reads of the cell-partitioned index table) + compressed-code
    ADC scan — the canonical web-scale ANN index shape, served the
    canonical way: encode once offline, probe thereafter. Oracle = the
    IVF probe prelude composed with the PQ encode/ADC block over the
    probed pool."""
    from darc_spark.functions.similarity import (
        ivf_cells,
        ivfpq_topk_from_index,
        pq_codebooks,
        write_ivfpq_index,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    cells = ivf_cells(8, 64)
    books = pq_codebooks(8, 16, 64)
    idx = _ann_index(
        spark,
        sf_dir,
        "ivfpq8x16",
        lambda p: write_ivfpq_index(emb, p, cells, books),
    )
    return ivfpq_topk_from_index(
        idx, qvec, cells, books, k=5, n_probe=2, exclude_id=0
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("adc_dist") * 1000000 + 0.5)
        .cast("long")
        .alias("adc_e6"),
    )


def q_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ — the canonical index encodes v − centroid[cell]
    (residuals share a tight near-zero distribution, so one codebook
    quantizes them far better than raw vectors). Materialized like
    ``ann_ivfpq``; the probe builds one ADC LUT per probed cell from
    q − centroid and selects it by the partition column. Oracle: the
    IVF assign prelude + residual encode + per-cell LUT join in SQL
    with the same literals and subspace-ordered accumulation."""
    from darc_spark.functions.similarity import (
        ivf_cells,
        ivfpq_topk_from_index,
        pq_codebooks,
        write_ivfpq_index,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    cells = ivf_cells(8, 64)
    books = pq_codebooks(8, 16, 64)
    idx = _ann_index(
        spark,
        sf_dir,
        "ivfpqres8x16",
        lambda p: write_ivfpq_index(
            emb, p, cells, books, residual=True
        ),
    )
    return ivfpq_topk_from_index(
        idx, qvec, cells, books, k=5, n_probe=2, residual=True,
        exclude_id=0,
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(F.col("adc_dist") * 1000000 + 0.5)
        .cast("long")
        .alias("adc_e6"),
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: measured recall@10 of the IVF index
    (8 cells, n_probe=2) against the exact cosine top-10, per query,
    over a 16-query batch. The exact side is the deliberate O(Q·N)
    ground-truth scan (``cosine_topk_batch``); the ANN side is the
    batched serving path over the SAME materialized cell-partitioned
    index the ``ann_ivf`` query probes (union-of-probed-cells isin →
    partition pruning, broadcast probe join). Recall is integer hit
    counts, so the oracle match is exact — this turns "the index is
    correct" into "and here is how good it is", the number a real
    10^10-row deployment tunes n_probe against."""
    from darc_spark.functions.similarity import (
        cosine_topk_batch,
        ivf_cells,
        ivf_topk_batch_from_index,
        recall_at_k,
        write_ivf_index,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cells = ivf_cells(8, 64)
    idx = _ann_index(
        spark, sf_dir, "ivf8", lambda p: write_ivf_index(emb, p, cells)
    )
    exact = cosine_topk_batch(emb, queries_df, k=10)
    approx = ivf_topk_batch_from_index(
        idx, queries_df, cells, k=10, n_probe=2
    )
    return recall_at_k(exact, approx, 10).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("hits"),
        F.col("recall_e6"),
    )


def q_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality evaluation: measured recall@10 of ADC over the
    materialized byte-code table (m=8, ksub=256) against the EXACT
    squared-L2 top-10 (the metric ADC approximates), per query, over a
    16-query batch. Batched serving: one LUT per query broadcast as a
    small DataFrame, one scan of the code table, subspace-ordered
    lookup sums — the quantization-loss number (not index pruning: the
    code scan is complete) a deployment trades against the 32× memory
    shrink, and tunes m/ksub with."""
    from darc_spark.functions.similarity import (
        l2_topk_batch,
        pq_adc_topk_batch_from_codes,
        pq_codebooks,
        recall_at_k,
        write_pq_codes,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    books = pq_codebooks(8, 256, 64)
    codes = _ann_index(
        spark, sf_dir, "pq8x256", lambda p: write_pq_codes(emb, p, books)
    )
    exact = l2_topk_batch(emb, queries_df, k=10)
    approx = pq_adc_topk_batch_from_codes(codes, queries_df, books, k=10)
    return recall_at_k(exact, approx, 10).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("hits"),
        F.col("recall_e6"),
    )


def q_ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ANN quality: measured recall@10 of residual IVF-PQ —
    probe pruning (n_probe=2/8) ON TOP of 4-bit quantization (m=8,
    ksub=16) — against the exact squared-L2 top-10, per query, over a
    16-query batch. This is the number a 10^10-row deployment actually
    ships with: both loss sources composed, evaluated over the SAME
    materialized cell-partitioned index the ``ann_ivfpq_residual``
    query serves from; batched per-(query,cell) residual LUTs ride a
    broadcast join on the partition column."""
    from darc_spark.functions.similarity import (
        ivf_cells,
        ivfpq_topk_batch_from_index,
        l2_topk_batch,
        pq_codebooks,
        recall_at_k,
        write_ivfpq_index,
    )

    (emb,) = _load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cells = ivf_cells(8, 64)
    books = pq_codebooks(8, 16, 64)
    idx = _ann_index(
        spark,
        sf_dir,
        "ivfpqres8x16",
        lambda p: write_ivfpq_index(emb, p, cells, books, residual=True),
    )
    exact = l2_topk_batch(emb, queries_df, k=10)
    approx = ivfpq_topk_batch_from_index(
        idx, queries_df, cells, books, k=10, n_probe=2, residual=True
    )
    return recall_at_k(exact, approx, 10).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("hits"),
        F.col("recall_e6"),
    )


def q_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-image alignment filter (CLIP-score-style pair cleaning):
    captions (documents.text) join their image embeddings
    (embeddings.embedding) by id, the caption's text-tower embedding is
    a deterministic in-line hash projection, and pairs below the cosine
    threshold are dropped — the LAION-style keep gate over an
    image+caption corpus. Per-row expression + one key join + pushed
    predicate: the whole 10^10-pair corpus cleans in one pass."""
    from darc_spark.functions.align import align_filter

    docs, emb = _load(spark, sf_dir, "documents", "embeddings")
    kept = align_filter(docs, emb, dims=64, threshold=0.05)
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("align"),
    ).orderBy("doc_id")


def q_data_uri_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: data-URI decode, pure SQL (save_data, darc/proxy/data.py:33-56)."""
    from darc_spark.functions.extract import decode_data_uris

    (docs,) = _load(spark, sf_dir, "documents")
    uris = docs.filter(F.col("doc_id") < 200).selectExpr(
        "doc_id",
        """CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'data:text/plain;base64,QUJD'
             WHEN 1 THEN 'data:,hello%20world'
             WHEN 2 THEN 'data:image/png;base64,aVZCT1I='
             ELSE 'data:text/html,<b>x</b>'
           END AS url""",
    )
    out = decode_data_uris(uris)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "data_mime",
        "data_is_base64",
        F.base64(F.col("data_payload")).alias("payload_b64"),
    )


def q_cosine_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-banded candidates + exact
    verify) in the regime the operator exists for: the synthetic
    embeddings are near-orthogonal (max pairwise cosine ~0.5), so true
    near-dups are INJECTED — vec_id<20 perturbed by +0.05 on element 1
    (unit vectors ⇒ cosine ≈ 0.999 vs the original) — and the query
    runs at threshold 0.9 with selective 8-bit bands. The oracle
    mirrors injection, banding, and verify exactly, so both recall
    (which pairs collide) and the exact cosine are value-checked.
    All arithmetic is double on both sides (bit-identical e6 floors)."""
    from darc_spark.functions.similarity import cosine_near_pairs

    (emb,) = _load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("embedding"))
    dup = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") + F.lit(0.05)),
            F.transform(
                F.slice("embedding", 2, 63), lambda x: x.cast("double")
            ),
        ).alias("embedding"),
    )
    emb2 = base.unionByName(dup)
    return cosine_near_pairs(
        emb2, threshold=0.9, n_bits=16, dims=64, band_bits=8
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.floor(F.col("cosine") * 1000000 + 0.5).cast("long").alias("cosine_e6"),
    )


def q_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darc_spark.functions.similarity import hamming_near_pairs

    (emb,) = _load(spark, sf_dir, "embeddings")
    return hamming_near_pairs(emb, n_bits=16, dims=64, max_hamming=3).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_crawl_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop itself: 2 rounds on the synthetic web.

    Oracle-checked: the DuckDB side reads the per-fetch rows produced by
    the pure-Python reference simulator (tests/oracle_crawler.py — the
    independent reimplementation of darc's round semantics) exported to
    parquet by ``oracle_sql()`` under the SAME seed list, config and
    politeness budget. This is the flagship crawl-ordering equivalence
    (SURVEY §5 item 3) surfaced as a value-checked driver row."""
    import tempfile

    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    crawler = Crawler(
        spark,
        tempfile.mkdtemp(prefix="q_crawl_"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, n_filter_buckets=4),
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    return crawler.store.read("fetches").select(
        "fetch_round", "hostname", "url", "status_code", "is_html", "n_links"
    )


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: robots.txt parsing → rules rows (pandas-batched)."""
    import pandas as pd

    from darc_spark.functions.robots import robots_rules_rows
    from darc_spark.schema import ROBOTS_RULES

    corpus = [
        ("h1", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 2\n", 200),
        ("h2", "User-agent: bot\nDisallow: /b/\n\nUser-agent: *\nDisallow:\n", 200),
        ("h3", "", 403),
        ("h4", "", 404),
    ]
    pdf = pd.DataFrame(corpus, columns=["hostname", "text", "status"])
    rules = robots_rules_rows(pdf["hostname"], pdf["text"], pdf["status"])
    # Plain-Python rows: the non-Arrow createDataFrame path re-coerces
    # pandas nullable Int32 through float64, which the declared
    # IntegerType rejects (2.0 is not an int). Building tuples with real
    # ints/None is robust regardless of the session's Arrow setting.
    rows = [
        (
            r.hostname,
            r.agent,
            int(r.rule_index),
            r.path_prefix,
            bool(r.allow),
            None if pd.isna(r.crawl_delay) else int(r.crawl_delay),
            None if pd.isna(r.request_rate) else float(r.request_rate),
        )
        for r in rules.itertuples(index=False)
    ]
    return spark.createDataFrame(rows, schema=ROBOTS_RULES)


def q_submit_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 value check: run the same crawl as ``crawl_rounds``, render
    the requests-submission JSON (darc/submit.py:394-603), then parse
    the fields back OUT of the rendered payload — so the oracle compares
    what a downstream API consumer would actually read."""
    import tempfile

    from darc_spark.functions.submit import requests_payloads
    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    crawler = Crawler(
        spark,
        tempfile.mkdtemp(prefix="q_sfield_"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, n_filter_buckets=4),
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    payloads = requests_payloads(crawler.store.read("fetches"))
    return payloads.select(
        F.get_json_object("payload", "$.URL").alias("url"),
        F.get_json_object("payload", "$.Timestamp").cast("long").alias("fetch_round"),
        F.get_json_object("payload", "$.Response.StatusCode")
        .cast("int")
        .alias("status_code"),
        F.get_json_object("payload", "$.Document").alias("document_b64"),
        F.get_json_object("payload", "$.Metadata.base").alias("base"),
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: the input_hint image+caption table (exact schema),
    synthesized distributed, then decode + feature-extract (mapInPandas).
    Value-checked against a driver-side enumeration of the same seeded
    payloads (decode is a pure function of the seed); floats compared at
    e6 rounding like every other float oracle."""
    from darc_spark.functions.multimodal import image_features
    from darc_spark.sources.synth import SynthWeb

    imgs = SynthWeb(seed=42).image_table(spark, n=256)

    def e6(c: str) -> F.Column:
        return F.floor(F.col(c) * 1000000 + 0.5).cast("long").alias(f"{c}_e6")

    return image_features(imgs).select(
        "image_id",
        F.col("dec_w").cast("int").alias("dec_w"),
        F.col("dec_h").cast("int").alias("dec_h"),
        e6("mean_r"),
        e6("mean_g"),
        e6("mean_b"),
        e6("brightness"),
        F.col("phash").cast("long").alias("phash"),
        "decode_error",
    )


def _canon_payload_sha(payload: str) -> str:
    """Canonical content hash of a rendered JSON payload: parse, re-dump
    with sorted keys / tight separators, sha256 — so the oracle compares
    the SEMANTIC document (all fields, full nesting) independent of
    to_json's key order and spacing."""
    import hashlib
    import json as _json

    return hashlib.sha256(
        _json.dumps(
            _json.loads(payload), sort_keys=True, separators=(",", ":")
        ).encode()
    ).hexdigest()


def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection over the input_hint image table: decode
    every payload (real PNG/qpng/JPEG codecs), compute the 64-bit
    perceptual hash from the DECODED pixels, then banded hamming
    near-dup pairs (4×16-bit bands — exact recall for hamming ≤ 3 by
    pigeonhole). Byte-identical copies of the first 24 images are
    injected (hamming 0 pairs) so the join is value-checked; the oracle
    is the all-pairs ground truth over the driver-enumerated phashes —
    STRONGER than mirroring the banding."""
    from darc_spark.functions.multimodal import image_features
    from darc_spark.functions.similarity import hamming_pairs_from_sigs
    from darc_spark.sources.synth import SynthWeb

    imgs = SynthWeb(seed=42).image_table(spark, n=256)
    dups = imgs.filter(F.col("image_id") < "img00000024").select(
        F.concat(F.lit("dup"), F.col("image_id")).alias("image_id"),
        *[c for c in imgs.columns if c != "image_id"],
    )
    feats = image_features(imgs.unionByName(dups))
    pairs = hamming_pairs_from_sigs(
        feats.select("image_id", F.col("phash").alias("sig")),
        n_bits=64,
        band_bits=16,
        max_hamming=3,
        id_col="image_id",
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_submit_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 parity, value-checked: render the requests-submission JSON
    (darc/submit.py:394-603 contract) from the same crawl as
    ``crawl_rounds``, and return a canonicalized sha256 per payload.
    The oracle renders the same contract driver-side from the reference
    simulator's fetch rows (pure functions of the seed) — a mismatch in
    ANY payload field (Response headers/cookies/history, Metadata,
    base64 Document, flags) flips the hash."""
    import tempfile

    from darc_spark.functions.submit import requests_payloads
    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    crawler = Crawler(
        spark,
        tempfile.mkdtemp(prefix="q_submit_"),
        web,
        CrawlConfig(per_host=4, lease=2, max_retries=1, n_filter_buckets=4),
    )
    crawler.seed(web.seeds())
    crawler.run(2)
    payloads = requests_payloads(crawler.store.read("fetches"))

    # nested def: cloudpickle ships it by VALUE (executor workers cannot
    # import __spark_entry__), logic identical to _canon_payload_sha
    def _canon(s):
        import hashlib
        import json as _json

        return s.map(
            lambda p: hashlib.sha256(
                _json.dumps(
                    _json.loads(p), sort_keys=True, separators=(",", ":")
                ).encode()
            ).hexdigest()
        )

    sha_udf = F.pandas_udf(_canon, "string")
    return payloads.select("name", sha_udf("payload").alias("payload_sha"))


def q_sniff_mime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing fallback (darc/parse.py:276-302): classify a
    closed corpus of header-less bodies with the REAL sniffing function;
    the oracle is an independent hand-derived CASE over the same corpus."""
    from darc_spark.functions.sniff import sniff_mime

    (docs,) = _load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).selectExpr(
        "doc_id",
        """CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN '<html><body>x</body></html>'
             WHEN 1 THEN '  <!DOCTYPE html><p>y</p>'
             WHEN 2 THEN 'plain words here'
             WHEN 3 THEN '<?xml version="1.0"?><urlset/>'
             ELSE ''
           END AS body""",
        """CASE CAST(doc_id % 6 AS INT)
             WHEN 4 THEN unhex('89504E470D0A1A0A0000')
             ELSE CAST(NULL AS BINARY)
           END AS blob""",
    )
    udf = F.pandas_udf(lambda t, b: sniff_mime(t, b), "string")
    return corpus.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        udf("body", "blob").alias("sniffed_mime"),
    )


def _audio_payloads() -> list[tuple[str, bytes]]:
    """Deterministic audio clip corpus — REAL WAV bytes (PCM16, mono
    and stereo, mixed sample rates and lengths, plus one corrupt
    payload exercising the never-throw decode_error path) — shared by
    the Spark query and the driver-side oracle enumeration."""
    import numpy as np

    from darc_spark.functions.wav import encode_wav, tone_wave

    out = []
    for i in range(64):
        sr = (8000, 16000, 44100)[i % 3]
        n = 2048 + 512 * (i % 5)
        wave = tone_wave(seed=1000 + i, n_samples=n, sample_rate=sr)
        if i % 4 == 3:  # stereo: right channel is a delayed copy
            wave = np.stack([wave, np.roll(wave, 7)], axis=1)
        payload = encode_wav(wave, sr)
        if i == 60:  # truncated stream → decode_error row
            payload = payload[: len(payload) // 2]
        out.append((f"aud{i:04d}", payload))
    return out


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: REAL RIFF/WAVE PCM decode + RMS/peak/ZCR features
    over an opaque binary column; value-checked against the driver-side
    enumeration of the same payloads."""
    from darc_spark.functions.multimodal import audio_features

    df = spark.createDataFrame(
        [(m, bytearray(p)) for m, p in _audio_payloads()],
        "media_id string, bytes binary",
    )

    def e6(c: str) -> F.Column:
        return F.floor(F.col(c) * 1000000 + 0.5).cast("long").alias(f"{c}_e6")

    return audio_features(df).select(
        "media_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        e6("duration_ms"),
        e6("rms"),
        e6("peak"),
        F.col("zero_crossings").cast("int").alias("zero_crossings"),
        "decode_error",
    )


def _mjpeg_payloads() -> list[tuple[str, bytes]]:
    """Deterministic video corpus — REAL streams in three wire shapes:
    concatenated JPEG with multipart-style boundaries, AVI/MJPG RIFF
    containers, and animated GIF89a (container == codec), varying frame
    counts, one torn payload for the never-throw path — shared by the
    Spark query and the driver-side oracle enumeration."""
    import numpy as np

    from darc_spark.functions.gif import encode_gif_frames
    from darc_spark.functions.images import smooth_pixels
    from darc_spark.functions.jpeg import encode_jpeg
    from darc_spark.functions.video import encode_avi_mjpg

    out = []
    for i in range(16):
        n_frames = 4 + i % 5
        if i % 3 == 1 and i != 13:  # animated GIF path
            rng = np.random.default_rng(900 + i)
            pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
            payload = encode_gif_frames(
                [
                    pal[rng.integers(0, 32, size=(24, 24))]
                    for _ in range(n_frames)
                ]
            )
            out.append((f"vid{i}", payload))
            continue
        frames = [
            encode_jpeg(
                smooth_pixels(np.random.default_rng(500 + i * 31 + f), 24),
                quality=92,
            )
            for f in range(n_frames)
        ]
        if i % 3 == 2:  # AVI/MJPG container path
            payload = encode_avi_mjpg(frames, 24, 24)
        else:  # raw multipart-style stream path
            sep = b"\r\n--frame\r\nContent-Type: image/jpeg\r\n\r\n"
            payload = sep.join(frames)
        if i == 13:  # torn mid-first-frame: no complete SOI..EOI span
            payload = frames[0][: len(frames[0]) // 2]
        out.append((f"vid{i}", payload))
    return out


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: REAL MJPEG frame sampling — exact SOI/EOI split,
    evenly spaced picks, per-frame JPEG decode + PNG re-encode; torn
    payloads become frame_index −1 error rows."""
    from darc_spark.functions.multimodal import sample_frames

    df = spark.createDataFrame(
        [(m, bytearray(p)) for m, p in _mjpeg_payloads()],
        "media_id string, bytes binary",
    )
    return sample_frames(df, n_frames=3).select(
        "media_id", "frame_index", F.length("frame_bytes").alias("frame_len")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier scheduling — classify a URL corpus with the
    vectorized parser, then claim a politeness-bounded batch per host."""
    from darc_spark.functions.canon import with_parsed_link
    from darc_spark.operators.politeness import per_host_top_k

    _ensure_shipped(spark)
    sf_dir = "/root/testdata/sf0.001"
    urls = _url_corpus(spark, sf_dir)
    parsed = with_parsed_link(urls).withColumn(
        "priority", F.lit(0).cast("int")
    ).withColumn("enqueue_round", F.lit(0).cast("long"))
    return per_host_top_k(parsed, 3, salt_shards=4).select(
        "hostname", "proxy", "url", "name"
    )


def _with_shipping(
    fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "link_classify": q_link_classify,
        "url_name_sha256": q_url_name_sha256,
        "frontier_claim": q_frontier_claim,
        "url_seen_dedup": q_url_seen_dedup,
        "stream_url_seen": q_stream_url_seen,
        "hostname_agg": q_hostname_agg,
        "link_graph_join": q_link_graph_join,
        "redirect_history": q_redirect_history,
        "fetch_headers": q_fetch_headers,
        "sessionize": q_sessionize,
        "event_windows": q_event_windows,
        "tpch_q1": q_tpch_q1,
        "tpch_q6": q_tpch_q6,
        "rollup_events": q_rollup_events,
        "topk_orders": q_topk_orders,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_components": q_dedup_components,
        "dedup_keep": q_dedup_keep,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "quality_percentiles": q_quality_percentiles,
        "quality_percentiles_approx": q_quality_percentiles_approx,
        "corpus_clean": q_corpus_clean,
        "image_phash_dedup": q_image_phash_dedup,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "cosine_topk": q_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivfpq": q_ann_ivfpq,
        "ann_ivfpq_residual": q_ann_ivfpq_residual,
        "ann_recall": q_ann_recall,
        "ann_recall_pq": q_ann_recall_pq,
        "ann_recall_ivfpq": q_ann_recall_ivfpq,
        "caption_align": q_caption_align,
        "data_uri_decode": q_data_uri_decode,
        "cosine_near_pairs": q_cosine_near_pairs,
        "phash_hamming": q_phash_hamming,
        "crawl_rounds": q_crawl_rounds,
        "submit_fields": q_submit_fields,
        # r5 evidence loss: submit_payloads sat LAST in this dict and
        # was the one row missing from the driver's CORRECTNESS record
        # (green in local gate runs) — keep it adjacent to its sibling
        # submit_fields so a tail cap/timeout cannot silently drop it;
        # tests/test_entry.py asserts the full 51-query census
        "submit_payloads": q_submit_payloads,
        "robots_rules": q_robots_rules,
        "image_features": q_image_features,
        "frame_sample": q_frame_sample,
        "audio_features": q_audio_features,
        "sniff_mime": q_sniff_mime,
    }


_RAW_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    return {name: _with_shipping(fn) for name, fn in _RAW_QUERIES().items()}


_ORACLE_DIR = "/tmp/darc_spark_oracle"
_ORACLE_EXPORTED = False


def _export_python_oracles() -> None:
    """Materialize the pure-Python oracles as parquet for DuckDB.

    Two query families have no SQL-expressible oracle over the test
    tables but ARE deterministic pure functions of the seed:

    * ``crawl_rounds`` — the single-threaded reference simulator
      (tests/oracle_crawler.py) run under the identical seed list +
      config; its per-fetch rows are the expected engine output.
    * ``redirect_history`` / ``fetch_headers`` — direct enumeration of
      the page function's response metadata; checks the DISTRIBUTED
      plumbing (Arrow map/struct transfer, posexplode) against the
      driver-side ground truth.

    Called from ``oracle_sql()`` (always before the SQL can run); writes
    once per process.
    """
    global _ORACLE_EXPORTED
    if _ORACLE_EXPORTED:
        return
    import os
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from darc_spark.operators.crawl import CrawlConfig
    from darc_spark.sources.synth import SynthWeb
    from tests.oracle_crawler import SimCrawler

    os.makedirs(_ORACLE_DIR, exist_ok=True)

    web = SynthWeb(seed=42, pages_per_host=40, branching=3)
    sim = SimCrawler(
        web, CrawlConfig(per_host=4, lease=2, max_retries=1, n_filter_buckets=4)
    )
    sim.seed(web.seeds())
    sim.run(2)
    rows = sim.fetches
    pq.write_table(
        pa.table(
            {
                "fetch_round": pa.array([r[0] for r in rows], pa.int64()),
                "hostname": pa.array([r[1] for r in rows], pa.string()),
                "url": pa.array([r[2] for r in rows], pa.string()),
                "status_code": pa.array([r[3] for r in rows], pa.int32()),
                "is_html": pa.array([r[4] for r in rows], pa.bool_()),
                "n_links": pa.array([r[5] for r in rows], pa.int32()),
            }
        ),
        os.path.join(_ORACLE_DIR, "crawl_rounds.parquet"),
    )

    # submit_fields: the S11 payload contract field-by-field — URL,
    # Timestamp, StatusCode, Document (base64), Metadata.base — from the
    # same simulator run (parsed back out of the rendered JSON on the
    # Spark side, so the check covers the actual to_json rendering)
    import base64 as _b64

    from tests.oracle_link import oracle_parse

    sf_rows: list[tuple] = []
    for (r, hostname, url, status, _is_html, _n) in rows:
        page = web.page(url)
        parsed = oracle_parse(url)
        sf_rows.append(
            (
                url,
                r,
                status,
                _b64.b64encode(page["bytes"]).decode() if page["bytes"] else None,
                f"{parsed['proxy']}/{parsed['scheme']}/{parsed['hostname']}",
            )
        )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([x[0] for x in sf_rows], pa.string()),
                "fetch_round": pa.array([x[1] for x in sf_rows], pa.int64()),
                "status_code": pa.array([x[2] for x in sf_rows], pa.int32()),
                "document_b64": pa.array([x[3] for x in sf_rows], pa.string()),
                "base": pa.array([x[4] for x in sf_rows], pa.string()),
            }
        ),
        os.path.join(_ORACLE_DIR, "submit_fields.parquet"),
    )

    # submit_payloads: the FULL requests.schema.json contract
    # (darc/submit.py:394-603) rendered driver-side from the simulator's
    # fetch rows — every field the engine's to_json emits, rebuilt from
    # the pure page/parse functions, then canonicalized+hashed exactly
    # like the Spark side. Null fields are omitted (to_json semantics).
    _HTML_CT = ("text/html", "application/xhtml+xml")
    sp_rows: list[tuple[str, str]] = []
    for (r, hostname, url, status, _is_html, _n) in rows:
        page = web.page(url)
        parsed = oracle_parse(url)
        ct = (page["content_type"] or "").lower().split(";")[0].strip()
        doc = {
            "$PARTIAL$": False,
            "Timestamp": r,
            "URL": url,
            "Response": {
                "StatusCode": page["status_code"],
                "ContentType": ct,
                "HTML": ct in _HTML_CT,
                "Headers": dict(page["headers"]),
                "Cookies": dict(page["cookies"]),
                "History": [
                    {"url": hop["url"], "status": hop["status"]}
                    for hop in page["history"]
                ],
            },
            "Metadata": {
                "url": url,
                "proxy": parsed["proxy"],
                "host": parsed["hostname"],
                "base": "/".join(
                    [parsed["proxy"], url.split(":")[0], parsed["hostname"]]
                ),
                "name": parsed["name"],
            },
        }
        if page["bytes"] is not None:
            doc["Document"] = _b64.b64encode(page["bytes"]).decode()
        import json as _json

        sp_rows.append((parsed["name"], _canon_payload_sha(_json.dumps(doc))))
    pq.write_table(
        pa.table(
            {
                "name": pa.array([x[0] for x in sp_rows], pa.string()),
                "payload_sha": pa.array([x[1] for x in sp_rows], pa.string()),
            }
        ),
        os.path.join(_ORACLE_DIR, "submit_payloads.parquet"),
    )

    web2 = SynthWeb(seed=42, pages_per_host=60, branching=3)
    hist: list[tuple] = []
    heads: list[tuple] = []
    for h in web2.hosts:
        for p in range(web2.pages_per_host):
            u = web2.url(h, p)
            page = web2.page(u)
            for i, hop in enumerate(page["history"]):
                hist.append((u, i, hop["url"], hop["status"]))
            for k, v in page["headers"].items():
                heads.append((u, k, v))
            for k, v in page["cookies"].items():
                heads.append((u, f"cookie:{k}", v))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in hist], pa.string()),
                "pos": pa.array([r[1] for r in hist], pa.int64()),
                "hop_url": pa.array([r[2] for r in hist], pa.string()),
                "hop_status": pa.array([r[3] for r in hist], pa.int32()),
            }
        ),
        os.path.join(_ORACLE_DIR, "redirect_history.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in heads], pa.string()),
                "hkey": pa.array([r[1] for r in heads], pa.string()),
                "hval": pa.array([r[2] for r in heads], pa.string()),
            }
        ),
        os.path.join(_ORACLE_DIR, "fetch_headers.parquet"),
    )

    # image_features: driver-side enumeration of the same seeded image
    # payloads q_image_features generates distributed — decode +
    # features are pure functions of (seed, i), so this is the expected
    # output modulo the Arrow/mapInPandas plumbing being checked
    from darc_spark.functions.multimodal import image_feature_row

    iweb = SynthWeb(seed=42)
    feats = []
    for i in range(256):
        r = iweb.image_row(i)
        feats.append(image_feature_row(r["image_id"], r["bytes"], r["fmt"]))
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([f["image_id"] for f in feats], pa.string()),
                "dec_w": pa.array([f["dec_w"] for f in feats], pa.int32()),
                "dec_h": pa.array([f["dec_h"] for f in feats], pa.int32()),
                "mean_r": pa.array([f["mean_r"] for f in feats], pa.float64()),
                "mean_g": pa.array([f["mean_g"] for f in feats], pa.float64()),
                "mean_b": pa.array([f["mean_b"] for f in feats], pa.float64()),
                "brightness": pa.array(
                    [f["brightness"] for f in feats], pa.float64()
                ),
                "phash": pa.array([f["phash"] for f in feats], pa.int64()),
                "decode_error": pa.array(
                    [f["decode_error"] for f in feats], pa.string()
                ),
            }
        ),
        os.path.join(_ORACLE_DIR, "image_features.parquet"),
    )

    # image_phash_dedup: phash per corpus image (same enumeration as
    # image_features, which the decode path is value-checked against)
    # plus the injected byte-copies; the SQL does ALL-PAIRS hamming —
    # ground truth the banded join must reproduce exactly
    ph_rows = [(f["image_id"], f["phash"]) for f in feats]
    ph_rows += [("dup" + f["image_id"], f["phash"]) for f in feats[:24]]
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([x[0] for x in ph_rows], pa.string()),
                "phash": pa.array([x[1] for x in ph_rows], pa.int64()),
            }
        ),
        os.path.join(_ORACLE_DIR, "image_phash.parquet"),
    )

    # audio_features: same pattern — pure enumeration of the shared
    # payload corpus through the identical per-clip computation
    from darc_spark.functions.multimodal import audio_feature_row

    au = [audio_feature_row(m, p) for m, p in _audio_payloads()]
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([f["media_id"] for f in au], pa.string()),
                "n_samples": pa.array([f["n_samples"] for f in au], pa.int32()),
                "sample_rate": pa.array(
                    [f["sample_rate"] for f in au], pa.int32()
                ),
                "duration_ms": pa.array(
                    [f["duration_ms"] for f in au], pa.float64()
                ),
                "rms": pa.array([f["rms"] for f in au], pa.float64()),
                "peak": pa.array([f["peak"] for f in au], pa.float64()),
                "zero_crossings": pa.array(
                    [f["zero_crossings"] for f in au], pa.int32()
                ),
                "decode_error": pa.array(
                    [f["decode_error"] for f in au], pa.string()
                ),
            }
        ),
        os.path.join(_ORACLE_DIR, "audio_features.parquet"),
    )

    # frame_sample: the REAL MJPEG split + JPEG decode + PNG re-encode
    # enumerated driver-side over the same payloads q_frame_sample builds
    from darc_spark.functions.multimodal import frame_sample_rows

    fr = []
    for mid, payload in _mjpeg_payloads():
        for r in frame_sample_rows(mid, payload, 3):
            fr.append(
                (
                    r["media_id"],
                    r["frame_index"],
                    len(r["frame_bytes"])
                    if r["frame_bytes"] is not None
                    else None,
                )
            )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([x[0] for x in fr], pa.string()),
                "frame_index": pa.array([x[1] for x in fr], pa.int32()),
                "frame_len": pa.array([x[2] for x in fr], pa.int32()),
            }
        ),
        os.path.join(_ORACLE_DIR, "frame_sample.parquet"),
    )
    _ORACLE_EXPORTED = True


def _duck_minhash_sig(bands: int = 4) -> str:
    mins = ", ".join(
        "min(" + _H64_DUCK.format(x=f"'{b}#' || shingle") + f") AS mh{b}"
        for b in range(bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS minhash FROM agged" for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3
      THEN list_transform(range(0, len(t)-2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      ELSE [] END
  ) AS shingle FROM toks
), agged AS (
  SELECT doc_id, {mins} FROM sh GROUP BY doc_id
), sigs AS ({unions})
"""


def _simhash_duck(bits: int = 16) -> str:
    th = _H64_DUCK.format(x="tok")
    sums = ", ".join(
        f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS tok FROM documents
), hashed AS (
  SELECT doc_id, {th} AS th FROM toks
), sums AS (
  SELECT doc_id, {sums} FROM hashed GROUP BY doc_id
), sigs AS (
  SELECT doc_id, ({sig}) AS simhash FROM sums
)
"""


def _planes_literal(n_bits: int, dims: int) -> list[str]:
    from darc_spark.functions.similarity import plane

    out = []
    for i in range(n_bits):
        vals = ", ".join(repr(v) for v in plane(i, dims))
        out.append(f"[{vals}]")
    return out


def _ivf_duck(n_cells: int, n_probe: int, dims: int) -> str:
    """CTE prelude: literal codebook + per-vector argmin assignment +
    query probe cells — same codeword literals, the same ||c||²−2·v·c
    comparable distance, and the same (dist, cell) tie-break as the
    engine's ivf_assign/ivf_topk."""
    from darc_spark.functions.similarity import ivf_cells

    cells = ivf_cells(n_cells, dims)
    rows = []
    for i, c in enumerate(cells):
        n2 = sum(x * x for x in c)
        lit = ", ".join(repr(v) for v in c)
        rows.append(f"({i}, [{lit}]::DOUBLE[], {n2!r})")
    values = ",\n  ".join(rows)
    dist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(embedding[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    qdist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(qv[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    return f"""
WITH cells AS (
  SELECT * FROM (VALUES
  {values}
  ) AS t(cell, c, n2)
), q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
), assign AS (
  SELECT vec_id, embedding, cell,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY ({dist}), cell
         ) AS rn
  FROM embeddings CROSS JOIN cells
), probe AS (
  SELECT cell FROM q CROSS JOIN cells
  ORDER BY ({qdist}), cell LIMIT {n_probe}
)
"""


def _pq_duck(
    m: int,
    ksub: int,
    dims: int,
    src: str = "embeddings",
    lead: str = "WITH",
    include_q: bool = True,
) -> str:
    """CTE prelude for the PQ oracle: literal codebooks, per-subspace
    argmin encoding (same comparable distance + tie-break as
    pq_encode), the query's ADC lookup table computed in-SQL from the
    same literals, and the subspace-ORDERED distance accumulation that
    matches the engine's left-to-right term chain. ``src``/``lead``/
    ``include_q`` let the block compose after an IVF probe prelude
    (which already defines the ``q`` CTE)."""
    from darc_spark.functions.similarity import pq_codebooks

    books = pq_codebooks(m, ksub, dims)
    dsub = dims // m
    rows = []
    for j, book in enumerate(books):
        for c_idx, c in enumerate(book):
            n2 = sum(x * x for x in c)
            lit = ", ".join(repr(v) for v in c)
            rows.append(f"({j}, {c_idx}, [{lit}]::DOUBLE[], {n2!r})")
    values = ",\n  ".join(rows)
    enc_dist = (
        f"n2 - 2.0 * list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> CAST(embedding[sub * {dsub} + i] AS DOUBLE) * cv[i]), "
        f"(a, b) -> a + b)"
    )
    q_dist = (
        f"list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> (CAST(qv[sub * {dsub} + i] AS DOUBLE) - cv[i]) * "
        f"(CAST(qv[sub * {dsub} + i] AS DOUBLE) - cv[i])), (a, b) -> a + b)"
    )
    q_cte = (
        ", q AS (\n  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0\n)"
        if include_q
        else ""
    )
    return f"""
{lead} books AS (
  SELECT * FROM (VALUES
  {values}
  ) AS t(sub, cell, cv, n2)
){q_cte}, enc AS (
  SELECT vec_id, sub, cell,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY ({enc_dist}), cell
         ) AS rn
  FROM {src} CROSS JOIN books
), codes AS (
  SELECT vec_id, sub, cell FROM enc WHERE rn = 1
), lut AS (
  SELECT sub, cell, ({q_dist}) AS qd FROM q CROSS JOIN books
), scored AS (
  SELECT vec_id, list_reduce(list(qd ORDER BY sub), (a, b) -> a + b) AS adc
  FROM codes JOIN lut USING (sub, cell)
  GROUP BY vec_id
)
"""


def _pq_res_duck(m: int, ksub: int, dims: int) -> str:
    """CTE block for the RESIDUAL IVF-PQ oracle, composed after the
    ``_ivf_duck`` prelude (which defines ``cells``/``q``/``assign``/
    ``probe``): residual vectors v − centroid[cell] in float64, the
    same per-subspace argmin encode as the engine's
    ``write_ivfpq_index(residual=True)``, and one ADC LUT per PROBED
    cell built from q − centroid — joined on (cell, sub, code) exactly
    like the engine's when-chain selects the probed cell's literal
    LUT. Same codeword literals, same left-to-right float64 op order,
    same subspace-ordered accumulation."""
    from darc_spark.functions.similarity import pq_codebooks

    books = pq_codebooks(m, ksub, dims)
    dsub = dims // m
    rows = []
    for j, book in enumerate(books):
        for c_idx, c in enumerate(book):
            n2 = sum(x * x for x in c)
            lit = ", ".join(repr(v) for v in c)
            rows.append(f"({j}, {c_idx}, [{lit}]::DOUBLE[], {n2!r})")
    values = ",\n  ".join(rows)
    enc_dist = (
        f"bn2 - 2.0 * list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> r[sub * {dsub} + i] * cv[i]), (a, b) -> a + b)"
    )
    q_res_i = (
        f"(CAST(qv[sub * {dsub} + i] AS DOUBLE) - cl.c[sub * {dsub} + i])"
    )
    q_dist = (
        f"list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> ({q_res_i} - cv[i]) * ({q_res_i} - cv[i])), "
        f"(a, b) -> a + b)"
    )
    return f""", pool AS (
  SELECT vec_id, embedding, cell FROM assign
  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
), res AS (
  SELECT p.vec_id, p.cell,
         list_transform(range(1, {dims}+1),
             i -> CAST(p.embedding[i] AS DOUBLE) - cl.c[i]) AS r
  FROM pool p JOIN cells cl ON cl.cell = p.cell
), books AS (
  SELECT * FROM (VALUES
  {values}
  ) AS t(sub, code, cv, bn2)
), enc AS (
  SELECT vec_id, cell, sub, code,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY ({enc_dist}), code
         ) AS brn
  FROM res CROSS JOIN books
), codes AS (
  SELECT vec_id, cell, sub, code FROM enc WHERE brn = 1
), lut AS (
  SELECT pr.cell, b.sub, b.code, ({q_dist}) AS qd
  FROM probe pr
  JOIN cells cl ON cl.cell = pr.cell
  CROSS JOIN books b
  CROSS JOIN q
), scored AS (
  SELECT vec_id,
         list_reduce(list(qd ORDER BY sub), (a, b) -> a + b) AS adc
  FROM codes JOIN lut USING (cell, sub, code)
  GROUP BY vec_id
)
"""


def _ann_recall_duck(
    n_cells: int, n_probe: int, dims: int, n_q: int, k: int
) -> str:
    """Full SQL for the IVF recall@k evaluation: exact per-query
    top-k (O(Q·N) cross join + window), the same literal-codebook
    assignment + per-query probe as ``_ivf_duck`` generalized to a
    query batch, and integer hit counts. Same float64 op order and
    (cosine DESC, vec_id) / (dist, cell) tie-breaks as the engine's
    ``cosine_topk_batch`` / ``probe_cells_batch``."""
    from darc_spark.functions.similarity import ivf_cells

    cells = ivf_cells(n_cells, dims)
    rows = []
    for i, c in enumerate(cells):
        n2 = sum(x * x for x in c)
        lit = ", ".join(repr(v) for v in c)
        rows.append(f"({i}, [{lit}]::DOUBLE[], {n2!r})")
    values = ",\n  ".join(rows)
    dist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(embedding[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    qdist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(qv[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    cos = (
        "list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)), "
        "(a, b) -> a + b) "
        "/ (sqrt(list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(e.embedding[j] AS DOUBLE) * CAST(e.embedding[j] AS DOUBLE)), "
        "(a, b) -> a + b)) "
        "* sqrt(list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(q.qv[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)), "
        "(a, b) -> a + b)))"
    ).format(d=dims)
    return f"""
WITH cells AS (
  SELECT * FROM (VALUES
  {values}
  ) AS t(cell, c, n2)
), qs AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < {n_q}
), exact_scored AS (
  SELECT q.q_id, e.vec_id, {cos} AS cosine
  FROM embeddings e CROSS JOIN qs q
  WHERE e.vec_id != q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
    FROM exact_scored) WHERE rn <= {k}
), assign AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY ({dist}), cell) AS rn
  FROM embeddings CROSS JOIN cells
), amem AS (
  SELECT vec_id, cell FROM assign WHERE rn = 1
), probe AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, cells.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY ({qdist}), cells.cell) AS rn
    FROM qs q CROSS JOIN cells) WHERE rn <= {n_probe}
), approx_scored AS (
  SELECT p.q_id, e.vec_id, {cos} AS cosine
  FROM amem a JOIN probe p USING (cell)
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN qs q ON q.q_id = p.q_id
  WHERE a.vec_id != p.q_id
), approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
    FROM approx_scored) WHERE rn <= {k}
), hits AS (
  SELECT e.q_id, count(*) AS hits
  FROM exact e JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY 1
)
SELECT CAST(q.q_id AS BIGINT) AS q_id,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(floor(coalesce(h.hits, 0) * 1000000.0 / {k} + 0.5) AS BIGINT) AS recall_e6
FROM (SELECT DISTINCT q_id FROM qs) q LEFT JOIN hits h ON h.q_id = q.q_id
"""


def _ann_recall_ivfpq_duck(
    n_cells: int, n_probe: int, m: int, ksub: int, dims: int,
    n_q: int, k: int,
) -> str:
    """Full SQL for the residual IVF-PQ recall@k evaluation: exact
    per-query squared-L2 top-k, the ``_ivf_duck`` assignment
    generalized to a query batch, residual encode over the probed-cell
    union, one LUT per (query, probed cell) built from q − centroid,
    subspace-ordered ADC accumulation, integer hit counts. Same
    float64 op orders and tie-breaks as the engine's batched path."""
    from darc_spark.functions.similarity import ivf_cells, pq_codebooks

    cells = ivf_cells(n_cells, dims)
    crows = []
    for i, c in enumerate(cells):
        n2 = sum(x * x for x in c)
        lit = ", ".join(repr(v) for v in c)
        crows.append(f"({i}, [{lit}]::DOUBLE[], {n2!r})")
    cvalues = ",\n  ".join(crows)
    books = pq_codebooks(m, ksub, dims)
    dsub = dims // m
    brows = []
    for j, book in enumerate(books):
        for c_idx, c in enumerate(book):
            bn2 = sum(x * x for x in c)
            lit = ", ".join(repr(v) for v in c)
            brows.append(f"({j}, {c_idx}, [{lit}]::DOUBLE[], {bn2!r})")
    bvalues = ",\n  ".join(brows)
    dist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(embedding[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    qdist = (
        "n2 - 2.0 * list_reduce(list_transform(range(1, {d}+1), "
        "j -> CAST(qv[j] AS DOUBLE) * c[j]), (a, b) -> a + b)"
    ).format(d=dims)
    l2 = (
        "list_reduce(list_transform(range(1, {d}+1), "
        "j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE)) * "
        "(CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE))), "
        "(a, b) -> a + b)"
    ).format(d=dims)
    enc_dist = (
        f"bn2 - 2.0 * list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> r[sub * {dsub} + i] * cv[i]), (a, b) -> a + b)"
    )
    q_res_i = (
        f"(CAST(qv[sub * {dsub} + i] AS DOUBLE) - cl.c[sub * {dsub} + i])"
    )
    q_dist = (
        f"list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> ({q_res_i} - cv[i]) * ({q_res_i} - cv[i])), "
        f"(a, b) -> a + b)"
    )
    return f"""
WITH cells AS (
  SELECT * FROM (VALUES
  {cvalues}
  ) AS t(cell, c, n2)
), qs AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < {n_q}
), exact_scored AS (
  SELECT q.q_id, e.vec_id, {l2} AS l2
  FROM embeddings e CROSS JOIN qs q
  WHERE e.vec_id != q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY l2, vec_id) AS rn
    FROM exact_scored) WHERE rn <= {k}
), assign AS (
  SELECT vec_id, embedding, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY ({dist}), cell) AS rn
  FROM embeddings CROSS JOIN cells
), probe AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, cells.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY ({qdist}), cells.cell) AS rn
    FROM qs q CROSS JOIN cells) WHERE rn <= {n_probe}
), pool AS (
  SELECT vec_id, embedding, cell FROM assign
  WHERE rn = 1 AND cell IN (SELECT DISTINCT cell FROM probe)
), res AS (
  SELECT p.vec_id, p.cell,
         list_transform(range(1, {dims}+1),
             i -> CAST(p.embedding[i] AS DOUBLE) - cl.c[i]) AS r
  FROM pool p JOIN cells cl ON cl.cell = p.cell
), books AS (
  SELECT * FROM (VALUES
  {bvalues}
  ) AS t(sub, code, cv, bn2)
), enc AS (
  SELECT vec_id, cell, sub, code,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY ({enc_dist}), code
         ) AS brn
  FROM res CROSS JOIN books
), codes AS (
  SELECT vec_id, cell, sub, code FROM enc WHERE brn = 1
), lut AS (
  SELECT pr.q_id, pr.cell, b.sub, b.code, ({q_dist}) AS qd
  FROM probe pr
  JOIN qs q ON q.q_id = pr.q_id
  JOIN cells cl ON cl.cell = pr.cell
  CROSS JOIN books b
), adc AS (
  SELECT l.q_id, c.vec_id,
         list_reduce(list(qd ORDER BY l.sub), (a, b) -> a + b) AS adc
  FROM codes c JOIN lut l ON l.cell = c.cell AND l.sub = c.sub AND l.code = c.code
  GROUP BY 1, 2
), approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
    FROM adc WHERE vec_id != q_id) WHERE rn <= {k}
), hits AS (
  SELECT e.q_id, count(*) AS hits
  FROM exact e JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY 1
)
SELECT CAST(q.q_id AS BIGINT) AS q_id,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(floor(coalesce(h.hits, 0) * 1000000.0 / {k} + 0.5) AS BIGINT) AS recall_e6
FROM (SELECT DISTINCT q_id FROM qs) q LEFT JOIN hits h ON h.q_id = q.q_id
"""


def _ann_recall_pq_duck(
    m: int, ksub: int, dims: int, n_q: int, k: int
) -> str:
    """Full SQL for the PQ/ADC recall@k evaluation: exact per-query
    squared-L2 top-k (the metric ADC approximates), the same
    literal-codebook per-subspace encode as ``_pq_duck``, a per-QUERY
    LUT (qs × books), subspace-ordered ADC accumulation, and integer
    hit counts. Same float64 op order and (score, vec_id) / (dist,
    cell) tie-breaks as the engine's ``l2_topk_batch`` /
    ``pq_adc_topk_batch_from_codes``."""
    from darc_spark.functions.similarity import pq_codebooks

    books = pq_codebooks(m, ksub, dims)
    dsub = dims // m
    rows = []
    for j, book in enumerate(books):
        for c_idx, c in enumerate(book):
            n2 = sum(x * x for x in c)
            lit = ", ".join(repr(v) for v in c)
            rows.append(f"({j}, {c_idx}, [{lit}]::DOUBLE[], {n2!r})")
    values = ",\n  ".join(rows)
    enc_dist = (
        f"n2 - 2.0 * list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> CAST(embedding[sub * {dsub} + i] AS DOUBLE) * cv[i]), "
        f"(a, b) -> a + b)"
    )
    q_dist = (
        f"list_reduce(list_transform(range(1, {dsub}+1), "
        f"i -> (CAST(qv[sub * {dsub} + i] AS DOUBLE) - cv[i]) * "
        f"(CAST(qv[sub * {dsub} + i] AS DOUBLE) - cv[i])), (a, b) -> a + b)"
    )
    l2 = (
        "list_reduce(list_transform(range(1, {d}+1), "
        "j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE)) * "
        "(CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE))), "
        "(a, b) -> a + b)"
    ).format(d=dims)
    return f"""
WITH books AS (
  SELECT * FROM (VALUES
  {values}
  ) AS t(sub, cell, cv, n2)
), qs AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < {n_q}
), exact_scored AS (
  SELECT q.q_id, e.vec_id, {l2} AS l2
  FROM embeddings e CROSS JOIN qs q
  WHERE e.vec_id != q.q_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY l2, vec_id) AS rn
    FROM exact_scored) WHERE rn <= {k}
), enc AS (
  SELECT vec_id, sub, cell,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY ({enc_dist}), cell
         ) AS rn
  FROM embeddings CROSS JOIN books
), codes AS (
  SELECT vec_id, sub, cell FROM enc WHERE rn = 1
), lut AS (
  SELECT q.q_id, b.sub, b.cell, ({q_dist}) AS qd
  FROM qs q CROSS JOIN books b
), adc AS (
  SELECT l.q_id, c.vec_id,
         list_reduce(list(qd ORDER BY sub), (a, b) -> a + b) AS adc
  FROM codes c JOIN lut l USING (sub, cell)
  GROUP BY 1, 2
), approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
    FROM adc WHERE vec_id != q_id) WHERE rn <= {k}
), hits AS (
  SELECT e.q_id, count(*) AS hits
  FROM exact e JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY 1
)
SELECT CAST(q.q_id AS BIGINT) AS q_id,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(floor(coalesce(h.hits, 0) * 1000000.0 / {k} + 0.5) AS BIGINT) AS recall_e6
FROM (SELECT DISTINCT q_id FROM qs) q LEFT JOIN hits h ON h.q_id = q.q_id
"""


def _sig_expr_duck(n_bits: int, dims: int, vec: str = "embedding") -> str:
    planes = _planes_literal(n_bits, dims)
    terms = []
    for i, p in enumerate(planes):
        dot = (
            f"list_reduce(list_transform(range(1, {dims}+1), "
            f"j -> CAST({vec}[j] AS DOUBLE) * ({p})[j]), (a, b) -> a + b)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


def oracle_sql() -> dict[str, str]:
    _export_python_oracles()
    stop_hits = (
        f"len(list_filter(t, x -> list_contains({_STOP_DUCK}, x)))"
    )
    q_quality = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS_DUCK} AS t,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(floor((CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 1000000 + 0.5) AS BIGINT) AS punct_e6,
       CAST(floor((CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1)) * 1000000 + 0.5) AS BIGINT) AS stop_e6,
       CAST(floor((0.4 * least(n_chars / 500.0, 1.0)
          + 0.3 * (1 - CAST(n_punct AS DOUBLE) / greatest(n_chars, 1))
          + 0.3 * CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1)) * 1000000 + 0.5) AS BIGINT) AS quality_e6
FROM base
"""

    q_lang = f"""
WITH base AS (
  SELECT lang, {_TOKS_DUCK} AS t FROM documents
), scored AS (
  SELECT lang,
         CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1) AS stop_ratio
  FROM base
)
SELECT lang, CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs
FROM scored GROUP BY 1, 2
"""

    proxy_case = """
CASE
  WHEN url LIKE 'mailto:%' THEN 'mail'
  WHEN url LIKE 'bitcoin:%' THEN 'bitcoin'
  WHEN url LIKE 'data:%' THEN 'data'
  WHEN url LIKE 'javascript:%' THEN 'script'
  WHEN url LIKE 'wss:%' THEN 'wss'
  WHEN url LIKE 'ftp:%' THEN 'ftp'
  WHEN url LIKE '%.onion.sh/%' THEN 'tor2web'
  WHEN url LIKE '%.onion/%' THEN 'tor'
  WHEN url LIKE '%.i2p/%' THEN 'i2p'
  WHEN url LIKE 'http://127.0.0.1:43110%' THEN 'zeronet'
  WHEN url LIKE 'http://127.0.0.1:8888%' THEN 'freenet'
  ELSE 'null'
END
"""
    hostname_case = """
CASE
  WHEN url LIKE 'mailto:%' OR url LIKE 'bitcoin:%' OR url LIKE 'data:%'
       OR url LIKE 'javascript:%' THEN '(null)'
  WHEN url LIKE 'wss:%' THEN 'socket.example'
  WHEN url LIKE 'http://127.0.0.1:43110%' THEN regexp_extract(url, '43110/([^/]+)', 1)
  WHEN url LIKE 'http://127.0.0.1:8888%' THEN regexp_extract(url, '8888/([^/]+)', 1)
  ELSE regexp_extract(url, '^[a-z]+://([^/]+)', 1)
END
"""

    return {
        "link_classify": f"""
WITH urls AS (SELECT ({_URL_CASE_DUCK}) AS url FROM documents)
SELECT ({proxy_case}) AS proxy,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT ({hostname_case})) AS BIGINT) AS n_hosts
FROM urls GROUP BY 1 ORDER BY 1
""",
        "url_name_sha256": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, sha256(({_URL_CASE_DUCK})) AS name
FROM documents ORDER BY doc_id LIMIT 200
""",
        "frontier_claim": """
WITH ranked AS (
  SELECT CAST(user_id AS VARCHAR) AS hostname,
         CAST(event_id AS BIGINT) AS event_id,
         'u' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR) AS url,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY event_id,
                    'u' || CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR)
         ) AS rn
  FROM events
)
SELECT hostname, event_id, url FROM ranked WHERE rn <= 3
""",
        "url_seen_dedup": """
WITH keyed AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
         CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS k
  FROM events
), thr AS (SELECT max(event_id) * 4 // 5 AS t FROM keyed),
batch AS (
  SELECT DISTINCT user_id, k FROM keyed, thr WHERE event_id >= t
), seen AS (
  SELECT DISTINCT user_id, k FROM keyed, thr WHERE event_id < t
)
SELECT b.user_id, b.k FROM batch b
ANTI JOIN seen s ON b.user_id = s.user_id AND b.k = s.k
""",
        # streaming end-state must equal the batch DISTINCT ground truth
        "stream_url_seen": """
WITH urls AS (
  SELECT DISTINCT 'http://h' || CAST(user_id % 41 AS VARCHAR)
         || '.example/p' || CAST(event_id % 500 AS VARCHAR) AS url
  FROM events
)
SELECT url, sha256(url) AS name FROM urls
""",
        "hostname_agg": """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(max(CASE WHEN event_type != 'error' THEN 1 ELSE 0 END) AS BIGINT) AS alive,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS since,
       CAST(count(*) AS BIGINT) AS n_urls
FROM events GROUP BY 1
""",
        "link_graph_join": """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "redirect_history": f"""
SELECT url, CAST(pos AS BIGINT) AS pos, hop_url, CAST(hop_status AS INT) AS hop_status
FROM read_parquet('{_ORACLE_DIR}/redirect_history.parquet')
""",
        "fetch_headers": f"""
SELECT url, hkey, hval FROM read_parquet('{_ORACLE_DIR}/fetch_headers.parquet')
""",
        "crawl_rounds": f"""
SELECT CAST(fetch_round AS BIGINT) AS fetch_round, hostname, url,
       CAST(status_code AS INT) AS status_code, is_html,
       CAST(n_links AS INT) AS n_links
FROM read_parquet('{_ORACLE_DIR}/crawl_rounds.parquet')
""",
        "submit_fields": f"""
SELECT url, CAST(fetch_round AS BIGINT) AS fetch_round,
       CAST(status_code AS INT) AS status_code, document_b64, base
FROM read_parquet('{_ORACLE_DIR}/submit_fields.parquet')
""",
        # full payload contract: canonicalized sha256 per rendered JSON
        # document, driver-rendered from the reference simulator's rows
        "submit_payloads": f"""
SELECT name, payload_sha
FROM read_parquet('{_ORACLE_DIR}/submit_payloads.parquet')
""",
        # expected features of the seeded payloads, enumerated driver-side
        # (pure function of the seed); same e6 rounding as the engine query
        "image_features": f"""
SELECT image_id, CAST(dec_w AS INT) AS dec_w, CAST(dec_h AS INT) AS dec_h,
       CAST(floor(mean_r * 1000000 + 0.5) AS BIGINT) AS mean_r_e6,
       CAST(floor(mean_g * 1000000 + 0.5) AS BIGINT) AS mean_g_e6,
       CAST(floor(mean_b * 1000000 + 0.5) AS BIGINT) AS mean_b_e6,
       CAST(floor(brightness * 1000000 + 0.5) AS BIGINT) AS brightness_e6,
       CAST(phash AS BIGINT) AS phash, decode_error
FROM read_parquet('{_ORACLE_DIR}/image_features.parquet')
""",
        "frame_sample": f"""
SELECT media_id, CAST(frame_index AS INT) AS frame_index,
       CAST(frame_len AS INT) AS frame_len
FROM read_parquet('{_ORACLE_DIR}/frame_sample.parquet')
""",
        # all-pairs hamming ground truth over the enumerated phashes —
        # the banded Spark join must lose no pair (pigeonhole: ≤3 < 4)
        "image_phash_dedup": f"""
WITH ph AS (
  SELECT image_id, phash
  FROM read_parquet('{_ORACLE_DIR}/image_phash.parquet')
)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
""",
        # hand-derived expected mime per corpus case, independent of the
        # engine's sniffing implementation
        "sniff_mime": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE CAST(doc_id % 6 AS INT)
    WHEN 0 THEN 'text/html'
    WHEN 1 THEN 'text/html'
    WHEN 2 THEN 'text/plain'
    WHEN 3 THEN 'text/xml'
    WHEN 4 THEN 'image/png'
    ELSE '(null)'
  END AS sniffed_mime
FROM documents WHERE doc_id < 100
""",
        "audio_features": f"""
SELECT media_id, CAST(n_samples AS INT) AS n_samples,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(floor(duration_ms * 1000000 + 0.5) AS BIGINT) AS duration_ms_e6,
       CAST(floor(rms * 1000000 + 0.5) AS BIGINT) AS rms_e6,
       CAST(floor(peak * 1000000 + 0.5) AS BIGINT) AS peak_e6,
       CAST(zero_crossings AS INT) AS zero_crossings, decode_error
FROM read_parquet('{_ORACLE_DIR}/audio_features.parquet')
""",
        "sessionize": """
WITH lagged AS (
  SELECT user_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) > 600
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM lagged GROUP BY 1
""",
        "event_windows": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
FROM events GROUP BY 1, 2
""",
        "tpch_q1": """
WITH scaled AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_e2,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_e2,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS disc_price_e2,
         CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS charge_e2,
         CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS disc_e6
  FROM lineitem WHERE l_shipdate <= '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_e2) AS BIGINT) AS sum_qty_e2,
       CAST(sum(price_e2) AS BIGINT) AS sum_base_price_e2,
       CAST(sum(disc_price_e2) AS BIGINT) AS sum_disc_price_e2,
       CAST(sum(charge_e2) AS BIGINT) AS sum_charge_e2,
       CAST(floor(CAST(sum(qty_e2) AS DOUBLE) * 10000 / count(*)) AS BIGINT) AS avg_qty_e6,
       CAST(floor(CAST(sum(price_e2) AS DOUBLE) * 10000 / count(*)) AS BIGINT) AS avg_price_e6,
       CAST(floor(CAST(sum(disc_e6) AS DOUBLE) / count(*)) AS BIGINT) AS avg_disc_e6,
       CAST(count(*) AS BIGINT) AS count_order
FROM scaled GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
        "tpch_q6": """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
        "rollup_events": """
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
FROM events GROUP BY ROLLUP(event_type, (user_id % 10))
""",
        "topk_orders": """
WITH ranked AS (
  SELECT CAST(o_custkey % 25 AS BIGINT) AS bucket,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2,
         CAST(row_number() OVER (
           PARTITION BY o_custkey % 25
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rank
  FROM orders
)
SELECT bucket, o_orderkey, price_e2, rank FROM ranked WHERE rank <= 3
""",
        "dedup_exact": """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 10
)
SELECT md5(text) AS digest, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM docs2 GROUP BY 1 HAVING count(*) > 1
""",
        "dedup_minhash_lsh": _duck_minhash_sig(4)
        + """
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(count(*) AS BIGINT) AS n_bands
FROM sigs a JOIN sigs b
  ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
        "dedup_simhash": _simhash_duck(16)
        + """
SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM sigs GROUP BY 1 HAVING count(*) > 1
""",
        # recursive reachability: component = min id reachable from node
        # over the (undirected) MinHash pair graph — independent of the
        # engine's iterative label-propagation implementation
        "dedup_components": _duck_minhash_sig(4).replace(
            "WITH toks", "WITH RECURSIVE toks", 1
        )
        + """
, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM walk GROUP BY 1
""",
        # kept corpus = all documents minus non-canonical cluster members
        "dedup_keep": _duck_minhash_sig(4).replace(
            "WITH toks", "WITH RECURSIVE toks", 1
        )
        + """
, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
), comp AS (
  SELECT node, min(label) AS component FROM walk GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node != component)
""",
        "dedup_ngram_jaccard": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
), sh_all AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(t) >= 3
      THEN list_transform(range(0, len(t)-2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      ELSE [] END
  ) AS shingle FROM toks
), sh AS (
  -- document-frequency cap (engine max_shingle_df=100): boilerplate
  -- shingles are excluded from BOTH intersection and sizes
  SELECT doc_id, shingle FROM sh_all
  WHERE shingle IN (SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 100)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(floor((CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)) * 1000000 + 0.5) AS BIGINT) AS jaccard_e6
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.3
""",
        # hand-derived from the robots.txt protocol for the fixed corpus in
        # q_robots_rules (independent expected output; ref contract
        # darc/_robotparser.py:87-158): h1 default entry with 2 rules +
        # crawl-delay, h2 bot entry + empty-Disallow default, h3 403 ⇒
        # disallow-all row, h4 404 ⇒ allow-all (no rows)
        "robots_rules": """
SELECT * FROM (VALUES
  ('h1', '*',   0, '/private/',   false, 2,                  CAST(NULL AS DOUBLE)),
  ('h1', '*',   1, '/private/ok', true,  2,                  CAST(NULL AS DOUBLE)),
  ('h2', 'bot', 0, '/b/',         false, CAST(NULL AS INT),  CAST(NULL AS DOUBLE)),
  ('h2', '*',   0, '',            true,  CAST(NULL AS INT),  CAST(NULL AS DOUBLE)),
  ('h3', '*',   0, '*',           false, CAST(NULL AS INT),  CAST(NULL AS DOUBLE))
) AS t(hostname, agent, rule_index, path_prefix, allow, crawl_delay, request_rate)
""",
        "lang_id": q_lang,
        "quality_percentiles": """
SELECT lang,
       CAST(floor(quantile_cont(n_chars, 0.5) * 1000000 + 0.5) AS BIGINT) AS p50_e6,
       CAST(floor(quantile_cont(n_chars, 0.9) * 1000000 + 0.5) AS BIGINT) AS p90_e6,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
""",
        # the sketch path's contract: the rank-error bound holds for
        # every language (the Spark query computes the verdict in-plan
        # against the exact bracket quantiles)
        "quality_percentiles_approx": """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, true AS within_bound
FROM documents GROUP BY 1
""",
        # the full cleaning pipeline re-run in SQL: quality + lang
        # filters, window-dedup on the content digest, MinHash bands +
        # recursive-CTE connected components, then the same rollup
        "corpus_clean": f"""
WITH RECURSIVE pre AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
  WHERE doc_id < 10
), feats AS (
  SELECT doc_id, text, lang, {_TOKS_DUCK} AS t,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM pre
), filtered AS (
  -- term association mirrors the Spark side EXACTLY (0.3 * (hits/len),
  -- not (0.3*hits)/len): the raw-double >= 0.5 threshold would flip on
  -- a 1-ulp divergence, unlike the e6-floored oracles
  SELECT doc_id, text, lang FROM feats
  WHERE (0.4 * least(n_chars / 500.0, 1.0)
       + 0.3 * (1 - (CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)))
       + 0.3 * (CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1))) >= 0.5
    AND CAST({stop_hits} AS DOUBLE) / greatest(len(t), 1) >= 0.08
), uniq AS (
  SELECT doc_id, text, lang FROM filtered
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
){_duck_minhash_sig(4).replace("FROM documents", "FROM uniq").replace("WITH toks", ", toks", 1)}
, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), cedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), walk(node, label) AS (
  SELECT src, src FROM cedges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN cedges e ON e.src = w.node
), comp AS (
  SELECT node, min(label) AS component FROM walk GROUP BY 1
), final AS (
  SELECT lang, text FROM uniq
  WHERE doc_id NOT IN (SELECT node FROM comp WHERE node != component)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_bpe_tokens
FROM final GROUP BY lang
""",
        "quality_score": q_quality,
        "token_count": f"""
SELECT source,
       CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS total_words,
       CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_bpe_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
""",
        "fingerprint": f"""
WITH fp AS (
  SELECT lang,
         {_H64_DUCK.format(x=f"array_to_string(list_slice({_TOKS_DUCK}, 1, 8), ' ')")} AS fingerprint
  FROM documents
)
SELECT lang, CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_fingerprints,
       CAST(count(*) AS BIGINT) AS n_docs
FROM fp GROUP BY 1
""",
        "cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_reduce(list_transform(range(1, len(embedding)+1),
             j -> CAST(embedding[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)),
             (a, b) -> a + b)
           / (sqrt(list_reduce(list_transform(range(1, len(embedding)+1),
                j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)), (a, b) -> a + b))
              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                j -> CAST(qv[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)), (a, b) -> a + b))) AS cosine
  FROM embeddings, q WHERE vec_id != 0
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6
FROM scored ORDER BY cosine DESC, vec_id LIMIT 5
""",
        "ann_lsh": f"""
SELECT ({_sig_expr_duck(8, 64)}) AS sig, CAST(count(*) AS BIGINT) AS n_vectors
FROM embeddings GROUP BY 1
""",
        "ann_topk": f"""
WITH sigs AS (
  SELECT vec_id, embedding, ({_sig_expr_duck(4, 64)}) AS sig FROM embeddings
), q AS (
  SELECT embedding AS qv, sig AS qsig FROM sigs WHERE vec_id = 0
), bucket AS (
  SELECT s.vec_id, s.embedding, q.qv FROM sigs s, q
  WHERE s.sig = q.qsig AND s.vec_id != 0
), scored AS (
  SELECT vec_id,
         list_reduce(list_transform(range(1, len(embedding)+1),
             j -> CAST(embedding[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)),
             (a, b) -> a + b)
           / (sqrt(list_reduce(list_transform(range(1, len(embedding)+1),
                j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)), (a, b) -> a + b))
              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                j -> CAST(qv[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)), (a, b) -> a + b))) AS cosine
  FROM bucket
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6
FROM scored ORDER BY cosine DESC, vec_id LIMIT 5
""",
        "ann_ivf": _ivf_duck(8, 2, 64)
        + """
, scored AS (
  SELECT a.vec_id,
         list_reduce(list_transform(range(1, len(a.embedding)+1),
             j -> CAST(a.embedding[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)),
             (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(range(1, len(a.embedding)+1),
                j -> CAST(a.embedding[j] AS DOUBLE) * CAST(a.embedding[j] AS DOUBLE)), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(range(1, len(q.qv)+1),
                j -> CAST(q.qv[j] AS DOUBLE) * CAST(q.qv[j] AS DOUBLE)), (x, y) -> x + y))) AS cosine
  FROM assign a CROSS JOIN q
  WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probe) AND a.vec_id != 0
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6
FROM scored ORDER BY cosine DESC, vec_id LIMIT 5
""",
        # CLIP-score pair filter: same hash projection (md5-prefix h64),
        # same float64 cosine chain, same threshold
        "caption_align": """
WITH pairs AS (
  SELECT d.doc_id,
         list_transform(range(0, 64), j ->
           (CAST(('0x' || substr(md5(d.text || '#' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)
            % 2001 - 1000) / 1000.0) AS cap,
         e.embedding AS img
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
), scored AS (
  SELECT doc_id,
    list_reduce(list_transform(range(1, 65),
        j -> CAST(cap[j] AS DOUBLE) * CAST(img[j] AS DOUBLE)), (a, b) -> a + b)
    / (sqrt(list_reduce(list_transform(range(1, 65),
        j -> CAST(cap[j] AS DOUBLE) * CAST(cap[j] AS DOUBLE)), (a, b) -> a + b))
       * sqrt(list_reduce(list_transform(range(1, 65),
        j -> CAST(img[j] AS DOUBLE) * CAST(img[j] AS DOUBLE)), (a, b) -> a + b))) AS align
  FROM pairs
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, align FROM scored
WHERE align >= 0.05 ORDER BY doc_id
""",
        # hand-derived expected rows per data-URI form (independent of the
        # engine's regexp/unbase64 path)
        "data_uri_decode": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 'text/plain' WHEN 1 THEN 'text/plain'
    WHEN 2 THEN 'image/png' ELSE 'text/html' END AS data_mime,
  CAST(doc_id % 4 AS INT) IN (0, 2) AS data_is_base64,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 'QUJD' WHEN 1 THEN 'aGVsbG8gd29ybGQ='
    WHEN 2 THEN 'aVZCT1I=' ELSE 'PGI+eDwvYj4=' END AS payload_b64
FROM documents WHERE doc_id < 200
""",
        "cosine_near_pairs": f"""
WITH emb2 AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_concat([CAST(embedding[1] AS DOUBLE) + 0.05],
                     list_transform(embedding[2:64], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id < 20
), sigs AS (
  SELECT vec_id, embedding, ({_sig_expr_duck(16, 64)}) AS sig FROM emb2
), banded AS (
  SELECT vec_id, b AS band_idx, (sig >> (b * 8)) & 255 AS band_val
  FROM sigs, (VALUES (0), (1)) t(b)
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
), scored AS (
  SELECT id_a, id_b,
         list_reduce(list_transform(range(1, len(ea.embedding)+1),
             j -> CAST(ea.embedding[j] AS DOUBLE) * CAST(eb.embedding[j] AS DOUBLE)),
             (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(range(1, len(ea.embedding)+1),
                j -> CAST(ea.embedding[j] AS DOUBLE) * CAST(ea.embedding[j] AS DOUBLE)), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(range(1, len(eb.embedding)+1),
                j -> CAST(eb.embedding[j] AS DOUBLE) * CAST(eb.embedding[j] AS DOUBLE)), (x, y) -> x + y))) AS cosine
  FROM cand
  JOIN emb2 ea ON ea.vec_id = id_a
  JOIN emb2 eb ON eb.vec_id = id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6
FROM scored WHERE cosine >= 0.9
""",
        # PQ encode + ADC re-run in SQL with the same codebook literals
        # (standard byte-code parameters: m=8, ksub=256 — 2048 codeword
        # literal rows in the VALUES block)
        "ann_pq": _pq_duck(8, 256, 64)
        + """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_e6
FROM scored WHERE vec_id != 0
ORDER BY adc, vec_id LIMIT 5
""",
        # the IVF probe prelude composed with the PQ block over the
        # probed pool — the SQL mirrors the engine's composition 1:1
        "ann_ivfpq": _ivf_duck(8, 2, 64)
        + """, pool AS (
  SELECT vec_id, embedding FROM assign
  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
)"""
        + _pq_duck(8, 16, 64, src="pool", lead=",", include_q=False)
        + """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_e6
FROM scored WHERE vec_id != 0
ORDER BY adc, vec_id LIMIT 5
""",
        # residual IVF-PQ: assign prelude + residual encode + per-cell
        # ADC LUT join — mirrors write_ivfpq_index(residual=True) +
        # ivfpq_topk_from_index(residual=True) literal-for-literal
        "ann_ivfpq_residual": _ivf_duck(8, 2, 64)
        + _pq_res_duck(8, 16, 64)
        + """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_e6
FROM scored WHERE vec_id != 0
ORDER BY adc, vec_id LIMIT 5
""",
        "ann_recall": _ann_recall_duck(8, 2, 64, 16, 10),
        "ann_recall_pq": _ann_recall_pq_duck(8, 256, 64, 16, 10),
        "ann_recall_ivfpq": _ann_recall_ivfpq_duck(8, 2, 8, 16, 64, 16, 10),
        # exact all-pairs oracle: STRONGER than mirroring the engine's
        # multi-band join — with 4 bands and max_hamming 3 < 4, pigeonhole
        # guarantees the banded candidates lose no pair, and this asserts it
        "phash_hamming": f"""
WITH sigs AS (
  SELECT vec_id, ({_sig_expr_duck(16, 64)}) AS sig FROM embeddings
)
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
""",
    }
