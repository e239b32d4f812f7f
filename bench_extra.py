#!/usr/bin/env python
"""Round-6 measurement harness (guide §1) — bench.py stays FROZEN.

Modes:

``queries`` — isolate each headline query with the noop sink
    (``df.write.format("noop")``), k reps, labeled jobs. Prints one JSON
    line with per-query best/median seconds.
``crawl``   — run the exact ``bench.crawl_bench`` workload once and dump
    the per-round stage wall buckets (sec_req_claim/gate/fetch/route,
    sec_selenium, sec_prev_commit) recorded in the commit manifests.
``jobs``    — run one crawl round and dump every Spark job's duration +
    description from the JVM status store: the per-round fixed cost
    (driver job latency × job count) is the crawl bench's wall clock.

Usage: python bench_extra.py <queries|crawl|jobs> [names...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_K.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark():
    from darc_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("darc-spark-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(names: list[str]) -> None:
    import bench as bench_mod

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = int(os.environ.get("BENCH_EXTRA_K", "3"))
    spark = _spark()
    qs = entry_mod.queries()
    names = names or bench_mod.HEADLINE
    spark.range(1000).selectExpr("sum(id)").collect()  # session warm-up
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for rep in range(k):
            spark.sparkContext.setJobDescription(f"{name}[{rep}]")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        runs_sorted = sorted(runs)
        out[name] = {
            "min": runs_sorted[0],
            "med": runs_sorted[len(runs) // 2],
            "runs": runs,
        }
        print(f"{name:24s} min={runs_sorted[0]:8.3f} runs={runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "k": k, "queries": out}))
    spark.stop()


def run_crawl() -> None:
    import bench as bench_mod

    spark = _spark()
    # untimed warm-up mini-crawl, same as bench.run_bench
    import shutil
    import tempfile

    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.sources.synth import SynthWeb

    wroot = tempfile.mkdtemp(prefix="bx_warm_")
    try:
        wweb = SynthWeb(seed=3, pages_per_host=50, branching=3)
        wc = Crawler(spark, wroot, wweb, CrawlConfig(per_host=4, selenium_enabled=True))
        wc.seed(wweb.seeds())
        wc.run(1)
    finally:
        shutil.rmtree(wroot, ignore_errors=True)

    web = SynthWeb(
        seed=7, hosts=bench_mod.CRAWL_HOSTS, pages_per_host=20000, branching=8
    )
    root = tempfile.mkdtemp(prefix="bx_crawl_")
    try:
        crawler = Crawler(
            spark,
            root,
            web,
            CrawlConfig(
                per_host=512,
                lease=3,
                max_retries=1,
                salt_shards=8,
                n_filter_buckets=16,
                selenium_enabled=True,
            ),
        )
        crawler.seed([web.url(h, i) for h in web.hosts for i in range(40)])
        t0 = time.perf_counter()
        metrics = crawler.run(3)
        dt = time.perf_counter() - t0
        print(json.dumps({"total_sec": round(dt, 2), "rounds": metrics}, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def run_jobs() -> None:
    """Crawl rounds with per-job durations parsed from the event log."""
    import glob
    import shutil
    import tempfile

    import bench as bench_mod

    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.session import get_spark
    from darc_spark.sources.synth import SynthWeb

    evdir = tempfile.mkdtemp(prefix="bx_eventlog_")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "darc-spark-bench-extra",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def read_events():
        out = {}
        paths = [
            os.path.join(r, fn)
            for r, _d, fns in os.walk(evdir)
            for fn in fns
            if "appstatus" not in fn and not fn.endswith(".crc")
        ]
        for path in paths:
            with open(path) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except ValueError:
                        continue
                    if ev.get("Event") == "SparkListenerJobStart":
                        jid = ev["Job ID"]
                        out.setdefault(jid, {})["t0"] = ev["Submission Time"]
                        props = ev.get("Properties") or {}
                        out[jid]["desc"] = props.get(
                            "spark.job.description",
                            props.get("callSite.short", ""),
                        )
                        out[jid]["stages"] = len(ev.get("Stage IDs", []))
                    elif ev.get("Event") == "SparkListenerJobEnd":
                        out.setdefault(ev["Job ID"], {})["t1"] = ev[
                            "Completion Time"
                        ]
        return out
    web = SynthWeb(
        seed=7, hosts=bench_mod.CRAWL_HOSTS, pages_per_host=20000, branching=8
    )
    root = tempfile.mkdtemp(prefix="bx_jobs_")
    try:
        crawler = Crawler(
            spark,
            root,
            web,
            CrawlConfig(
                per_host=512,
                lease=3,
                max_retries=1,
                salt_shards=8,
                n_filter_buckets=16,
                selenium_enabled=True,
            ),
        )
        crawler.seed([web.url(h, i) for h in web.hosts for i in range(40)])
        rounds = int(os.environ.get("BENCH_EXTRA_ROUNDS", "3"))
        marks = []
        for rnd in range(rounds):
            t0 = time.time()
            tp0 = time.perf_counter()
            m = crawler.run_round()
            dt = time.perf_counter() - tp0
            marks.append((rnd, t0, time.time(), dt, m))
        spark.stop()
        events = read_events()
        for rnd, w0, w1, dt, m in marks:
            new = {
                jid: e
                for jid, e in events.items()
                if e.get("t0", 0) / 1000.0 >= w0 - 0.05
                and e.get("t0", 0) / 1000.0 <= w1
            }
            total = sum(
                (e["t1"] - e["t0"]) / 1000.0
                for e in new.values()
                if "t1" in e and "t0" in e
            )
            print(
                f"== round {rnd}: wall={dt:.2f}s jobs={len(new)} "
                f"sum_job={total:.2f}s "
                f"stage_secs={ {k: v for k, v in m.items() if k.startswith('sec_')} }"
            )
            for jid in sorted(new):
                e = new[jid]
                ms = e.get("t1", 0) - e.get("t0", 0)
                print(
                    f"  job {jid:4d} {ms/1000.0:7.2f}s st={e.get('stages', 0):2d} "
                    f" {e.get('desc', '')[:100]}"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        run_queries(sys.argv[2:])
    elif mode == "crawl":
        run_crawl()
    elif mode == "jobs":
        run_jobs()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
