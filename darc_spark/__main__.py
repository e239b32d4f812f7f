"""CLI entry — parity with ``python -m darc -t crawler <seeds>``.

Reference CLI (``darc/__main__.py:65-161``): choose worker type, read
seed URLs from args and/or ``-f`` files, enqueue NX, run the loop. Here
one process drives both stages per round (the two workers communicate
only through queue state in both systems, so a single round-robin driver
is behaviorally identical), state lives under ``--root``, and a rerun
with the same root resumes from the last committed snapshot.

Examples::

    python -m darc_spark --root /tmp/crawl http://hot.example/p/0
    python -m darc_spark --root /tmp/crawl -f seeds.txt --rounds 5
    python -m darc_spark --root /tmp/crawl --rounds 3   # resume

The synthetic deterministic web stands in for the network (sandbox);
swap ``SynthWeb.pages_batch`` for a requests/Tor session pool on a real
deployment — the fetch UDF contract is identical.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m darc_spark", description=__doc__.splitlines()[0]
    )
    parser.add_argument("seeds", nargs="*", help="seed URLs (darc positional args)")
    parser.add_argument(
        "-f", "--file", action="append", default=[], help="seed file (darc -f)"
    )
    parser.add_argument("--root", required=True, help="state directory")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--per-host", type=int, default=8, help="politeness budget")
    parser.add_argument("--lease", type=int, default=3)
    parser.add_argument("--max-retries", type=int, default=3)
    parser.add_argument("--no-robots", action="store_true", help="darc FORCE=1")
    parser.add_argument(
        "--type",
        choices=("both", "crawler", "loader"),
        default="both",
        help="worker type (darc -t); 'both' runs the two stages per round",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from darc_spark.operators.crawl import Crawler, CrawlConfig
    from darc_spark.session import get_spark
    from darc_spark.sources.synth import SynthWeb

    spark = get_spark("darc-spark", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        web = SynthWeb()
        cfg = CrawlConfig(
            per_host=args.per_host,
            lease=args.lease,
            max_retries=args.max_retries,
            robots_enabled=not args.no_robots,
            selenium_enabled=args.type in ("both", "loader"),
        )
        crawler = Crawler(spark, args.root, web, cfg)
        seeds = list(args.seeds)
        for path in args.file:
            with open(path) as f:
                seeds.extend(
                    line.strip()
                    for line in f
                    if line.strip() and not line.startswith("#")
                )
        if seeds:
            crawler.seed(seeds)
        for _ in range(args.rounds):
            r = crawler.round
            m = crawler.run_round()
            print(json.dumps({"round": r, **m}))
            if (
                m.get("claimed_requests", 0) == 0
                and m.get("claimed_selenium", 0) == 0
            ):
                break  # frontier drained (DARC_WAIT idle analogue)
        print(
            json.dumps(
                {
                    "final": True,
                    "snapshot": crawler.store.version,
                    **{k: v for k, v in crawler.fr_req.metrics(crawler.round).items()},
                }
            )
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
