#!/usr/bin/env bash
# North-rule deployment check: run a crawl via spark-submit --py-files.
# Usage: scripts/spark_submit_check.sh [master]   (default local[8])
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
WORK="$(mktemp -d)"
python - <<PY
import zipfile, os
os.chdir("$REPO")
with zipfile.ZipFile("$WORK/darc_spark.zip", "w") as zf:
    for root, _, files in os.walk("darc_spark"):
        for fn in files:
            if fn.endswith(".py"):
                zf.write(os.path.join(root, fn))
PY
cat > "$WORK/job.py" <<'PY'
import json, tempfile
from pyspark.sql import SparkSession
spark = SparkSession.builder.appName("darc-spark-submit-check").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from darc_spark.operators.crawl import Crawler, CrawlConfig
from darc_spark.sources.synth import SynthWeb
web = SynthWeb(seed=5, pages_per_host=40, branching=3)
crawler = Crawler(spark, tempfile.mkdtemp(prefix="ssub-"), web,
                  CrawlConfig(per_host=4, lease=2, max_retries=1))
crawler.seed(web.seeds())
ms = crawler.run(2)
total = sum(m.get("fetched_requests", 0) for m in ms)
assert total > 0, "no fetches"
print("SPARK_SUBMIT_OK", json.dumps({"rounds": len(ms), "fetched": total}))
spark.stop()
PY
"${SPARK_HOME:-/opt/spark}/bin/spark-submit" --master "$MASTER" \
  --py-files "$WORK/darc_spark.zip" "$WORK/job.py"
