#!/usr/bin/env bash
# Package graven_spark and run the crawl via spark-submit --py-files
# (north_rule submission shape). Usage:
#   scripts/submit.sh crawl --pages P --seeds S --state D [...]
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f graven_spark.zip
zip -qr graven_spark.zip graven_spark -x '*__pycache__*'
cat > /tmp/graven_spark_main.py <<'PY'
from graven_spark.__main__ import main
import sys
raise SystemExit(main(sys.argv[1:]))
PY
# Iceberg variant: provision the runtime and run the opt-in integration test
#   SPARK_GRAFT_ICEBERG_PACKAGES=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
#     python -m pytest tests/test_iceberg_integration.py -q
# (the coordinate rides spark.jars.packages; any pre-placed jar also works)
exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files graven_spark.zip \
  /tmp/graven_spark_main.py "$@"
