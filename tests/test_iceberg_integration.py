"""Opt-in Iceberg integration (VERDICT r2 #7): runs only when the
environment provides the Iceberg Spark runtime (set
``SPARK_GRAFT_ICEBERG_PACKAGES`` to a maven coordinate for
``spark.jars.packages``, or to any value with the jar pre-placed on the
classpath); skips cleanly otherwise — this container has neither network
nor the jar. The check itself lives in scripts/iceberg_integration.py and
runs in a SUBPROCESS because the catalog/extension/SPJ confs must be set
before the JVM starts (the shared test session already runs without them).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_RUNNER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "iceberg_integration.py",
)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_ICEBERG_PACKAGES"),
    reason="Iceberg runtime not provisioned "
           "(set SPARK_GRAFT_ICEBERG_PACKAGES; see scripts/iceberg_integration.py)",
)
def test_iceberg_seen_table_end_to_end():
    out = subprocess.run(
        [sys.executable, _RUNNER], capture_output=True, text=True, timeout=900
    )
    if "SKIP:" in out.stdout:  # env var set but runtime failed to load
        pytest.skip(out.stdout.strip().splitlines()[-1])
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    for marker in ("merge_dedup", "snapshot_resume",
                   "spj_anti_join_no_exchange", "all"):
        assert f"ICEBERG_OK {marker}" in out.stdout
