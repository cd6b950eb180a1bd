#!/usr/bin/env python3
"""External golden-source reconciliation runner (env-gated).

Mirrors the reference's ``scripts/check-sweeps.js`` workflow on the
Spark warehouse: per-key warehouse totals vs independent external
sources, per-key diff report + summary, nonzero exit over budget.

Usage:
    RECON_SOURCES='api=https://example/totals.json,audit=/path/fix.json' \
    [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1] \
    [RECON_TOLERANCE_CENTS=0] [RECON_MAX_BAD=0] \
    [RECON_REPORT=recon_report.jsonl] \
    python tools/reconcile.py

Without RECON_SOURCES the run is a clean no-network skip (exit 0).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stakehouse_etl_spark.io.recon_harness import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
