#!/bin/sh
# One-command full differential sweep at sf0.1 (r8 VERDICT ask #5):
# every registered query vs its DuckDB oracle at the larger scale the
# driver spot-checks — the same gate as the default sf0.01 pytest run,
# just pointed at /root/testdata/sf0.1. Takes ~15 minutes on local[32].
#
#   scripts/sweep_sf01.sh [extra pytest args...]
#
# Recorded green runs are noted in README ("sf0.1 differential sweep").
set -e
cd "$(dirname "$0")/.."
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 \
    exec python -m pytest tests/test_oracle_diff.py -q "$@"
