#!/bin/bash
# Local correctness loop: compile, run Verify at sf0.01, DuckDB-compare.
# Usage: tools/check.sh [sf] [query ...]
# With query names, BOTH Verify and the compare restrict to them — a
# scoped check runs in seconds instead of minutes.
set -e
cd /root/repo
SF="${1:-0.01}"
shift 2>/dev/null || true
SFDIR="/root/testdata/sf$SF"
OUT="/tmp/graft_verify_sf$SF"
sbt -batch --error "set Compile/run/javaOptions += \"-Dderby.stream.error.file=/tmp/derby.log\"; runMain graft.Verify $SFDIR $OUT $*"
python3 tools/selfcheck.py "$SFDIR" "$OUT" "$@"
