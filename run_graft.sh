#!/bin/bash
# Scheduler entry point — the `run_etl.sh:1-20` analog for the Spark engine:
# cron/launchd invokes this; one run = Verify (correctness dump) over the
# given scale-factor directory with tee'd logging and a status line.
#
# The reference checks `$?` AFTER `tee`, so it tests tee's exit code and
# always reports success (`run_etl.sh:14`, noted in SURVEY.md §3.3). Fixed
# here with `pipefail` + PIPESTATUS: the status line reflects the ENGINE's
# exit code even though the output is piped.
set -uo pipefail

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/graft_run}"
REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
LOG_DIR="$REPO_DIR/logs"
mkdir -p "$LOG_DIR"

echo "Starting graft run"
echo "Timestamp: $(date)"

cd "$REPO_DIR"

sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" 2>&1 \
  | tee "$LOG_DIR/graft_$(date +%Y%m%d_%H%M%S).log"
status=${PIPESTATUS[0]}   # sbt's exit code, NOT tee's

if [ "$status" -eq 0 ]; then
    echo "graft run completed"
    echo "$(date): graft run completed (sf=$SF_DIR)" >> "$LOG_DIR/graft_status.log"
else
    echo "graft run FAILED (exit $status)"
    echo "$(date): graft run FAILED exit=$status (sf=$SF_DIR)" >> "$LOG_DIR/graft_status.log"
fi
exit "$status"
