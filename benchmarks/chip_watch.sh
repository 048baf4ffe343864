#!/bin/bash
# Watch for the TPU tunnel to return, then run the round-4 certification
# queue exactly once (benchmarks/chip_session.py). Two chip jobs contend
# and poison each other's timings, so this is the ONLY chip entry while
# it runs. Logs under benchmarks/sessions/<stamp>/.
cd /root/repo || exit 1
ROUND="${1:-4}"
while true; do
  if timeout 400 python -c "import sys; from benchmarks.chip_session import probe; sys.exit(0 if probe(300).get('up') else 1)" 2>/dev/null; then
    echo "[chip_watch] TPU up at $(date -u +%FT%TZ); starting certification queue"
    python benchmarks/chip_session.py --round "$ROUND" --probe-timeout 300
    rc=$?
    echo "[chip_watch] chip_session exited rc=$rc at $(date -u +%FT%TZ)"
    exit $rc
  fi
  echo "[chip_watch] chip down at $(date -u +%FT%TZ); retry in 10 min"
  sleep 600
done
