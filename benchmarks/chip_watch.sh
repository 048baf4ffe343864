#!/bin/bash
# Watch for the TPU tunnel to return, then run the round-4 certification
# queue (benchmarks/chip_session.py). Two chip jobs contend and poison
# each other's timings, so this is the ONLY chip entry while it runs.
# A failed queue (tunnel drop mid-run, rc!=0) gets up to 3 attempts total
# — steps are idempotent and re-promote their artifacts — with a fresh
# probe before each. Logs under benchmarks/sessions/<stamp>/.
cd /root/repo || exit 1
ROUND="${1:-4}"
ATTEMPTS=0
while true; do
  if timeout 400 python -c "import sys; from benchmarks.chip_session import probe; sys.exit(0 if probe(300).get('up') else 1)" 2>/dev/null; then
    ATTEMPTS=$((ATTEMPTS + 1))
    echo "[chip_watch] TPU up at $(date -u +%FT%TZ); queue attempt $ATTEMPTS"
    python benchmarks/chip_session.py --round "$ROUND" --probe-timeout 300
    rc=$?
    echo "[chip_watch] chip_session exited rc=$rc at $(date -u +%FT%TZ)"
    if [ "$rc" -eq 0 ] || [ "$ATTEMPTS" -ge 3 ]; then
      exit $rc
    fi
    echo "[chip_watch] queue incomplete; re-probing for another attempt"
  else
    echo "[chip_watch] chip down at $(date -u +%FT%TZ); retry in 10 min"
  fi
  sleep 600
done
