#!/bin/bash
# Round-4 evidence, part 4: the full-scale north-star run (32x32 x 4096),
# driven through the resumable scripts/northstar2.py. Each attempt resumes
# from ns_state/; a TPU-worker crash costs one chunk.
cd /root/repo
LOG=docs/evidence_r4.log
say() { echo "[$(date -u +%FT%TZ)] $*" | tee -a "$LOG"; }

say "=== part 4 start: full-scale northstar (resumable) ==="
rm -f northstar_result.json   # stale --fast smoke result; full run rewrites it

for attempt in $(seq 1 12); do
  say "northstar2 attempt $attempt"
  timeout 5400 python scripts/northstar2.py >>"$LOG" 2>&1
  rc=$?
  say "northstar2 attempt $attempt rc=$rc"
  if [ $rc -eq 0 ] && [ -f northstar_result.json ]; then
    break
  fi
  sleep 30
done

if [ -f northstar_result.json ]; then
  say "northstar complete:"
  cat northstar_result.json | tee -a "$LOG"
  git add northstar_result.json docs/evidence_r4.log ns_state/progress.json 2>/dev/null
  git commit -q -m "On-chip evidence: full-scale northstar run (32x32 x 4096, resumable)" \
    && say "committed northstar result"
else
  say "northstar FAILED after all attempts"
  git add docs/evidence_r4.log ns_state/progress.json 2>/dev/null
  git commit -q -m "Evidence log: full-scale northstar attempts (incomplete)"
fi
say "=== part 4 end ==="
