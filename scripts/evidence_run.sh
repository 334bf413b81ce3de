#!/bin/bash
# Round-4 on-chip evidence package (VERDICT r3 next #1) — run at every
# tunnel window, cheapest-first so a short window still lands artifacts:
#   1. compiled-vs-interpret A/B        -> ab_result.json        (commit)
#   2. kbench fast_recip kernel A/B     -> log
#   3. bench.py exact + NM_FAST_RECIP=1 -> bench_progression_r4.json
#   4. eambench                         -> eambench_result.json  (commit)
#   5. northstar full scale             -> northstar_result.json (commit)
# Each step logs to docs/evidence_r4.log and commits its artifact so a
# mid-package outage keeps everything landed so far.
set -u
cd /root/repo
LOG=docs/evidence_r4.log
stamp() { date -u "+%Y-%m-%dT%H:%M:%SZ"; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }
commit_art() {  # commit_art <msg> <files...>
    local msg="$1"; shift
    git add "$@" "$LOG" docs/bench_progression_r4.json 2>/dev/null
    git commit -q -m "$msg" 2>/dev/null && say "committed: $msg"
}

say "=== evidence package start (port 8082 $(timeout 3 bash -c \
    'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null && echo open || echo CLOSED)) ==="

say "step 1: compiled-vs-interpret A/B"
timeout 3600 python scripts/ab_interpret.py >> "$LOG" 2>&1
RC=$?
say "ab_interpret rc=$RC"
[ -f ab_result.json ] && commit_art "On-chip evidence: compiled-vs-interpret A/B artifact" ab_result.json

say "step 2: kbench fast_recip kernel A/B (48:16 vs 48:16:r)"
timeout 3600 python scripts/kbench.py 48:16 48:16:r >> "$LOG" 2>&1
say "kbench rc=$?"
commit_art "On-chip evidence: kbench fast_recip A/B log" "$LOG"

say "step 3a: bench.py (exact divide)"
NM_BENCH_WAIT_SECS=600 timeout 5400 python bench.py 2>>"$LOG" \
    | python scripts/record_progression.py "r4 exact-divide (sigma-fix recompile)" >> "$LOG" 2>&1
say "bench rc=$?"
commit_art "On-chip evidence: r4 bench progression (exact divide)"

say "step 3b: bench.py NM_FAST_RECIP=1"
NM_FAST_RECIP=1 NM_BENCH_WAIT_SECS=600 timeout 5400 python bench.py 2>>"$LOG" \
    | python scripts/record_progression.py "r4 fast_recip epilogue" >> "$LOG" 2>&1
say "bench fast_recip rc=$?"
commit_art "On-chip evidence: r4 bench progression (fast_recip)"

say "step 4: eambench"
timeout 7200 python scripts/eambench.py >> "$LOG" 2>&1
say "eambench rc=$?"
[ -f eambench_result.json ] && commit_art "On-chip evidence: EAM bench artifact" eambench_result.json

say "step 4b: occupancy study (band-kcap decision data; reuses bench compile)"
timeout 5400 python scripts/occupancy_study.py >> "$LOG" 2>&1
say "occupancy rc=$?"
[ -f occupancy_result.json ] && commit_art "On-chip evidence: per-replica occupancy distribution (band-kcap decision)" occupancy_result.json

say "step 5: northstar (full scale)"
timeout 14400 python scripts/northstar.py >> "$LOG" 2>&1
say "northstar rc=$?"
[ -f northstar_result.json ] && commit_art "On-chip evidence: north-star pipeline artifact" northstar_result.json

say "=== evidence package end ==="
