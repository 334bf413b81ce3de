#!/bin/bash
# Round-4 on-chip evidence package, part 2 (takes over from
# evidence_run.sh after its commit_art pathspec fix): waits for any
# already-running kbench to finish, then lands the remaining artifacts,
# committing each as it goes so a mid-package outage loses nothing.
set -u
cd /root/repo
LOG=docs/evidence_r4.log
stamp() { date -u "+%Y-%m-%dT%H:%M:%SZ"; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }
commit_art() {  # commit_art <msg> <files...>
    local msg="$1"; shift
    local f
    for f in "$@" "$LOG" docs/bench_progression_r4.json; do
        [ -e "$f" ] && git add -- "$f"
    done
    git commit -q -m "$msg" 2>/dev/null && say "committed: $msg"
}

# wait for the in-flight kbench (step 2 of part 1) to release the chip
while pgrep -x python -a | grep -q "scripts/kbench.py"; do sleep 15; done
say "part 2 start: chip free"
commit_art "On-chip evidence: kbench fast_recip A/B log"

say "step 2b: kbench specs, one process each (a hung tunnel RPC in one"
say "        spec must not starve the rest — the 03:33 stall ate 48:16)"
for SPEC in 48:16 48:16:r 48:32; do
    say "kbench $SPEC"
    timeout 1500 python scripts/kbench.py "$SPEC" >> "$LOG" 2>&1
    say "kbench $SPEC rc=$?"
done
commit_art "On-chip evidence: kbench fast_recip + J=32 probes"

say "step 2c: vpu_probe (fma peak, pair incr/recip, bf16 issue rate)"
timeout 1800 python scripts/vpu_probe.py >> "$LOG" 2>&1
say "vpu_probe rc=$?"
commit_art "On-chip evidence: VPU issue-rate probe (peak vs sustained, bf16)"

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

say "step 4b: occupancy study (band-kcap decision data)"
timeout 5400 python scripts/occupancy_study.py >> "$LOG" 2>&1
say "occupancy rc=$?"
[ -f occupancy_result.json ] && commit_art "On-chip evidence: per-replica occupancy distribution (band-kcap decision)" occupancy_result.json

say "step 5: northstar (full scale)"
timeout 14400 python scripts/northstar.py >> "$LOG" 2>&1
say "northstar rc=$?"
[ -f northstar_result.json ] && commit_art "On-chip evidence: north-star pipeline artifact" northstar_result.json

say "=== part 2 end ==="
