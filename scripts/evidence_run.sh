#!/bin/bash
# On-chip evidence runner (one script, parameterized — VERDICT r4 #9).
# Usage: scripts/evidence_run.sh [stage ...]     (default: all stages)
# Stages, cheapest-first so a short tunnel window still lands artifacts:
#   ab        compiled-vs-interpret bitwise A/B      -> ab_result.json
#   bench     headline kernel + e2e rows             -> log
#   eambench  EAM engine throughput + melting sweep  -> eambench_result.json
#   tmab      EAM cross-engine T_m A/B (+brackets)   -> eam_tm_ab.json
#   northstar full-scale resumable pipeline run      -> northstar_result.json
# Each stage logs to $LOG and commits its artifact immediately, so a
# mid-package outage keeps everything landed so far.
set -u
cd /root/repo
ROUND=${NM_ROUND:-5}
LOG=docs/evidence_r${ROUND}.log
stamp() { date -u "+%Y-%m-%dT%H:%M:%SZ"; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }
commit_art() {  # commit_art <msg> <files...>
    local msg="$1"; shift
    local f
    for f in "$@"; do
        [ -e "$f" ] && git add "$f"
    done
    git add "$LOG" 2>/dev/null
    git commit -q -m "$msg" && say "committed: $msg"
}

run_ab() {
    say "=== ab: compiled-vs-interpret A/B ==="
    timeout 1800 python scripts/ab_interpret.py >>"$LOG" 2>&1
    say "ab rc=$?"
    commit_art "On-chip evidence: compiled-vs-interpret A/B" ab_result.json
}

run_bench() {
    say "=== bench: headline + e2e rows ==="
    timeout 5400 python bench.py > /tmp/nm_bench_out.json 2>>"$LOG"
    say "bench rc=$?"
    cat /tmp/nm_bench_out.json >>"$LOG"
    NM_ROUND=$ROUND python scripts/record_progression.py \
        "r${ROUND} headline + e2e row" /tmp/nm_bench_out.json \
        >>"$LOG" 2>&1 || true
    commit_art "On-chip evidence: bench headline + e2e rows" \
        docs/bench_progression_r${ROUND}.json
}

run_eambench() {
    say "=== eambench: EAM throughput + sweep ==="
    timeout 5400 python scripts/eambench.py >>"$LOG" 2>&1
    say "eambench rc=$?"
    commit_art "On-chip evidence: EAM engine benchmark" eambench_result.json
}

run_tmab() {
    say "=== tmab: EAM T_m cross-engine A/B + brackets ==="
    # regenerate ALL legs at the current (round-5) series tolerance so
    # the artifact is homogeneous — the round-4 file mixed old-default
    # legs (git history keeps it). Heating legs auto-run before cooling.
    rm -f eam_tm_ab.json
    timeout 14400 python scripts/eam_tm_ab.py clong ccool gcool >>"$LOG" 2>&1
    say "tmab rc=$?"
    commit_art "On-chip evidence: EAM T_m A/B with hysteresis brackets" \
        eam_tm_ab.json
}

run_longrc() {
    say "=== longrc: EAM at published-table cutoff (rc=6.3, 7^3 box) ==="
    timeout 3600 python scripts/longrc_run.py >>"$LOG" 2>&1
    say "longrc rc=$?"
    commit_art "On-chip evidence: long-rc EAM drop-in run (rc=6.3, 1372 atoms)" \
        longrc_result.json
}

run_northstar() {
    say "=== northstar: full-scale resumable pipeline ==="
    for attempt in $(seq 1 12); do
        say "northstar attempt $attempt"
        timeout 5400 python scripts/northstar2.py --cool >>"$LOG" 2>&1
        rc=$?
        say "northstar attempt $attempt rc=$rc"
        if [ $rc -eq 0 ] && [ -f northstar_result.json ]; then
            break
        fi
        sleep 30
    done
    commit_art "On-chip evidence: full-scale northstar run" \
        northstar_result.json ns_state/progress.json
}

STAGES=${*:-ab bench eambench tmab longrc northstar}
say "=== evidence_run: stages [$STAGES] ==="
for s in $STAGES; do
    "run_$s" || say "stage $s FAILED"
done
say "=== evidence_run: done ==="
