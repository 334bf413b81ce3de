#!/bin/bash
# Round-4 on-chip evidence, part 3: reruns the two bench.py measurements
# that part 2 lost to the bench.py UnboundLocalError (fixed in 28d3615),
# the vpu_probe bf16 legs lost to the scalar-bf16 Mosaic crash, and a
# J=24 kbench point (J=32 hit the 112M scoped-VMEM limit). Waits for
# part 2 (eambench/occupancy/northstar) to release the chip first.
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

while pgrep -f "bash scripts/evidence_run2.sh" > /dev/null; do sleep 30; done
say "part 3 start: part 2 done"

say "step 6: bench.py exact divide (headline, post-fix)"
NM_BENCH_WAIT_SECS=900 timeout 5400 python bench.py 2>>"$LOG" \
    | python scripts/record_progression.py "r4 exact-divide headline (post bench.py fix)" >> "$LOG" 2>&1
say "bench rc=$?"
commit_art "On-chip evidence: r4 headline bench (exact divide)"

say "step 7: vpu_probe rerun (bf16 legs, post scalar-f32 fix)"
timeout 2400 python scripts/vpu_probe.py >> "$LOG" 2>&1
say "vpu_probe rc=$?"
commit_art "On-chip evidence: VPU probe with bf16 issue-rate legs"

say "step 8: kbench 48:24 (J=24; J=32 exceeded scoped VMEM)"
timeout 1500 python scripts/kbench.py 48:24 >> "$LOG" 2>&1
say "kbench 48:24 rc=$?"
commit_art "On-chip evidence: kbench J=24 probe"

say "step 9: bench.py NM_FAST_RECIP=1 (full-scale A/B for the record)"
NM_FAST_RECIP=1 NM_BENCH_WAIT_SECS=600 timeout 5400 python bench.py 2>>"$LOG" \
    | python scripts/record_progression.py "r4 fast_recip full-scale A/B" >> "$LOG" 2>&1
say "bench fast_recip rc=$?"
commit_art "On-chip evidence: r4 full-scale fast_recip bench"

say "=== part 3 end ==="
