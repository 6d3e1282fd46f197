#!/bin/bash
# Priority-ordered hardware session; runs when the TPU tunnel returns.
# Round-5 revision: upk=round and pipe 1-4/7 steps dropped (modes pruned
# after losing the round-4 A/Bs); packed stripes are ADOPTED, so the
# stripe step is now a production-confirm A/B; the sweep steps focus on
# the two open perf fronts (lq=144 toward the ~321 GCUPS cost-model
# bound, lq=17 toward >=45% of ceiling).
cd /root/repo
log=/tmp/hw_queue.log
echo "=== HW QUEUE START $(date) ===" >> $log

# /tmp/hw_queue_deadline (epoch seconds): past it, only the bench steps
# [0]/[1] run — a tunnel that returns minutes before round end must spend
# them on the official capture, not on sweeps.
DEADLINE_FILE=/tmp/hw_queue_deadline
step() {
  name="$1"; shift
  dl=$(cat $DEADLINE_FILE 2>/dev/null || echo 9999999999)
  case "$name" in
    "[0]"*|"[1]"*) ;;
    *) if [ "$(date +%s)" -gt "$dl" ]; then
         echo "--- $name SKIPPED past deadline ---" >> $log
         return
       fi ;;
  esac
  echo "--- $name @ $(date -u +%FT%TZ) ---" >> $log
  timeout "$@" >> $log 2>&1
  echo "rc=$?" >> $log
}

step "[0] bench.py --rehearse (tiny-shape three-program hardware rehearsal)" 700 python bench.py --rehearse
step "[1] bench.py official capture (warms the exact persistent-cache entries the driver's end-of-round run needs; 780s watchdog)" 1500 python bench.py
step "[2] tpu_check --paths (production path validation incl. packed stream + adopted stripe)" 2400 python tools/tpu_check.py --paths
step "[3] drift-immune lq=144 A/B: production vs more-chain challengers (freed-VMEM lever, VERDICT r4 item 3)" 3600 python tools/ab_check.py --lq 144 --rounds 5 --include-production --cand 5,8,16,144,6,4 --cand 6,8,16,144,6,4 --cand 4,4,16,144,6,4
step "[4] drift-immune lq=17 A/B: production vs adjacent feasible high-chain stacks (VERDICT r4 item 4)" 3600 python tools/ab_check.py --lq 17 --rounds 5 --include-production --cand 6,8,2,18,6,2 --cand 7,8,2,18,6,2 --cand 6,8,2,20,6,4
step "[5] exp_pack row-stacked mq confirm" 2400 python tools/exp_pack.py --mq 8 --lq 17 24 48
step "[6] tpu_check --mq64 (aggregate vs single-query)" 2400 python tools/tpu_check.py --mq64
step "[7] longpair adopted-stripe confirm (v0 = production = packed stripes since round 5)" 2400 python tools/longpair_check.py --ab
step "[8] tpu_check production ladder (per-band table)" 3600 python tools/tpu_check.py
step "[9] per-band constant-S ceilings (roofline refresh)" 2400 python tools/exp_pack.py --lq 17 64 144 256 512 --const-s
echo "=== HW QUEUE DONE $(date) ===" >> $log
# Digest the whole log into adoption recommendations ending in a READY
# EDITS block (concrete _SHAPES_* lines) — an adoption can never strand
# in prose (VERDICT round-4 item 6). Pure stdlib, no TPU.
python tools/adopt.py $log > /tmp/adopt_report.txt 2>&1
echo "adoption report: /tmp/adopt_report.txt (rc=$?)" >> $log
