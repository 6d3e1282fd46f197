#!/bin/bash
# Priority-ordered hardware session; runs when the TPU tunnel returns.
# Round-5 final revision. Both single-query perf fronts are CLOSED with
# measured bound statements (docs/DESIGN.md round-5 section): lq=144 is
# shape-lattice-flat at ~255 (0.7% spread) and lq=17 is S-dot-bound at
# ~145-170 (the dot's M axis is wasted below 128 rows). The sweep steps
# are therefore confirms at HIGH-WORK measurement settings (--lb/--reps-hi
# high enough that per-sample time clears the tunnel noise floor — the
# round-5 lesson: lq=17 at lb=2048 swung 145->236 on noise; at lb=16384
# spreads collapse to <2%). Re-open the closed fronts ONLY on a toolchain
# bump (int16 vectors compiling, or the HTTP-500 chunked-40-chain family).
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
step "[3] lq=144 production confirm at high-work settings (bound: lattice flat at ~255)" 3600 python tools/ab_check.py --lq 144 --lb 8192 --reps-hi 17 --rounds 5 --include-production --cand 2,16,16,144,6,4 --cand 3,8,16,144,6,4
step "[4] lq=17 production confirm at high-work settings (bound: S-dot ~145-170)" 3600 python tools/ab_check.py --lq 17 --lb 16384 --reps-hi 33 --rounds 5 --include-production --cand 4,16,2,18,6,1 --cand 2,32,2,18,6,1
step "[5] row-stacked mq confirm of the round-5 (4,4,2) pack2 adoption" 3600 python tools/ab_check.py --nq 8 --lq 17 --lb 4096 --reps-hi 17 --rounds 5 --include-production --cand 2,4,2,144,6,2
step "[6] tpu_check --mq64 (aggregate vs single-query)" 2400 python tools/tpu_check.py --mq64
step "[7] longpair adopted-stripe confirm (v0 = production = packed stripes since round 5)" 2400 python tools/longpair_check.py --ab
step "[8] tpu_check production ladder (per-band table)" 3600 python tools/tpu_check.py
step "[9] drift-immune per-band const-S ceilings (ab_check --const-s; exp_pack --const-s is NOT drift-immune)" 2400 python tools/ab_check.py --lq 144 --lb 8192 --reps-hi 17 --rounds 5 --const-s --cand 4,8,16,144,6,4 --cand 2,16,16,144,6,4
echo "=== HW QUEUE DONE $(date) ===" >> $log
# Digest the whole log into adoption recommendations ending in a READY
# EDITS block (concrete _SHAPES_* lines) — an adoption can never strand
# in prose (VERDICT round-4 item 6). Pure stdlib, no TPU.
python tools/adopt.py $log > /tmp/adopt_report.txt 2>&1
echo "adoption report: /tmp/adopt_report.txt (rc=$?)" >> $log
