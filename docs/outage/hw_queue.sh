#!/bin/bash
# Priority-ordered hardware session; runs when the TPU tunnel returns.
cd /root/repo
log=/tmp/hw_queue.log
echo "=== HW QUEUE START $(date) ===" >> $log

# /tmp/hw_queue_deadline (epoch seconds): past it, only the bench steps
# [0]/[1] run — a tunnel that returns minutes before round end must spend
# them on the official capture, not on sweeps (total step timeouts ~7.8h).
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

step "[0] bench.py --rehearse (tiny-shape two-program hardware rehearsal)" 420 python bench.py --rehearse
step "[1] bench.py official capture (warms the exact persistent-cache entries the driver's end-of-round run needs; 780s watchdog)" 900 python bench.py
step "[2] tpu_check --paths (production path validation incl. packed stream)" 2400 python tools/tpu_check.py --paths
step "[3] exp_pack sweep: all bands + chain-count candidates, 3 reps" 5400 python tools/exp_pack.py --lq 17 64 144 256 512 --repeat 3
step "[4] exp_pack upk=round vs floor at lq=144, 3 reps" 1800 python tools/exp_pack.py --lq 144 --upk round --repeat 3
step "[5] exp_pack row-stacked mq" 2400 python tools/exp_pack.py --mq 8 --lq 17 24 48
step "[6] tpu_check --mq64 (aggregate vs single-query)" 2400 python tools/tpu_check.py --mq64
step "[7] longpair hardware point (striped pipe0)" 2400 python tools/longpair_check.py
step "[8] longpair packed stripes (pipe6 pack4 full-height at 512 rows — fits since the nc==1 single-parity s_buf fix)" 2400 python tools/longpair_check.py --pipe 6 --pack 4 --ic 512 --stripe-rows 512 --verify-rows 1200
step "[8b] longpair packed stripes, 384-row variant" 1800 python tools/longpair_check.py --pipe 6 --pack 4 --ic 384 --stripe-rows 384 --verify-rows 1200
step "[9] tpu_check production ladder (per-band table)" 3600 python tools/tpu_check.py
step "[10] per-band constant-S ceilings (roofline)" 2400 python tools/exp_pack.py --lq 17 64 144 256 512 --const-s
echo "=== HW QUEUE DONE $(date) ===" >> $log
# Digest the whole log into adoption recommendations (pure stdlib, no TPU)
python tools/adopt.py $log > /tmp/adopt_report.txt 2>&1
echo "adoption report: /tmp/adopt_report.txt (rc=$?)" >> $log
