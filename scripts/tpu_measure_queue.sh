#!/bin/bash
# Queued TPU measurements (run when the relay recovers). Each step is a
# fresh process with its own compile budget; logs under /tmp/q_*.log.
set -x
cd /root/repo

timeout 600 python /tmp/ab_dense.py > /tmp/q_ab_dense.log 2>&1
timeout 900 python scripts/bench_detect_tail.py > /tmp/q_detect_tail.log 2>&1
timeout 1800 python scripts/run_fullpipe_tpu.py 8 f16 devpromo heavy2 pf32 > /tmp/q_fullpipe_sync.log 2>&1
timeout 1800 python scripts/run_fullpipe_tpu.py 8 f16 asyncb devpromo heavy2 pf32 > /tmp/q_fullpipe_async.log 2>&1
timeout 900 python scripts/profile_track_pieces.py > /tmp/q_track_pieces.log 2>&1
timeout 900 python __graft_entry__.py > /tmp/q_entry.log 2>&1
echo QUEUE DONE
tail -1 /tmp/q_ab_dense.log
grep -h "ms / frame-equivalent\|detect_and_describe" /tmp/q_detect_tail.log
grep -h RESULT /tmp/q_fullpipe_sync.log /tmp/q_fullpipe_async.log
tail -1 /tmp/q_entry.log
