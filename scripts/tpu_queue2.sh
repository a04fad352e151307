#!/bin/bash
# Round-4 follow-up measurements (after tpu_measure_queue.sh): diagnose the
# dense-BA shape cliff (0.72 ms @ W16/M1024 -> 121 ms @ W32/M4096) and the
# still-pathological sparse solve, plus the track-step piece breakdown.
set -x
cd /root/repo
mkdir -p benchlogs

timeout 1800 python scripts/profile_ba_pieces2.py > benchlogs/q_ba_pieces2.log 2>&1
timeout 1200 python scripts/profile_track_pieces.py > benchlogs/q_track_pieces.log 2>&1

echo QUEUE2 DONE
