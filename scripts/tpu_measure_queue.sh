#!/bin/bash
# Round-4 queued TPU measurements (run when the relay recovers). Each step
# is a fresh process with its own compile budget; logs persist under
# benchlogs/ (VERDICT r3 next #7 — every number traceable to a file).
set -x
cd /root/repo
mkdir -p benchlogs

# 1. The driver bench itself: validates the shipped full-pipeline config on
#    device + the new honest-BA/MFU/multiseq/pose-graph metrics.
timeout 3300 python bench.py > benchlogs/q_bench.log 2>&1

# 2. Dense vs sparse BA A/B (one-hot lowering) at W=32/64.
timeout 1200 python scripts/bench_ba_sparse.py > benchlogs/q_ba_sparse.log 2>&1

# 3. Ragged-descriptor detect-tail A/B (flip the default if it wins).
timeout 1200 python scripts/bench_detect_tail.py > benchlogs/q_detect_tail.log 2>&1

# 4. Full-pipeline ladder around the shipped config.
timeout 1800 python scripts/run_fullpipe_tpu.py 8 f16 devpromo heavy2 pf32 > benchlogs/q_fullpipe_c8h2.log 2>&1
timeout 1800 python scripts/run_fullpipe_tpu.py 12 f16 devpromo heavy2 pf32 > benchlogs/q_fullpipe_c12h2.log 2>&1
timeout 1800 python scripts/run_fullpipe_tpu.py 16 f16 devpromo heavy3 pf32 > benchlogs/q_fullpipe_c16h3.log 2>&1

# 4b. Per-stage breakdown of the full-pipeline loop (the north-star ceiling
#     evidence if 30 FPS stays out of reach).
timeout 1800 python scripts/profile_full_pipeline.py > benchlogs/q_fullpipe_stages.log 2>&1

# 5. Place recognition at map scale on the device path.
timeout 1500 python scripts/bench_place_recognition.py > benchlogs/q_place_recognition.log 2>&1

# 6. Graft entry sanity.
timeout 900 python __graft_entry__.py > benchlogs/q_entry.log 2>&1

echo QUEUE DONE
grep -h '"metric"' benchlogs/q_bench.log | tail -1
grep -h RESULT benchlogs/q_fullpipe_*.log
tail -1 benchlogs/q_entry.log
