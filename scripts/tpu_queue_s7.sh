#!/bin/bash
# Session-7 measurement queue: BA-shape + n_iter ladder on the bench config.
# Run AFTER bench_chunk_ablation.py (serial device).
set -x
cd /root/repo
timeout 2400 python scripts/run_fullpipe_tpu.py 8 f16 devpromo heavy2 pf32 niter12 mf2048 \
  > benchlogs/q_lad_niter12_mf2048.log 2>&1
timeout 2400 python scripts/run_fullpipe_tpu.py 8 f16 devpromo heavy2 pf32 mf2048 \
  > benchlogs/q_lad_mf2048.log 2>&1
timeout 2400 python scripts/run_fullpipe_tpu.py 8 f16 devpromo heavy4 pf32 niter12 mf2048 \
  > benchlogs/q_lad_niter12_mf2048_h4.log 2>&1
echo S7 LADDER DONE
timeout 3000 python scripts/bench_chunk_ablation.py \
  > benchlogs/q_chunk_ablation.log 2>&1
echo S7 ABLATION DONE
