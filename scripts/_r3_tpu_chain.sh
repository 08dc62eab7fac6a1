#!/bin/bash
# Round-3 TPU measurement chain (run sequentially — ONE axon client at a
# time).  Each stage writes its own log under /tmp.
set -x
cd /root/repo

# 0. device trace of the final-config flagship vag (attribution of what
#    remains after the three negative-verdict levers)
python scripts/_vag_trace.py /tmp/vag_trace_r3 bf16 > /tmp/vag_trace.log 2>&1

# 0b. bench.py pre-warm (driver budget: warm the exact graphs incl. the
#     new RAFT rows)
python bench.py > /tmp/bench_prewarm.json 2>/tmp/bench_prewarm.log

# 1. RAFT train-step phase decomposition (verdict item 4)
python scripts/train_phase_bench.py bf16 RAFT_Stereo > /tmp/raft_phase.log 2>&1

# 2. RAFT extended synthetic convergence (verdict item 5): the flagship's
#    extended config — 256 pairs, 30 epochs, held-out val
python -m stereoformer_tpu.cli.train --dataset dummy:256 --net RAFT_Stereo \
  --loss_name sequence --dtype bf16 --epochs 30 --batch_size 4 \
  --crop_h 320 --crop_w 640 --train_iters 12 --eval_iters 12 \
  --lr 2e-4 --test_batch 2 \
  --outf /tmp/r3_raft_ext --save_logdir /tmp/r3_raft_ext_logs \
  > /tmp/raft_ext.log 2>&1

# 3. CrossAttention extended synthetic convergence
python -m stereoformer_tpu.cli.train --dataset dummy:256 \
  --net CrossAttentionStereo --loss_name sequence --dtype bf16 \
  --epochs 30 --batch_size 4 --crop_h 320 --crop_w 640 \
  --lr 1e-3 --test_batch 2 \
  --outf /tmp/r3_cross_ext --save_logdir /tmp/r3_cross_ext_logs \
  > /tmp/cross_ext.log 2>&1
