#!/bin/bash
# Training launch script — the reference's scripts/run.sh configuration
# (lr 1e-3, batch 4, crop 320x640, seed 1024, SceneFlow, loss schedule JSON)
# on the TPU framework.  Reference: scripts/run.sh:2-38.

datapath=${DATAPATH:-/data/sceneflow}
trainlist=${TRAINLIST:-filenames/SceneFlow_finalpass_train.list}
vallist=${VALLIST:-filenames/SceneFlow_finalpass_val.txt}

python -m stereoformer_tpu.cli.train \
  --net LowCNN_gru \
  --loss config/loss_config_disp.json \
  --lr 1e-3 \
  --batch_size 4 \
  --test_batch 4 \
  --manualSeed 1024 \
  --dataset SceneFlow \
  --datapath "$datapath" \
  --trainlist "$trainlist" \
  --vallist "$vallist" \
  --maxdisp 192 \
  --train_iters 12 --eval_iters 12 \
  --outf ./saved_models --save_logdir ./logs "$@"
