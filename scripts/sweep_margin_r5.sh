#!/bin/bash
# Round-5 m_neg sweep (VERDICT item 1): fresh init per arm, 48-scene
# corpus, batch-4 pair steps, probe-selected checkpoints. Serial on the
# one chip. 400 steps/arm = 1600 pair samples, ~1.6x the round-4 A/B
# evidence per arm (2.1 s/step at batch 4 makes 800-step arms a ~3 h
# sweep; the winner is then trained to probe plateau separately).
# Logs: ladder_logs/r5_sweep_m*.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for m in 0.7 0.6 0.8 0.5 0.9; do
  tag=${m/./}
  rm -rf model_sweep/m$tag
  echo "=== arm m_neg=$m $(date +%H:%M:%S)"
  timeout 2400 python -u scripts/train_fcgf.py \
    --dataset synth_train --origin-dir ./data/origin_data \
    --model-dir model_sweep/m$tag --val-scenes scene_05 \
    --steps 400 --val-interval 200 --save-interval 200 \
    --neg-margin $m --batch-pairs 4 \
    > ladder_logs/r5_sweep_m$tag.log 2>&1
  echo "    rc=$?"
done
echo "=== final uniform probe $(date +%H:%M:%S)"
timeout 1800 python -u scripts/probe_fcgf_matching.py \
  model_sweep/m05/Backbone/model_best.pkl \
  model_sweep/m06/Backbone/model_best.pkl \
  model_sweep/m07/Backbone/model_best.pkl \
  model_sweep/m08/Backbone/model_best.pkl \
  model_sweep/m09/Backbone/model_best.pkl \
  > ladder_logs/r5_sweep_probe.log 2>&1
echo "rc=$?; done $(date +%H:%M:%S)"
