#!/bin/bash
# Round-5 post-sweep chain: continue the WINNER arm to probe plateau,
# promote it to model/Backbone, rebuild trainset/PartI/PartII, evaluate,
# and write RESULTS.md. Winner tag (e.g. m07) is $1; target steps $2
# (default 2400).
set -u
WIN=${1:?winner tag, e.g. m07}
STEPS=${2:-2400}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== winner $WIN -> $STEPS steps $(date +%H:%M:%S)"
timeout 7200 python -u scripts/train_fcgf.py \
  --dataset synth_train --origin-dir ./data/origin_data \
  --model-dir model_sweep/$WIN --val-scenes scene_05 \
  --steps $STEPS --val-interval 200 --save-interval 200 \
  --neg-margin $(echo $WIN | sed 's/m0/0./') --batch-pairs 4 \
  > ladder_logs/r5_winner_train.log 2>&1
echo "    rc=$?"

echo "=== promote $WIN to model/Backbone $(date +%H:%M:%S)"
mkdir -p model/Backbone
cp model_sweep/$WIN/Backbone/model_best.pkl model/Backbone/model_best.pkl
cp model_sweep/$WIN/Backbone/model.pkl model/Backbone/model.pkl

for st in trainset part1 part2 eval results; do
  echo "=== ladder stage $st $(date +%H:%M:%S)"
  timeout 5400 python -u scripts/run_synth_ladder.py --stage $st \
    --trainset-scenes scene_00,scene_01,scene_02,scene_03,scene_04,scene_05,scene_06,scene_07,scene_08,scene_09,scene_10,scene_11,scene_12,scene_13,scene_14,scene_15 \
    >> ladder_logs/r5_ladder.log 2>&1
  rc=$?
  echo "    rc=$rc"
  if [ $rc -ne 0 ]; then echo "stage $st FAILED"; exit $rc; fi
done
echo "=== done $(date +%H:%M:%S)"
