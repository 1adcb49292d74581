#!/bin/bash
# Continuation of r5_ladder_rest.sh from a given stage (idempotent
# stages resume from their caches). Usage: r5_ladder_rest2.sh [stage...]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for st in "$@"; do
  echo "=== ladder stage $st $(date +%H:%M:%S)"
  timeout 7200 python -u scripts/run_synth_ladder.py --stage $st \
    --trainset-scenes scene_00,scene_01,scene_02,scene_03,scene_04,scene_05,scene_06,scene_07,scene_08,scene_09,scene_10,scene_11,scene_12,scene_13,scene_14,scene_15 \
    >> ladder_logs/r5_ladder.log 2>&1
  rc=$?
  echo "    rc=$rc"
  if [ $rc -ne 0 ]; then echo "stage $st FAILED"; exit $rc; fi
done
echo "=== done $(date +%H:%M:%S)"
