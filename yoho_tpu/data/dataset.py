"""Evaluation datasets: 3DMatch/3DLoMatch/ETH/WHU-TLS/demo layouts.

Re-implements the reference data layer
(``/root/reference/utils/dataset.py:22-238``): the on-disk layout
(``PointCloud/cloud_bin_k.ply``, ``PointCloud/gt.log``,
``Keypoints/cloud_bin_kKeypoints.txt``, ``Keypoints_PC/*.npy``), the
gt.log parser, the keypoint loader with random-5000 fallback, and the
hard-coded scene/station tables. Pure numpy + our own PLY reader.

Transform convention (reference ``utils/dataset.py:40-44``):
``R @ pts1 + t = pts0`` — id0 is the target, id1 the source.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from yoho_tpu.utils.ply import read_ply

# scene name -> fragment counts (reference utils/dataset.py:160-226)
SCENE_TABLES: Dict[str, Tuple[List[str], List[int]]] = {
    "demo": (["kitchen"], [2]),
    "3dmatch": (
        [
            "kitchen",
            "sun3d-home_at-home_at_scan1_2013_jan_1",
            "sun3d-home_md-home_md_scan9_2012_sep_30",
            "sun3d-hotel_uc-scan3",
            "sun3d-hotel_umd-maryland_hotel1",
            "sun3d-hotel_umd-maryland_hotel3",
            "sun3d-mit_76_studyroom-76-1studyroom2",
            "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
        ],
        [60, 60, 60, 55, 57, 37, 66, 38],
    ),
    "ETH": (
        ["gazebo_summer", "gazebo_winter", "wood_autumn", "wood_summer"],
        [32, 31, 32, 37],
    ),
    "WHU-TLS": (
        ["Park", "Mountain", "Campus", "RiverBank", "UndergroundExcavation", "Tunnel"],
        [32, 6, 10, 7, 12, 7],
    ),
}
# 3DLoMatch reuses the 3dmatch clouds with gtLo.log (dataset.py:176-189)
SCENE_TABLES["3dLomatch"] = SCENE_TABLES["3dmatch"]

TRAIN_SCENES = (
    ['bundlefusion-apt0', 'rgbd-scenes-v2-scene_02', 'bundlefusion-office1',
     'sun3d-brown_cogsci_1-brown_cogsci_1', 'rgbd-scenes-v2-scene_06',
     'analysis-by-synthesis-apt2-kitchen', 'rgbd-scenes-v2-scene_03',
     'bundlefusion-apt1', 'sun3d-harvard_c8-hv_c8_3', 'bundlefusion-copyroom',
     'sun3d-home_bksh-home_bksh_oct_30_2012_scan2_erika', 'rgbd-scenes-v2-scene_04',
     '7-scenes-pumpkin', 'rgbd-scenes-v2-scene_01', 'analysis-by-synthesis-office2-5a',
     'sun3d-brown_bm_1-brown_bm_1', 'bundlefusion-apt2', 'sun3d-brown_cs_2-brown_cs2',
     'bundlefusion-office2', 'sun3d-hotel_sf-scan1', 'sun3d-hotel_nips2012-nips_4',
     'bundlefusion-office3', 'rgbd-scenes-v2-scene_09', 'rgbd-scenes-v2-scene_05',
     'rgbd-scenes-v2-scene_07', '7-scenes-heads', 'sun3d-harvard_c3-hv_c3_1',
     'rgbd-scenes-v2-scene_08', 'sun3d-mit_76_417-76-417b', 'sun3d-mit_32_d507-d507_2',
     'sun3d-mit_46_ted_lab1-ted_lab_2', '7-scenes-chess', 'rgbd-scenes-v2-scene_10',
     'sun3d-harvard_c11-hv_c11_2', 'analysis-by-synthesis-apt2-living',
     'sun3d-mit_w20_athena-sc_athena_oct_29_2012_scan1_erika',
     'analysis-by-synthesis-apt1-living', 'analysis-by-synthesis-apt1-kitchen',
     'sun3d-mit_dorm_next_sj-dorm_next_sj_oct_30_2012_scan1_erika', '7-scenes-stairs',
     'sun3d-brown_bm_4-brown_bm_4', 'bundlefusion-office0', 'sun3d-harvard_c6-hv_c6_1',
     'rgbd-scenes-v2-scene_14', 'rgbd-scenes-v2-scene_12',
     'analysis-by-synthesis-office2-5b', 'analysis-by-synthesis-apt2-luke',
     '7-scenes-office', 'sun3d-harvard_c5-hv_c5_1', 'sun3d-brown_cs_3-brown_cs3',
     '7-scenes-fire', 'rgbd-scenes-v2-scene_11', 'analysis-by-synthesis-apt2-bed',
     'rgbd-scenes-v2-scene_13'],
    [85, 8, 57, 28, 10, 9, 8, 84, 10, 44, 96, 8, 54, 8, 14, 65, 38, 52, 34, 92, 62,
     37, 7, 11, 9, 18, 19, 9, 77, 54, 75, 54, 7, 8, 10, 70, 15, 11, 26, 24, 32, 60,
     15, 6, 7, 17, 19, 90, 20, 34, 36, 6, 10, 4],
)
SCENE_TABLES["3dmatch_train"] = TRAIN_SCENES
VAL_SCENES = [
    "sun3d-brown_bm_4-brown_bm_4",
    "sun3d-harvard_c11-hv_c11_2",
    "7-scenes-heads",
    "rgbd-scenes-v2-scene_10",
    "bundlefusion-office0",
    "analysis-by-synthesis-apt2-kitchen",
]


def parse_gt_log(path: str) -> Dict[Tuple[str, str], np.ndarray]:
    """gt.log -> {(id0, id1): 3x4 transform} (reference
    ``ThrDMatchPartDataset.parse_gt_fn``, utils/dataset.py:73-89)."""
    out: Dict[Tuple[str, str], np.ndarray] = {}
    with open(path) as f:
        lines = f.readlines()
    for k in range(len(lines) // 5):
        head = np.fromstring(lines[k * 5], dtype=np.float64, sep="\t")
        if head.size < 2:
            head = np.fromstring(lines[k * 5], dtype=np.float64, sep=" ")
        id0, id1 = int(head[0]), int(head[1])
        rows = [
            np.fromstring(lines[k * 5 + 1 + r], dtype=np.float64, sep=" ")[:4]
            for r in range(3)
        ]
        out[(str(id0), str(id1))] = np.stack(rows, axis=0)
    return out


class FragmentDataset:
    """One scene of fragments with ground-truth pairs — the equivalent
    of ``ThrDMatchPartDataset``."""

    def __init__(self, root: str, station_num: int, gt_path: str | None = None):
        self.root = root
        self.station_num = station_num
        self.gt_dir = gt_path or os.path.join(root, "PointCloud", "gt.log")
        self.pair_id2transform = parse_gt_log(self.gt_dir)
        self.pair_ids = list(self.pair_id2transform.keys())
        self.pc_ids = [str(k) for k in range(station_num)]
        self.name = os.path.basename(root)

    def get_pair_ids(self):
        return self.pair_ids

    def get_cloud_ids(self):
        return self.pc_ids

    def get_transform(self, id0: str, id1: str) -> np.ndarray:
        return self.pair_id2transform[(str(id0), str(id1))]

    def _ply_path(self, pc_id) -> str:
        return os.path.join(self.root, "PointCloud", f"cloud_bin_{int(pc_id)}.ply")

    def get_pc(self, pc_id) -> np.ndarray:
        p = self._ply_path(pc_id)
        if os.path.exists(p):
            return read_ply(p)
        txt = os.path.join(self.root, "PointCloud", f"cloud_bin_{int(pc_id)}.txt")
        return np.loadtxt(txt, delimiter=",")

    def get_kps(self, pc_id) -> np.ndarray:
        """Keypoint coordinates; mirrors the reference's cache-or-sample
        behavior (utils/dataset.py:123-143): use Keypoints_PC cache, else
        Keypoints txt indices, else random-5000 sample (persisted)."""
        npy = os.path.join(
            self.root, "Keypoints_PC", f"cloud_bin_{int(pc_id)}Keypoints.npy"
        )
        if os.path.exists(npy):
            return np.load(npy)
        txt = os.path.join(self.root, "Keypoints", f"cloud_bin_{int(pc_id)}Keypoints.txt")
        pc = self.get_pc(pc_id)
        if os.path.exists(txt):
            idx = np.loadtxt(txt).astype(np.int64)
        else:
            idx = np.random.permutation(pc.shape[0])[:5000]
            os.makedirs(os.path.dirname(txt), exist_ok=True)
            np.savetxt(txt, idx)
        keys = pc[idx]
        os.makedirs(os.path.dirname(npy), exist_ok=True)
        np.save(npy, keys)
        return keys


def get_datasets(dataset_name: str, origin_data_dir: str) -> Dict[str, FragmentDataset]:
    """Name -> {scene: FragmentDataset, 'wholesetname': name}
    (reference ``get_dataset_name``, utils/dataset.py:146-229)."""
    if dataset_name not in SCENE_TABLES and dataset_name.startswith("synth"):
        # synthetic corpora register themselves by scanning what
        # data/synthetic.py emitted under origin_data_dir
        from yoho_tpu.data.synthetic import register_synthetic_tables

        register_synthetic_tables(origin_data_dir)
    if dataset_name not in SCENE_TABLES:
        raise NotImplementedError(f"unknown dataset {dataset_name!r}")
    scenes, stations = SCENE_TABLES[dataset_name]
    datasets: Dict[str, FragmentDataset] = {}
    datasets["wholesetname"] = dataset_name  # type: ignore[assignment]
    source = "3dmatch" if dataset_name == "3dLomatch" else dataset_name
    for scene, n in zip(scenes, stations):
        root = os.path.join(origin_data_dir, source, scene)
        gt = (
            os.path.join(root, "PointCloud", "gtLo.log")
            if dataset_name == "3dLomatch"
            else None
        )
        ds = FragmentDataset(root, n, gt)
        ds.name = f"{dataset_name}/{scene}"
        datasets[scene] = ds
    return datasets
