"""Synthetic benchmark corpus: geometry, gt correctness, protocol wiring."""

import os

import numpy as np
import pytest

from yoho_tpu.benchmark import rr
from yoho_tpu.data.dataset import SCENE_TABLES, FragmentDataset
from yoho_tpu.data.synthetic import (
    _overlap_ratio,
    generate_scene,
    make_room,
    register_synthetic_tables,
    render_fragment,
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    n = generate_scene(str(root), "scene_00", 6, seed=123)
    ds = FragmentDataset(os.path.join(str(root), "scene_00"), 6)
    ds.name = "synth_test/scene_00"
    return str(root), ds, n


def test_room_and_fragment_shapes():
    rng = np.random.default_rng(0)
    world = make_room(rng)
    assert world.shape[1] == 3 and len(world) > 50_000
    cam = world.mean(0) + np.array([0, 0, 1.0])
    frag = render_fragment(rng, world, cam, world.mean(0))
    assert len(frag) > 1000
    # occlusion: a frustum view must see far fewer points than the room
    assert len(frag) < 0.7 * len(world)


def test_gt_transforms_align_fragments(scene):
    _, ds, n = scene
    assert n >= 1
    for id0, id1 in ds.pair_ids:
        p0, p1 = ds.get_pc(id0), ds.get_pc(id1)
        T = ds.get_transform(id0, id1)
        p1in0 = p1 @ T[:3, :3].T + T[:3, 3]
        ov = _overlap_ratio(p0, p1in0)
        assert ov > 0.25, f"pair {id0}-{id1} misaligned (overlap {ov:.2f})"
        # rotations are arbitrary, NOT icosahedral-group elements
        from yoho_tpu.group import get_group

        G = get_group().rotations
        d = np.linalg.norm(G - T[:3, :3][None], axis=(1, 2)).min()
        assert d > 1e-3


def test_nonconsecutive_pairs_exist(scene):
    _, ds, _ = scene
    assert any(abs(int(a) - int(b)) > 1 for a, b in ds.pair_ids), (
        "RR protocol only counts non-consecutive pairs; corpus must have them"
    )


def test_oracle_rr_is_one_identity_zero(scene, tmp_path):
    _, ds, _ = scene
    cache = str(tmp_path / "cache")
    for sign, mk in [("YOHO_C", lambda T: T), ("YOHO_O", lambda T: np.eye(4))]:
        d = os.path.join(cache, "Testset", ds.name, "Match", sign, "1000iters")
        os.makedirs(d, exist_ok=True)
        pairs = [(a, b) for a, b in ds.pair_ids]
        trans = [mk(ds.get_transform(a, b))[:3] for a, b in ds.pair_ids]
        rr.write_trajectory(os.path.join(d, "pre.log"), pairs, trans, len(ds.pc_ids))
    datasets = {"wholesetname": "synth_test", "scene_00": ds}
    good, _, _ = rr.benchmark(datasets, cache, 1000, "YOHO_C")
    bad, _, _ = rr.benchmark(datasets, cache, 1000, "YOHO_O")
    assert good == 1.0
    assert bad == 0.0


def test_aligned_train_scene(tmp_path):
    n = generate_scene(str(tmp_path), "scene_00", 4, seed=7, aligned=True)
    ds = FragmentDataset(os.path.join(str(tmp_path), "scene_00"), 4)
    for id0, id1 in ds.pair_ids:
        T = ds.get_transform(id0, id1)  # (3, 4) per parse_gt_log
        assert np.allclose(T, np.eye(4)[:3])
        # clouds stored aligned: direct-distance pair mining must find pairs
        p0, p1 = ds.get_pc(id0), ds.get_pc(id1)
        assert _overlap_ratio(p0, p1) > 0.25


def test_register_tables(scene):
    root, _, _ = scene
    # registry scans {root}/synth_test — emulate the layout
    base = os.path.join(root, "..", "reg")
    os.makedirs(os.path.join(base, "synth_test"), exist_ok=True)
    os.symlink(
        os.path.join(root, "scene_00"),
        os.path.join(base, "synth_test", "scene_00"),
    )
    register_synthetic_tables(base)
    scenes, counts = SCENE_TABLES["synth_test"]
    assert scenes == ["scene_00"] and counts == [6]


def test_idempotent(scene):
    root, _, n = scene
    # second call must be a cheap cache hit returning the same pair count
    n2 = generate_scene(str(root), "scene_00", 6, seed=123)
    assert n2 == n


@pytest.mark.slow
def test_param_change_regenerates(tmp_path):
    """The .done sentinel encodes generation params: rescaling n_frag on
    a machine holding an older corpus must regenerate, not no-op
    (round-3 advisor medium finding)."""
    root = str(tmp_path)
    generate_scene(root, "s", 4, seed=9, aligned=True)
    pc = os.path.join(root, "s", "PointCloud")
    n_ply = len([f for f in os.listdir(pc) if f.endswith(".ply")])
    assert n_ply <= 4
    generate_scene(root, "s", 6, seed=9, aligned=True)
    n_ply2 = len([f for f in os.listdir(pc) if f.endswith(".ply")])
    assert n_ply2 > n_ply, "param change silently no-opped"
    # legacy bare-int sentinel (pre-round-4 corpora) also regenerates
    with open(os.path.join(root, "s", ".done"), "w") as f:
        f.write("12")
    n3 = generate_scene(root, "s", 6, seed=9, aligned=True)
    import json

    with open(os.path.join(root, "s", ".done")) as f:
        rec = json.load(f)
    assert rec["pairs"] == n3 and rec["params"]["n_frag"] == 6
