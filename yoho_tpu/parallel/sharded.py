"""Device-sharded pipeline stages over the (data, group) mesh.

The reference cannot scale out: its lifting loops one (cloud, rotation)
at a time on one GPU (``YOHO_testset.py:109-168``) and its only
multi-device story is manual scene splitting (``README.md:167-169``).
Here the axes the reference streams over become mesh axes:

* **lift**  — clouds over ``data``, the 60-rotation group axis over
  ``group`` (embarrassingly parallel; each device lifts its rotation
  slice and the results concatenate along the group axis — zero
  cross-device traffic until the final all-gather of outputs).
* **match** — keypoint rows of cloud 0 over all devices; cloud 1's
  descriptors are all-gathered (32 floats x Kn — tiny next to the
  (Kn, Kn) distance work), column minima combine with one more
  all-gather: the descriptor-exchange pattern of SURVEY §5.8.
* **RANSAC** — fragment pairs over all devices (the TPU analog of the
  reference's one-process-per-pair pool, ``tests/estimator.py:269``).
* **FCGF training** — one fragment pair per device, gradients pmean'd
  over ``data`` (the DDP analog, ``examples/multigpu_ddp.py:82-91``).

All functions take the mesh explicitly and run under ``jax.jit`` with
``shard_map`` internals, so the same code drives 1 chip, a v4-8 slice,
or a multi-host pod (process-level scene sharding composes on top via
``jax.process_index``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from yoho_tpu.group import get_group
from yoho_tpu.pipeline.lifting import lift_rotations
from yoho_tpu.pipeline.matching import MatchResult, compact_matches
from yoho_tpu.pipeline.ransac import yoho_c_ransac, yoho_o_ransac


def _flat_axes(mesh) -> tuple[str, ...]:
    return tuple(mesh.axis_names)


def make_sharded_lift(
    mesh,
    fcgf_apply,
    voxel_size: float,
    conv1_kernel_size: int,
    rotations_per_batch: int = 5,
):
    """Jitted lift of a batch of clouds: (B, pad, 3) -> (B, Kn, 60, C).

    B is sharded over ``data`` (B % mesh.data == 0), the 60 rotations
    over ``group`` (60 % mesh.group == 0, and the per-device slice must
    be divisible by ``rotations_per_batch`` — 5 works for any group
    size in {1, 2, 3, 4, 6, 12}).
    """
    n_group = mesh.shape["group"]
    assert 60 % n_group == 0, f"group axis {n_group} must divide 60"
    g_local = 60 // n_group
    bg = rotations_per_batch
    while g_local % bg:
        bg -= 1
    Rg = jnp.asarray(get_group().rotations, jnp.float32)

    def body(variables, points, n_valid, keys, rots):
        # local shapes: points (B_l, pad, 3), rots (g_l, 3, 3)
        def one_cloud(args):
            pts, n, k = args
            return lift_rotations(
                fcgf_apply, variables, pts, n, k, rots,
                voxel_size, conv1_kernel_size, rotations_per_batch=bg,
            )

        out = jax.lax.map(one_cloud, (points, n_valid, keys))
        return out  # (B_l, g_l, Kn, C)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("group")),
        out_specs=P("data", "group"),
        check_vma=False,
    )

    @jax.jit
    def lift_batch(variables, points, n_valid, keys):
        out = sharded(variables, points, n_valid, keys, Rg)
        return out.transpose(0, 2, 1, 3)  # (B, Kn, 60, C)

    return lift_batch


def make_sharded_match(mesh):
    """Jitted mutual matching with cloud-0 keypoint rows sharded over
    every device; returns the same MatchResult as
    ``pipeline.matching.mutual_match``."""
    axes = _flat_axes(mesh)

    def body(inv0_l, inv1):
        # inv0_l: (Kn/n, C) local rows; inv1: (Kn, C) replicated
        kn_l = inv0_l.shape[0]
        shard = jax.lax.axis_index(axes)
        row0 = shard * kn_l  # global row offset of this shard
        sq0 = jnp.sum(inv0_l * inv0_l, axis=1)
        sq1 = jnp.sum(inv1 * inv1, axis=1)
        d = sq0[:, None] - 2.0 * (inv0_l @ inv1.T) + sq1[None, :]
        nn0in1_l = jnp.argmin(d, axis=1).astype(jnp.int32)
        # column minima: combine local (val, argrow) across shards
        colmin_l = jnp.min(d, axis=0)
        colarg_l = row0 + jnp.argmin(d, axis=0).astype(jnp.int32)
        colmin_all = jax.lax.all_gather(colmin_l, axes)  # (n, Kn)
        colarg_all = jax.lax.all_gather(colarg_l, axes)
        which = jnp.argmin(colmin_all, axis=0)
        nn1in0 = jnp.take_along_axis(colarg_all, which[None, :], axis=0)[0]
        mutual_l = nn1in0[nn0in1_l] == (row0 + jnp.arange(kn_l, dtype=jnp.int32))
        return nn0in1_l, mutual_l

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=(P(axes), P(axes)),
        check_vma=False,
    )

    @jax.jit
    def match(inv0, inv1) -> MatchResult:
        nn0in1, mutual = sharded(inv0, inv1)
        return compact_matches(nn0in1, mutual)

    return match


def make_sharded_ransac_c(mesh, max_iter: int, inlier_dist: float,
                          refine_iters: int = 0):
    """Jitted YOHO-C RANSAC over a batch of fragment pairs, pairs
    sharded across every device (vmapped lanes within a device)."""
    axes = _flat_axes(mesh)
    spec = NamedSharding(mesh, P(axes))

    v = jax.vmap(
        functools.partial(yoho_c_ransac, max_iter=max_iter,
                          inlier_dist=inlier_dist, refine_iters=refine_iters)
    )

    @functools.partial(
        jax.jit,
        in_shardings=(spec, spec, spec, spec, spec, spec),
        out_shardings=NamedSharding(mesh, P(axes)),
    )
    def run(keys, keys0, keys1, pairs, mask, dr):
        return v(keys, keys0, keys1, pairs, mask, dr)

    return run


def make_sharded_ransac_o(mesh, inlier_dist: float, refine_iters: int = 0):
    axes = _flat_axes(mesh)
    spec = NamedSharding(mesh, P(axes))
    v = jax.vmap(functools.partial(yoho_o_ransac, inlier_dist=inlier_dist,
                                   refine_iters=refine_iters))

    @functools.partial(
        jax.jit,
        in_shardings=(spec,) * 5,
        out_shardings=NamedSharding(mesh, P(axes)),
    )
    def run(keys0, keys1, pairs, mask, transforms):
        return v(keys0, keys1, pairs, mask, transforms)

    return run


def make_fcgf_train_step_dp(
    mesh, model, optimizer, voxel_size, conv1_kernel_size,
    pos_margin: float = 0.1, neg_margin: float = 1.4,
):
    """Data-parallel FCGF training: one fragment pair per ``data``-axis
    device, gradients and batch stats pmean'd (DDP analog, reference
    ``MinkowskiEngine/examples/multigpu_ddp.py:82-91``).

    batch leaves carry a leading device axis of size mesh.data.
    Equivalent to single-device training on the mean of the per-pair
    gradients (tested in ``tests/test_sharded.py``).
    """
    from yoho_tpu.train.fcgf import fcgf_grads
    from yoho_tpu.train.steps import TrainState
    import optax

    def body(state, batch, key):
        local = jax.tree.map(lambda x: x[0], batch)  # this device's pair
        keys = jax.random.split(key, mesh.shape["data"])
        k = keys[jax.lax.axis_index("data")]
        grads, new_stats, metrics = fcgf_grads(
            model, state, local, voxel_size, conv1_kernel_size, k,
            pos_margin=pos_margin, neg_margin=neg_margin,
        )
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        metrics = jax.lax.pmean(metrics, "data")
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, metrics

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
