"""Worker for the 2-process jax.distributed test (run via subprocess by
``tests/test_multihost.py``; reference analog: torch DDP bootstrap in
``MinkowskiEngine/examples/multigpu_ddp.py:82-91``).

Each process hosts 2 virtual CPU devices -> a 4-device global mesh.
Exercises the real multi-process stack end to end:
``maybe_initialize`` -> ``shard_items`` -> cross-process psum ->
a pmean'd data-parallel FCGF train step -> ``barrier`` -> prints a
params digest that must agree bit-exactly across processes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from yoho_tpu.parallel.multihost import barrier, maybe_initialize, shard_items

    assert maybe_initialize(), "coordinator env vars must trigger init"
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mine = shard_items(list(range(10)))
    print(f"SHARD {pid} {sorted(mine)}", flush=True)

    # cross-process device collective: psum of (process_index + 1) over
    # every global device = 2 * (1 + 2) = 6
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(jnp.asarray([pid + 1.0])).sum()
    print(f"ALLGATHER {pid} {float(total):.1f}", flush=True)
    assert float(total) == 3.0

    # pmean'd FCGF data-parallel step over the global 4-device mesh
    # (one fragment pair per device, 2 of them on the other process)
    import optax

    from yoho_tpu.config import default_config
    from yoho_tpu.data.fcgf_pairs import make_fcgf_batch
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.parallel.mesh import make_mesh
    from yoho_tpu.parallel.sharded import make_fcgf_train_step_dp
    from yoho_tpu.train.steps import init_train_state

    cfg = default_config()
    pad, vs = 2048, cfg.backbone.voxel_size
    model = SparseResUNet(cfg.backbone)
    pts0 = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, vs, 10))(pts0)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )
    opt = optax.adam(1e-3)
    state = init_train_state(variables, opt)

    # identical global batch on every process (deterministic rng), each
    # process feeds its local quarter of the leading axis
    rng = np.random.default_rng(5)
    cloud = rng.normal(size=(900, 3)).astype(np.float32) * 0.5
    bs = [
        make_fcgf_batch(
            cloud, cloud + rng.normal(scale=0.001, size=cloud.shape).astype(np.float32),
            vs, pad, n_pos=64, rng=np.random.default_rng(11 + i),
        )
        for i in range(4)
    ]
    global_batch = {k: np.stack([b[k] for b in bs]) for k in bs[0]}
    lo, hi = pid * 2, pid * 2 + 2
    local_batch = {k: v[lo:hi] for k, v in global_batch.items()}

    mesh = make_mesh(4, 1)
    step = make_fcgf_train_step_dp(mesh, model, opt, vs, cfg.backbone.conv1_kernel_size)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    dev_batch = {
        k: jax.make_array_from_process_local_data(sh, v, global_shape=(4,) + v.shape[1:])
        for k, v in local_batch.items()
    }
    with mesh:
        state2, metrics = step(state, dev_batch, jax.random.PRNGKey(0))
    loss = float(jax.device_get(metrics["loss"]))
    print(f"LOSS {pid} {loss:.6f}", flush=True)

    # bit-exact agreement of the replicated updated params across
    # processes (grads were pmean'd)
    leaves = jax.tree.leaves(jax.device_get(state2.params))
    digest = float(sum(np.float64(np.asarray(l).sum()) for l in leaves))
    barrier("test-multihost")
    print(f"DIGEST {pid} {digest:.10e}", flush=True)
    print(f"OK {pid}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
