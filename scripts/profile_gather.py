"""Isolate the gather cost: random vs sorted indices, widths, formats."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    rng = np.random.default_rng(0)
    N, C = 32768, 32
    Q = 27 * 32768
    feats = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    idx_rand = rng.integers(0, N, size=Q).astype(np.int32)
    # per-offset sorted: 27 blocks of 32768 ascending indices
    idx_sorted = np.sort(rng.integers(0, N, size=(27, 32768)), axis=1).astype(np.int32).reshape(-1)

    def t(f, *a, reps=20):
        out = jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    print(f"take {Q} rows x {C}ch random : {t(take, feats, jnp.asarray(idx_rand))*1e3:7.2f} ms")
    print(f"take {Q} rows x {C}ch sorted : {t(take, feats, jnp.asarray(idx_sorted))*1e3:7.2f} ms")
    take128 = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    feats128 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    print(f"take {Q} rows x 128ch sorted: {t(take128, feats128, jnp.asarray(idx_sorted))*1e3:7.2f} ms")
    idx_small = jnp.asarray(np.sort(rng.integers(0, N, size=(27, 4096)), axis=1).astype(np.int32).reshape(-1))
    print(f"take {27*4096} rows x {C}ch sorted : {t(take, feats, idx_small)*1e3:7.2f} ms")

    # wide-row version: N rows of 864 floats
    featsW = jnp.asarray(rng.normal(size=(N, 27 * C)).astype(np.float32))
    idxN = jnp.asarray(np.sort(rng.integers(0, N, size=N)).astype(np.int32))
    takeW = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    print(f"take {N} rows x 864ch sorted: {t(takeW, featsW, idxN)*1e3:7.2f} ms")

    # dynamic-slice contiguous copy for reference
    copy = jax.jit(lambda x: x * 1.000001)
    big = jnp.asarray(rng.normal(size=(Q, C)).astype(np.float32))
    print(f"stream copy {Q}x{C}        : {t(copy, big)*1e3:7.2f} ms")

    # one-hot matmul alternative for small N (not viable at 32768) skipped.

    # roll (adjacent-shift) for reference
    roll = jax.jit(lambda x: jnp.roll(x, 1, axis=0))
    print(f"roll N rows                : {t(roll, feats)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
