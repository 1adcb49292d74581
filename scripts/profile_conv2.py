"""Decompose sparse_conv cost: gather / mask / transpose / matmul,
and einsum variants that avoid the (K,M,C)->(M,K*C) relayout."""

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
    K, M, N, Cin, Cout = 27, 32768, 32768, 32, 32
    feats = jnp.asarray(rng.normal(size=(N, Cin)).astype(np.float32))
    idx = jnp.asarray(
        np.sort(rng.integers(0, N, size=(K, M)), axis=1).astype(np.int32)
    )
    valid = jnp.asarray(rng.random((K, M)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)

    def t(f, *a, reps=20):
        out = jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3

    g_only = jax.jit(lambda f, i: jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin))
    print(f"gather only          : {t(g_only, feats, idx):7.2f} ms")

    gm = jax.jit(
        lambda f, i, v: jnp.where(
            v[:, :, None], jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin), 0.0
        )
    )
    print(f"gather+mask          : {t(gm, feats, idx, valid):7.2f} ms")

    gmt = jax.jit(
        lambda f, i, v: jnp.where(
            v[:, :, None], jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin), 0.0
        )
        .transpose(1, 0, 2)
        .reshape(M, K * Cin)
    )
    print(f"gather+mask+transpose: {t(gmt, feats, idx, valid):7.2f} ms")

    full = jax.jit(
        lambda f, i, v: gmt._fun(f, i, v) @ w.reshape(K * Cin, Cout)
        if False
        else (
            jnp.where(
                v[:, :, None],
                jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin),
                0.0,
            )
            .transpose(1, 0, 2)
            .reshape(M, K * Cin)
            @ w.reshape(K * Cin, Cout)
        )
    )
    print(f"full (im2col matmul) : {t(full, feats, idx, valid):7.2f} ms")

    ein = jax.jit(
        lambda f, i, v: jnp.einsum(
            "kmc,kco->mo",
            jnp.where(
                v[:, :, None],
                jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin),
                0.0,
            ),
            w,
            preferred_element_type=jnp.float32,
        )
    )
    print(f"einsum kmc,kco->mo   : {t(ein, feats, idx, valid):7.2f} ms")

    # mask folded into matmul? masking via zeroing idx out-of-range with fill
    def fillgather(f, i, v):
        i2 = jnp.where(v, i, N)  # out-of-range -> fill 0
        g = jnp.take(f, i2.reshape(-1), axis=0, mode="fill", fill_value=0.0)
        return jnp.einsum("kmc,kco->mo", g.reshape(K, M, Cin), w,
                          preferred_element_type=jnp.float32)

    print(f"fill-gather einsum   : {t(jax.jit(fillgather), feats, idx, valid):7.2f} ms")

    # scan over K accumulating (avoids big intermediate)
    def scank(f, i, v):
        def body(acc, kiw):
            ik, vk, wk = kiw
            g = jnp.take(f, ik, axis=0)
            g = jnp.where(vk[:, None], g, 0.0)
            return acc + g @ wk, None

        acc0 = jnp.zeros((M, Cout), jnp.float32)
        out, _ = jax.lax.scan(body, acc0, (i, v, w))
        return out

    print(f"scan-K accumulate    : {t(jax.jit(scank), feats, idx, valid):7.2f} ms")

    # bf16 einsum
    einb = jax.jit(
        lambda f, i, v: jnp.einsum(
            "kmc,kco->mo",
            jnp.where(
                v[:, :, None],
                jnp.take(f.astype(jnp.bfloat16), i.reshape(-1), axis=0).reshape(K, M, Cin),
                jnp.bfloat16(0),
            ),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    print(f"einsum bf16          : {t(einb, feats, idx, valid):7.2f} ms")


if __name__ == "__main__":
    main()


def barrier_variants():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    K, M, N, Cin, Cout = 27, 32768, 32768, 32, 32
    feats = jnp.asarray(rng.normal(size=(N, Cin)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, N, size=(K, M)), axis=1).astype(np.int32))
    valid = jnp.asarray(rng.random((K, M)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)

    def t(f, *a, reps=20):
        out = jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3

    def barrier_im2col(f, i, v):
        g = jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin)
        g = jnp.where(v[:, :, None], g, 0.0)
        g = g.transpose(1, 0, 2).reshape(M, K * Cin)
        g = jax.lax.optimization_barrier(g)
        return g @ w.reshape(K * Cin, Cout)

    print(f"barrier im2col matmul: {t(jax.jit(barrier_im2col), feats, idx, valid):7.2f} ms")

    def barrier_kmc(f, i, v):
        g = jnp.take(f, i.reshape(-1), axis=0).reshape(K, M, Cin)
        g = jnp.where(v[:, :, None], g, 0.0)
        g = jax.lax.optimization_barrier(g)
        return jnp.einsum("kmc,kco->mo", g, w, preferred_element_type=jnp.float32)

    print(f"barrier kmc einsum   : {t(jax.jit(barrier_kmc), feats, idx, valid):7.2f} ms")

    def barrier_kmc_bf16(f, i, v):
        fb = f.astype(jnp.bfloat16)
        g = jnp.take(fb, i.reshape(-1), axis=0).reshape(K, M, Cin)
        g = jnp.where(v[:, :, None], g, jnp.bfloat16(0))
        g = jax.lax.optimization_barrier(g)
        return jnp.einsum("kmc,kco->mo", g, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    print(f"barrier kmc bf16     : {t(jax.jit(barrier_kmc_bf16), feats, idx, valid):7.2f} ms")

    # vmap BG=4 with barrier
    BG = 4
    featsB = jnp.asarray(rng.normal(size=(BG, N, Cin)).astype(np.float32))
    idxB = jnp.asarray(np.sort(rng.integers(0, N, size=(BG, K, M)), axis=2).astype(np.int32))
    validB = jnp.asarray(rng.random((BG, K, M)) < 0.4)
    vm = jax.jit(jax.vmap(barrier_kmc))
    print(f"barrier kmc vmap4    : {t(vm, featsB, idxB, validB)/BG:7.2f} ms/rot")


if __name__ == "__main__":
    barrier_variants()
