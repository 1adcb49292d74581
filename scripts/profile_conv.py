"""Microbench sparse-conv variants on the real TPU.

Isolates one level-1-shaped conv (M=32768, Cin=Cout=32, K=27) and a
level-2 conv (M=16384, C=64) under different implementations:
chunked-f32 (current), full-f32, full-bf16.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    import jax.numpy as jnp

    from yoho_tpu.ops.kernel_map import KernelMap
    from yoho_tpu.ops.sparse_conv import sparse_conv

    rng = np.random.default_rng(0)
    BG = 4

    def bench_case(M, N, Cin, Cout, K=27, reps=10):
        feats = jnp.asarray(rng.normal(size=(BG, N, Cin)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(BG, K, M)).astype(np.int32))
        valid = jnp.asarray(rng.random((BG, K, M)) < 0.5)
        w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)

        def run(f, name):
            g = jax.jit(jax.vmap(lambda ff, ii, vv: f(ff, KernelMap(ii, vv))))
            out = jax.block_until_ready(g(feats, idx, valid))
            t0 = time.time()
            for _ in range(reps):
                out = g(feats, idx, valid)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / reps / BG
            print(f"  {name:18s} {dt*1e3:8.2f} ms/rot")
            return dt

        print(f"M={M} N={N} Cin={Cin} Cout={Cout} K={K}")
        run(lambda f, k: sparse_conv(f, k, w, row_chunk=4096), "chunked f32")
        run(lambda f, k: sparse_conv(f, k, w, row_chunk=1 << 30), "full f32")

        def full_bf16(f, k):
            fb = f.astype(jnp.bfloat16)
            K_, Mq = k.in_idx.shape
            g = jnp.take(fb, k.in_idx.reshape(-1), axis=0).reshape(K_, Mq, Cin)
            g = jnp.where(k.valid[:, :, None], g, jnp.bfloat16(0))
            g2 = g.transpose(1, 0, 2).reshape(Mq, K_ * Cin)
            return jax.lax.dot(
                g2, w.reshape(K_ * Cin, Cout).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        run(full_bf16, "full bf16")

        def onehot_dge(f, k):
            # no-gather variant: might lower to dynamic-gather anyway
            return None

        return

    bench_case(32768, 32768, 32, 32)
    bench_case(32768, 32768, 64 + 64, 64)  # decoder cat level 1
    bench_case(16384, 32768, 32, 64)  # down2
    bench_case(16384, 16384, 64, 64)
    bench_case(8192, 16384, 64, 128)
    bench_case(4096, 8192, 128, 256)


if __name__ == "__main__":
    main()
