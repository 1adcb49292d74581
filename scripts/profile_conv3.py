"""Per-layer sparse-conv benchmark across XLA variants, at the real
ResUNetBN2C shapes the lift runs (bg=4 x nv=16384 buckets).

This is the measurement the production conv-variant decision rests on
(the reference analog being replaced is the gather-GEMM-scatter CUDA
loop, ``/root/reference/MinkowskiEngine/src/convolution_kernel.cu:
115-180``). A fused Pallas gather->MXU kernel used to be the fifth
column; it was removed after this script showed (a) Mosaic cannot lower
its in-kernel row gather at any layer shape and (b) the XLA variants
are all within ~15% of each other — see docs/PERF.md for the committed
numbers and rationale.

Run on the real chip: PYTHONPATH=/root/repo python scripts/profile_conv3.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, N_in, M_out, Cin, Cout) at lift scale bg*nv = 65536
LAYERS = [
    ("b1 32@64k", 65536, 65536, 32, 32),
    ("down2 32->64", 65536, 16384, 32, 64),
    ("b2 64@16k", 16384, 16384, 64, 64),
    ("down3 64->128", 16384, 4096, 64, 128),
    ("b4 128@4k", 4096, 4096, 128, 128),
    ("down4 128->256", 4096, 1024, 128, 256),
    ("b8 256@1k", 1024, 1024, 256, 256),
    ("up4 256->128", 1024, 4096, 256, 128),
    ("up3 256->64", 4096, 16384, 256, 64),
    ("up2 128->64", 16384, 65536, 128, 64),
    ("dec b1 64@64k", 65536, 65536, 64, 64),
]
K = 27


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from yoho_tpu.ops.kernel_map import KernelMap
    from yoho_tpu.ops.sparse_conv import sparse_conv

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    def bench(variant, feats, kmap, w, reps=20):
        """Time `reps` chained convs inside one jitted lax.scan.

        Each iteration's features depend on the previous output
        (negligible perturbation), so the device MUST execute every
        conv — a plain enqueue-N-identical-calls loop measured absurd
        >600 TFLOP/s through the remote-execution tunnel (results of
        identical dispatches are evidently deduplicated), which is how
        an earlier version of this script mis-called the totals."""

        def body(f, _):
            o = sparse_conv(f, kmap, w, variant=variant)
            return f * (1.0 + 1e-30 * o[0, 0]), ()

        @jax.jit
        def run(f):
            return jax.lax.scan(body, f, None, length=reps)[0]

        # warmup and timed runs must NOT be identical dispatches (same
        # executable + same buffer): the tunnel dedups those and the
        # timed call can read ~0. Perturb the input in between.
        jax.block_until_ready(run(feats))  # compile + warmup
        feats_t = feats * (1.0 + 1e-6)
        t0 = time.time()
        jax.block_until_ready(run(feats_t))
        return (time.time() - t0) / reps * 1e3

    variants = ["unrolled", "im2col", "einsum", "einsum_bf16"]
    header = f"{'layer':16s} " + " ".join(f"{v:>12s}" for v in variants)
    print(header)
    results = {}
    for name, N, M, Cin, Cout in LAYERS:
        feats = jnp.asarray(rng.normal(size=(N, Cin)).astype(np.float32))
        # ~74% fill like real kernel maps; sorted per offset (monotone)
        idx = jnp.asarray(
            np.sort(rng.integers(0, N - 1, size=(K, M)), axis=1).astype(np.int32)
        )
        validm = rng.random((K, M)) < 0.74
        idx = jnp.where(jnp.asarray(validm), idx, N - 1)
        kmap = KernelMap(in_idx=idx, valid=jnp.asarray(validm))
        w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)
        flops = 2 * K * M * Cin * Cout

        row = []
        for v in variants:
            try:
                ms = bench(v, feats, kmap, w)
                row.append(ms)
            except Exception as e:  # Mosaic compile failures etc.
                print(f"  {name} {v}: FAILED {type(e).__name__}: {e}", flush=True)
                row.append(float("nan"))
        results[name] = row
        cells = " ".join(
            f"{x:10.3f}ms" if isinstance(x, float) and x == x else f"{'--':>12s}"
            for x in row
        )
        best = min([x for x in row if isinstance(x, float) and x == x])
        print(f"{name:16s} {cells}   best {flops/best/1e9:7.2f} TFLOP/s", flush=True)

    # totals per variant over all layers (missing -> unrolled fallback)
    print("\ntotals (fallback to unrolled where a variant is ineligible):")
    for j, v in enumerate(variants):
        tot = 0.0
        for name, row in results.items():
            x = row[j]
            if not isinstance(x, float) or x != x:
                x = row[0]
            tot += x
        print(f"  {v:12s}: {tot:8.2f} ms")


if __name__ == "__main__":
    main()
