"""Finite-difference gradient checking for jitted functions.

The TPU analog of MinkowskiEngine's double-precision ``gradcheck``
(``MinkowskiEngine/utils/gradcheck.py``, applied to every op's autograd
Function in the reference test suite, e.g.
``tests/python/convolution.py:46``). JAX gives exact reverse-mode
gradients, so this checks our *op formulations* (masked gathers,
segment reductions, the zero-row invariant) rather than hand-written
backward kernels — same role, same fixture style.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def gradcheck(
    fn: Callable,
    args: Sequence[jnp.ndarray],
    argnums: Sequence[int] | int = 0,
    eps: float = 1e-3,
    rtol: float = 5e-2,
    atol: float = 5e-3,
    num_probes: int = 24,
    seed: int = 0,
) -> bool:
    """Compare reverse-mode grads of ``sum(fn(*args) * probe)`` against
    central finite differences at ``num_probes`` random coordinates of
    each checked argument. Raises AssertionError on mismatch.

    fp32-tolerant: uses a random probe vector so one pair of function
    evaluations checks a full directional derivative.
    """
    if isinstance(argnums, int):
        argnums = (argnums,)
    rng = np.random.default_rng(seed)
    out0 = fn(*args)
    probe = jnp.asarray(rng.normal(size=out0.shape).astype(np.float32))

    def scalar_fn(*a):
        return jnp.sum(fn(*a) * probe)

    grads = jax.grad(scalar_fn, argnums=argnums)(*args)

    args = list(args)
    for gi, ai in enumerate(argnums):
        g = np.asarray(grads[gi])
        x = np.asarray(args[ai])
        flat = x.reshape(-1)
        idxs = rng.choice(flat.size, size=min(num_probes, flat.size), replace=False)
        for i in idxs:
            fp = flat.copy()
            fm = flat.copy()
            fp[i] += eps
            fm[i] -= eps
            ap = args.copy()
            am = args.copy()
            ap[ai] = jnp.asarray(fp.reshape(x.shape))
            am[ai] = jnp.asarray(fm.reshape(x.shape))
            fd = (float(scalar_fn(*ap)) - float(scalar_fn(*am))) / (2 * eps)
            an = g.reshape(-1)[i]
            if not np.isclose(fd, an, rtol=rtol, atol=atol):
                raise AssertionError(
                    f"grad mismatch at arg {ai} flat index {i}: "
                    f"analytic {an:.6f} vs finite-diff {fd:.6f}"
                )
    return True
