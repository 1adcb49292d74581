"""Mutual-NN matching probe: the ground-truth backbone training signal.

Round 4 measured that the held-out *contrastive loss* is only a weak
checkpoint selector (its absolute level mixes the feature-collapse mode
into the negative term, ``docs/FCGF_TRAINING.md``); the quantity the
whole system cares about is the mutual-nearest-neighbor matching inlier
fraction on held-out aligned fragment pairs. This module is the single
implementation used both by the standalone probe CLI
(``scripts/probe_fcgf_matching.py``) and by the trainer's
best-checkpoint selection (``scripts/train_fcgf.py``).

Reference analog: none — the reference selects FCGF checkpoints outside
the repo entirely (``/root/reference/others/Readme.md:55-57``); this is
the recipe it leaves implicit, made explicit and tested.

Determinism: every scoring call re-seeds its own ``np.random.default_rng``
(advisor round-4 finding: a shared rng consumed across calls scored each
checkpoint on *different* subsamples, adding ranking noise between close
candidates). Two checkpoints probed on the same pairs always see
identical subsampled rows.
"""

from __future__ import annotations

import numpy as np


def mutual_nn_inlier_fraction(
    fa: np.ndarray,
    xa: np.ndarray,
    ma: np.ndarray,
    fb: np.ndarray,
    xb: np.ndarray,
    mb: np.ndarray,
    inlier_dist: float = 0.10,
    n_sample: int = 4000,
    seed: int = 0,
    oracle: bool = False,
) -> float:
    """Inlier fraction of mutual-NN matches between two featurized clouds.

    fa/fb: (N, C) features; xa/xb: (N, 3) voxel positions in the ALIGNED
    frame; ma/mb: (N,) valid-row masks. ``oracle=True`` matches on xyz
    instead of features (the geometric ceiling).
    """
    rng = np.random.default_rng(seed)
    ia = rng.permutation(np.where(ma)[0])[:n_sample]
    ib = rng.permutation(np.where(mb)[0])[:n_sample]
    if oracle:
        d = -((xa[ia][:, None, :] - xb[ib][None, :, :]) ** 2).sum(-1)
    else:
        d = fa[ia] @ fb[ib].T
    nn_ab = d.argmax(1)
    nn_ba = d.argmax(0)
    mutual = nn_ba[nn_ab] == np.arange(len(ia))
    if mutual.sum() == 0:
        return 0.0
    dist = np.linalg.norm(xa[ia][mutual] - xb[ib][nn_ab[mutual]], axis=1)
    return float((dist < inlier_dist).mean())


def probe_inlier_fractions(
    featurize,
    pair_clouds,
    inlier_dist: float = 0.10,
    n_sample: int = 4000,
    oracle: bool = False,
) -> list[float]:
    """Score a list of held-out pairs.

    featurize(points_padded, n) -> (features, positions, mask) as numpy;
    pair_clouds: list of ((pa, na), (pb, nb)) padded aligned clouds.
    The subsample seed is the pair index — identical across calls.
    """
    out = []
    for i, ((pa, na), (pb, nb)) in enumerate(pair_clouds):
        fa, xa, ma = featurize(pa, na)
        fb, xb, mb = featurize(pb, nb)
        out.append(
            mutual_nn_inlier_fraction(
                fa, xa, ma, fb, xb, mb,
                inlier_dist=inlier_dist, n_sample=n_sample, seed=i,
                oracle=oracle,
            )
        )
    return out


def collapse_stats(
    featurize,
    pair_cloud,
    n_anchor: int = 3000,
    seed: int = 0,
) -> dict:
    """Feature-collapse diagnostics on one aligned pair: d_pos (feature
    distance at oracle correspondences), d_rand (at random cross-cloud
    pairs), their ratio, and the in-cloud feature spread. These four
    numbers diagnosed the round-4 margin-geometry collapse
    (docs/FCGF_TRAINING.md tables)."""
    rng = np.random.default_rng(seed)
    (pa, na), (pb, nb) = pair_cloud
    fa, xa, ma = featurize(pa, na)
    fb, xb, mb = featurize(pb, nb)
    ia = rng.permutation(np.where(ma)[0])[:n_anchor]
    ib_all = np.where(mb)[0]
    d2 = ((xa[ia][:, None, :] - xb[ib_all][None, :, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    ok = np.sqrt(d2[np.arange(len(ia)), nn]) < 0.05
    fpos_a = fa[ia][ok]
    d_pos = float(np.linalg.norm(fpos_a - fb[ib_all[nn[ok]]], axis=1).mean())
    jr = rng.permutation(ib_all)[: int(ok.sum())]
    d_rand = float(np.linalg.norm(fpos_a - fb[jr], axis=1).mean())
    s = fa[rng.permutation(np.where(ma)[0])[:1000]]
    spread = float(
        np.linalg.norm(s[:500, None] - s[None, 500:1000], axis=-1).mean()
    )
    return {
        "d_pos": d_pos,
        "d_rand": d_rand,
        "ratio": d_rand / max(d_pos, 1e-9),
        "spread": spread,
    }
