"""The icosahedral rotation group I (60 elements), generated from first
principles.

The reference ships the group as opaque data assets
(``/root/reference/group_related/Rotation.npy``,
``Nei_Index_in_SO3_ordered_13.npy``, ``60_60.npy``, sourced from EMVN per
``README.md:226``). Here the group, its Cayley/permutation table, and the
13-element conv footprint are *derived* at import time and cached, with
the algebraic properties unit-tested (see ``tests/test_group.py``).

Conventions (matching the reference semantics, verified numerically
against its tables):

* ``cayley[a, b] = index(R[b] @ R[a])`` — reference ``60_60.npy``.
  With group-feature lifting ``F[g] = net(X @ R[g].T)``, rotating the
  cloud by ``R[i]`` permutes the feature as ``F'[g] = F[cayley[i][g]]``
  (the reference's equivariance self-check, ``utils/network.py:290-312``).
* ``neighbors[g, s] = index(R[n_s] @ R[g])`` where ``n_0 = identity`` and
  ``n_1..n_12`` are the 12 group elements at 72 degrees from the
  identity, in ascending index order. Left-translating a fixed footprint
  this way is exactly what makes the 1x13 "Comb" convolution
  equivariant under the right action above — an arbitrary per-element
  neighbor ordering would silently break equivariance.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from yoho_tpu.utils.so3 import axis_angle_matrix

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _canonical_quaternion(R: np.ndarray) -> tuple:
    """A hashable, sign-canonical, rounded quaternion key for dedup/sort."""
    from yoho_tpu.utils.so3 import quaternion_from_matrix

    q = quaternion_from_matrix(R)
    q = np.round(q, 9) + 0.0  # kill -0.0
    if q[0] < 1e-12:  # w == 0: canonicalize sign by first nonzero component
        for v in q[1:]:
            if abs(v) > 1e-9:
                if v < 0:
                    q = -q
                break
        q = np.round(q, 9) + 0.0
    return tuple(q.tolist())


def _generate_elements() -> np.ndarray:
    """Closure of two generators of I: 72-degree turn about an icosahedron
    vertex axis and a 180-degree turn about an edge axis.

    Icosahedron vertices: cyclic permutations of (0, ±1, ±phi).
    (0, 1, phi) and (0, -1, phi) are adjacent, so the z axis is an edge
    (2-fold) axis; (0, 1, phi) itself is a vertex (5-fold) axis.
    """
    g1 = axis_angle_matrix(np.array([0.0, 1.0, _PHI]), 2.0 * np.pi / 5.0)
    g2 = axis_angle_matrix(np.array([0.0, 0.0, 1.0]), np.pi)

    elems: dict[tuple, np.ndarray] = {}
    frontier = [np.eye(3), g1, g2]
    for R in frontier:
        elems.setdefault(_canonical_quaternion(R), R)
    while True:
        new = []
        for Ra in list(elems.values()):
            for g in (g1, g2):
                Rc = g @ Ra
                k = _canonical_quaternion(Rc)
                if k not in elems:
                    elems[k] = Rc
                    new.append(Rc)
        if not new:
            break
    assert len(elems) == 60, f"expected 60 group elements, got {len(elems)}"
    # Deterministic canonical order: identity first, then descending w
    # (i.e. ascending rotation angle), ties broken lexicographically.
    keys = sorted(elems.keys(), key=lambda q: (-q[0], q[1], q[2], q[3]))
    Rs = np.stack([elems[k] for k in keys], axis=0)
    # Re-orthonormalize accumulated products via SVD projection.
    u, _, vt = np.linalg.svd(Rs)
    Rs = u @ vt
    return Rs


def _find_index(Rs: np.ndarray, R: np.ndarray) -> int:
    d = np.linalg.norm(Rs - R[None], axis=(1, 2))
    i = int(np.argmin(d))
    assert d[i] < 1e-6, f"matrix not in group (min dist {d[i]})"
    return i


@dataclasses.dataclass(frozen=True)
class IcosahedralGroup:
    """The 60-element icosahedral rotation group with derived tables.

    Attributes:
      rotations: (60, 3, 3) float64 rotation matrices, identity at 0.
      cayley: (60, 60) int32; ``cayley[a, b] = index(R[b] @ R[a])``.
      inverse: (60,) int32; ``R[inverse[g]] = R[g].T``.
      neighbors: (60, 13) int32 equivariant conv footprint (self first).
      angles: (60,) float64 rotation angle of each element, degrees.
    """

    rotations: np.ndarray
    cayley: np.ndarray
    inverse: np.ndarray
    neighbors: np.ndarray
    angles: np.ndarray

    @property
    def order(self) -> int:
        return self.rotations.shape[0]


@functools.lru_cache(maxsize=1)
def get_group() -> IcosahedralGroup:
    Rs = _generate_elements()
    n = Rs.shape[0]

    # Relative angles from identity; class structure 1/12/12/20/15 at
    # angles 0/72/144/120/180.
    traces = np.einsum("gii->g", Rs)
    angles = np.degrees(np.arccos(np.clip((traces - 1.0) / 2.0, -1.0, 1.0)))

    cayley = np.zeros((n, n), dtype=np.int32)
    for a in range(n):
        for b in range(n):
            cayley[a, b] = _find_index(Rs, Rs[b] @ Rs[a])

    inverse = np.array([_find_index(Rs, Rs[g].T) for g in range(n)], dtype=np.int32)

    # Footprint at the identity: self + the 12 elements at 72 degrees.
    base = [0] + sorted(int(i) for i in np.nonzero(np.abs(angles - 72.0) < 1e-6)[0])
    assert len(base) == 13, f"expected 13 footprint elements, got {len(base)}"
    # neighbors[g, s] = index(R[n_s] @ R[g]) = cayley[n_s, g]... careful:
    # cayley[a, b] = index(R[b] @ R[a]) so index(R[n_s] @ R[g]) = cayley[g, n_s].
    neighbors = np.stack([cayley[:, s] for s in base], axis=1).astype(np.int32)
    assert neighbors.shape == (n, 13)
    assert np.all(neighbors[:, 0] == np.arange(n))  # n_0 = e => self first

    return IcosahedralGroup(
        rotations=Rs,
        cayley=cayley,
        inverse=inverse,
        neighbors=neighbors,
        angles=angles,
    )


def nearest_group_index(R: np.ndarray, rotations: np.ndarray | None = None) -> int:
    """Index of the group element closest (geodesically) to ``R``.

    Reference: ``R2DR_id`` (``utils/dataset.py:253-261``). Uses the trace
    form of the geodesic distance, equivalent to the reference's
    quaternion form.
    """
    Rs = rotations if rotations is not None else get_group().rotations
    tr = np.einsum("gij,ij->g", Rs, R)  # trace(R_g^T ... ) proxy: <R_g, R>
    return int(np.argmax(tr))
