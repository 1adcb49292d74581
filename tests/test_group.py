"""Group-math tests: axioms, class structure, table semantics.

These are the executable spec of the properties the reference only
asserts implicitly via its data assets (``group_related/*.npy``) and its
manual equivariance check (``utils/network.py:290-312``).
"""

import numpy as np
import pytest

from yoho_tpu.group import get_group
from yoho_tpu.utils.so3 import compute_R_diff


@pytest.fixture(scope="module")
def G():
    return get_group()


def test_sixty_orthonormal_elements(G):
    R = G.rotations
    assert R.shape == (60, 3, 3)
    eye = np.einsum("gij,gkj->gik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (60, 1, 1)), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(60), atol=1e-10)
    assert np.allclose(R[0], np.eye(3), atol=1e-10)


def test_elements_distinct(G):
    R = G.rotations
    d = np.linalg.norm(R[:, None] - R[None, :], axis=(2, 3))
    d += np.eye(60) * 10
    assert d.min() > 0.5  # min pairwise angle 72deg => frobenius dist ~1.7


def test_closure_and_cayley_semantics(G):
    R, C = G.rotations, G.cayley
    for a in range(0, 60, 7):
        for b in range(0, 60, 11):
            np.testing.assert_allclose(R[C[a, b]], R[b] @ R[a], atol=1e-8)


def test_cayley_rows_cols_are_permutations(G):
    C = G.cayley
    for i in range(60):
        assert sorted(C[i]) == list(range(60))
        assert sorted(C[:, i]) == list(range(60))


def test_identity_row(G):
    # cayley[0, b] = index(R[b] @ I) = b ; cayley[a, 0] = a
    np.testing.assert_array_equal(G.cayley[0], np.arange(60))
    np.testing.assert_array_equal(G.cayley[:, 0], np.arange(60))


def test_inverse(G):
    R, inv = G.rotations, G.inverse
    for g in range(60):
        np.testing.assert_allclose(R[inv[g]], R[g].T, atol=1e-8)
    # inverse is an involution
    np.testing.assert_array_equal(inv[inv], np.arange(60))


def test_conjugacy_class_structure(G):
    # icosahedral group: 1 identity, 15 order-2, 20 order-3, 12+12 order-5
    ang = np.round(G.angles).astype(int)
    counts = {a: int((ang == a).sum()) for a in sorted(set(ang.tolist()))}
    assert counts == {0: 1, 72: 12, 120: 20, 144: 12, 180: 15}


def test_neighbor_table_regular_and_self_first(G):
    N = G.neighbors
    assert N.shape == (60, 13)
    np.testing.assert_array_equal(N[:, 0], np.arange(60))
    # 72-degree neighbors: each element appears in exactly 13 footprints
    counts = np.bincount(N.reshape(-1), minlength=60)
    np.testing.assert_array_equal(counts, np.full(60, 13))
    # all non-self neighbors are at 72 degrees
    R = G.rotations
    for g in range(0, 60, 5):
        for s in range(1, 13):
            d = compute_R_diff(R[g], R[N[g, s]])
            assert abs(d - 72.0) < 1e-4


def test_neighbor_table_equivariance(G):
    """Nei[cayley[i][g], s] == cayley[i][Nei[g, s]] for all i, g, s.

    This is the property that makes the 1x13 group conv equivariant
    under F'[g] = F[cayley[i][g]] (cloud rotated by R[i]).
    """
    N, C = G.neighbors, G.cayley
    for i in range(0, 60, 7):
        lhs = N[C[i]]  # (60, 13)
        rhs = C[i][N]  # (60, 13)
        np.testing.assert_array_equal(lhs, rhs)


def test_nearest_group_index(G):
    from yoho_tpu.group.icosahedral import nearest_group_index
    from yoho_tpu.utils.so3 import axis_angle_matrix

    rng = np.random.default_rng(1)
    for g in [0, 7, 33, 59]:
        # perturb R[g] by a small rotation; nearest must remain g
        axis = rng.normal(size=3)
        pert = axis_angle_matrix(axis, np.deg2rad(10.0))
        assert nearest_group_index(pert @ G.rotations[g]) == g


def test_lifting_permutation_property(G):
    """F[g] = X @ R[g].T lifting transforms by the cayley row: this is
    the algebraic core of the reference's self-check
    (utils/network.py:297-311) without any network."""
    rng = np.random.default_rng(2)
    X = rng.normal(size=(5, 3))
    R, C = G.rotations, G.cayley
    lift = np.einsum("nd,gkd->ngk", X, R)  # lift[n, g] = X_n @ R[g].T
    for i in [3, 17, 42]:
        Xi = X @ R[i].T
        lift_i = np.einsum("nd,gkd->ngk", Xi, R)
        np.testing.assert_allclose(lift_i, lift[:, C[i]], atol=1e-9)
