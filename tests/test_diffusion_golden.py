"""Hand-derived golden values for the diffusion preprocessing
(`data/diffusion.py`, parity `util_gdc.py:7-31`).

The three diffusion implementations (NumPy, native C++, batched device)
are cross-pinned against each other in `test_native.py` — but they share
one derivation, so a systematic misreading of the reference formula
(e.g. random-walk `D^-1 A` normalization instead of symmetric
`D^-1/2 A D^-1/2`, or top-k per ROW instead of per COLUMN) would move all
three together and stay green. These tests pin the NumPy root of that
derivation to closed-form values computed by hand.
"""
import numpy as np

from iggcn_tpu.data.diffusion import (get_clipped_matrix, get_ppr_matrix,
                                      get_top_k_matrix)


def test_ppr_matrix_closed_form_two_nodes():
    """A = [[0,1],[1,0]]: row sums are 1, so D^-1/2 A D^-1/2 = A and
    PPR = alpha (I - beta A)^-1 = alpha/(1-beta^2) [[1, beta], [beta, 1]]
    with beta = 1 - alpha."""
    a = np.array([[0.0, 1.0], [1.0, 0.0]])
    alpha = 0.05
    beta = 1 - alpha
    c = alpha / (1 - beta * beta)
    expected = c * np.array([[1.0, beta], [beta, 1.0]])
    np.testing.assert_allclose(get_ppr_matrix(a, alpha), expected,
                               rtol=1e-12)


def test_ppr_matrix_weighted_asymmetric_degree():
    """Weighted pair with unequal degrees: A = [[0,2],[2,8]] has row sums
    (2, 10), so H = D^-1/2 A D^-1/2 = [[0, 2/sqrt(20)], [2/sqrt(20), 0.8]]
    — the SYMMETRIC normalization; the random-walk misreading D^-1 A gives
    H[0,1] = 1 instead. The expected value below is the hand-inverted
    2x2 alpha (I - beta H)^-1."""
    a = np.array([[0.0, 2.0], [2.0, 8.0]])
    alpha = 0.05
    beta = 1 - alpha
    h01 = 2.0 / np.sqrt(20.0)
    h11 = 0.8
    # (I - beta H) = [[1, -beta*h01], [-beta*h01, 1 - beta*h11]]
    det = (1 - beta * h11) - (beta * h01) ** 2
    inv = np.array([[1 - beta * h11, beta * h01],
                    [beta * h01, 1.0]]) / det
    np.testing.assert_allclose(get_ppr_matrix(a, alpha), alpha * inv,
                               rtol=1e-12)


def test_top_k_keeps_largest_per_column_and_normalizes():
    a = np.array([[0.5, 0.1, 0.3],
                  [0.2, 0.6, 0.2],
                  [0.1, 0.4, 0.9]])
    out = get_top_k_matrix(a, k=2)
    # per COLUMN: zero the smallest entry, then divide by the column sum
    expected = np.array([[0.5 / 0.7, 0.0, 0.3 / 1.2],
                         [0.2 / 0.7, 0.6, 0.0],
                         [0.0, 0.4, 0.9 / 1.2]])
    np.testing.assert_allclose(out, expected, rtol=1e-12)
    # input must not be mutated (the reference clobbers its argument;
    # the rebuild deliberately copies)
    assert a[2, 0] == 0.1


def test_top_k_column_sums_are_one():
    rng = np.random.default_rng(0)
    a = np.abs(rng.normal(size=(12, 12))) + 0.01
    out = get_top_k_matrix(a, k=3)
    assert ((out > 0).sum(axis=0) == 3).all()       # k survivors per column
    np.testing.assert_allclose(out.sum(axis=0), 1.0, rtol=1e-12)


def test_clipped_matrix_zeroes_below_eps_and_normalizes():
    a = np.array([[0.5, 1e-6], [0.25, 0.5]])
    out = get_clipped_matrix(a, eps=1e-4)
    expected = np.array([[0.5 / 0.75, 0.0], [0.25 / 0.75, 1.0]])
    np.testing.assert_allclose(out, expected, rtol=1e-12)
    assert a[0, 1] == 1e-6   # argument unmutated
