"""Golden-value tests for every loss term: each is recomputed here with
explicit loop-style NumPy transcribed from the REFERENCE's formulas (file:line
cited per test), independent of `train/losses.py`'s vectorized masked algebra.
This closes the SURVEY §4 test-strategy row "golden-value tests of each loss
term" and breaks any shared-derivation loop between the implementation and
its tests."""
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.config import SparsityWeights
from iggcn_tpu.train import losses

RNG = np.random.default_rng(0)


def _sig(v):
    return 1.0 / (1.0 + np.exp(-v))


def _ent(p, eps=1e-6):
    return -(p * np.log(p + eps) + (1 - p) * np.log((1 - p) + eps))


def test_sparsity_loss_golden():
    """loss_probability (kernel/sgcn_img_snp.py:153-181): mean L1 + mean
    binary entropy of sigmoid(prob), of the per-existing-edge scores, and of
    sigmoid(snps_prob); weights lamda_x_* on node AND snp terms, lamda_e_*
    on edges."""
    b, n, d, s = 3, 6, 3, 7
    prob = RNG.normal(size=(n, d)).astype(np.float32)
    bias = RNG.normal(size=(2 * d, 1)).astype(np.float32)
    snps_prob = RNG.normal(size=(1, s)).astype(np.float32)
    x = RNG.normal(size=(b, n, d)).astype(np.float32)
    adj = (RNG.random((b, n, n)) < 0.4).astype(np.float32)
    sw = SparsityWeights(lamda_x_l1=0.1, lamda_e_l1=0.2,
                         lamda_x_ent=0.3, lamda_e_ent=0.4)

    # --- reference transcription (per-edge loop over the COO edge list) ---
    xp = _sig(prob)
    f_sum = np.abs(xp).sum() / (n * d)
    f_ent = _ent(xp).sum() / (n * d)
    edge_scores = []
    xm = x * prob                                     # cal_probability masking
    for k in range(b):
        for r in range(n):
            for c in range(n):
                if adj[k, r, c] != 0:
                    cat = np.concatenate([xm[k, r], xm[k, c]])
                    edge_scores.append(_sig(cat @ bias[:, 0]))
    e = np.array(edge_scores)
    e_sum = np.abs(e).sum() / len(e)
    e_ent = _ent(e).sum() / len(e)
    sp = _sig(snps_prob)
    s_sum = np.abs(sp).sum() / s
    s_ent = _ent(sp).sum() / s
    want = (0.1 * f_sum + 0.2 * e_sum + 0.1 * s_sum
            + 0.3 * f_ent + 0.4 * e_ent + 0.3 * s_ent)

    got = float(losses.sparsity_loss(jnp.asarray(prob), jnp.asarray(bias),
                                     jnp.asarray(snps_prob), jnp.asarray(x),
                                     jnp.asarray(adj), sw))
    np.testing.assert_allclose(got, want, rtol=2e-5)

    # padded rows (w=0) must not contribute edges
    xpad = np.concatenate([x, x[:1]])
    apad = np.concatenate([adj, adj[:1]])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    got_pad = float(losses.sparsity_loss(
        jnp.asarray(prob), jnp.asarray(bias), jnp.asarray(snps_prob),
        jnp.asarray(xpad), jnp.asarray(apad), sw, sample_weight=w))
    np.testing.assert_allclose(got_pad, want, rtol=2e-5)


def test_sgcn_sparsity_loss_golden():
    """Image-only variant (kernel/sgcn.py:88-109): NO snp term, and the node
    L1 normalizes by N (not N*D) — the reference's documented quirk."""
    b, n, d = 2, 5, 3
    prob = RNG.normal(size=(n, d)).astype(np.float32)
    bias = RNG.normal(size=(2 * d, 1)).astype(np.float32)
    x = RNG.normal(size=(b, n, d)).astype(np.float32)
    adj = (RNG.random((b, n, n)) < 0.5).astype(np.float32)
    sw = SparsityWeights(lamda_x_l1=0.1, lamda_e_l1=0.1,
                         lamda_x_ent=0.1, lamda_e_ent=0.1)

    xp = _sig(prob)
    f_sum = np.abs(xp).sum() / n                       # / N, not / (N*D)
    f_ent = _ent(xp).sum() / (n * d)
    xm = x * prob
    e = []
    for k in range(b):
        for r in range(n):
            for c in range(n):
                if adj[k, r, c] != 0:
                    cat = np.concatenate([xm[k, r], xm[k, c]])
                    e.append(_sig(cat @ bias[:, 0]))
    e = np.array(e)
    want = 0.1 * (f_sum + np.abs(e).mean() + f_ent + _ent(e).mean())

    got = float(losses.sgcn_sparsity_loss(jnp.asarray(prob), jnp.asarray(bias),
                                          jnp.asarray(x), jnp.asarray(adj), sw))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_consistency_loss_golden():
    """consist_loss (kernel/sgcn_img_snp.py:183-196):
    trace(s^T (D - W) s) / n^2 with W = rbf or ones; cluster mode subsets
    rows by boolean indexing — the masked formulation must equal explicit
    subsetting, and an empty subset returns 0."""
    b, f, t = 5, 4, 3
    s = RNG.normal(size=(b, f)).astype(np.float32)
    tsne = RNG.normal(size=(b, t)).astype(np.float32)
    gamma = 0.07

    # soft-similarity: explicit W, D, L, trace
    w = np.exp(-gamma * ((tsne[:, None, :] - tsne[None, :, :]) ** 2).sum(-1))
    lap = np.diag(w.sum(axis=1)) - w
    want = np.trace(s.T @ lap @ s) / (b * b)
    got = float(losses.consistency_loss(
        jnp.asarray(s), losses.rbf_kernel(jnp.asarray(tsne),
                                          jnp.asarray(tsne), gamma)))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # cluster mode: member mask == boolean subsetting with W = ones
    member = np.array([1, 0, 1, 1, 0], np.float32)
    sub = s[member > 0]
    m = sub.shape[0]
    w1 = np.ones((m, m))
    lap1 = np.diag(w1.sum(axis=1)) - w1
    want_sub = np.trace(sub.T @ lap1 @ sub) / (m * m)
    got_sub = float(losses.consistency_loss(
        jnp.asarray(s), jnp.ones((b, b), jnp.float32), jnp.asarray(member)))
    np.testing.assert_allclose(got_sub, want_sub, rtol=1e-4)

    # empty subset -> 0 (reference: `if len(s) == 0: return 0`)
    got_empty = float(losses.consistency_loss(
        jnp.asarray(s), jnp.ones((b, b), jnp.float32), jnp.zeros(b)))
    assert got_empty == 0.0


def test_orthogonal_loss_golden():
    """OrthogonalConstraint (kernel/sgcn_img_snp.py:198-205):
    ||W_n^T W_n - I||_F^2 / B^2 with L2-row-normalized W."""
    b, f = 6, 4
    w = RNG.normal(size=(b, f)).astype(np.float32)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    gram = wn.T @ wn
    want = (np.linalg.norm(gram - np.eye(f)) ** 2) / (b * b)
    got = float(losses.orthogonal_loss(jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # padding: zero-weight rows are excluded and B counts real rows
    wpad = np.concatenate([w, RNG.normal(size=(2, f)).astype(np.float32)])
    sw = jnp.asarray([1.0] * b + [0.0] * 2)
    got_pad = float(losses.orthogonal_loss(jnp.asarray(wpad),
                                           sample_weight=sw))
    np.testing.assert_allclose(got_pad, want, rtol=1e-5)


def test_orthogonal_loss_wide_matches_direct_form():
    """D > B takes the trace-algebra path (no (D, D) gram); it must equal the
    direct ||W_n^T W_n - I||_F^2 / B^2 definition, with and without padding."""
    b, f = 5, 37
    w = RNG.normal(size=(b, f)).astype(np.float32)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    want = (np.linalg.norm(wn.T @ wn - np.eye(f)) ** 2) / (b * b)
    got = float(losses.orthogonal_loss(jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    wpad = np.concatenate([w, RNG.normal(size=(3, f)).astype(np.float32)])
    sw = jnp.asarray([1.0] * b + [0.0] * 3)
    got_pad = float(losses.orthogonal_loss(jnp.asarray(wpad),
                                           sample_weight=sw))
    np.testing.assert_allclose(got_pad, want, rtol=1e-5)


def test_elementwise_losses_golden():
    """nll (F.nll_loss mean), mse (F.mse_loss mean), recon
    (sum-reduction MSE, train_eval_sgcn_img_snps.py:533-537)."""
    lp = np.log(np.array([[0.7, 0.3], [0.2, 0.8], [0.5, 0.5]], np.float32))
    y = np.array([0, 1, 1])
    want_nll = -(np.log(0.7) + np.log(0.8) + np.log(0.5)) / 3
    np.testing.assert_allclose(
        float(losses.nll_loss(jnp.asarray(lp), jnp.asarray(y))), want_nll,
        rtol=1e-6)

    a = RNG.normal(size=(4, 3)).astype(np.float32)
    t = RNG.normal(size=(4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.mse_loss(jnp.asarray(a), jnp.asarray(t))),
        ((a - t) ** 2).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.recon_sum(jnp.asarray(a), jnp.asarray(t))),
        ((a - t) ** 2).sum(), rtol=1e-5)
    # weighted: padded rows drop out of both reductions
    apad = np.concatenate([a, a[:1] + 1])
    tpad = np.concatenate([t, t[:1]])
    w = jnp.asarray([1.0] * 4 + [0.0])
    np.testing.assert_allclose(
        float(losses.mse_loss(jnp.asarray(apad), jnp.asarray(tpad), w)),
        ((a - t) ** 2).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.recon_sum(jnp.asarray(apad), jnp.asarray(tpad), w)),
        ((a - t) ** 2).sum(), rtol=1e-5)
