"""Reference-pinned golden test for the GO hierarchical network.

The flax `GeneOntologyNetwork` is a DENSE reformulation of the reference's
sparse code; all other parity tests compare it to a torch oracle that shares
the same dense derivation, so a shared misreading of the reference's index
bookkeeping would pass them.  This test breaks that loop: `_sparse_reference`
below is a brute-force NumPy executor that follows the reference's sparse
bookkeeping LITERALLY —

  * per-layer nnz index lists of the cumulatively sliced adjacency
    (`n_loc_in`, go_model.py:51-61) and the transposed rectangular decoder
    slices (`n_loc_out`, :65-74),
  * the `store_ind` run-length compaction used to divide each nnz by its
    row sum (:161-168,173-180),
  * per-sample attention normalization `exp(tanh(W [x_i || x_j]))`
    (:182-186,230-244),
  * scatter-sum un-pooling `batch_mul` with uniform 1/degree weights
    (:195-201,258-275), front-padded self loop (:267-269),
  * the fake-data recipe of go_model.py:290-303 (A transposed by the
    caller, cf. train_eval_sgcn_img_snps.py:69: the network receives
    adj.T; incidence (n, 54); pool [3, 6, 11]; n_l=2; f_dim [5,5]).

Both consume the SAME randomized parameter tree; agreement pins the dense
masks/slicing/normalization to the reference semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.data.go_graph import GoTopology
from iggcn_tpu.models.go_network import GeneOntologyNetwork

N, S, B = 20, 54, 4
IN_F = 2
POOL = [3, 6, 11]
N_L = 2
F_DIM = (5, 5)
L_DIM = 5
EPS = 1e-5


def _relu(x):
    return np.maximum(x, 0.0)


def _make_act(params, activation):
    """Site-keyed activation: ReLU (go_model.py) or per-module PReLU
    (guide_go_model.py diffs: PReLU everywhere, latent WITHOUT the final
    BN+ReLU after Linear(32, l_dim))."""
    def act(site, x):
        if activation == "relu":
            return _relu(x)
        alpha = params[site]["alpha"]
        return np.where(x >= 0, x, alpha * x)
    return act


def _bn_eval(x, p, st, axis_channel):
    """torch BatchNorm1d eval: (x - mean)/sqrt(var+eps)*gamma + beta with
    channel dim `axis_channel` (1 for both 2-D (B,C) and 3-D (B,C,L))."""
    shape = [1] * x.ndim
    shape[axis_channel] = -1
    g = p["scale"].reshape(shape)
    b = p["bias"].reshape(shape)
    m = st["mean"].reshape(shape)
    v = st["var"].reshape(shape)
    return (x - m) / np.sqrt(v + EPS) * g + b


def _layernorm_nodes(x, scale, bias):
    """torch nn.LayerNorm(n_nodes) applied to (B, F, n) permuted input ==
    normalize over the node axis of (B, n, F), per-node affine."""
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    y = (x - mean) / np.sqrt(var + EPS)
    return y * scale[None, :, None] + bias[None, :, None]


def _row_normalized_nnz(rows, vals):
    """attention_adj semantics: divide each nnz value by its row's sum
    (store_ind compaction is exactly a rows->rowsum lookup)."""
    out = np.array(vals, np.float64)
    for r in np.unique(rows):
        sel = rows == r
        out[sel] = out[sel] / vals[sel].sum()
    return out


def _sparse_reference(params, stats, a_raw, g_inc, snps,
                      activation="relu"):
    """Brute-force NumPy executor of Gene_ontology_network.forward (eval)."""
    p = params
    act = _make_act(params, activation)
    a_net = a_raw.T                     # caller transposes (train_eval:69)

    # gene encoding via explicit nnz loop (go_model.py:206-215)
    gr, gs = np.nonzero(g_inc)          # row-major == torch coalesce order
    chans = []
    for c in range(IN_F):
        vals = p[f"gene_enc_{c}"][gr, gs]
        xc = np.zeros((B, N))
        for e in range(len(gr)):
            xc[:, gr[e]] += vals[e] * snps[:, gs[e]]
        chans.append(xc)
    x = np.stack(chans, axis=2)

    # encoder (go_model.py:219-251)
    for jj in range(N_L):
        s0 = sum(POOL[:jj])
        a_cur = a_net[s0:, s0:]
        rows, cols = np.nonzero(a_cur)
        k_inc = p[f"w_inc_{jj}"]["kernel"]
        k_slp = p[f"w_s_loop_{jj}"]["kernel"]
        k_att_s = p[f"w_att_s_{jj}"]["kernel"]
        w_att = p[f"w_att_in_{jj}"]
        x_in = x @ k_inc
        x_s = x @ k_slp
        cat = np.concatenate([x_in[:, rows, :], x_in[:, cols, :]], axis=2)
        v = np.exp(np.tanh(cat @ w_att))[..., 0]       # (B, nnz)
        m = x.shape[1]
        out = np.zeros((B, m, x_in.shape[2]))
        for b in range(B):                              # per-sample loop,
            vn = _row_normalized_nnz(rows, v[b])        # go_model.py:236-244
            for e in range(len(rows)):
                out[b, rows[e]] += vn[e] * x_in[b, cols[e]]
        v_self = 1.0 / (1.0 + np.exp(-(x_s @ k_att_s)))
        out = out + x_s * v_self
        out = _layernorm_nodes(out, p[f"g_b_{jj}"]["scale"],
                               p[f"g_b_{jj}"]["bias"])
        out = act(f"act_enc_{jj}", out)
        x = out[:, POOL[jj]:, :]

    # readouts (go_model.py:117-146,254-255,285)
    atten = x @ p["conc_for_attention"]["kernel"]
    atten = act("act_atten",
                _bn_eval(atten, p["bn_atten"], stats["bn_atten"], 1))
    inp = (x @ p["conc"]["kernel"])[..., 0]
    inp = act("act_b", _bn_eval(inp, p["bn_b"], stats["bn_b"], 1))
    h = inp @ p["latent1"]["kernel"]
    h = act("act_latent1",
            _bn_eval(h, p["bn_latent1"], stats["bn_latent1"], 1))
    h = h @ p["latent2"]["kernel"]
    if activation == "relu":
        latent = _relu(_bn_eval(h, p["bn_latent2"], stats["bn_latent2"], 1))
    else:   # guide_go_model.py:138-144 ends at the linear
        latent = h

    # decoder (go_model.py:258-275)
    a_t = a_net.T
    for jj in range(N_L):
        r0 = sum(POOL[:N_L - jj - 1])
        c0 = sum(POOL[:N_L - jj])
        t_mat = a_t[r0:, c0:]
        rows, cols = np.nonzero(t_mat)
        x_out = x @ p[f"w_out_{jj}"]["kernel"]
        x_s_out = x @ p[f"w_s_loop_out_{jj}"]["kernel"]
        v_out = _row_normalized_nnz(rows, np.ones(len(rows)))
        grown = sum(POOL[N_L - jj - 1:])
        out = np.zeros((B, grown, x_out.shape[2]))
        for e in range(len(rows)):                      # batch_mul scatter
            out[:, rows[e]] += v_out[e] * x_out[:, cols[e]]
        pad = POOL[N_L - jj - 1]
        out[:, pad:, :] += x_s_out
        out = _layernorm_nodes(out, p[f"g_b_d_{jj}"]["scale"],
                               p[f"g_b_d_{jj}"]["bias"])
        x = act(f"act_dec_{jj}", out)

    out_d = (x @ p["conc_d"]["kernel"])[..., 0]
    out_d = act("act_b_d", _bn_eval(out_d, p["bn_b_d"], stats["bn_b_d"], 1))

    # gene decoding via the transposed incidence nnz (go_model.py:280-282)
    x_hat = np.zeros((B, S))
    dec = p["gene_dec"]
    for e in range(len(gr)):
        x_hat[:, gs[e]] += dec[gr[e], gs[e]] * out_d[:, gr[e]]
    return latent, x_hat, atten


@pytest.fixture(scope="module", params=["relu", "prelu"])
def setup(request):
    activation = request.param
    rng = np.random.default_rng(7)
    # fake-data recipe of go_model.py:290-303 (randint adjacency/incidence)
    a_raw = rng.integers(0, 2, (N, N)).astype(np.float64)
    g_inc = rng.integers(0, 2, (N, S)).astype(np.float64)
    snps = rng.random((B, S))
    topo = GoTopology(adj_child_parent=a_raw, go_snps=g_inc, pool=POOL,
                      n_l=N_L, go_level=np.zeros(N, np.int64),
                      go_ids=[f"GO:{i}" for i in range(N)],
                      go_genes=[[] for _ in range(N)])
    model = GeneOntologyNetwork(topo=topo, in_f_dim=IN_F, n_l=N_L,
                                f_dim=F_DIM, l_dim=L_DIM, dim_snps_atten=5,
                                activation=activation)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(snps, jnp.float32))
    # randomize EVERY parameter and batch stat so agreement is non-trivial
    prng = np.random.default_rng(11)

    def randomize(tree, is_stats=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = randomize(dict(v), is_stats)
            else:
                arr = prng.normal(0.0, 0.3, np.shape(v))
                if is_stats and k == "var":
                    arr = np.abs(arr) + 0.5
                out[k] = arr
        return out

    params_np = randomize(dict(jax.tree_util.tree_map(np.asarray,
                                                      variables["params"])))
    stats_np = randomize(dict(jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))), is_stats=True)
    variables = {
        "params": jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params_np),
        "batch_stats": jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), stats_np),
    }
    return (model, variables, params_np, stats_np, a_raw, g_inc, snps,
            activation)


@pytest.mark.parametrize("impl", ["dense", "edge"])
def test_flax_matches_sparse_reference(setup, impl):
    (model, variables, params_np, stats_np, a_raw, g_inc, snps,
     activation) = setup
    model = model.clone(attention_impl=impl)
    latent, x_hat, atten = model.apply(variables,
                                       jnp.asarray(snps, jnp.float32))
    ref_latent, ref_x_hat, ref_atten = _sparse_reference(
        params_np, stats_np, a_raw, g_inc, snps, activation)
    np.testing.assert_allclose(np.asarray(latent), ref_latent,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_hat), ref_x_hat,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(atten), ref_atten,
                               rtol=2e-4, atol=2e-5)


def test_golden_is_sensitive_to_orientation(setup):
    """Sanity: the oracle is NOT trivially equal — a plausible misreading
    (forgetting that the caller transposes the adjacency,
    train_eval_sgcn_img_snps.py:69) must break agreement."""
    (model, variables, params_np, stats_np, a_raw, g_inc, snps,
     activation) = setup
    ref_latent, ref_x_hat, _ = _sparse_reference(params_np, stats_np,
                                                 a_raw.T, g_inc, snps,
                                                 activation)
    latent, x_hat, _ = model.apply(variables, jnp.asarray(snps, jnp.float32))
    assert not (np.allclose(np.asarray(latent), ref_latent, rtol=1e-3)
                and np.allclose(np.asarray(x_hat), ref_x_hat, rtol=1e-3))
