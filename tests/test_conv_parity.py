"""Hand-computed parity pins for the dense conv primitives' PyG semantics
that dense reformulations most easily get wrong: gcn_norm's
add_REMAINING_self_loops (existing diagonal weights are kept) and GATConv's
fill_value='mean' (per-TARGET mean of incoming edge attributes, after
removing existing self loops)."""
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.ops.gat import GATParams, gat_conv
from iggcn_tpu.ops.gcn import gcn_propagation_matrix


def test_gcn_norm_keeps_existing_self_loop_weight():
    # node 0 has a self-loop of weight 5 (as PPR+top-k diffusion produces);
    # PyG add_remaining_self_loops keeps it; node 1 gets a fresh loop of 1
    adj = np.array([[5.0, 2.0],
                    [0.0, 0.0]], np.float32)[None]
    p = np.asarray(gcn_propagation_matrix(jnp.asarray(adj)))[0]
    # effective A: [[5, 2], [0, 1]]; degrees at targets (column sums):
    # d0 = 5, d1 = 3
    d0, d1 = 5.0, 3.0
    expected = np.array([
        [5.0 / d0, 0.0],                                  # into node 0
        [2.0 / np.sqrt(d0 * d1), 1.0 / d1],               # into node 1
    ], np.float32)
    np.testing.assert_allclose(p, expected, rtol=1e-6)


def test_gcn_norm_adds_loop_only_where_missing():
    adj = np.array([[0.0, 1.0],
                    [1.0, 0.0]], np.float32)[None]
    p = np.asarray(gcn_propagation_matrix(jnp.asarray(adj)))[0]
    # A+I = [[1,1],[1,1]], degrees 2,2 -> every entry 1/2
    np.testing.assert_allclose(p, np.full((2, 2), 0.5), rtol=1e-6)


def test_gat_self_loop_fill_is_per_target_mean():
    """Three nodes; node 2's incoming edges average 0.9, node 1's 0.1,
    node 0 has none (fill 0). An existing self-loop (0,0) is REMOVED before
    the means are computed (PyG remove_self_loops + add_self_loops('mean'))."""
    adj = np.zeros((1, 3, 3), np.float32)
    adj[0, 0, 0] = 7.0       # existing self-loop: must not enter the means
    adj[0, 0, 2] = 0.8
    adj[0, 1, 2] = 1.0
    adj[0, 0, 1] = 0.1
    f = 2
    p = GATParams(weight=jnp.eye(f),
                  att_src=jnp.zeros((f,)), att_dst=jnp.zeros((f,)),
                  lin_edge=jnp.ones((1, f)), att_edge=jnp.ones((f,)),
                  bias=jnp.zeros((f,)))
    x = jnp.ones((1, 3, f))
    out = np.asarray(gat_conv(x, jnp.asarray(adj), p))
    # attention logits reduce to leaky_relu(edge_weight * f) per edge; what
    # matters here is WHICH self-loop weights were used. Reconstruct them:
    # incoming means: node0 <- {} = 0; node1 <- {0.1} = 0.1;
    # node2 <- {0.8, 1.0} = 0.9
    mean_in = np.array([0.0, 0.1, 0.9], np.float32)

    def ref_target(c, srcs_w):
        # srcs_w: {src: weight} incl. the self-loop (c, mean_in[c])
        logits = {s: np.maximum(w * f, 0.2 * w * f) for s, w in srcs_w.items()}
        m = max(logits.values())
        exps = {s: np.exp(v - m) for s, v in logits.items()}
        z = sum(exps.values())
        # h = x @ I = ones -> output = sum alpha * ones = ones
        return sum(exps[s] / z for s in exps)

    # every target's output should be exactly 1 (weights sum to 1, h = 1)
    np.testing.assert_allclose(out[0], np.ones((3, f)), rtol=1e-5)
    # and the self-loop attribute actually used must be the per-target mean:
    # check via the attention weight of node 2's self-loop vs a global-mean
    # implementation. Rebuild expected alpha for target 2 explicitly:
    w22 = mean_in[2]
    logits = np.array([0.8 * f, 1.0 * f, w22 * f], np.float32)
    alpha = np.exp(logits - logits.max())
    alpha = alpha / alpha.sum()
    # output rows are all-ones regardless; assert on the internal convention
    # through a weighted feature instead: make h distinguishable per source
    x2 = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    out2 = np.asarray(gat_conv(x2, jnp.asarray(adj), p))[0, 2]
    h = np.asarray(x2)[0]        # weight = I
    expected2 = alpha[0] * h[0] + alpha[1] * h[1] + alpha[2] * h[2]
    np.testing.assert_allclose(out2, expected2, rtol=1e-5)
