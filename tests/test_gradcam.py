"""Grad-CAM saliency export (parity capability: the forward/backward hooks
on SGCN_Ori's final conv, `kernel/sgcn.py:111-148`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iggcn_tpu.models.sgcn_image import SGCNImage, SGCNOri
from iggcn_tpu.tools.explain import grad_cam


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 20, 3)).astype(np.float32)
    adj = np.abs(rng.normal(size=(6, 20, 20))).astype(np.float32)
    return x, adj


@pytest.mark.parametrize("model", [
    SGCNOri(rois=20, num_classes=2),
    SGCNImage(num_layers=3, hidden=8, rois=20, num_classes=2),
    SGCNImage(num_layers=2, hidden=8, rois=20, num_classes=2, use_gat=True),
], ids=["ori", "gcn3", "gat"])
def test_grad_cam_shapes_and_sensitivity(data, model):
    x, adj = data
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x),
                                    jnp.asarray(adj))
    cam0 = grad_cam(model, variables, x, adj, class_index=0)
    cam1 = grad_cam(model, variables, x, adj, class_index=1)
    assert cam0.shape == (6, 20) and cam0.dtype == np.float32
    assert np.isfinite(cam0).all() and np.isfinite(cam1).all()
    assert (cam0 >= 0).all(), "grad-CAM maps are relu'd"
    # one class's pooled map can legitimately relu to zero; at least one
    # class must light up on random data
    assert max(cam0.max(), cam1.max()) > 0
    assert not np.allclose(cam0, cam1), "maps must be class-sensitive"


def test_trunk_head_equals_call(data):
    """The grad-CAM seam decomposition reproduces __call__ exactly."""
    x, adj = data
    model = SGCNOri(rois=20, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), jnp.asarray(x),
                                    jnp.asarray(adj))
    direct = model.apply(variables, jnp.asarray(x), jnp.asarray(adj))
    prefix, acts = model.apply(variables, jnp.asarray(x), jnp.asarray(adj),
                               method=SGCNOri.trunk)
    via_seam = model.apply(variables, prefix, acts, method=SGCNOri.head)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_seam))


def test_pooled_vs_elementwise(data):
    x, adj = data
    model = SGCNOri(rois=20, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), jnp.asarray(x),
                                    jnp.asarray(adj))
    pooled = grad_cam(model, variables, x, adj, pooled=True)
    elem = grad_cam(model, variables, x, adj, pooled=False)
    assert pooled.shape == elem.shape == (6, 20)
    assert not np.allclose(pooled, elem)


def test_export_writes_npy(tmp_path, data):
    from iggcn_tpu.tools.explain import export_grad_cam
    x, adj = data
    model = SGCNImage(num_layers=2, hidden=16, rois=20, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), jnp.asarray(x),
                                    jnp.asarray(adj))
    cam = export_grad_cam(variables["params"], {}, x, adj, str(tmp_path),
                          "t", num_layers=2, hidden=16)
    saved = np.load(tmp_path / "grad_cam_t.npy")
    np.testing.assert_array_equal(saved, cam)


def test_export_infers_dims_from_checkpoint(tmp_path, data):
    """Regression: a non-default-width checkpoint must not need explicit
    --gradcam_layers/--gradcam_hidden (a hidden=5 checkpoint used to crash
    against the hidden=16 default with a ScopeParamShapeError)."""
    from iggcn_tpu.tools.explain import export_grad_cam
    x, adj = data
    model = SGCNImage(num_layers=3, hidden=5, rois=20, num_classes=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(4), jnp.asarray(x),
                                    jnp.asarray(adj))
    cam = export_grad_cam(variables["params"], {}, x, adj, str(tmp_path), "i")
    assert cam.shape == (6, 20)


def test_cli_skips_gradcam_on_fused_checkpoint(tmp_path, data, capsys):
    """A fused-model checkpoint exports importances/edge probabilities but
    must skip grad-CAM with a message instead of crashing."""
    from iggcn_tpu.config import ModelConfig
    from iggcn_tpu.data.go_graph import synthetic_topology
    from iggcn_tpu.models.fused_sgcn import FusedSGCN
    from iggcn_tpu.tools import explain
    from iggcn_tpu.train.checkpoint import save_checkpoint

    x, adj = data
    topo = synthetic_topology(np.random.default_rng(5))
    mcfg = ModelConfig(num_layers=2, hidden=5, rois=20, l_dim=8,
                       hidden_linear=8)
    model = FusedSGCN(cfg=mcfg, topo=topo)
    snps = np.random.default_rng(6).random((6, 54)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), jnp.asarray(x),
                                    jnp.asarray(adj), jnp.asarray(snps))
    ckpt = tmp_path / "fused.msgpack"
    save_checkpoint(str(ckpt), variables["params"],
                    variables.get("batch_stats", {}))
    np.save(tmp_path / "x.npy", x)
    np.save(tmp_path / "adj.npy", adj)
    explain.main([str(ckpt), "--out", str(tmp_path / "out"),
                  "--x_npy", str(tmp_path / "x.npy"),
                  "--adj_npy", str(tmp_path / "adj.npy")])
    assert "grad-CAM skipped" in capsys.readouterr().out
    assert (tmp_path / "out" / "node_importance_ckpt.npy").exists()
    assert (tmp_path / "out" / "edge_probability_ckpt.npy").exists()
    assert not (tmp_path / "out" / "grad_cam_ckpt.npy").exists()


def test_export_infers_num_classes_and_ori_arch(tmp_path, data):
    """A 3-class SGCNImage checkpoint (CLI default --disease_id 3) and an
    SGCNOri checkpoint must both export without explicit dims: num_classes
    comes from the head kernel, the Ori architecture from conv1_w/fc3."""
    from iggcn_tpu.tools.explain import export_grad_cam
    x, adj = data
    m3 = SGCNImage(num_layers=2, hidden=7, rois=20, num_classes=3)
    v3 = jax.jit(m3.init)(jax.random.PRNGKey(6), jnp.asarray(x),
                          jnp.asarray(adj))
    cam = export_grad_cam(v3["params"], {}, x, adj, str(tmp_path), "c3")
    assert cam.shape == (6, 20)

    ori = SGCNOri(rois=20, num_classes=3, h1=16, h3=4)
    vo = jax.jit(ori.init)(jax.random.PRNGKey(7), jnp.asarray(x),
                           jnp.asarray(adj))
    cam = export_grad_cam(vo["params"], vo.get("batch_stats", {}), x, adj,
                          str(tmp_path), "ori")
    assert cam.shape == (6, 20)
    assert (tmp_path / "grad_cam_ori.npy").exists()
