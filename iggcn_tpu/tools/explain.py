"""Explainability export: read a trained fold checkpoint, dump importances.

The reference saves per-fold `state_dict` checkpoints but has NO load path
anywhere (SURVEY §5 checkpoint row) — its downstream interpretability
analysis re-reads the separately dumped npys. This tool closes that gap: it
restores a `gcn_state_dict_*_fold_k.msgpack` (written by
`train/checkpoint.py:save_checkpoint`) template-free and exports the learned
importance probabilities in the reference's analysis units:

  * node importance  sigmoid-free raw `prob` (90, 3)  — as `util/output.py:24`
  * SNP importance   raw `snps_prob` (1, 54)          — as `:27`
  * edge scorer      raw `prob_bias` (2*D, 1)         — as `:30`
  * optionally, per-subject edge probabilities on provided data (the
    `cal_probability` edge scores, `kernel/sgcn_img_snp.py:139-145`)

Usage:
  python -m iggcn_tpu.tools.explain CKPT.msgpack --out DIR [--npz cohort.npz]

Also accepts a serving bundle (`serving_bundle_*.npz`, written by
`tools/serve.save_bundle` / `--export_bundle`) in place of the msgpack
checkpoint — interpretability on a deployment host that only has the
self-contained bundle.
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import numpy as np


def load_payload(path: str) -> Dict[str, Any]:
    """Template-free restore of a trained payload ({"params": ...,
    "batch_stats": ...}) from either a `save_checkpoint` msgpack or a
    `save_bundle` serving npz. Dispatch is by content — npz is a ZIP
    container (PK magic) — so renamed files still route correctly, and
    programmatic callers of the documented load path (`predict.py:7`)
    get bundle support for free."""
    with open(path, "rb") as fh:
        head = fh.read(2)
    if head == b"PK":
        # self-contained serving bundle: same collections, plus the model
        # config/topology this tool does not need
        from iggcn_tpu.tools.serve import load_bundle
        _, params, batch_stats = load_bundle(path)
        return {"params": params, "batch_stats": batch_stats}
    from flax import serialization

    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())


def load_params(path: str) -> Dict[str, Any]:
    return load_payload(path)["params"]


def export_importances(params: Dict[str, Any], out_dir: str,
                       prefix: str = "ckpt") -> Dict[str, np.ndarray]:
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    # bias_n: the guide family's Bernoulli mask logits ((rois*H_0, 2);
    # softmax[:, 1] = keep-probability). The reference's export for this
    # family is commented-out dead code (`train_eval_guide_img_snps.py:314`
    # would crash — GUIDE_IMGSNP has no snps_prob/prob_bias tensors); rebuilt
    # as intended with the family's own artifact name.
    for key, fname in (("prob", "node_importance"),
                       ("snps_prob", "snps_importance"),
                       ("prob_bias", "edge_prob_bias"),
                       ("bias_n", "mask_importance")):
        if key in params:
            arr = np.asarray(params[key])
            out[key] = arr
            np.save(os.path.join(out_dir, f"{fname}_{prefix}.npy"), arr)
    return out


def plot_importances(exported: Dict[str, np.ndarray], out_dir: str,
                     prefix: str = "ckpt") -> list:
    """Render a sorted importance bar chart per exported tensor, in the
    tensor's analysis units (matching tests/test_interpretability.py):
    sigmoid for prob/snps_prob, softmax keep-probability for the guide
    family's bias_n mask logits. prob_bias (the edge-scorer WEIGHTS, not
    per-entity scores) is skipped — per-subject edge probabilities get
    their own heatmap when --x_npy is given."""
    from iggcn_tpu.utils.plots import plot_importance_bar

    def sigmoid(a):
        return 1.0 / (1.0 + np.exp(-np.asarray(a, np.float64)))

    pngs = []
    if "prob" in exported:
        v = sigmoid(exported["prob"])
        v = v.mean(axis=-1) if v.ndim > 1 else v      # (rois, D) -> (rois,)
        pngs.append(plot_importance_bar(
            v, os.path.join(out_dir, f"node_importance_{prefix}.png"),
            title="ROI importance sigmoid(prob)"))
    if "snps_prob" in exported:
        pngs.append(plot_importance_bar(
            sigmoid(exported["snps_prob"]).reshape(-1),
            os.path.join(out_dir, f"snps_importance_{prefix}.png"),
            title="SNP importance sigmoid(snps_prob)", item_name="SNP"))
    if "bias_n" in exported:
        logits = np.asarray(exported["bias_n"], np.float64)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        keep = (e / e.sum(axis=-1, keepdims=True))[:, 1]
        pngs.append(plot_importance_bar(
            keep, os.path.join(out_dir, f"mask_importance_{prefix}.png"),
            title="Gumbel mask keep-probability", item_name="feature"))
    return pngs


def export_edge_probabilities(params: Dict[str, Any], x: np.ndarray,
                              out_dir: str, prefix: str = "ckpt"
                              ) -> np.ndarray:
    """Per-subject dense edge scores sigmoid([x_i||x_j] @ prob_bias)
    (parity `kernel/sgcn_img_snp.py:139-145`)."""
    import jax
    import jax.numpy as jnp

    from iggcn_tpu.ops.masking import edge_probability_dense

    fn = jax.jit(lambda xa, pr, pb: edge_probability_dense(xa * pr, pb))
    ep = np.asarray(fn(jnp.asarray(x), jnp.asarray(params["prob"]),
                       jnp.asarray(params["prob_bias"])))
    np.save(os.path.join(out_dir, f"edge_probability_{prefix}.npy"), ep)
    return ep


def grad_cam(model, variables, x, adj, *, class_index: Optional[int] = None,
             is_explain: bool = False, pooled: bool = True) -> np.ndarray:
    """Per-ROI grad-CAM saliency for the SGCN image family.

    The functional equivalent of the reference's forward/backward hooks on
    `final_conv_acts` (`kernel/sgcn.py:111-148`): the model's `trunk` method
    returns the final conv's pre-relu activations A (B, N, C); the gradient
    dy/dA of the target class score is one `jax.grad` through the `head`
    method.  With `pooled=True` this is graph Grad-CAM (Pope et al.):
    alpha_c = mean_n dy/dA_{n,c},  map_n = relu(sum_c alpha_c A_{n,c});
    with `pooled=False`, the element-wise variant relu(sum_c dy/dA * A).

    Args:
      class_index: logit to explain; None = each subject's predicted class.
    Returns (B, N) float32 saliency maps.
    """
    import jax
    import jax.numpy as jnp

    cls = type(model)
    n_classes = getattr(model, "num_classes", None)
    if (class_index is not None and n_classes is not None
            and not 0 <= class_index < n_classes):
        # take_along_axis would silently clamp to the last class under jit
        raise ValueError(f"class_index {class_index} out of range for a "
                         f"{n_classes}-class model")

    # the jitted program is cached per (model config, flags): a fresh
    # closure per call would recompile the full trunk+head+grad program
    # on every invocation even at identical shapes (advisor r2)
    cache_key = (cls, _model_config_key(model), pooled, is_explain,
                 class_index)
    if cache_key in _GRADCAM_CACHE:
        return np.asarray(
            _GRADCAM_CACHE[cache_key](variables, jnp.asarray(x),
                                      jnp.asarray(adj)), np.float32)

    # one jitted program: eager ops are pathologically slow on a remote
    # backend (each op is a round-trip over the axon tunnel)
    @jax.jit
    def compute(variables, x, adj):
        prefix, acts = model.apply(variables, x, adj,
                                   is_explain=is_explain, method=cls.trunk)
        log_probs = model.apply(variables, prefix, acts, method=cls.head)
        if class_index is None:
            target = jnp.argmax(log_probs, axis=-1)
        else:
            target = jnp.full((x.shape[0],), class_index, jnp.int32)

        def score(a):
            lp = model.apply(variables, prefix, a, method=cls.head)
            return jnp.sum(jnp.take_along_axis(lp, target[:, None], axis=-1))

        grads = jax.grad(score)(acts)
        if pooled:
            alpha = jnp.mean(grads, axis=1, keepdims=True)     # (B, 1, C)
            return jax.nn.relu(jnp.sum(alpha * acts, axis=-1))  # (B, N)
        return jax.nn.relu(jnp.sum(grads * acts, axis=-1))

    _GRADCAM_CACHE[cache_key] = compute
    cam = compute(variables, jnp.asarray(x), jnp.asarray(adj))
    return np.asarray(cam, np.float32)


# jitted grad-CAM programs keyed on (model class, config fields, pooled,
# is_explain, class_index); see grad_cam
_GRADCAM_CACHE: Dict[tuple, Any] = {}


def _is_primitive(v) -> bool:
    if isinstance(v, tuple):
        return all(_is_primitive(x) for x in v)
    return isinstance(v, (int, float, bool, str, type(None)))


def _model_config_key(model) -> tuple:
    """Hashable key of a flax module's declared (hyperparameter) fields —
    the harness-managed `parent`/`name` fields are excluded. If ANY field
    is non-primitive (a nested config dataclass, a topology of arrays),
    two instances cannot be proven equivalent from primitives alone, so
    the key degrades to object identity — the cached closure keeps `model`
    alive, so the id cannot be recycled while the cache entry exists."""
    import dataclasses

    fields = [(f.name, getattr(model, f.name))
              for f in dataclasses.fields(model)
              if f.name not in ("parent", "name")]
    if all(_is_primitive(v) for _, v in fields):
        return tuple(fields)
    return ("model_id", id(model))


def export_grad_cam(params: Dict[str, Any], batch_stats: Dict[str, Any],
                    x: np.ndarray, adj: np.ndarray, out_dir: str,
                    prefix: str = "ckpt", *, use_gat: Optional[bool] = None,
                    num_layers: Optional[int] = None,
                    hidden: Optional[int] = None,
                    class_index: Optional[int] = None) -> np.ndarray:
    """Build the SGCN image-family model matching the checkpoint and dump
    saliency npys. `use_gat`/`num_layers`/`hidden` default to autodetection
    from the checkpoint's param keys and weight shapes (gat_w_i / conv_w_i /
    SGCNOri's conv1_w); the class count always follows the head kernel."""
    from iggcn_tpu.models.sgcn_image import SGCNImage, SGCNOri

    if "conv1_w" in params and "fc3" in params:
        # fixed SGCN_Ori architecture (parity kernel/sgcn.py:11-151);
        # its dims come from the weights, so explicit SGCNImage-family
        # overrides cannot apply — reject rather than silently ignore
        if num_layers is not None or hidden is not None or use_gat:
            raise ValueError(
                "checkpoint is an SGCN_Ori (fixed conv1->conv3) model; "
                "--gradcam_layers/--gradcam_hidden/use_gat do not apply")
        model = SGCNOri(
            h0=x.shape[2], rois=x.shape[1],
            h1=int(np.asarray(params["conv1_w"]).shape[1]),
            h3=int(np.asarray(params["conv3_w"]).shape[1]),
            num_classes=int(np.asarray(params["fc3"]["kernel"]).shape[1]))
    else:
        if use_gat is None:
            use_gat = any(k.startswith("gat_") for k in params)
        stem = "gat_w_" if use_gat else "conv_w_"
        conv_keys = [k for k in params if k.startswith(stem)]
        if not conv_keys:
            raise ValueError(
                "checkpoint has no SGCN image-family conv parameters "
                f"(no '{stem}*' keys); grad-CAM targets the SGCN image "
                "models (parity kernel/sgcn.py:111-148)")
        if num_layers is None:
            num_layers = len(conv_keys)
        if hidden is None:
            hidden = int(np.asarray(params[stem + "0"]).shape[1])
        model = SGCNImage(
            num_layers=num_layers, hidden=hidden, rois=x.shape[1],
            feat_dim=x.shape[2], use_gat=use_gat,
            num_classes=int(np.asarray(params["lin2"]["kernel"]).shape[1]))
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    cam = grad_cam(model, variables, x, adj, class_index=class_index)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"grad_cam_{prefix}.npy"), cam)
    return cam


def build_parser() -> argparse.ArgumentParser:
    """Parser construction hoisted from main() so the CLI reference
    (tools/gen_docs.py) can render it without side effects."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint",
                   help="gcn_state_dict_*.msgpack checkpoint or a "
                        "serving_bundle_*.npz bundle")
    p.add_argument("--out", default="./explain_out")
    p.add_argument("--prefix", default="ckpt")
    p.add_argument("--x_npy", default=None,
                   help="optional (S, N, D) features npy for per-subject "
                        "edge probabilities")
    p.add_argument("--adj_npy", default=None,
                   help="(S, N, N) adjacency npy; with --x_npy on an SGCN "
                        "image checkpoint, also exports grad-CAM saliency")
    p.add_argument("--gradcam_layers", type=int, default=None,
                   help="override layer count (default: infer from ckpt)")
    p.add_argument("--gradcam_hidden", type=int, default=None,
                   help="override hidden width (default: infer from ckpt)")
    p.add_argument("--gradcam_class", type=int, default=None)
    p.add_argument("--plot", action="store_true", default=False,
                   help="also render figures (png) next to each exported "
                        "npy: sorted importance bars, subject-mean edge-"
                        "probability heatmap, grad-CAM saliency bar")
    return p


def main(argv=None):
    from iggcn_tpu.utils.platform import honor_platform_env

    honor_platform_env()   # JAX_PLATFORMS=cpu must actually mean cpu
    from iggcn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # warm compiles + dead-tunnel watchdog
    args = build_parser().parse_args(argv)
    payload = load_payload(args.checkpoint)
    params = payload["params"]
    out = export_importances(params, args.out, args.prefix)
    n_exported = len(out)
    if out:
        print(f"exported {sorted(out)} to {args.out}")
    if args.plot and out:
        for png in plot_importances(out, args.out, args.prefix):
            print(f"figure {png}")
    if args.x_npy is not None:
        if "prob" in params and "prob_bias" in params:
            ep = export_edge_probabilities(params, np.load(args.x_npy),
                                           args.out, args.prefix)
            n_exported += 1
            print(f"edge probabilities {ep.shape} exported")
            if args.plot:
                from iggcn_tpu.utils.plots import plot_matrix
                png = plot_matrix(
                    ep.mean(axis=0),
                    os.path.join(args.out,
                                 f"edge_probability_{args.prefix}.png"),
                    title="Edge probability (subject mean)")
                print(f"figure {png}")
        else:
            # e.g. a GUIDE_IMGSNP checkpoint: its importances are the
            # Gumbel mask logits (bias_n), not the SGCN edge scorer
            print("edge probabilities skipped: checkpoint has no "
                  "prob/prob_bias importance parameters")
    if args.x_npy is not None and args.adj_npy is not None:
        if "go_network" in params or "mha_in_proj_weight" in params:
            # fused (imaging x genetics) checkpoint: the reference's grad-CAM
            # hooks exist only on the SGCN image family (kernel/sgcn.py:111),
            # and a fused head cannot be driven through SGCNImage
            print("grad-CAM skipped: fused-model checkpoint (importances and "
                  "edge probabilities above are the interpretability "
                  "artifacts for this family)")
        else:
            cam = export_grad_cam(
                params, payload.get("batch_stats") or {}, np.load(args.x_npy),
                np.load(args.adj_npy), args.out, args.prefix,
                num_layers=args.gradcam_layers, hidden=args.gradcam_hidden,
                class_index=args.gradcam_class)
            n_exported += 1
            print(f"grad-CAM saliency {cam.shape} exported")
            if args.plot:
                from iggcn_tpu.utils.plots import plot_importance_bar
                sal = np.abs(np.asarray(cam, np.float64))
                if sal.ndim > 1:
                    sal = sal.mean(axis=0)      # subject mean -> (rois,)
                while sal.ndim > 1:             # defensive: extra dims
                    sal = sal.mean(axis=-1)
                png = plot_importance_bar(
                    sal / max(float(sal.max()), 1e-12),
                    os.path.join(args.out, f"grad_cam_{args.prefix}.png"),
                    title="Grad-CAM saliency (subject mean, normalized)")
                print(f"figure {png}")
    if not n_exported:
        # exiting 0 with an empty export would read as success on e.g. a
        # SNP-only GO/MLP bundle, which carries no importance leaves at all
        import sys

        print(
            "error: no interpretability artifacts in this checkpoint — it "
            "has none of the prob/snps_prob/prob_bias importance leaves "
            "(those live on the SGCN image + fused families), and grad-CAM "
            "needs --x_npy/--adj_npy on an SGCN image-family checkpoint. "
            "SNP-only "
            "GeneOntologyNetwork/MLPModel bundles have no importance "
            "parameters; SNP importances come from the FUSED model "
            "(parity kernel/sgcn_img_snp.py:88-97).", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
