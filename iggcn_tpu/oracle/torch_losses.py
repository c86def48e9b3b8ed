"""Torch-side assembly of the flagship's 7-term training objective.

Assembled independently from the repo's `iggcn_tpu/train/losses.py` —
directly from the reference's loss construction
(`kernel/train_eval_sgcn_img_snps.py:511-548`, sparsity penalty
`kernel/sgcn_img_snp.py:153-181`) — so the trajectory-parity test
(`tests/test_trajectory_parity.py`) and the convergence A/B
(`scripts/convergence_ab.py`) compare two INDEPENDENT derivations of the
same math, not one implementation against itself.
"""
import torch
import torch.nn.functional as F


def binary_entropy(p: torch.Tensor, eps: float = 1e-6) -> torch.Tensor:
    return -(p * torch.log(p + eps) + (1 - p) * torch.log(1 - p + eps))


def consistency(s: torch.Tensor, sim: torch.Tensor) -> torch.Tensor:
    """Similarity-consistency term tr(S^T L S) / n^2 over the t-SNE
    affinity graph (`kernel/train_eval_sgcn_img_snps.py:529-535`)."""
    deg = sim.sum(1)
    gram = s @ s.t()
    tr = (deg * gram.diag()).sum() - (sim * gram).sum()
    return tr / (s.shape[0] ** 2)


def sparsity_penalty(model, x, adj, with_snps=True):
    """loss_probability (`kernel/sgcn_img_snp.py:153-181`): L1 + binary
    entropy over the sigmoid node/SNP importances and the masked edge
    probabilities. `with_snps=False` is the image-only variant
    (`kernel/sgcn.py:88-109`: node L1 / N, no SNP term)."""
    xp = torch.sigmoid(model.prob)
    d = x.shape[-1]
    b = model.prob_bias.reshape(-1)
    xf = x * model.prob
    ep = torch.sigmoid((xf @ b[:d])[:, :, None] + (xf @ b[d:])[:, None, :])
    epm = ep[adj != 0]
    if with_snps:
        sp = torch.sigmoid(model.snps_prob)
        l1 = xp.abs().mean() + sp.abs().mean() + epm.abs().mean()
        ent = (binary_entropy(xp).mean() + binary_entropy(sp).mean()
               + binary_entropy(epm).mean())
    else:
        l1 = xp.abs().sum() / xp.shape[0] + epm.abs().mean()
        ent = binary_entropy(xp).mean() + binary_entropy(epm).mean()
    return 0.1 * l1 + 0.1 * ent


def orthogonality(hidden):
    """||W_n^T W_n - I||_F^2 / B^2 with row-normalized hidden rows
    (`kernel/sgcn_img_snp.py:198-205`)."""
    wn = hidden / hidden.norm(dim=1, keepdim=True).clamp_min(1e-12)
    gram = wn.t() @ wn
    eye = torch.eye(gram.shape[0])
    return ((gram - eye) ** 2).sum() / (hidden.shape[0] ** 2)


def tsne_similarity(tsne):
    """RBF affinity over the t-SNE features
    (`kernel/train_eval_sgcn_img_snps.py:529-535`)."""
    return torch.exp(-0.01 * torch.cdist(tsne, tsne) ** 2)


def seven_term_loss(model, x, adj, snps, y, clini, tsne, lw):
    """The reference 7-term train loss on a `TorchFused` replica: dual-pass
    CE + regression MSE + sparsity (L1+entropy over sigmoid importances and
    masked edge probabilities) + SNP reconstruction + similarity consistency
    + orthogonality (`kernel/train_eval_sgcn_img_snps.py:511-548`)."""
    out = model(x, adj, snps)
    out_m = model(x, adj, snps, is_explain=True)

    loss = lw.disease * (F.nll_loss(out[0], y) + F.nll_loss(out_m[0], y))
    loss = loss + lw.regr * (F.mse_loss(out[5], clini)
                             + F.mse_loss(out_m[5], clini)) / 2

    loss = loss + lw.prob * sparsity_penalty(model, x, adj)

    loss = loss + lw.reco * (((out[1] - snps) ** 2).sum()
                             + ((out_m[1] - snps) ** 2).sum()) / 2

    sim = tsne_similarity(tsne)
    loss = loss + lw.simi * (consistency(out[2], sim)
                             + consistency(out_m[2], sim)) / 2

    return loss + lw.orth * orthogonality(out[2])


def gcn_fusion_loss(model, x, adj, snps, y, clini, tsne, lw):
    """GCN_IMGSNP objective on a `TorchFused` replica: SINGLE forward,
    CE + regression MSE + SNP recon + similarity consistency +
    orthogonality — no sparsity term, no masked second pass
    (`kernel/train_eval_gcn_img_snps.py:448-483`)."""
    out = model(x, adj, snps)
    sim = tsne_similarity(tsne)
    return (lw.disease * F.nll_loss(out[0], y)
            + lw.regr * F.mse_loss(out[5], clini)
            + lw.reco * ((out[1] - snps) ** 2).sum()
            + lw.simi * consistency(out[2], sim)
            + lw.orth * orthogonality(out[2]))


def clusterlabel_loss(model, x, adj, snps, y, clust_y, lw):
    """SGCN_GCN_CLUSTERLABEL objective on a `TorchClusterLabel` replica:
    dual sequential pass, averaged disease/cluster CE on both passes,
    UNWEIGHTED sparsity penalty, averaged SNP reconstruction
    (`kernel/train_eval_sgcn_clusterlabel.py:365-399`)."""
    out = model(x, adj, snps)
    out_m = model(x, adj, snps, is_explain=True)
    ce = (F.nll_loss(out[0], y) + F.nll_loss(out[1], clust_y)) / 2
    mi = (F.nll_loss(out_m[0], y) + F.nll_loss(out_m[1], clust_y)) / 2
    recon = lw.reco * (((out[2] - snps) ** 2).sum()
                       + ((out_m[2] - snps) ** 2).sum()) / 2
    return ce + mi + sparsity_penalty(model, x, adj) + recon


def sgcn_image_loss(model, x, adj, y, *, lamda_ce=1.0, lamda_mi=1.0):
    """Image-only SGCN trainer objective on a `TorchSgcnImage` /
    `TorchSgcnOri` replica: lamda_ce*CE(plain) + loss_probability +
    lamda_mi*CE(masked), dual sequential pass, no genetics branch
    (`kernel/train_eval_sgcn.py:296-313`). Shared by the trajectory-parity
    tests and the convergence A/B."""
    lp = model(x, adj)
    lp_m = model(x, adj, is_explain=True)
    return (lamda_ce * F.nll_loss(lp, y)
            + sparsity_penalty(model, x, adj, with_snps=False)
            + lamda_mi * F.nll_loss(lp_m, y))


def snps_bce_loss(model, x, y, lambda0):
    """SNP-only GO trainer objective on a `TorchGoClassifier` replica:
    BCE(sum) over the positive-class probability + lambda0 * sum-MSE SNP
    reconstruction (`kernel/train_eval_snps.py:298-335` as-intended; the
    upstream trainer is broken — undefined `model`, arity mismatch).
    Shared by the 6-step trajectory test and the convergence A/B."""
    _, x_hat, y_hat = model(x)
    p = y_hat[:, 0].clamp(1e-7, 1.0)
    q = (1 - y_hat[:, 0]).clamp(1e-7, 1.0)
    bce = -(y * torch.log(p) + (1 - y) * torch.log(q)).sum()
    return bce + lambda0 * ((x_hat - x) ** 2).sum()


def guide_loss(model, x, adj, snps, y, clini, lw, *, temperature=0.1,
               rho=0.001, eps=1e-10):
    """The guide family's training objective on a `TorchGuide` replica:
    CE + regression MSE + SNP reconstruction + image surrogate
    reconstruction + Bernoulli-KL sparsity on the Gumbel keep-probabilities
    (`kernel/train_eval_guide_img_snps.py:450-489`; the positional lambda
    list maps prob -> SNP recon, reco -> image recon, simi -> KL). Shared by
    the trajectory-parity test and the convergence A/B so both compare the
    SAME independent derivation."""
    lp, snps_hat, _latent, reg, img_out, recon, rho_hat = model(
        x, adj, snps, temperature=temperature)
    s1 = (rho_hat * (torch.log(rho_hat + eps)
                     - torch.log(torch.tensor(rho) + eps))).mean()
    s2 = ((1 - rho_hat) * (torch.log(1 - rho_hat + eps)
                           - torch.log(torch.tensor(1 - rho) + eps))
          ).mean() + s1
    return (lw.disease * F.nll_loss(lp, y)
            + lw.regr * F.mse_loss(reg, clini)
            + lw.prob * ((snps_hat - snps) ** 2).sum()
            + lw.reco * ((img_out - recon) ** 2).sum()
            + lw.simi * s2)
