"""SNP-only GO-network classifier trainer (intended semantics of the broken
reference `kernel/train_eval_snps.py`, SURVEY §2a)."""
import numpy as np

from iggcn_tpu.train.snps_trainer import cross_validation_snps


def test_snps_cv_learns_separable_labels(topo):
    rng = np.random.default_rng(0)
    s = 60
    y = rng.integers(0, 2, s)
    # strong class-dependent SNP signal
    mu = rng.random((2, topo.num_snps))
    snps = np.clip(mu[y] + rng.normal(0, 0.05, (s, topo.num_snps)), 0, 1
                   ).astype(np.float32)
    res = cross_validation_snps(snps, y, topo, folds=3, epochs=8,
                                batch_size=10, lr=3e-3)
    assert res.accs.shape == (3, 8)
    assert np.isfinite(res.mean_loss)
    # separable data: best epoch should beat chance comfortably
    assert res.best_acc > 0.65
