"""Generic CV trainer end-to-end on synthetic TU graphs (parity target:
`kernel/train_eval.py` NLL cross-validation)."""
import numpy as np

from iggcn_tpu.data.tu import synthetic_tu_dataset
from iggcn_tpu.models.baselines import GIN, DiffPool, Graclus
from iggcn_tpu.train.generic_cv import cross_validation_generic


def test_gin_cv_learns():
    ds = synthetic_tu_dataset(np.random.default_rng(0), num_graphs=60)
    res = cross_validation_generic(
        ds, GIN(num_layers=2, hidden=8, num_classes=ds.num_classes),
        folds=3, epochs=4, batch_size=16)
    assert res.accs.shape == (3, 4)
    assert np.isfinite(res.mean_loss)
    assert res.best_acc > 0.5  # above chance on separable synthetic data


def test_graclus_cv_no_val():
    ds = synthetic_tu_dataset(np.random.default_rng(1), num_graphs=48)
    res = cross_validation_generic(
        ds, Graclus(num_layers=3, hidden=8, num_classes=ds.num_classes),
        folds=3, epochs=2, batch_size=16, needs_assign=True, no_val=True)
    assert np.isfinite(res.mean_loss)


def test_diffpool_cv_aux_losses():
    ds = synthetic_tu_dataset(np.random.default_rng(2), num_graphs=48)
    res = cross_validation_generic(
        ds, DiffPool(max_nodes=ds.x.shape[1], hidden=8,
                     num_classes=ds.num_classes),
        folds=3, epochs=2, batch_size=16, aux_loss=True)
    assert np.isfinite(res.mean_loss)
