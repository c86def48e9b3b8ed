"""StepLR-parity pins: the reference decays the LR in place at the END of
every `lr_decay_step_size`-th epoch, per fold
(`kernel/train_eval_sgcn_img_snps.py:169-171`)."""
import jax.numpy as jnp
import numpy as np

from iggcn_tpu.config import TrainConfig
from iggcn_tpu.train.steps import lr_at_step, steplr_host


def test_steplr_host_decays_after_each_window():
    # epochs are 0-indexed here; the reference's epoch 50 (1-indexed) decay
    # means epochs 0..49 run at lr, 50..99 at lr*f, ...
    assert steplr_host(1e-3, 0.5, 50, 0) == 1e-3
    assert steplr_host(1e-3, 0.5, 50, 49) == 1e-3
    assert steplr_host(1e-3, 0.5, 50, 50) == 5e-4
    assert steplr_host(1e-3, 0.5, 50, 149) == 2.5e-4
    assert steplr_host(1e-3, 0.5, 0, 1000) == 1e-3   # disabled


def test_lr_at_step_matches_host_per_fold():
    tcfg = TrainConfig(epochs=200, lr=1e-3, lr_decay_factor=0.5,
                       lr_decay_step_size=50)
    for spe in (7, 16):     # folds of different sizes
        for step in (0, spe - 1, 50 * spe - 1, 50 * spe, 123 * spe):
            epoch = step // spe
            expected = steplr_host(tcfg.lr, tcfg.lr_decay_factor,
                                   tcfg.lr_decay_step_size, epoch)
            got = float(lr_at_step(tcfg, jnp.asarray(step, jnp.int32),
                                   jnp.asarray(spe, jnp.int32)))
            np.testing.assert_allclose(got, expected, rtol=1e-6,
                                       err_msg=f"spe={spe} step={step}")


def test_lr_at_step_vectorizes_over_folds():
    """Different folds (different steps_per_epoch) get different decay
    points from the SAME traced function — the fold-parallel requirement."""
    import jax

    tcfg = TrainConfig(lr=1.0, lr_decay_factor=0.1, lr_decay_step_size=2)
    spes = jnp.asarray([2, 3], jnp.int32)
    steps = jnp.asarray([4, 4], jnp.int32)   # epoch 2 vs epoch 1
    lrs = jax.vmap(lambda s, p: lr_at_step(tcfg, s, p))(steps, spes)
    np.testing.assert_allclose(np.asarray(lrs), [0.1, 1.0], rtol=1e-6)
