"""Whole-fold on-device training: one jit dispatch per CV fold.

The python-epoch driver (`train/cv.py`) dispatches ~4 device calls per epoch;
under a tunneled TPU each dispatch costs a round trip. Here the entire fold —
E epochs x (train scan + val eval + test eval), best-val bookkeeping included
— runs as a single `lax.scan` program. Host receives only the per-epoch
metric scalars, the small per-epoch test outputs, and the best-epoch bundle.

Best-val checkpointing is a `lax.cond`-selected parameter copy in the scan
carry (the reference re-saves `state_dict` whenever val loss improves,
`kernel/train_eval_sgcn_img_snps.py:176-185`; the file written at fold end is
identical to the last improvement's).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from iggcn_tpu.config import ModelConfig, TrainConfig
from iggcn_tpu.train.steps import TrainState, make_eval_step, make_train_step


class FoldCarry(NamedTuple):
    state: TrainState
    best_val: jax.Array        # scalar
    best_params: Any
    best_stats: Any
    best_test: Dict[str, jax.Array]   # best-epoch test outputs
    rng: jax.Array


def make_epoch_fns(model, mcfg: ModelConfig, tcfg: TrainConfig, optimizer,
                   objective):
    """The ONE implementation of per-epoch train/eval used by both the
    python-epoch debug driver (`cv._epoch_fns`, which jits these directly)
    and the whole-fold scan (`make_fold_runner`, which scans them over
    epochs). Returns un-jitted (train_one_epoch, eval_set)."""
    train_step = make_train_step(model, mcfg, tcfg, optimizer, objective)
    eval_step = make_eval_step(model, mcfg, tcfg, objective)
    b = tcfg.batch_size

    def eval_set(params, stats, data):
        nb = data["y"].shape[0] // b
        batches = {k: v.reshape((nb, b) + v.shape[1:])
                   for k, v in data.items() if k != "sbj_id"}

        def body(_, batch):
            return None, eval_step(params, stats, batch)

        _, outs = jax.lax.scan(body, None, batches)
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in outs.items()
                if k != "loss_sum"}
        flat["loss_sum"] = jnp.sum(outs["loss_sum"])
        return flat

    def train_one_epoch(state, data, perm, rng):
        shuffled = {k: jnp.take(v, perm, axis=0) for k, v in data.items()
                    if k != "sbj_id"}
        nb = shuffled["y"].shape[0] // b
        batches = {k: v.reshape((nb, b) + v.shape[1:])
                   for k, v in shuffled.items()}
        rngs = jax.random.split(rng, nb)

        def body(carry, xs):
            batch, r = xs
            new_state, loss_sum = train_step(carry, batch, r)
            return new_state, loss_sum

        state, loss_sums = jax.lax.scan(body, state, (batches, rngs),
                                        unroll=tcfg.scan_unroll)
        return state, jnp.sum(loss_sums)

    return train_one_epoch, eval_set


def make_fold_runner(model, mcfg: ModelConfig, tcfg: TrainConfig, optimizer,
                     objective, *, track_best_on: str = "val"):
    """Build a jitted fold runner.

    Args:
      track_best_on: 'val' (with-val CV) or 'test' (no-val CV parity).
    Returns fold_fn(state, train_data, val_data, test_data, perms, rng) ->
      (per_epoch dict, best bundle dict, final TrainState).
    `perms`: (E, S_train_total) int32 pre-drawn epoch permutations.
    """
    train_one_epoch, eval_set = make_epoch_fns(model, mcfg, tcfg, optimizer,
                                               objective)

    # donate the incoming TrainState: the caller always rebinds it to the
    # returned final state, and donation lets XLA update params/opt-state
    # in place instead of allocating a second copy
    @partial(jax.jit, donate_argnums=(0,))
    def fold_fn(state: TrainState, train_data, val_data, test_data, perms,
                rng):
        init_test = eval_set(state.params, state.batch_stats, test_data)
        carry = FoldCarry(state=state, best_val=jnp.asarray(jnp.inf),
                          best_params=state.params,
                          best_stats=state.batch_stats,
                          best_test=init_test, rng=rng)

        def epoch_body(carry: FoldCarry, perm):
            rng, erng = jax.random.split(carry.rng)
            state, train_loss_sum = train_one_epoch(carry.state, train_data,
                                                    perm, erng)
            test_out = eval_set(state.params, state.batch_stats, test_data)
            if track_best_on == "val":
                val_out = eval_set(state.params, state.batch_stats, val_data)
                val_loss_sum = val_out["loss_sum"]
            else:
                val_loss_sum = test_out["loss_sum"]

            improved = val_loss_sum < carry.best_val

            def pick(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b2: jnp.where(improved, a, b2), new, old)

            new_carry = FoldCarry(
                state=state,
                best_val=jnp.minimum(carry.best_val, val_loss_sum),
                best_params=pick(state.params, carry.best_params),
                best_stats=pick(state.batch_stats, carry.best_stats),
                best_test=pick(test_out, carry.best_test),
                rng=rng)
            per_epoch = {
                "train_loss_sum": train_loss_sum,
                "val_loss_sum": val_loss_sum,
                "test_loss_sum": test_out["loss_sum"],
                "log_probs": test_out["log_probs"],
                "pred": test_out["pred"],
            }
            if "our_reg" in test_out:
                per_epoch["our_reg"] = test_out["our_reg"]
            return new_carry, per_epoch

        carry, per_epoch = jax.lax.scan(epoch_body, carry, perms)
        best = {"params": carry.best_params, "batch_stats": carry.best_stats,
                "test": carry.best_test, "val_loss_sum": carry.best_val}
        return per_epoch, best, carry.state

    return fold_fn
