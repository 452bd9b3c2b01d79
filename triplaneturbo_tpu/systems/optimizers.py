"""Adan optimizer (Adaptive Nesterov Momentum) as an optax transformation.

Rebuild of the reference Adan used for all TriplaneTurbo training
(/root/reference/threestudio/systems/optimizers.py:23-315;
configs/TriplaneTurbo_v1.yaml:235-244: lr 2e-4, betas (0.98, 0.92, 0.99),
eps 1e-15). Update rule (Xie et al. 2022, bias-corrected as in the torch
implementation):

  m_k = (1-β1) m_{k-1} + β1 g_k
  v_k = (1-β2) v_{k-1} + β2 (g_k - g_{k-1})
  n_k = (1-β3) n_{k-1} + β3 [g_k + (1-β2)(g_k - g_{k-1})]²
  update = (m̂ + (1-β2) v̂) / (sqrt(n̂) + eps)
  θ = (θ - lr · update) / (1 + lr · wd)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jax.Array
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def scale_by_adan(
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-15,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(
            count=jnp.zeros([], jnp.int32), m=zeros(), v=zeros(), n=zeros(), prev_grad=zeros()
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        is_first = state.count == 0

        def diff(g, pg):
            return jnp.where(is_first, jnp.zeros_like(g), g - pg)

        gd = jax.tree_util.tree_map(diff, grads, state.prev_grad)
        m = jax.tree_util.tree_map(lambda m_, g: (1 - b1) * m_ + b1 * g, state.m, grads)
        v = jax.tree_util.tree_map(lambda v_, d: (1 - b2) * v_ + b2 * d, state.v, gd)
        n = jax.tree_util.tree_map(
            lambda n_, g, d: (1 - b3) * n_ + b3 * (g + (1 - b2) * d) ** 2,
            state.n, grads, gd,
        )
        cf = count.astype(jnp.float32)
        bc1 = 1 - (1 - b1) ** cf
        bc2 = 1 - (1 - b2) ** cf
        bc3 = 1 - (1 - b3) ** cf

        def upd(m_, v_, n_):
            denom = jnp.sqrt(n_ / bc3) + eps
            return (m_ / bc1 + (1 - b2) * v_ / bc2) / denom

        updates = jax.tree_util.tree_map(upd, m, v, n)
        return updates, AdanState(count=count, m=m, v=v, n=n, prev_grad=grads)

    return optax.GradientTransformation(init_fn, update_fn)


def adan(
    learning_rate: float = 2e-4,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-15,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    txs = [scale_by_adan(betas, eps)]
    if weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


def guarded_adan(
    learning_rate: float = 2e-4,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-15,
    weight_decay: float = 0.0,
    grad_clip_norm: Optional[float] = None,
    accumulation_steps: int = 1,
    skip_nonfinite: bool = True,
) -> optax.GradientTransformation:
    """Adan with the training-loop numerical armor around it.

    Reference parity: the guidance nan_to_num's its image-space grads
    (guidance:661,1079,1455) and clips them via the update_step hook
    (guidance:1765-1770); torch AMP additionally skips non-finite optimizer
    steps. Here: optional global-norm clip on the PARAM grads, MultiSteps
    accumulation, and an outermost optax.apply_if_finite gate so one
    non-finite grad batch is skipped-and-counted instead of poisoning the
    accumulator/params forever (measured failure mode r4: NaN grads x
    MultiSteps' mid-cycle acc*0 update = NaN params from step 1 on).
    The skip count rides in ``opt_state.total_notfinite``.
    """
    tx = adan(learning_rate, betas, eps, weight_decay)
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, accumulation_steps)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx
