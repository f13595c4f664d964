"""Train state, optimizer construction, LR schedule, backbone freezing.

TPU-native rewrite of the reference's optimizer setup:

- exponential LR decay ``lr * rate^(step / steps)`` continuous in the step —
  exact parity with ``engines/lr.py:20-23``,
- Adam(0.9, 0.999) per ``run_nerf.py:320``,
- frozen-backbone finetune: the reference flips ``requires_grad`` off for
  every param whose name lacks ``semantic_linear`` (``run_nerf.py:307-318``);
  here that is an ``optax.masked`` gradient mask over the ``sem_*`` head
  subtrees (NeRF has no normalization layers, so masked updates keep the
  backbone bit-exact).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def exp_decay_schedule(init_lr: float, decay_rate: float, decay_steps: float) -> optax.Schedule:
    """lr(step) = init_lr * decay_rate^(step / decay_steps).

    Parity: reference ``engines/lr.py:22`` (continuous exponent, no staircase).
    """

    def schedule(step):
        return init_lr * (decay_rate ** (step / decay_steps))

    return schedule


def fast_forward_schedule(opt_state: Any, step: int) -> Any:
    """Set every ``ScaleByScheduleState`` count inside ``opt_state`` to ``step``.

    The reference drives its LR scheduler with the loop's ``global_step``
    (``run_nerf.py:355`` restores it; ``engines/lr.py:20-23`` is stateless in
    the step), so a finetune ingesting a 150k-step torch checkpoint resumes at
    the decayed LR (~1.26e-4), not back at ``init_lr``. optax's schedule keeps
    its own internal count, which starts at 0 on a fresh ``tx.init`` — this
    fast-forwards it. Adam moments (and their bias-correction count) stay
    fresh, which is correct for freshly-initialized moments.
    """
    import jax.numpy as jnp

    is_sched = lambda s: isinstance(s, optax.ScaleByScheduleState)

    def fix(s):
        if is_sched(s):
            return optax.ScaleByScheduleState(count=jnp.asarray(step, jnp.int32))
        return s

    return jax.tree_util.tree_map(fix, opt_state, is_leaf=is_sched)


def semantic_head_mask(params: Any) -> Any:
    """True for semantic-head params (``sem_*`` Dense layers), False elsewhere.

    Mirrors the reference's name test ``'semantic_linear' in name``
    (``run_nerf.py:313-318``) — note ``geo_map_sem`` (our ``geo_*``) is NOT
    matched there either, so it stays frozen under ``fix_backbone``.
    """

    def mark(tree: Any, inside_sem: bool) -> Any:
        if isinstance(tree, dict):
            return {
                k: mark(v, inside_sem or k.startswith("sem_"))
                for k, v in tree.items()
            }
        return inside_sem

    return mark(params, False)


def make_optimizer(
    init_lr: float,
    decay_rate: float = 0.1,
    decay_steps: float = 250_000,
    fix_backbone: bool = False,
    params: Optional[Any] = None,
    mask_fn: Callable[[Any], Any] = semantic_head_mask,
) -> optax.GradientTransformation:
    """Adam + exponential decay, optionally restricted to the semantic head."""
    tx = optax.adam(exp_decay_schedule(init_lr, decay_rate, decay_steps), b1=0.9, b2=0.999)
    if fix_backbone:
        # multi_transform (not optax.masked alone — masked passes raw grads
        # through for unmasked leaves): frozen params get zero updates.
        def labels(p):
            return jax.tree_util.tree_map(
                lambda m: "train" if m else "freeze", mask_fn(p)
            )

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            labels(params) if params is not None else labels,
        )
    return tx
