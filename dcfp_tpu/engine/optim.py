"""Optimizers + LR schedules (reference optimizer.py).

SGD-momentum / AdamW with a ``no_decay`` keyword list that zeroes weight
decay on matching parameter paths (optimizer.py:34-49), and the poly decay
schedule with optional linear warmup (optimizer.py:60-79) — here a pure
``step -> lr`` function baked into the optax chain, instead of mutating
param groups every iteration.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def poly_warmup_schedule(base_lr: float, num_steps: int, power: float = 0.9,
                         warmup: int = -1, warmup_ratio: float = 1e-6
                         ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(i) = base * (1 - i/N)^power, linearly warmed up over ``warmup``
    steps when warmup > 0 (reference optimizer.py:60-68)."""

    def schedule(count):
        frac = 1.0 - jnp.minimum(count, num_steps) / num_steps
        lr = base_lr * frac ** power
        if warmup > 0:
            ramp = 1.0 - (1.0 - count / warmup) * (1.0 - warmup_ratio)
            lr = jnp.where(count >= warmup, lr, lr * ramp)
        return lr

    return schedule


def _decay_mask(params, no_decay_keywords: Sequence[str]):
    """True where weight decay applies.  Matches the reference behavior:
    decay everything except params whose path contains a no-decay keyword
    (optimizer.py:34-57).  Paths look like 'backbone.layer1.0.bn1/scale'."""

    def mask_fn(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        return not any(k in name for k in no_decay_keywords)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(*, optim: str = "sgd", learning_rate: float = 1e-2,
                    momentum: float = 0.9, weight_decay: float = 5e-4,
                    betas: str = "0.9,0.999", num_steps: int = 40000,
                    power: float = 0.9, warmup: int = -1,
                    no_decay: Optional[str] = None,
                    params=None) -> optax.GradientTransformation:
    """Build the optax chain.  ``no_decay`` is the reference's comma-joined
    keyword list (e.g. 'bn,bias')."""
    schedule = poly_warmup_schedule(learning_rate, num_steps, power, warmup)
    keywords = [k for k in (no_decay or "").split(",") if k]
    if keywords:
        if params is None:
            raise ValueError("no_decay masking requires example params")
        mask = _decay_mask(params, keywords)
    else:
        mask = None

    if optim == "sgd":
        # torch SGD: grad += wd * param, then buf = mu * buf + grad,
        # update = -lr * buf — optax.trace matches that accumulation.
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    if optim == "adamw":
        b1, b2 = (float(x) for x in betas.split(","))
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2),
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.scale_by_learning_rate(schedule),
        )
    raise NotImplementedError(f"optim={optim!r}")
