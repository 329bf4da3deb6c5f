"""EIC (expected importance of channels) scoring — the DCFP training-time
statistic (reference pruners/dcfp_pruner.py:7-26).

Per prunable BN scale parameter gamma, per step:

    flag    = grad(gamma) * gamma > 0          # gradient shrinks channel
    eic_new = where(flag, r * eic + (1-r) * |grad|, eic)

The reference implements this with a post-backward hook reading ``.grad``
(train.py:267-268); here it is a pure function of (params, grads, eic)
folded into the jitted train step as carried state — the gradients seen are
the data-parallel-mean gradients, matching DDP's averaged-grad semantics.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from dcfp_tpu.graph.ir import Graph

EicState = Dict[str, jnp.ndarray]


def prunable_bn_names(graph: Graph):
    ignore = set(graph.ignore_prune)
    return [n.name for n in graph.bn_nodes() if n.name not in ignore]


def init_eic(graph: Graph) -> EicState:
    return {name: jnp.zeros((graph.node(name).attrs["channels"],),
                            jnp.float32)
            for name in prunable_bn_names(graph)}


def eic_update(eic: EicState, params, grads, r: float = 0.999) -> EicState:
    new = {}
    for name, score in eic.items():
        g = grads[name]["scale"].astype(jnp.float32)
        w = params[name]["scale"].astype(jnp.float32)
        flag = g * w > 0
        new[name] = jnp.where(flag, r * score + (1.0 - r) * jnp.abs(g),
                              score)
    return new
