"""Property fuzz of the pruning engine over random DAGs.

The model-family tests pin the topologies we ship; this fuzzer attacks
the same machinery with randomized graphs — residual adds (2- and
3-way), concats (including concat-of-concat), shared branches, mixed
kernel/dilation — and asserts the two invariants that make pruning
trustworthy (SURVEY §7 hard parts 1-2):

  1. the declared-IR tracer and the jaxpr tracer derive the SAME
     topology (coupling groups, BN links, input segmentations,
     protected outputs) — two independent derivations agreeing;
  2. physical surgery is EXACT: the sliced model reproduces the full
     model with the pruned channels' BN scale+bias zeroed.

Reference equivalents: pruners/channel_pruner.py:501-737 (tracing),
:907-948 (surgery) — the reference never property-tests either.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.prune.jaxpr_trace import trace_topology_jaxpr
from dcfp_tpu.prune.pruner import ChannelPruner
from dcfp_tpu.prune.trace import trace_topology


class _SpaceMaskPruner(ChannelPruner):
    """Assigns a predetermined mask to every conv of a coupling space."""

    def __init__(self, topo, space_mask, **kw):
        super().__init__(**kw)
        self._topo = topo
        self._space_mask = space_mask

    def conv_masks(self, graph, topo, except_layers):
        out = {}
        for conv, space in self._topo.conv_space.items():
            if conv in except_layers:
                continue
            if space in self._space_mask:
                out[conv] = self._space_mask[space]
        return out


def random_net(seed: int):
    """Random stride-1 DAG of conv/bn/relu/add/concat nodes.

    Tracks a per-tensor segment-size signature so adds only join
    tensors with congruent channel segmentations (what a type-correct
    model builder would produce; e.g. HRNet fuses branches of matching
    widths)."""
    rng = np.random.default_rng(seed)
    widths = (4, 8, 12)
    b = GraphBuilder(f"fuzz{seed}")
    x = b.input("image")
    x = b.conv(x, "stem", out_ch=int(rng.choice(widths)), kernel=3)
    x = b.bn(x, "stem.bn")
    x = b.relu(x, "stem.r")

    # tensors[name] = tuple of segment sizes (conv outputs are one
    # segment; concat concatenates signatures)
    tensors = {x: (b.channels(x),)}
    n_ops = int(rng.integers(6, 14))
    for i in range(n_ops):
        op = rng.choice(["conv", "conv", "add", "concat", "dw", "se",
                         "pool"])
        names = list(tensors)
        if op == "se":
            # SE gate: globalpool -> 1x1 squeeze -> 1x1 excite ->
            # sigmoid -> mul with the trunk (couples the excite conv
            # into the trunk's space; reference tools/se_module.py)
            pool = [n for n in names if len(tensors[n]) == 1]
            if not pool:
                continue
            src = pool[int(rng.integers(len(pool)))]
            ch = b.channels(src)
            s = b.globalpool(src, f"s{i}.pool")
            s = b.conv(s, f"s{i}.fc1", out_ch=max(ch // 2, 2), kernel=1,
                       padding=0, bias=True)
            s = b.relu(s, f"s{i}.r")
            s = b.conv(s, f"s{i}.fc2", out_ch=ch, kernel=1, padding=0,
                       bias=True)
            s = b.sigmoid(s, f"s{i}.sig")
            y = b.mul([src, s], f"s{i}.scale")
            tensors[y] = tensors[src]
        elif op == "pool":
            src = names[int(rng.integers(len(names)))]
            y = b.maxpool(src, f"p{i}", kernel=3, stride=1, padding=1)
            tensors[y] = tensors[src]
        elif op == "dw":
            # depthwise over a single-segment tensor (channels map 1:1,
            # couples with the producing space)
            pool = [n for n in names if len(tensors[n]) == 1]
            if not pool:
                continue
            src = pool[int(rng.integers(len(pool)))]
            ch = b.channels(src)
            y = b.conv(src, f"d{i}", out_ch=ch, kernel=3, groups=ch)
            y = b.bn(y, f"d{i}.bn")
            y = b.relu(y, f"d{i}.r")
            tensors[y] = (ch,)
        elif op == "conv":
            src = names[int(rng.integers(len(names)))]
            k = int(rng.choice([1, 3]))
            y = b.conv(src, f"c{i}", out_ch=int(rng.choice(widths)),
                       kernel=k, padding=(0 if k == 1 else None),
                       dilation=int(rng.choice([1, 2])) if k == 3 else 1)
            y = b.bn(y, f"c{i}.bn")
            y = b.relu(y, f"c{i}.r")
            tensors[y] = (b.channels(y),)
        elif op == "add":
            # group tensors by segment signature; need >= 2 congruent
            by_sig = {}
            for n in names:
                by_sig.setdefault(tensors[n], []).append(n)
            pools = [v for v in by_sig.values() if len(v) >= 2]
            if not pools:
                continue
            pool = pools[int(rng.integers(len(pools)))]
            take = min(len(pool), int(rng.choice([2, 2, 3])))
            srcs = list(rng.choice(pool, size=take, replace=False))
            y = b.add_(srcs, f"a{i}")
            y = b.relu(y, f"a{i}.r")
            tensors[y] = tensors[srcs[0]]
        else:  # concat
            take = int(rng.choice([2, 3]))
            srcs = list(rng.choice(names, size=min(take, len(names)),
                                   replace=False))
            if len(srcs) < 2:
                continue
            y = b.concat(srcs, f"k{i}")
            sig = ()
            for s in srcs:
                sig = sig + tensors[s]
            tensors[y] = sig

    # classifier over a random tensor (bias, no BN) -> protected space
    src = list(tensors)[int(rng.integers(len(tensors)))]
    pred = b.conv(src, "pred", out_ch=5, kernel=1, padding=0, bias=True)
    g = b.finish([pred])
    g.ignore_prune = []
    return g


def _forward(g, params, state, x):
    outs, _ = graph_apply(g, params, state, {"image": jnp.asarray(x)},
                          train=False)
    return np.asarray(outs[g.outputs[0]])


def _space_key(topo, space):
    return frozenset(topo.spaces[space])


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_graph_topology_and_surgery(seed):
    rng = np.random.default_rng(1000 + seed)
    g = random_net(seed)
    params, state = init_graph(g, jax.random.key(seed))

    # -- invariant 1: independent tracers agree ------------------------
    t_ir = trace_topology(g)
    t_jx = trace_topology_jaxpr(g, params, state,
                                input_shape=(1, 17, 17, 3))
    assert set(t_ir.conv_space) == set(t_jx.conv_space)
    assert ({frozenset(v) for v in t_ir.spaces.values()}
            == {frozenset(v) for v in t_jx.spaces.values()})
    assert t_ir.norm_conv == t_jx.norm_conv
    for conv in t_ir.conv_space:
        segs_ir = [(None if s.space is None else _space_key(t_ir, s.space),
                    s.size) for s in t_ir.in_segments[conv]]
        segs_jx = [(None if s.space is None else _space_key(t_jx, s.space),
                    s.size) for s in t_jx.in_segments[conv]]
        assert segs_ir == segs_jx, conv
    assert ({_space_key(t_ir, s) for s in t_ir.output_spaces}
            == {_space_key(t_jx, s) for s in t_jx.output_spaces})

    # -- invariant 2: surgery == zeroed channels ------------------------
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    for bn in [n.name for n in g.bn_nodes()]:
        ch = g.node(bn).attrs["channels"]
        params[bn]["scale"] = rng.standard_normal(ch).astype(np.float32)
        params[bn]["bias"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["mean"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["var"] = (np.abs(rng.standard_normal(ch)) + 0.5
                            ).astype(np.float32)

    # random mask per non-protected coupling space, >= 1 channel kept.
    # Spaces containing a BN-less conv (SE gate fc layers) are skipped:
    # EIC masks only exist for BN-paired convs, so the real pruners
    # never prune those spaces (space_masks forces ones), and the
    # zeroed-BN emulation below cannot express pruning them either.
    space_mask = {}
    for space, convs in t_ir.spaces.items():
        if space in t_ir.output_spaces:
            continue
        if any(t_ir.conv_norm.get(c) is None for c in convs):
            continue
        ch = g.node(next(iter(convs))).attrs["out_ch"]
        m = rng.random(ch) > 0.4
        if not m.any():
            m[int(rng.integers(ch))] = True
        space_mask[space] = m

    pruner = _SpaceMaskPruner(t_ir, space_mask)
    zeroed = jax.tree.map(np.copy, params)
    masks = pruner.space_masks(g, t_ir)
    for space, m in masks.items():
        for conv in t_ir.spaces[space]:
            bn = t_ir.conv_norm.get(conv)
            if bn is not None:
                zeroed[bn]["scale"][~m] = 0.0
                zeroed[bn]["bias"][~m] = 0.0

    x = rng.standard_normal((2, 17, 17, 3)).astype(np.float32)
    full = _forward(g, zeroed, state, x)
    result = pruner.prune_model(g, zeroed, state)
    pruned = _forward(result.graph, result.params, result.state, x)
    np.testing.assert_allclose(pruned, full, rtol=1e-4, atol=1e-5)

    # something was actually cut (when any prunable space drew zeros)
    total_in = sum(n.attrs["out_ch"] for n in g.conv_nodes())
    total_out = sum(n.attrs["out_ch"]
                    for n in result.graph.conv_nodes())
    if any((~m).any() for m in space_mask.values()):
        assert total_out < total_in
    else:
        assert total_out == total_in


@pytest.mark.parametrize("seed", [2, 5])
def test_fuzzed_graph_remat_equivalence(seed):
    """remat segmentation must be value- and gradient-exact on arbitrary
    DAGs, not just the shipped models: random residual/concat/SE/depthwise
    graphs, train mode (live BN batch stats), 3 checkpoint segments."""
    rng = np.random.default_rng(2000 + seed)
    g = random_net(seed)
    params, state = init_graph(g, jax.random.key(seed))
    x = jnp.asarray(rng.standard_normal((2, 17, 17, 3),
                                        dtype=np.float32))

    def loss(p, segs):
        outs, new_bn = graph_apply(g, p, state, {"image": x},
                                   train=True, remat_segments=segs)
        return outs[g.outputs[0]].sum(), new_bn

    (l0, s0), g0 = jax.value_and_grad(loss, has_aux=True)(params, 0)
    (l1, s1), g1 = jax.value_and_grad(loss, has_aux=True)(params, 3)
    # checkpoint segments compile separately, so fusion/reduction order
    # (and hence last-ulp f32 rounding) may differ — tight allclose, not
    # bitwise (the dedicated branchy-model test pins exactness where the
    # schedules happen to coincide)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), s0, s1)
    # grads are large cancellation sums — reassociation moves small
    # elements by ~1e-4 abs; direction must agree to float precision
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4), g0, g1)

    def _cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        return 1.0 if denom == 0 else float(a @ b / denom)

    for (path0, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        # earliest layers accumulate the deepest cancellation chains
        # (stem feeds every path in these DAGs) — 0.999 matches the
        # repo's cross-schedule comparison convention (tests/mp_worker.py)
        assert _cos(a, b) > 0.999, path0
