"""Channel-topology discovery from the jaxpr — SURVEY §7 layer (b).

The reference discovers conv coupling by walking torch's autograd graph
(channel_pruner.py:501-737, pinned to torch-1.10 grad_fn class names).
The honest JAX equivalent is a walk over the *jaxpr* of the model's
forward: ``trace_topology_jaxpr`` traces ``graph_apply`` (or any
compatible ``fn(params, state, image)``), propagates a channel
descriptor through every primitive — conv_general_dilated creates a
fresh channel space, elementwise joins union spaces (residual adds),
concatenate splices segments, dot_general/reduce/transpose/... pass
channels through — and emits the same :class:`~dcfp_tpu.prune.trace.
Topology` structure the declared-IR tracer produces.

This is both the general tracer (it sees only primitives, not the IR, so
it works for any forward built from the same op vocabulary) and a
validation oracle for :func:`dcfp_tpu.prune.trace.trace_topology`:
tests assert the two derivations agree on every model family.

BN pairing falls out of the arithmetic: an eval-mode BatchNorm is
``x * f(scale, var) + g(...)`` — a broadcast multiply whose (C,) operand
derives from a BN scale parameter; the multiply links that BN to the
conv space flowing through ``x`` (the reference's trace_norm_conv_links,
channel_pruner.py:522-614).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from dcfp_tpu.prune.trace import Segment, Topology, _UnionFind

Seg = Tuple[Optional[str], int]  # (source conv name | None, size)


@dataclasses.dataclass(frozen=True)
class _Act:
    """Activation descriptor: which axis holds channels, and the channel
    segmentation (source conv per contiguous range)."""
    ch_axis: int
    segs: Tuple[Seg, ...]


@dataclasses.dataclass(frozen=True)
class _Vec:
    """Per-channel vector derived from params/state (BN scale chains,
    conv biases): carries the contributing (node, key) paths."""
    paths: frozenset
    ch_axis: Optional[int] = None  # set once broadcast to tensor rank


@dataclasses.dataclass(frozen=True)
class _Kernel:
    name: str  # conv node whose kernel this value is


class _JaxprTracer:
    def __init__(self, bn_scale_names):
        self.uf = _UnionFind()
        self.bn_scale_names = bn_scale_names  # node names that are BNs
        self.conv_in: Dict[str, Tuple[Seg, ...]] = {}
        self.conv_out_ch: Dict[str, int] = {}
        self.norm_conv: Dict[str, str] = {}
        self.env: Dict[Any, Any] = {}
        # spaces joined elementwise with unprunable channels (width pinned
        # by the other operand) — resolved into output_spaces at assembly
        self.pinned: List[str] = []

    # -- env ------------------------------------------------------------
    def read(self, atom):
        from jax._src.core import Literal
        if isinstance(atom, Literal):
            return None
        return self.env.get(atom)

    def write(self, var, val):
        self.env[var] = val

    # -- union semantics (trace.py:77-90) --------------------------------
    def _unify(self, a: Tuple[Seg, ...], b: Tuple[Seg, ...], where: str
               ) -> Tuple[Seg, ...]:
        if len(a) != len(b) or any(sa != sb for (_, sa), (_, sb)
                                   in zip(a, b)):
            raise ValueError(
                f"{where}: elementwise op joins incongruent channel "
                f"segmentations {a} vs {b}")
        out: List[Seg] = []
        for (ca, sa), (cb, _) in zip(a, b):
            if ca is None or cb is None:
                keep = cb if ca is None else ca
                if keep is not None:
                    self.pinned.append(keep)
                out.append((None, sa))
            else:
                self.uf.union(ca, cb)
                out.append((ca, sa))
        return tuple(out)

    # -- per-primitive rules ---------------------------------------------
    def eval_eqn(self, eqn):
        prim = eqn.primitive.name
        invals = [self.read(v) for v in eqn.invars]
        out_aval = eqn.outvars[0].aval if eqn.outvars else None

        if prim in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "custom_vjp_call_jaxpr",
                    "remat_call", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is None:
                fun = eqn.params.get("fun_jaxpr")
                inner = fun
            jaxpr = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            for var, val in zip(jaxpr.invars, invals):
                self.write(var, val)
            for inner_eqn in jaxpr.eqns:
                self.eval_eqn(inner_eqn)
            for outer, inner_var in zip(eqn.outvars, jaxpr.outvars):
                self.write(outer, self.read(inner_var))
            return

        out = self._rule(prim, eqn, invals, out_aval)
        if eqn.outvars:
            self.write(eqn.outvars[0], out)

    def _acts(self, invals):
        return [v for v in invals if isinstance(v, _Act)]

    def _vec_paths(self, invals):
        paths = frozenset()
        for v in invals:
            if isinstance(v, _Vec):
                paths |= v.paths
        return paths

    def _rule(self, prim, eqn, invals, out_aval):
        UNARY = {"convert_element_type", "copy", "stop_gradient", "neg",
                 "exp", "log", "log1p", "expm1", "rsqrt", "sqrt", "abs",
                 "sign", "floor", "ceil", "round", "logistic", "tanh",
                 "erf", "integer_pow", "is_finite", "reduce_precision",
                 "real", "imag", "cbrt", "square"}
        BINARY = {"add", "sub", "mul", "div", "max", "min", "pow",
                  "atan2", "rem", "and", "or", "xor", "nextafter",
                  "shift_left", "select_n"}

        if prim in UNARY:
            v = invals[0]
            if isinstance(v, (_Act, _Vec, _Kernel)):
                return v
            return None

        if prim in BINARY:
            acts = self._acts(invals)
            if len(acts) >= 2:
                segs = acts[0].segs
                for other in acts[1:]:
                    segs = self._unify(segs, other.segs, prim)
                return _Act(acts[0].ch_axis, segs)
            if len(acts) == 1:
                act = acts[0]
                if prim in ("mul", "add", "sub", "div"):
                    # BN link: a broadcast (C,) operand that derives from
                    # a BN scale pairs that BN with the conv space in x
                    for v in invals:
                        if isinstance(v, _Vec) and (
                                v.ch_axis == act.ch_axis
                                or v.ch_axis is None):
                            self._maybe_norm_link(v, act)
                return act
            # vectors only
            paths = self._vec_paths(invals)
            if paths:
                ch = next((v.ch_axis for v in invals
                           if isinstance(v, _Vec)), None)
                return _Vec(paths, ch)
            return None

        if prim == "broadcast_in_dim":
            v = invals[0]
            bdims = eqn.params["broadcast_dimensions"]
            if isinstance(v, _Vec):
                ch = bdims[0] if len(bdims) == 1 else v.ch_axis
                return _Vec(v.paths, ch)
            if isinstance(v, _Act):
                return _Act(bdims[v.ch_axis], v.segs)
            return None

        if prim == "conv_general_dilated":
            lhs, rhs = invals[0], invals[1]
            dn = eqn.params["dimension_numbers"]
            groups = eqn.params.get("feature_group_count", 1)
            if not isinstance(rhs, _Kernel):
                raise NotImplementedError(
                    "conv kernel is not a traced parameter leaf")
            name = rhs.name
            out_ch = out_aval.shape[dn.out_spec[1]]
            in_ch = eqn.invars[0].aval.shape[dn.lhs_spec[1]]
            if groups != 1:
                if not (groups == in_ch == out_ch):
                    raise NotImplementedError(
                        "grouped conv with 1 < groups < in_ch (the "
                        "reference's pruner does not support these "
                        "either, channel_pruner.py:934)")
                # depthwise: joins its parent's coupling group (the
                # reference's depthwise parser, channel_pruner.py:324-329)
                if (not isinstance(lhs, _Act) or len(lhs.segs) != 1
                        or lhs.segs[0][0] is None):
                    raise NotImplementedError(
                        "depthwise conv over a concat or unprunable "
                        "input")
                self.uf.union(lhs.segs[0][0], name)
                self.conv_in[name] = lhs.segs
                self.conv_out_ch[name] = out_ch
                return _Act(dn.out_spec[1], ((name, out_ch),))
            if isinstance(lhs, _Act):
                self.conv_in[name] = lhs.segs
            else:
                self.conv_in[name] = ((None, in_ch),)
            self.conv_out_ch[name] = out_ch
            return _Act(dn.out_spec[1], ((name, out_ch),))

        if prim == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            for side, (contract, batch) in ((0, (lc, lb)), (1, (rc, rb))):
                v = invals[side]
                if not isinstance(v, _Act):
                    continue
                other = invals[1 - side]
                if isinstance(other, _Act):
                    raise NotImplementedError(
                        "dot_general of two traced activations")
                if v.ch_axis in contract:
                    return None  # channels contracted away: opaque
                ndim = eqn.invars[side].aval.ndim
                free = [d for d in range(ndim)
                        if d not in contract and d not in batch]
                if v.ch_axis in batch:
                    new_ax = batch.index(v.ch_axis)
                else:
                    off = len(lb)
                    if side == 1:
                        lhs_ndim = eqn.invars[0].aval.ndim
                        off += lhs_ndim - len(lc) - len(lb)
                    new_ax = off + free.index(v.ch_axis)
                return _Act(new_ax, v.segs)
            return None

        if prim == "concatenate":
            dim = eqn.params["dimension"]
            acts = self._acts(invals)
            if acts and all(isinstance(v, _Act) for v in invals):
                if all(a.ch_axis == dim for a in invals):
                    segs: List[Seg] = []
                    for a in invals:
                        segs.extend(a.segs)
                    return _Act(dim, tuple(segs))
                # spatial concat: all parts must share one segmentation
                segs = invals[0].segs
                for a in invals[1:]:
                    segs = self._unify(segs, a.segs, "concatenate")
                return _Act(invals[0].ch_axis, segs)
            return None

        if prim in ("reduce_window_max", "reduce_window_sum",
                    "reduce_window_min", "reduce_window"):
            v = invals[0]
            if isinstance(v, _Act):
                dims = eqn.params["window_dimensions"]
                if dims[v.ch_axis] == 1:
                    return v
            return None

        if prim in ("reduce_sum", "reduce_max", "reduce_min",
                    "reduce_prod", "reduce_and", "reduce_or",
                    "argmax", "argmin"):
            v = invals[0]
            axes = eqn.params.get("axes", ())
            if isinstance(v, _Act) and v.ch_axis not in axes:
                shift = sum(1 for a in axes if a < v.ch_axis)
                return _Act(v.ch_axis - shift, v.segs)
            if isinstance(v, _Vec):
                return _Vec(v.paths)
            return None

        if prim == "transpose":
            v = invals[0]
            perm = eqn.params["permutation"]
            if isinstance(v, _Act):
                return _Act(perm.index(v.ch_axis), v.segs)
            return v

        if prim == "pad":
            v = invals[0]
            if isinstance(v, _Act):
                cfg = eqn.params["padding_config"]
                lo, hi, interior = cfg[v.ch_axis]
                if lo == 0 and hi == 0 and interior == 0:
                    return v
            return None

        if prim in ("squeeze",):
            v = invals[0]
            if isinstance(v, _Act):
                dims = eqn.params["dimensions"]
                if v.ch_axis not in dims:
                    shift = sum(1 for d in dims if d < v.ch_axis)
                    return _Act(v.ch_axis - shift, v.segs)
            return v if isinstance(v, _Vec) else None

        if prim == "reshape":
            v = invals[0]
            if isinstance(v, _Act):
                old = eqn.invars[0].aval.shape
                new = out_aval.shape
                # common case: channels stay the trailing axis
                if (v.ch_axis == len(old) - 1 and new
                        and new[-1] == old[-1]):
                    return _Act(len(new) - 1, v.segs)
            return None

        if prim in ("slice", "dynamic_slice"):
            v = invals[0]
            if isinstance(v, _Act):
                in_shape = eqn.invars[0].aval.shape
                if out_aval.shape[v.ch_axis] == in_shape[v.ch_axis]:
                    return v
            return None

        if prim in ("iota", "rng_bit_generator", "random_seed",
                    "random_wrap", "random_bits", "random_unwrap",
                    "eq", "ne", "lt", "le", "gt", "ge", "sort",
                    "gather", "scatter", "cumsum", "cumlogsumexp"):
            return None

        raise NotImplementedError(
            f"jaxpr tracer: no rule for primitive {prim!r}")

    # -- BN pairing ------------------------------------------------------
    def _maybe_norm_link(self, vec: _Vec, act: _Act):
        bn_names = {name for name, key in vec.paths
                    if key == "scale" and name in self.bn_scale_names}
        if len(bn_names) != 1:
            return
        bn = next(iter(bn_names))
        if len(act.segs) == 1 and act.segs[0][0] is not None:
            self.norm_conv.setdefault(bn, act.segs[0][0])


def trace_topology_jaxpr(graph, params, state,
                         input_shape=(1, 65, 65, 3)) -> Topology:
    """Derive the channel topology of ``graph`` by abstractly evaluating
    the jaxpr of its forward — no use of the declared IR topology."""
    import dcfp_tpu.graph.apply as apply_mod
    from dcfp_tpu.graph.apply import graph_apply

    bn_names = {n.name for n in graph.bn_nodes()}

    def fwd(params, state, image):
        outs, _ = graph_apply(graph, params, state, {"image": image},
                              train=False)
        return outs

    image = jax.ShapeDtypeStruct(input_shape, np.float32)
    # keep every conv a conv_general_dilated (the shifted-matmul rewrite
    # is a performance alias, not a different topology)
    saved = apply_mod.DILATED_MATMUL_MIN
    apply_mod.DILATED_MATMUL_MIN = 10**9
    try:
        closed = jax.make_jaxpr(fwd)(params, state, image)
    finally:
        apply_mod.DILATED_MATMUL_MIN = saved

    tracer = _JaxprTracer(bn_names)

    # map flattened arguments to (node, key) paths
    flat, _ = jax.tree_util.tree_flatten_with_path((params, state))
    args_flat = [leaf for _, leaf in flat] + [image]
    paths = [p for p, _ in flat]
    jaxpr = closed.jaxpr
    assert len(jaxpr.invars) == len(args_flat), (
        len(jaxpr.invars), len(args_flat))
    for var, path in zip(jaxpr.invars[:-1], paths):
        # path like (SeqKey(0), DictKey('backbone.conv1'), DictKey('kernel'))
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        name, key = keys[-2], keys[-1]
        if key == "kernel":
            tracer.write(var, _Kernel(name))
        else:
            tracer.write(var, _Vec(frozenset({(name, key)})))
    img_var = jaxpr.invars[-1]
    in_ch = input_shape[-1]
    tracer.write(img_var, _Act(len(input_shape) - 1, ((None, in_ch),)))
    for var in jaxpr.constvars:
        tracer.write(var, None)

    for eqn in jaxpr.eqns:
        tracer.eval_eqn(eqn)

    # -- assemble the Topology (same resolution as trace.py:113-149) -----
    uf = tracer.uf

    def resolved(segs):
        return [Segment(None if c is None else uf.find(c), s)
                for c, s in segs]

    conv_space = {name: uf.find(name) for name in tracer.conv_in}
    spaces: Dict[str, List[str]] = {}
    for conv, sp in conv_space.items():
        spaces.setdefault(sp, []).append(conv)
    in_segments = {name: resolved(segs)
                   for name, segs in tracer.conv_in.items()}
    norm_conv = dict(tracer.norm_conv)
    conv_norm = {v: k for k, v in norm_conv.items()}

    output_spaces = {uf.find(c) for c in tracer.pinned}
    for var in jaxpr.outvars:
        v = tracer.read(var)
        if isinstance(v, _Act):
            for seg in resolved(v.segs):
                if seg.space is not None:
                    output_spaces.add(seg.space)

    return Topology(spaces=spaces, conv_space=conv_space,
                    norm_conv=norm_conv, conv_norm=conv_norm,
                    in_segments=in_segments,
                    output_spaces=sorted(output_spaces))


def topology_mismatches(t_a: Topology, t_b: Topology) -> List[str]:
    """Compare two topologies up to space-id renaming; return a list of
    human-readable mismatch descriptions (empty = exact agreement).

    Space ids are representative-elect (union-find roots), so identity is
    the frozen set of member convs, as in tests/test_jaxpr_trace.py."""
    def space_key(topo, space):
        return frozenset(topo.spaces[space])

    out: List[str] = []
    if set(t_a.conv_space) != set(t_b.conv_space):
        out.append("conv inventory differs: %s" % sorted(
            set(t_a.conv_space) ^ set(t_b.conv_space)))
        return out
    groups_a = {frozenset(v) for v in t_a.spaces.values()}
    groups_b = {frozenset(v) for v in t_b.spaces.values()}
    if groups_a != groups_b:
        out.append("coupling groups differ: %s" % [
            sorted(g) for g in groups_a ^ groups_b])
    if t_a.norm_conv != t_b.norm_conv:
        diff = {k for k in set(t_a.norm_conv) | set(t_b.norm_conv)
                if t_a.norm_conv.get(k) != t_b.norm_conv.get(k)}
        out.append("BN pairing differs at: %s" % sorted(diff))
    for conv in sorted(t_a.conv_space):
        segs_a = [(None if s.space is None else space_key(t_a, s.space),
                   s.size) for s in t_a.in_segments[conv]]
        segs_b = [(None if s.space is None else space_key(t_b, s.space),
                   s.size) for s in t_b.in_segments[conv]]
        if segs_a != segs_b:
            out.append("input segmentation differs at conv %s" % conv)
    outs_a = {space_key(t_a, s) for s in t_a.output_spaces}
    outs_b = {space_key(t_b, s) for s in t_b.output_spaces}
    if outs_a != outs_b:
        out.append("protected output spaces differ")
    return out
