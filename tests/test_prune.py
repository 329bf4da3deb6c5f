"""Pruning engine tests: exact surgery equivalence, bias compensation
exactness, topology on residual/concat/HRNet graphs, and the FLOPs search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.prune.pruner import (ChannelPruner, DCFPPruner,
                                   RandomChannelPruner, apply_channel_cfg,
                                   slice_params_to_cfg)
from dcfp_tpu.prune.search import prune_to_flops
from dcfp_tpu.prune.trace import trace_topology
from dcfp_tpu.utils.flops import count_flops_params


class FixedMaskPruner(ChannelPruner):
    """Test pruner with predetermined per-conv masks."""

    def __init__(self, masks, **kw):
        super().__init__(**kw)
        self.fixed = masks

    def conv_masks(self, graph, topo, except_layers):
        return {c: m for c, m in self.fixed.items()
                if c not in except_layers}


def residual_concat_net():
    """conv stem -> two residual blocks -> concat branch -> classifier."""
    b = GraphBuilder("net")
    x = b.input("image")
    x = b.conv(x, "stem", out_ch=8, kernel=3)
    x = b.bn(x, "stem_bn")
    x = b.relu(x, "stem_r")
    # residual block: two convs whose outputs couple via add
    c = b.conv(x, "blk.conv1", out_ch=16, kernel=3)
    c = b.bn(c, "blk.bn1")
    c = b.relu(c, "blk.r1")
    c = b.conv(c, "blk.conv2", out_ch=16, kernel=3)
    c = b.bn(c, "blk.bn2")
    d = b.conv(x, "blk.down", out_ch=16, kernel=1, padding=0)
    d = b.bn(d, "blk.down_bn")
    s = b.add_([c, d], "blk.sum")
    y = b.relu(s, "blk.out")
    # concat branch
    p = b.conv(y, "br.conv", out_ch=8, kernel=1, padding=0)
    p = b.bn(p, "br.bn")
    p = b.relu(p, "br.r")
    cat = b.concat([y, p], "cat")
    z = b.conv(cat, "head.conv", out_ch=12, kernel=3)
    z = b.bn(z, "head.bn")
    z = b.relu(z, "head.r")
    pred = b.conv(z, "pred", out_ch=5, kernel=1, padding=0, bias=True)
    g = b.finish([pred])
    g.ignore_prune = []
    return g


def test_topology_residual_and_concat():
    g = residual_concat_net()
    topo = trace_topology(g)
    # residual coupling: conv2 and down share one space
    assert topo.conv_space["blk.conv2"] == topo.conv_space["blk.down"]
    assert topo.conv_space["blk.conv1"] != topo.conv_space["blk.conv2"]
    # concat-fed conv sees two segments: the residual space + branch conv
    segs = topo.in_segments["head.conv"]
    assert len(segs) == 2 and segs[0].size == 16 and segs[1].size == 8
    assert segs[0].space == topo.conv_space["blk.conv2"]
    assert segs[1].space == topo.conv_space["br.conv"]
    # pred conv's space feeds the output -> protected
    assert topo.conv_space["pred"] in topo.output_spaces
    # BN links
    assert topo.norm_conv["blk.bn2"] == "blk.conv2"
    assert topo.conv_norm["blk.down"] == "blk.down_bn"


def _forward(g, params, state, x):
    outs, _ = graph_apply(g, params, state, {"image": jnp.asarray(x)},
                          train=False)
    return np.asarray(outs[g.outputs[0]])


def test_surgery_equals_zeroed_channels(rng):
    """Physically sliced model == full model with pruned channels' BN
    scale+bias zeroed (exact, no compensation involved since beta=0)."""
    g = residual_concat_net()
    params, state = init_graph(g, jax.random.key(0))
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    # give BNs nontrivial affine + running stats
    for bn in [n.name for n in g.bn_nodes()]:
        ch = g.node(bn).attrs["channels"]
        params[bn]["scale"] = rng.standard_normal(ch).astype(np.float32)
        params[bn]["bias"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["mean"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["var"] = (np.abs(rng.standard_normal(ch)) + 0.5
                            ).astype(np.float32)

    masks = {
        "stem": np.array([1, 0, 1, 1, 0, 1, 1, 1], bool),
        "blk.conv1": rng.random(16) > 0.3,
        "blk.conv2": rng.random(16) > 0.3,
        "blk.down": rng.random(16) > 0.5,
        "br.conv": np.array([1, 1, 0, 0, 1, 1, 1, 0], bool),
        "head.conv": rng.random(12) > 0.3,
    }
    pruner = FixedMaskPruner(masks)
    topo = trace_topology(g)
    space_masks = pruner.space_masks(g, topo)

    # zero pruned channels in the FULL model (scale and bias)
    zeroed = jax.tree.map(np.copy, params)
    for space, m in space_masks.items():
        for conv in topo.spaces[space]:
            bn = topo.conv_norm.get(conv)
            if bn is not None:
                zeroed[bn]["scale"][~m] = 0.0
                zeroed[bn]["bias"][~m] = 0.0

    x = rng.standard_normal((2, 17, 17, 3), dtype=np.float32)
    full = _forward(g, zeroed, state, x)

    result = pruner.prune_model(g, zeroed, state)
    pruned = _forward(result.graph, result.params, result.state, x)
    np.testing.assert_allclose(pruned, full, rtol=1e-4, atol=1e-5)
    # it really is smaller
    assert result.graph.node("blk.conv1").attrs["out_ch"] < 16


def test_bias_compensation_exact(rng):
    """Channels with scale=0 but beta>0 produce a constant relu(beta);
    pruning them with compensation must keep a 1x1-conv consumer exact."""
    b = GraphBuilder("comp")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    x = b.conv(x, "c2", out_ch=6, kernel=1, padding=0)
    x = b.bn(x, "n2")
    x = b.relu(x, "r2")
    pred = b.conv(x, "pred", out_ch=4, kernel=1, padding=0, bias=True)
    g = b.finish([pred])
    g.ignore_prune = []

    params, state = init_graph(g, jax.random.key(1))
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    prune = np.zeros(8, bool)
    prune[[1, 4, 6]] = True
    # pruned channels: gamma=0, beta>0 -> exact constant activation
    params["n1"]["scale"] = rng.standard_normal(8).astype(np.float32)
    params["n1"]["scale"][prune] = 0.0
    params["n1"]["bias"] = np.abs(rng.standard_normal(8)).astype(np.float32)
    params["n2"]["scale"] = rng.standard_normal(6).astype(np.float32)
    params["n2"]["bias"] = rng.standard_normal(6).astype(np.float32)
    state["n2"]["mean"] = rng.standard_normal(6).astype(np.float32)
    state["n2"]["var"] = (np.abs(rng.standard_normal(6)) + 0.5
                          ).astype(np.float32)

    x_in = rng.standard_normal((1, 9, 9, 3), dtype=np.float32)
    full = _forward(g, params, state, x_in)

    pruner = FixedMaskPruner({"c1": ~prune, "c2": np.ones(6, bool)})
    result = pruner.prune_model(g, params, state)
    pruned = _forward(result.graph, result.params, result.state, x_in)
    np.testing.assert_allclose(pruned, full, rtol=1e-4, atol=1e-5)


def test_dcfp_thresholds_and_floor():
    g = residual_concat_net()
    g.ignore_prune = []
    topo = trace_topology(g)
    # scores: make head.conv's bn scores all tiny -> floor must kick in
    eic = {}
    for bn, conv in topo.norm_conv.items():
        ch = g.node(conv).attrs["out_ch"]
        eic[bn] = np.linspace(0.1, 1.0, ch).astype(np.float32)
    eic["head.bn"] = np.full(12, 1e-6, np.float32)
    pruner = DCFPPruner(eic, global_percent=0.5, layer_keep=0.25)
    masks = pruner.conv_masks(g, topo, set())
    # floor: 25% of 12 = 3 channels minimum survive
    assert masks["head.conv"].sum() == 3
    # threshold pools: all these BNs are non-backbone (group 1)
    scores = np.sort(np.concatenate([v for v in eic.values()]))
    thr = scores[int(scores.size * 0.5)]
    assert (masks["stem"] == (eic["stem_bn"] > thr)).all()


def test_deeplabv3_prune_end_to_end(rng):
    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para={"os": 8}, num_classes=19,
                        align_corner=True, deepsup=True)
    g = model.graph
    params, state = init_graph(g, jax.random.key(0))
    topo = trace_topology(g)
    # random EIC scores for every prunable BN
    eic = {bn: np.random.default_rng(7).random(
        g.node(bn).attrs["channels"]).astype(np.float32)
        for bn in topo.norm_conv}
    pruner = DCFPPruner(eic, global_percent=0.5, layer_keep=0.02,
                        except_start_keys=["conv_deepsup"])
    result = pruner.prune_model(g, params, state)

    # forward works at pruned widths
    x = rng.standard_normal((1, 33, 33, 3), dtype=np.float32)
    outs, _ = graph_apply(result.graph, result.params, result.state,
                          {"image": jnp.asarray(x)})
    assert outs["pred"].shape == (1, 33, 33, 19)

    # FLOPs strictly reduced; protected layers untouched
    f0, p0 = count_flops_params(g, (65, 65))
    f1, p1 = count_flops_params(result.graph, (65, 65))
    assert f1 < 0.75 * f0 and p1 < p0
    assert result.graph.node("aspp.conv1").attrs["out_ch"] == 512  # ignored
    assert result.graph.node("backbone.layer4.2.conv3").attrs[
        "out_ch"] == 2048  # residual group excepted via layer4.2.bn3
    assert result.graph.node("conv_deepsup.0").attrs["out_ch"] == 512
    assert result.graph.node("last_conv.6").attrs["out_ch"] == 19

    # channel_cfg round-trip: rebuild fresh graph at pruned widths
    fresh = build_model("deeplabv3", backbone="resnet50",
                        backbone_para={"os": 8}, num_classes=19,
                        align_corner=True, deepsup=True).graph
    rebuilt = apply_channel_cfg(fresh, result.channel_cfg)
    for n in rebuilt.conv_nodes():
        assert n.attrs["out_ch"] == result.graph.node(n.name).attrs["out_ch"]
    # sliced-param helper produces loadable shapes
    p2, s2 = slice_params_to_cfg(
        jax.tree.map(np.asarray, params), state, result.channel_cfg)
    outs2, _ = graph_apply(rebuilt, p2, s2, {"image": jnp.asarray(x)})
    assert outs2["pred"].shape == (1, 33, 33, 19)


def test_hrnet_topology_and_prune_smoke(rng):
    model = build_model("simple", backbone="hrnetv2w48",
                        backbone_para={"width": 18}, num_classes=7,
                        deepsup=False)
    g = model.graph
    topo = trace_topology(g)
    assert len(topo.spaces) > 50  # dense fusion lattice traced
    params, state = init_graph(g, jax.random.key(0))
    pruner = RandomChannelPruner(global_percent=0.3, layer_keep=0.1, seed=3)
    result = pruner.prune_model(g, params, state)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    outs, _ = graph_apply(result.graph, result.params, result.state,
                          {"image": jnp.asarray(x)})
    assert outs["pred"].shape == (1, 32, 32, 7)


def test_hrnet_surgery_exactness(rng):
    """HRNet is the pruning stress test (SURVEY §7 hard part 1: dozens
    of coupled spaces through the dense cross-resolution fusion
    lattice).  Beyond the shape smoke above, assert the strong
    invariant the fuzzer proves on random DAGs: physical surgery
    reproduces the full model with the pruned channels' BN scale+bias
    zeroed, EXACTLY (reference surgery: channel_pruner.py:907-948)."""
    model = build_model("simple", backbone="hrnetv2w48",
                        backbone_para={"width": 18}, num_classes=7,
                        deepsup=False)
    g = model.graph
    topo = trace_topology(g)
    params, state = init_graph(g, jax.random.key(1))

    # randomize BN affine + running stats so zeroed-channel emulation
    # is a strong check (fresh-init scale=1/bias=0 would hide errors)
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    for n in g.bn_nodes():
        ch = g.node(n.name).attrs["channels"]
        params[n.name]["scale"] = rng.standard_normal(ch).astype(np.float32)
        params[n.name]["bias"] = rng.standard_normal(ch).astype(np.float32)
        state[n.name]["mean"] = rng.standard_normal(ch).astype(np.float32)
        state[n.name]["var"] = (np.abs(rng.standard_normal(ch)) + 0.5
                                ).astype(np.float32)

    # random mask per prunable coupling space (>=1 channel kept)
    fixed = {}
    for space, convs in topo.spaces.items():
        if space in topo.output_spaces:
            continue
        if any(topo.conv_norm.get(c) is None for c in convs):
            continue
        ch = g.node(next(iter(convs))).attrs["out_ch"]
        m = rng.random(ch) > 0.4
        if not m.any():
            m[int(rng.integers(ch))] = True
        for conv in convs:
            fixed[conv] = m
    pruner = FixedMaskPruner(fixed)

    masks = pruner.space_masks(g, topo)
    zeroed = jax.tree.map(np.copy, params)
    for space, m in masks.items():
        for conv in topo.spaces[space]:
            bn = topo.conv_norm.get(conv)
            if bn is not None:
                zeroed[bn]["scale"][~m] = 0.0
                zeroed[bn]["bias"][~m] = 0.0

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    full, _ = graph_apply(g, zeroed, state, {"image": jnp.asarray(x)},
                          train=False)
    result = pruner.prune_model(g, zeroed, state)
    pruned, _ = graph_apply(result.graph, result.params, result.state,
                            {"image": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(pruned["pred"]),
                               np.asarray(full["pred"]),
                               rtol=1e-4, atol=1e-5)
    # the lattice was actually cut hard
    total_in = sum(n.attrs["out_ch"] for n in g.conv_nodes())
    total_out = sum(n.attrs["out_ch"] for n in result.graph.conv_nodes())
    assert total_out < 0.85 * total_in

    # finetune-path rebuild (reference train.py:200-205): a fresh
    # full-width HRNet graph rewritten to channel_cfg runs the pruned
    # weights bit-identically
    rebuilt = apply_channel_cfg(g, result.channel_cfg)
    outs2, _ = graph_apply(rebuilt, result.params, result.state,
                           {"image": jnp.asarray(x)}, train=False)
    np.testing.assert_array_equal(np.asarray(outs2["pred"]),
                                  np.asarray(pruned["pred"]))


def test_flops_search(rng):
    train_model = build_model("deeplabv3", backbone="resnet50",
                              num_classes=19, deepsup=True)
    deploy_model = build_model("deeplabv3", backbone="resnet50",
                               num_classes=19, deepsup=False)
    g = train_model.graph
    params, state = init_graph(g, jax.random.key(0))
    topo = trace_topology(g)
    eic = {bn: np.random.default_rng(11).random(
        g.node(bn).attrs["channels"]).astype(np.float32)
        for bn in topo.norm_conv}
    result, gp, report = prune_to_flops(
        g, deploy_model.graph, params, state, eic, prune_ratio=0.5,
        input_hw=(128, 128))
    assert report["flops_ratio"] <= 0.5
    assert 0.5 <= gp <= 0.99

def test_channel_align_rounds_up_and_preserves_equivalence(rng):
    """channel_align must (a) make every pruned space's kept count a
    multiple of the alignment, (b) keep pruned==rebuilt forward
    equivalence (the TPU tiling extension must not break surgery)."""
    import jax
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.prune.pruner import DCFPPruner, apply_channel_cfg
    from dcfp_tpu.prune.trace import trace_topology

    graph = residual_concat_net()
    params, state = init_graph(graph, jax.random.key(0))
    eic = {bn.name: np.abs(rng.standard_normal(bn.attrs["channels"]))
           for bn in graph.bn_nodes()}
    pruner = DCFPPruner(eic, global_percent=0.6, layer_keep=0.05,
                        channel_align=8)
    topo = trace_topology(graph)
    masks = pruner.space_masks(graph, topo)
    protected = set(topo.output_spaces)
    aligned_spaces = 0
    for space, m in masks.items():
        if space in protected or m.all():
            continue
        assert int(m.sum()) % 8 == 0, (space, int(m.sum()))
        aligned_spaces += 1
    assert aligned_spaces > 0  # the test must actually exercise alignment

    # alignment keeps strictly more channels than the unaligned pruner
    base = DCFPPruner(eic, global_percent=0.6, layer_keep=0.05)
    base_masks = base.space_masks(graph, topo)
    for space in masks:
        assert masks[space].sum() >= base_masks[space].sum()
        # aligned mask is a superset: resurrect, never re-prune
        assert (masks[space] | base_masks[space] == masks[space]).all()

    result = pruner.prune_model(graph.copy(), params, state)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    rebuilt = apply_channel_cfg(graph, result.channel_cfg)
    out1, _ = graph_apply(result.graph, result.params, result.state,
                          {"image": x})
    out2, _ = graph_apply(rebuilt, result.params, result.state,
                          {"image": x})
    np.testing.assert_allclose(np.asarray(out1["pred"]),
                               np.asarray(out2["pred"]), rtol=1e-5,
                               atol=1e-5)


def test_depthwise_conv_coupling_and_surgery(rng):
    """MobileNet-style block: 1x1 expand -> depthwise 3x3 -> 1x1 project.
    The depthwise conv joins its parent's coupling group (the reference's
    depthwise parser, channel_pruner.py:324-329) and surgery slices its
    kernel + groups together with the shared mask (deploy_subnet's
    groups = in_channels, channel_pruner.py:934-936)."""
    b = GraphBuilder("mb")
    x = b.input("image")
    x = b.conv(x, "expand", out_ch=12, kernel=1, padding=0)
    x = b.bn(x, "expand.bn")
    x = b.relu(x, "expand.r")
    x = b.conv(x, "dw", out_ch=12, kernel=3, groups=12)
    x = b.bn(x, "dw.bn")
    x = b.relu(x, "dw.r")
    pred = b.conv(x, "project", out_ch=5, kernel=1, padding=0, bias=True)
    g = b.finish([pred])
    g.ignore_prune = []

    topo = trace_topology(g)
    # depthwise couples with its parent conv
    assert topo.conv_space["dw"] == topo.conv_space["expand"]
    assert topo.norm_conv["dw.bn"] == "dw"

    # jaxpr tracer agrees
    from dcfp_tpu.prune.jaxpr_trace import trace_topology_jaxpr
    params, state = init_graph(g, jax.random.key(0))
    t_jx = trace_topology_jaxpr(g, params, state, input_shape=(1, 9, 9, 3))
    assert ({frozenset(v) for v in topo.spaces.values()}
            == {frozenset(v) for v in t_jx.spaces.values()})
    assert topo.norm_conv == t_jx.norm_conv

    # surgery == zeroed channels (scale+bias zeroed on BOTH bns of the
    # shared space)
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    for bn in ("expand.bn", "dw.bn"):
        params[bn]["scale"] = rng.standard_normal(12).astype(np.float32)
        params[bn]["bias"] = rng.standard_normal(12).astype(np.float32)
        state[bn]["mean"] = rng.standard_normal(12).astype(np.float32)
        state[bn]["var"] = (np.abs(rng.standard_normal(12)) + 0.5
                            ).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0, 1, 1, 1, 0, 1], bool)
    for bn in ("expand.bn", "dw.bn"):
        params[bn]["scale"][~mask] = 0.0
        params[bn]["bias"][~mask] = 0.0

    x_in = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
    full = _forward(g, params, state, x_in)
    pruner = FixedMaskPruner({"expand": mask, "dw": mask})
    result = pruner.prune_model(g, params, state)
    pruned = _forward(result.graph, result.params, result.state, x_in)
    np.testing.assert_allclose(pruned, full, rtol=1e-4, atol=1e-5)

    dwn = result.graph.node("dw")
    kept = int(mask.sum())
    assert dwn.attrs["out_ch"] == kept and dwn.attrs["in_ch"] == kept
    assert dwn.attrs["groups"] == kept
    assert result.params["dw"]["kernel"].shape == (3, 3, 1, kept)

    # the finetune-path rebuild (apply_channel_cfg) shrinks groups too,
    # and the rebuilt graph runs with the surgically sliced params
    g2 = apply_channel_cfg(g, result.channel_cfg)
    assert g2.node("dw").attrs["groups"] == kept
    out2 = _forward(g2, result.params, result.state, x_in)
    np.testing.assert_allclose(out2, pruned, rtol=1e-5, atol=1e-6)


def test_dcfp_flops_search_depthwise_net(rng):
    """The full EIC -> two-pool threshold -> FLOPs-targeted search on a
    depthwise (MobileNet-style) net, with tracer verification enabled
    ('verify' computes both derivations and errors on disagreement)."""
    b = GraphBuilder("mbnet")
    x = b.input("image")
    x = b.conv(x, "backbone.stem", out_ch=16, kernel=3, stride=2)
    x = b.bn(x, "backbone.stem.bn")
    x = b.relu(x, "backbone.stem.r")
    for i, ch in enumerate((24, 32)):
        x = b.conv(x, f"backbone.b{i}.dw", out_ch=b.channels(x), kernel=3,
                   groups=b.channels(x))
        x = b.bn(x, f"backbone.b{i}.dw.bn")
        x = b.relu(x, f"backbone.b{i}.dw.r")
        x = b.conv(x, f"backbone.b{i}.pw", out_ch=ch, kernel=1, padding=0)
        x = b.bn(x, f"backbone.b{i}.pw.bn")
        x = b.relu(x, f"backbone.b{i}.pw.r")
    pred = b.conv(x, "pred", out_ch=7, kernel=1, padding=0, bias=True)
    g = b.finish([pred])
    g.ignore_prune = []

    params, state = init_graph(g, jax.random.key(2))
    topo = trace_topology(g)
    eic = {bn: np.random.default_rng(3).random(
        g.node(conv).attrs["out_ch"]).astype(np.float32)
        for bn, conv in topo.norm_conv.items()}
    result, gp, report = prune_to_flops(
        g, g, params, state, eic, prune_ratio=0.3, layer_keep=0.1,
        except_start_keys=(), input_hw=(33, 33), trace="verify")
    assert report["flops_ratio"] <= 0.7
    # depthwise convs kept their 1:1 structure
    for i in range(2):
        dw = result.graph.node(f"backbone.b{i}.dw")
        assert dw.attrs["groups"] == dw.attrs["in_ch"] == dw.attrs["out_ch"]
    # pruned model runs
    x_in = rng.standard_normal((1, 33, 33, 3)).astype(np.float32)
    out = _forward(result.graph, result.params, result.state, x_in)
    assert out.shape[-1] == 7


def test_input_joined_space_is_protected(rng):
    """A space joined elementwise with unprunable channels (the graph
    input) has its width pinned from outside — both tracers must protect
    it, and surgery must keep the deployed graph runnable."""
    b = GraphBuilder("pin")
    x = b.input("image", channels=3)
    c = b.conv(x, "c1", out_ch=3, kernel=3)
    bn = b.bn(c, "bn1")
    a = b.add_([x, bn], "a")
    z = b.conv(a, "c2", out_ch=8, kernel=3)
    z = b.bn(z, "bn2")
    pred = b.conv(z, "pred", out_ch=4, kernel=1, padding=0, bias=True)
    g = b.finish([pred])

    topo = trace_topology(g)
    assert topo.conv_space["c1"] in topo.output_spaces

    from dcfp_tpu.prune.jaxpr_trace import trace_topology_jaxpr
    params, state = init_graph(g, jax.random.key(1))
    t_jx = trace_topology_jaxpr(g, params, state,
                                input_shape=(1, 17, 17, 3))
    assert t_jx.conv_space["c1"] in t_jx.output_spaces

    # a mask that would shrink c1 must be overridden to ones by the
    # protection, leaving the add well-formed after surgery
    pruner = FixedMaskPruner({
        "c1": np.array([1, 0, 1], bool),
        "c2": np.array([1, 0, 1, 1, 0, 1, 1, 1], bool),
    })
    res = pruner.prune_model(g, params, state)
    assert res.graph.node("c1").attrs["out_ch"] == 3
    assert res.graph.node("c2").attrs["out_ch"] == 6
    x_in = rng.standard_normal((1, 17, 17, 3)).astype(np.float32)
    out = _forward(res.graph, res.params, res.state, x_in)
    assert out.shape == (1, 17, 17, 4)
