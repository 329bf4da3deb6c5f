"""The jaxpr-based topology tracer (SURVEY §7 layer (b) — the general,
autograd-graph-equivalent derivation) must agree EXACTLY with the
declared-IR tracer on every model family: same coupling groups, same
BN<->conv links, same per-conv input segmentations, same protected
output spaces.  Two independent derivations agreeing is the strongest
internal check the topology the pruner consumes is right (the reference
has only its single autograd walk, channel_pruner.py:501-737)."""

import numpy as np
import pytest

import jax

from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.prune.jaxpr_trace import trace_topology_jaxpr
from dcfp_tpu.prune.trace import trace_topology

CASES = [
    ("deeplabv3", "resnet50",
     {"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128}, {}, True),
    ("deeplabv3p", "resnet50", {"os": 16}, {}, True),
    ("psp", "resnet50", {"os": 8}, {}, True),
    ("simple", "resnet50", {"os": 32, "mg_unit": [1, 1, 1],
                            "inplanes": 64}, {}, False),
    ("simple", "hrnetv2w48", {"width": 18},
     {"in_channels": [270, 270]}, False),
]


def _space_key(topo, space):
    """Stable identity of a space: the frozen set of its member convs."""
    return frozenset(topo.spaces[space])


@pytest.mark.parametrize("head,backbone,bpara,mpara,deepsup", CASES)
def test_jaxpr_topology_matches_ir_topology(head, backbone, bpara, mpara,
                                            deepsup):
    model = build_model(head, backbone=backbone, backbone_para=bpara,
                        model_para=mpara, num_classes=7,
                        align_corner=False, deepsup=deepsup)
    g = model.graph
    params, state = init_graph(g, jax.random.key(0))
    hw = 65 if backbone.startswith("resnet") else 64
    t_ir = trace_topology(g)
    t_jx = trace_topology_jaxpr(g, params, state,
                                input_shape=(1, hw, hw, 3))

    # same conv inventory
    assert set(t_ir.conv_space) == set(t_jx.conv_space)
    # same coupling groups (space ids are representative-elect, so
    # compare as sets of member sets)
    groups_ir = {frozenset(v) for v in t_ir.spaces.values()}
    groups_jx = {frozenset(v) for v in t_jx.spaces.values()}
    assert groups_ir == groups_jx
    # same BN pairing
    assert t_ir.norm_conv == t_jx.norm_conv
    # same per-conv input segmentation, resolved to group identity
    for conv in t_ir.conv_space:
        segs_ir = [(None if s.space is None else _space_key(t_ir, s.space),
                    s.size) for s in t_ir.in_segments[conv]]
        segs_jx = [(None if s.space is None else _space_key(t_jx, s.space),
                    s.size) for s in t_jx.in_segments[conv]]
        assert segs_ir == segs_jx, conv
    # same protected output spaces
    outs_ir = {_space_key(t_ir, s) for s in t_ir.output_spaces}
    outs_jx = {_space_key(t_jx, s) for s in t_jx.output_spaces}
    assert outs_ir == outs_jx


def test_jaxpr_tracer_drives_the_pruner():
    """The jaxpr-derived topology is a drop-in for the IR one: prune with
    it and the pruned model still runs and matches the IR-topology prune
    exactly."""
    from dcfp_tpu.graph.apply import graph_apply
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.pruner import DCFPPruner

    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                       "inplanes": 64},
                        num_classes=5, align_corner=False, deepsup=False)
    g = model.graph
    params, state = init_graph(g, jax.random.key(0))
    r = np.random.default_rng(2)
    eic = {bn: r.uniform(0, 1, g.node(bn).attrs["channels"]
                         ).astype(np.float32)
           for bn in prunable_bn_names(g)}

    pruner = DCFPPruner(eic, global_percent=0.5, layer_keep=0.02)
    topo_jx = trace_topology_jaxpr(g, params, state,
                                   input_shape=(1, 33, 33, 3))
    masks_jx = pruner.space_masks(g, topo_jx)
    res_jx = pruner.deploy(g, topo_jx, params, state, masks_jx)

    pruner2 = DCFPPruner(eic, global_percent=0.5, layer_keep=0.02)
    res_ir = pruner2.prune_model(g, params, state)

    for node in res_ir.graph.conv_nodes():
        assert (res_jx.graph.node(node.name).attrs["out_ch"]
                == node.attrs["out_ch"]), node.name
    x = np.random.default_rng(0).standard_normal(
        (1, 33, 33, 3)).astype(np.float32)
    out, _ = graph_apply(res_jx.graph, res_jx.params, res_jx.state,
                         {"image": x})
    assert out["pred"].shape == (1, 33, 33, 5)


def test_prune_search_trace_modes_agree():
    """prune_to_flops(trace='verify') gates on exact IR/jaxpr agreement,
    and trace='jaxpr' yields the identical pruned architecture."""
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    def build():
        return build_model("deeplabv3", backbone="resnet50",
                           backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                          "inplanes": 64},
                           num_classes=5, align_corner=False,
                           deepsup=True)

    train_g = build().graph
    deploy_g = build_model("deeplabv3", backbone="resnet50",
                           backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                          "inplanes": 64},
                           num_classes=5, align_corner=False,
                           deepsup=False).graph
    params, state = init_graph(train_g, jax.random.key(0))
    r = np.random.default_rng(3)
    eic = {bn: r.uniform(0, 1, train_g.node(bn).attrs["channels"]
                         ).astype(np.float32)
           for bn in prunable_bn_names(train_g)}

    results = {}
    for mode in ("verify", "jaxpr"):
        res, gp, report = prune_to_flops(
            train_g, deploy_g, params, state, eic, prune_ratio=0.5,
            input_hw=(64, 64), trace=mode)
        results[mode] = (res, gp, report["flops_ratio"])

    res_v, gp_v, fr_v = results["verify"]
    res_j, gp_j, fr_j = results["jaxpr"]
    assert gp_v == gp_j and fr_v == fr_j
    for node in res_v.graph.conv_nodes():
        assert (res_j.graph.node(node.name).attrs["out_ch"]
                == node.attrs["out_ch"]), node.name
