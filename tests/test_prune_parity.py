"""Head-to-head pruning parity against the reference's OWN pruner code.

Two directions (the last buildable links of the accuracy-parity chain,
short of real datasets):

* mask golden — identical EIC scores are fed to our ``DCFPPruner`` and to
  the reference's ``DCFPPruner.get_thresh``/``gen_channel_mask``
  (/root/reference/pruners/dcfp_pruner.py:43-94, run verbatim on stub
  modules — no autograd tracing needed) and the per-BN channel masks must
  be identical, including the two-pool quantile thresholds and the
  layer_keep floor;
* reverse interop — our exported ``channel_cfg.pth``/``pruned.pth`` are
  consumed by the reference's ``init_pruned_model``
  (/root/reference/pruners/channel_pruner.py:29-74) + ``load_model``
  (/root/reference/utils/pyt_utils.py:43-96) and the torch forward of the
  rebuilt pruned model must match our pruned graph's forward.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

from dcfp_tpu.graph.apply import graph_apply
from dcfp_tpu.models.convert import torch_state_dict_to_graph
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.prune.eic import prunable_bn_names
from dcfp_tpu.prune.pruner import DCFPPruner
from dcfp_tpu.prune.trace import trace_topology

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
if HAS_REF and REF not in sys.path:
    sys.path.insert(0, REF)

BPARA = {"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128}


def _import_reference_pruners():
    if "ordered_set" not in sys.modules:
        # reference channel_pruner imports ordered_set (not installed);
        # the code paths under test never touch it
        shim = types.ModuleType("ordered_set")
        shim.OrderedSet = list
        sys.modules["ordered_set"] = shim
    import pruners
    return pruners


class _StubModule:
    """Just enough module surface for the reference's get_thresh /
    gen_channel_mask / get_except_layers: a per-channel weight and the
    out_mask buffer the masks are written into."""

    def __init__(self, torch, channels):
        self.weight = types.SimpleNamespace(
            data=torch.zeros(channels),
            requires_grad=True)
        self.out_mask = torch.ones(1, channels, 1, 1)


class _StubSupernet:
    def __init__(self, modules):
        self._modules_list = list(modules.items())

    def named_modules(self):
        return self._modules_list


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("global_percent", [0.5, 0.85])
def test_mask_golden_vs_reference(global_percent, tmp_path):
    """Identical EIC scores -> identical per-BN masks from both
    frameworks' threshold/mask code, on the full CS DeepLabV3-R50
    topology (incl. deepsup head and the prune.py except list)."""
    import torch
    pruners = _import_reference_pruners()

    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para=dict(BPARA), num_classes=19,
                        align_corner=True, deepsup=True)
    graph = model.graph
    # the graph carries the reference's own ignore_prune_layer defaults
    assert set(graph.ignore_prune) == {"aspp.bn1",
                                       "backbone.layer4.2.bn3"}
    topo = trace_topology(graph)

    r = np.random.default_rng(3)
    eic = {}
    for bn in prunable_bn_names(graph):
        ch = graph.node(bn).attrs["channels"]
        eic[bn] = r.uniform(0.0, 1.0, ch).astype(np.float32)
    # force the layer_keep floor to trigger on a few layers: all their
    # scores fall below any global threshold
    floored = ["backbone.layer1.0.bn2", "backbone.layer3.2.bn1",
               "aspp.aspp2.bn"]
    for bn in floored:
        assert bn in eic
        eic[bn] = (eic[bn] * 1e-6).astype(np.float32)

    layer_keep = 0.02
    except_start = ["conv_deepsup"]  # reference prune.py:94-96

    # ---- our side -------------------------------------------------------
    ours = DCFPPruner(eic, global_percent=global_percent,
                      layer_keep=layer_keep,
                      except_start_keys=list(except_start))
    our_except = ours._except_layers(graph, topo)
    our_masks = ours.conv_masks(graph, topo, our_except)

    # ---- reference side (its own code, stub modules) --------------------
    score_path = str(tmp_path / "score.pth")
    torch.save({"eic": {k: torch.from_numpy(v.copy())
                        for k, v in eic.items()}}, score_path)
    ref = pruners.dcfp_pruner.DCFPPruner(
        global_percent=global_percent, layer_keep=layer_keep,
        except_start_keys=list(except_start), score_file=score_path)
    # prune_model would append model.ignore_prune_layer before the
    # exclusion closure (channel_pruner.py:975-979)
    ref.except_start_keys = ref.except_start_keys + list(
        graph.ignore_prune)
    ref.norm_conv_links = dict(topo.norm_conv)
    ref.conv_norm_links = dict(topo.conv_norm)
    stubs = {}
    for node in graph.toposorted():
        if node.op == "conv":
            stubs[node.name] = _StubModule(torch, node.attrs["out_ch"])
        elif node.op == "bn":
            stubs[node.name] = _StubModule(torch, node.attrs["channels"])
    ref.name2module = stubs
    ref.get_except_layers(_StubSupernet(stubs))

    # the exclusion closures agree
    assert set(ref.except_layers) == set(our_except)

    # identical two-pool thresholds
    ref_thresh = [float(t) for t in ref.get_thresh()]
    our_thresh = ours._thresholds(graph, topo, our_except)
    np.testing.assert_allclose(our_thresh, ref_thresh, rtol=0, atol=0)

    ref.gen_channel_mask()

    checked = floor_hits = 0
    for bn, conv in topo.norm_conv.items():
        if conv in our_except or bn in our_except or bn not in eic:
            continue
        want = (stubs[conv].out_mask.reshape(-1).numpy() > 0.5)
        got = our_masks[conv]
        np.testing.assert_array_equal(
            got, want, err_msg=f"mask mismatch at {bn} -> {conv}")
        checked += 1
        if bn in floored:
            floor_hits += 1
            ch = want.size
            assert want.sum() == max(int(ch * layer_keep), 1), bn
    assert checked >= 50, checked
    assert floor_hits == len(floored)
    # excepted convs keep full width on the reference side too
    for name in ["aspp.conv1", "backbone.layer4.2.conv3"]:
        assert bool(np.all(stubs[name].out_mask.numpy() == 1.0)), name


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("head", ["deeplabv3", "deeplabv3p", "psp"])
def test_reference_consumes_our_pruned_artifacts(head, tmp_path, rng):
    """Our channel_cfg.pth + pruned.pth rebuild and load through the
    reference's init_pruned_model + load_model, and the torch forward of
    that model matches our pruned graph's forward — certifying the
    surgery artifacts end-to-end in the reverse direction.  Parametrized
    over the head families whose concat topologies stress the in-mask
    splicing differently: ASPP concat (v3), + low-level decoder concat
    (v3+), PPM multi-branch concat (psp)."""
    import torch
    pruners = _import_reference_pruners()
    from pruners.channel_pruner import init_pruned_model
    from utils.pyt_utils import load_model as ref_load_model
    import networks

    torch.manual_seed(0)
    ref_full = getattr(networks, head).Seg_Model(
        backbone="resnet50", backbone_para=dict(BPARA, pretrained=False),
        model_para={}, num_classes=19, align_corner=True, criterion=None,
        deepsup=False)
    ref_full.eval()
    init_sd = ref_full.state_dict()

    model = build_model(head, backbone="resnet50",
                        backbone_para=dict(BPARA), num_classes=19,
                        align_corner=True, deepsup=False)
    params, state, report = torch_state_dict_to_graph(model.graph,
                                                      init_sd)
    assert not report["missing"] and not report["unexpected"]

    r = np.random.default_rng(11)
    eic = {bn: r.uniform(0.0, 1.0, model.graph.node(bn).attrs["channels"]
                         ).astype(np.float32)
           for bn in prunable_bn_names(model.graph)}
    result = DCFPPruner(eic, global_percent=0.6, layer_keep=0.02
                        ).prune_model(model.graph, params, state)

    # ---- export in the reference's artifact formats (the same
    # save_channel_cfg / save_pruned calls the prune CLI makes when given
    # .pth output paths) ------------------------------------------------
    from dcfp_tpu.utils import checkpoint as ckpt
    cfg_path = str(tmp_path / "channel_cfg.pth")
    ckpt.save_channel_cfg(cfg_path, result.channel_cfg)
    pruned_path = str(tmp_path / "pruned.pth")
    ckpt.save_pruned(pruned_path, result.params, result.state)

    # ---- reference side: rebuild + load + forward ----------------------
    cfg = torch.load(cfg_path)  # the reference's own load (prune.py /
    # train.py --channel-cfg path); torch>=2.6 defaults weights_only=True
    # and our artifacts pass it
    torch.manual_seed(1)  # different init: weights must all be overwritten
    ref_pruned = getattr(networks, head).Seg_Model(
        backbone="resnet50", backbone_para=dict(BPARA, pretrained=False),
        model_para={}, num_classes=19, align_corner=True, criterion=None,
        deepsup=False)
    init_pruned_model(ref_pruned, cfg)
    ref_load_model(ref_pruned, pruned_path)
    ref_pruned.eval()

    # every pruned width landed
    for name, module in ref_pruned.named_modules():
        if name in cfg and hasattr(module, "out_channels"):
            assert module.out_channels == cfg[name]["out_channels"], name
            assert module.weight.shape[0] == cfg[name]["out_channels"]

    x = rng.standard_normal((1, 65, 65, 3), dtype=np.float32) * 0.5
    ours_out, _ = graph_apply(result.graph, result.params, result.state,
                              {"image": np.asarray(x)})
    with torch.no_grad():
        want = ref_pruned(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()))[0].numpy()
    np.testing.assert_allclose(np.asarray(ours_out["pred"]),
                               np.transpose(want, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_flops_counter_matches_reference_counter():
    """Our analytic counter vs the reference's forward-hook counter
    (utils/flops_counter.py:35) on the full DeepLabV3-R50: both FLOPs
    and params match EXACTLY (measured: 12,445,961,523 MACs /
    41,270,483 params at 129x129 on both sides).  The prune search
    stops on a FLOPs ratio (prune.py:112-116), so this certifies the
    same --prune-ratio lands on the same widths."""
    _import_reference_pruners()
    import networks
    from utils.flops_counter import get_model_complexity_info
    from dcfp_tpu.utils.flops import count_flops_params

    ref = networks.deeplabv3.Seg_Model(
        backbone="resnet50", backbone_para=dict(BPARA, pretrained=False),
        model_para={}, num_classes=19, align_corner=True, criterion=None,
        deepsup=False)
    ref.eval()
    want_f, want_p = get_model_complexity_info(
        ref, (3, 129, 129), print_per_layer_stat=False, as_strings=False)

    ours = build_model("deeplabv3", backbone="resnet50",
                       backbone_para=dict(BPARA), num_classes=19,
                       align_corner=True, deepsup=False)
    got_f, got_p = count_flops_params(ours.graph, (129, 129))
    assert got_p == want_p, (got_p, want_p)
    assert got_f == want_f, (got_f, want_f)
