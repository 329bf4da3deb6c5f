"""Reference-artifact interop: the checkpoint loaders accept the torch
``.pth`` files a wzx99/DCFP user already has — model snapshots
(train.py:278-282), score.pth (dcfp_pruner.py:25-26), channel_cfg.pth +
pruned.pth (prune.py:97-98) — so switching frameworks does not require
retraining or a manual conversion step."""

import os
import sys

import numpy as np
import pytest

import jax

from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.utils import checkpoint as ckpt

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_reference_model_pth_loads_non_strict(rng, tmp_path):
    """A reference full-model snapshot loads via the same
    load_params_non_strict call the CLIs use for msgpack files."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import networks
    torch.manual_seed(0)
    ref = networks.deeplabv3.Seg_Model(
        backbone="resnet50",
        backbone_para=dict(os=8, mg_unit=[1, 2, 4], inplanes=128,
                           pretrained=False),
        model_para={}, num_classes=19, align_corner=True, criterion=None,
        deepsup=True)
    ref.eval()
    path = str(tmp_path / "CS_scenes_4000.pth")
    torch.save(ref.state_dict(), path)

    ours = build_model("deeplabv3", backbone="resnet50",
                       backbone_para=dict(os=8, mg_unit=[1, 2, 4],
                                          inplanes=128),
                       num_classes=19, align_corner=True, deepsup=True)
    params, bn_state = init_graph(ours.graph, jax.random.key(0))
    params, bn_state = ckpt.load_params_non_strict(path, params, bn_state)

    sd = ref.state_dict()
    w = sd["backbone.layer1.0.conv1.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["backbone.layer1.0.conv1"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(bn_state["backbone.layer1.0.bn1"]["var"]),
        sd["backbone.layer1.0.bn1.running_var"].numpy())
    # forward parity through the converted weights
    x = rng.standard_normal((1, 65, 65, 3), dtype=np.float32) * 0.5
    outs, _ = graph_apply(ours.graph, params, bn_state,
                          {"image": np.asarray(x)})
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
                   deepsup=True)[0].numpy()
    np.testing.assert_allclose(np.asarray(outs["pred"]),
                               np.transpose(want, (0, 2, 3, 1)),
                               rtol=2e-3, atol=2e-3)


def test_reference_score_and_channel_cfg_pth(tmp_path, rng):
    """score.pth ({'eic': {...}}) and channel_cfg.pth (mask schema of
    channel_pruner.py:821-842) round-trip through the sniffing loaders
    and drive an actual pruned-width rebuild."""
    torch = pytest.importorskip("torch")
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.pruner import DCFPPruner, apply_channel_cfg

    model = build_model("simple", backbone="resnet50",
                        backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                       "inplanes": 64},
                        num_classes=5, align_corner=False, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    eic_np = {bn: np.abs(rng.standard_normal(
        model.graph.node(bn).attrs["channels"])).astype(np.float32)
        for bn in prunable_bn_names(model.graph)}

    # reference-format score.pth
    score_path = str(tmp_path / "score.pth")
    torch.save({"eic": {k: torch.from_numpy(v.copy())
                        for k, v in eic_np.items()}}, score_path)
    eic = ckpt.load_eic(score_path)
    assert set(eic) == set(eic_np)
    np.testing.assert_allclose(eic[next(iter(eic))],
                               eic_np[next(iter(eic))])

    # prune with it, then export the cfg as a torch pickle (what the
    # reference's prune.py would have written) and rebuild from that
    result = DCFPPruner(eic, global_percent=0.4, layer_keep=0.02
                        ).prune_model(model.graph, params, state)
    cfg_path = str(tmp_path / "channel_cfg.pth")
    torch.save({name: {k: (torch.from_numpy(np.asarray(v))
                           if np.ndim(v) else int(v))
                       for k, v in entry.items()}
                for name, entry in result.channel_cfg.items()}, cfg_path)
    cfg = ckpt.load_channel_cfg(cfg_path)
    rebuilt = apply_channel_cfg(model.graph, cfg)
    for node in result.graph.conv_nodes():
        assert (rebuilt.node(node.name).attrs["out_ch"]
                == node.attrs["out_ch"]), node.name

    # pruned.pth in torch layout loads into the rebuilt widths
    pruned_path = str(tmp_path / "pruned.pth")
    sd = {}
    for name, p in result.params.items():
        if "kernel" in p:
            sd[f"{name}.weight"] = torch.from_numpy(
                np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy())
            if "bias" in p:
                sd[f"{name}.bias"] = torch.from_numpy(
                    np.asarray(p["bias"]).copy())
        else:
            sd[f"{name}.weight"] = torch.from_numpy(
                np.asarray(p["scale"]).copy())
            sd[f"{name}.bias"] = torch.from_numpy(
                np.asarray(p["bias"]).copy())
    for name, s in result.state.items():
        sd[f"{name}.running_mean"] = torch.from_numpy(
            np.asarray(s["mean"]).copy())
        sd[f"{name}.running_var"] = torch.from_numpy(
            np.asarray(s["var"]).copy())
    torch.save(sd, pruned_path)

    p2, s2 = init_graph(rebuilt, jax.random.key(1))
    p2, s2 = ckpt.load_params_non_strict(pruned_path, p2, s2)
    x = rng.standard_normal((1, 33, 33, 3), dtype=np.float32)
    out1, _ = graph_apply(result.graph, result.params, result.state,
                          {"image": np.asarray(x)})
    out2, _ = graph_apply(rebuilt, p2, s2, {"image": np.asarray(x)})
    np.testing.assert_allclose(np.asarray(out2["pred"]),
                               np.asarray(out1["pred"]), rtol=1e-5,
                               atol=1e-5)
