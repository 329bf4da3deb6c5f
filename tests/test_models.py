"""Model-zoo tests.

The heavyweight check imports the actual reference PyTorch models (read-only
at /root/reference), builds them with random weights, converts the torch
state_dict into our graph params by name, and asserts the full forward
matches numerically.  That validates architecture wiring, padding/dilation
conventions, BN semantics, and the checkpoint converter in one shot.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.models.convert import torch_state_dict_to_graph
from dcfp_tpu.models.registry import build_model

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def _forward(model, x_nhwc, params=None, state=None, train=False):
    if params is None:
        params, state = init_graph(model.graph, jax.random.key(0))
    outs, _ = graph_apply(model.graph, params, state,
                          {"image": jnp.asarray(x_nhwc)}, train=train)
    return outs


@pytest.mark.parametrize("name", ["simple", "deeplabv3", "deeplabv3p", "psp"])
def test_heads_build_and_forward(rng, name):
    model = build_model(name, backbone="resnet50",
                        backbone_para={"os": 8}, num_classes=19,
                        align_corner=True, deepsup=True)
    x = rng.standard_normal((1, 33, 33, 3), dtype=np.float32)
    outs = _forward(model, x)
    assert outs["pred"].shape == (1, 33, 33, 19)
    assert outs["deepsup"].shape == (1, 33, 33, 19)


def test_channel_invariants():
    m = build_model("deeplabv3", backbone="resnet50", num_classes=19)
    g = m.graph
    assert g.node("aspp.conv1").attrs["in_ch"] == 1280  # 5 x 256 concat
    assert g.node("backbone.layer4.2.conv3").attrs["out_ch"] == 2048
    p = build_model("psp", backbone="resnet50", num_classes=19)
    assert p.graph.node("ppm.bottleneck.0").attrs["in_ch"] == 2048 + 4 * 512


def _load_reference_module():
    sys.path.insert(0, REF)
    # the reference resolves data paths at import time only; model builders
    # need no data.  We instantiate with pretrained=False.
    import networks  # noqa
    return networks


REF_CASES = [
    ("deeplabv3", dict(os=8, mg_unit=[1, 2, 4], inplanes=128), True),
    ("deeplabv3p", dict(os=16, mg_unit=[1, 1, 1], inplanes=128), False),
    ("psp", dict(os=8, mg_unit=[1, 2, 4], inplanes=128), True),
    ("simple", dict(os=8, mg_unit=[1, 2, 4], inplanes=128), False),
]


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("name,bpara,align", REF_CASES)
def test_forward_matches_reference_torch(rng, name, bpara, align):
    import torch
    networks = _load_reference_module()
    ref_mod = {"deeplabv3": networks.deeplabv3, "deeplabv3p": networks.deeplabv3p,
               "psp": networks.psp, "simple": networks.simple}[name]
    bpara_ref = dict(bpara, pretrained=False)
    torch.manual_seed(0)
    ref = ref_mod.Seg_Model(backbone="resnet50", backbone_para=bpara_ref,
                            model_para={}, num_classes=19,
                            align_corner=align, criterion=None, deepsup=True)
    ref.eval()

    ours = build_model(name, backbone="resnet50", backbone_para=dict(bpara),
                       num_classes=19, align_corner=align, deepsup=True)
    params, state, report = torch_state_dict_to_graph(
        ours.graph, ref.state_dict())
    assert not report["missing"], report["missing"][:8]
    assert not report["unexpected"], report["unexpected"][:8]

    x = rng.standard_normal((1, 65, 65, 3), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()), deepsup=True)
    outs = _forward(ours, x, params=params, state=state)

    for key, ref_out in zip(["pred", "deepsup"], ref_outs):
        got = np.asarray(outs[key])
        want = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"{name}:{key}")


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_hrnet_forward_matches_reference_torch(rng):
    import torch
    networks = _load_reference_module()
    torch.manual_seed(0)
    ref = networks.simple.Seg_Model(
        backbone="hrnetv2w48", backbone_para={"pretrained": False},
        model_para={"in_channels": [720, 720]}, num_classes=19,
        align_corner=False, criterion=None, deepsup=False)
    ref.eval()

    ours = build_model("simple", backbone="hrnetv2w48",
                       backbone_para={"width": 48},
                       model_para={"in_channels": [720, 720]},
                       num_classes=19, align_corner=False, deepsup=False)
    params, state, report = torch_state_dict_to_graph(
        ours.graph, ref.state_dict())
    assert not report["missing"], report["missing"][:8]
    assert not report["unexpected"], report["unexpected"][:8]

    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = np.asarray(_forward(ours, x, params=params, state=state)["pred"])
    want = np.transpose(ref_out[0].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
