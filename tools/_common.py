"""Shared helpers for the tools/exp_* measurement scripts."""

import os


def default_backbone_para(backbone: str) -> dict:
    """The recipe backbone_para the CLIs build (scripts/cs/*.sh config):
    hrnet* backbones take only the pretrained gate; resnet* the os8 +
    multi-grid Cityscapes config.  One definition so every profiling
    tool measures the same model as the recipes."""
    if backbone.startswith("hrnet"):
        return {"pretrained": False}
    return {"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128}


def clear_env_compiler_options() -> None:
    """Drop an inherited DCFP_XLA_OPTIONS so A/B sweeps measure what
    they say: with the env var set, every variant (including any
    baseline) would silently compile WITH those options."""
    if os.environ.pop("DCFP_XLA_OPTIONS", None) is not None:
        print("note: ignoring inherited DCFP_XLA_OPTIONS — variants "
              "state their options explicitly", flush=True)
