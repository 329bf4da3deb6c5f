"""CLI flag-parity audit against the reference entry points.

docs/MIGRATION.md promises that every reference flag keeps its name and
semantics here, with an explicit table of intentional deviations.  This
test pins that promise mechanically: it extracts every ``--flag``
registered by each reference entry point's argparse (plus the three
flags the reference ``Engine`` injects into every parser,
engine.py:54-61) and asserts our corresponding CLI parser accepts it —
or that it is on the documented-deviation list below.  A reference flag
disappearing from our parsers, or a new reference-side flag appearing
un-mapped, fails here instead of silently breaking a migrating user.
"""

import os
import re

import pytest

REFERENCE = "/root/reference"

if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)

# reference entry file -> our CLI module name
PAIRS = {
    "train": "train",
    "prune": "prune",
    "evaluate": "evaluate",
    "evaluate_test": "evaluate_test",
    "totrt": "deploy",
    "label_index": "label_index",
}

# Intentional deviations — every entry must be justified in
# docs/MIGRATION.md ("Differences" table).
DEVIATIONS = {
    # SPMD over a device mesh: no per-GPU process launcher, so no rank
    # or device-list plumbing (MIGRATION.md: --ddp/--local_rank row)
    "--ddp": "one SPMD process per host; see --distributed/--num-devices",
    "--local_rank": "no per-device processes under SPMD",
    "--devices": "GPU-id selection -> --num-devices mesh limit",
    # engine.py's --continue never feeds the entry points (they use
    # --resume/--restore-from; continue_fpath is read only by the dead
    # Engine.restore_checkpoint path)
    "--continue": "dead reference path; --resume is the live spelling",
    # declared but never read by the reference (train.py:135)
    "--backbone-ratio": "write-only flag in the reference",
    # TensorRT engine serving -> serialized XLA executable
    "--use-trt": "--use-aot --aot-path <model.stablehlo>",
}

# matches long options anywhere in the call, including the
# short-option-first form add_argument('-d', '--devices', ...)
_ADD_ARG_CALL = re.compile(r"add_argument\(([^)]*)", re.DOTALL)
_LONG_OPT = re.compile(r'[\'"](--[a-zA-Z0-9_-]+)[\'"]')


class _ADD_ARG:
    @staticmethod
    def findall(src: str):
        out = []
        for call in _ADD_ARG_CALL.findall(src):
            # option strings come before the first keyword argument
            head = call.split("=", 1)[0]
            out.extend(_LONG_OPT.findall(head))
        return out

# flags Engine(parser) injects into every reference entry parser
with open(f"{REFERENCE}/engine.py") as f:
    _ENGINE_FLAGS = set(_ADD_ARG.findall(f.read()))


def _reference_flags(entry: str) -> set:
    with open(f"{REFERENCE}/{entry}.py") as f:
        flags = set(_ADD_ARG.findall(f.read()))
    # every entry point constructs Engine(parser) except the offline
    # CLIs (prune.py, label_index.py, totrt.py run engine-free)
    if entry in ("train", "evaluate", "evaluate_test"):
        flags |= _ENGINE_FLAGS
    return flags


@pytest.mark.parametrize("entry,ours", sorted(PAIRS.items()))
def test_every_reference_flag_is_accepted_or_documented(entry, ours):
    import importlib

    mod = importlib.import_module(f"dcfp_tpu.cli.{ours}")
    parser = mod.get_parser()
    accepted = {k for k in parser._option_string_actions
                if k.startswith("--")}

    unmapped = sorted(
        f for f in _reference_flags(entry)
        if f not in accepted and f not in DEVIATIONS)
    assert not unmapped, (
        f"reference {entry}.py flags with no equivalent in "
        f"dcfp_tpu.cli.{ours} and no documented deviation: {unmapped}")


def test_deviation_list_is_live():
    """Every allowlisted deviation must still exist in the reference —
    stale entries would mask a future regression."""
    all_ref = set(_ENGINE_FLAGS)
    for entry in PAIRS:
        all_ref |= _reference_flags(entry)
    stale = sorted(f for f in DEVIATIONS if f not in all_ref)
    assert not stale, f"deviations no longer present in reference: {stale}"


def test_deviations_are_documented_in_migration_guide():
    with open("docs/MIGRATION.md") as f:
        guide = f.read()
    undocumented = sorted(
        f for f in DEVIATIONS
        if f.lstrip("-") not in guide and f not in guide)
    assert not undocumented, (
        f"deviations missing from docs/MIGRATION.md: {undocumented}")
