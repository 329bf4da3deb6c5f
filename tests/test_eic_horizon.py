"""Opt-in full-horizon EIC parity gate (round-5 VERDICT item 1).

The measured finding (docs/ROADMAP.md "EIC signal vs training horizon",
raw curves in docs/data/eic_horizon_r5.json to 2,000 steps and
docs/data/eic_horizon_r5_4k.json to the recipe's own 4,000-step prune
point): the within-layer EIC ranking is seed-chaos-bounded at EVERY
horizon — the self-noise floor itself decays with steps (pearson 0.705
at 100 steps -> 0.242 at 4,000) and the cross-framework statistics
track it to within noise (gap 0.050 -> 0.007, shrinking monotonically;
mask agreement within 0.015 of its floor everywhere, 0.848 vs 0.852 at
4,000), while the between-layer structure the global threshold consumes
stays >= 0.974.  This test re-runs tools/exp_eic_horizon.py at a
requested horizon and gates those relationships.

A 3 x 2000-step two-framework CPU run is ~1 h on the 1-core suite host
(~2.5 h at 4000), so the gate is opt-in:

    DCFP_EIC_HORIZON_STEPS=2000 python -m pytest tests/test_eic_horizon.py

(any horizon >= 100 works; the recorded round-5 runs pass at every
checkpoint, including the full 4,000-step recipe horizon).  Reference
recipe being modeled: pretrain 4k steps with EMA decay 0.999 —
/root/reference/scripts/cs/pretrain.sh:13,31, train.py:216,
pruners/dcfp_pruner.py:15-20.
"""

import os

import pytest

STEPS = os.environ.get("DCFP_EIC_HORIZON_STEPS")
HAS_REF = os.path.isdir("/root/reference")


@pytest.mark.slow
@pytest.mark.skipif(not STEPS, reason="opt-in: set DCFP_EIC_HORIZON_STEPS")
@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_eic_horizon(tmp_path):
    import json

    from tools.exp_eic_horizon import main as run_horizon

    out = tmp_path / "horizon.json"
    run_horizon(int(STEPS), str(out))
    rows = json.loads(out.read_text())["rows"]
    assert rows
    for row in rows:
        # cross-framework within-layer statistics sit at the self-noise
        # floor (measured gaps: pearson <= 0.043, shrinking with steps;
        # mask agreement <= 0.017) — margins ~2.5x the worst measured gap
        assert row["pearson_ref"] > row["pearson_floor"] - 0.10, row
        assert row["spearman_ref"] > row["spearman_floor"] - 0.10, row
        assert row["mask_agree_ref"] > row["mask_agree_floor"] - 0.04, row
        # the statistic the global threshold consumes stays signal
        # (measured: 0.9998 at 100 steps, 0.974 at the 4,000-step
        # recipe horizon — the gate leaves seed margin below that)
        assert row["layer_mean_corr"] > 0.95, row
    # the floor-relative gap SHRINKS with horizon (measured 0.043 -> 0.0):
    # late-horizon parity must not be worse than the first checkpoint's
    first = rows[0]["pearson_floor"] - rows[0]["pearson_ref"]
    last = rows[-1]["pearson_floor"] - rows[-1]["pearson_ref"]
    assert last <= first + 0.02, (first, last)
