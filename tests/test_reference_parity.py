"""Behavioral parity vs the PyTorch reference engine (torch CPU).

Identical ICs through both engines; per-interval energy-drift
trajectories must agree to the SURVEY §7 statistical envelopes. Skipped
if the reference checkout or torch is unavailable.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not mounted")


def test_reference_mode_strings_canonicalised():
    """Ours-only aliases translate; unknowns raise instead of inheriting
    the reference parser's silent unknown->FLOAT64 fallback
    (reference quantization.py:175) — the failure that produced the
    mis-keyed first canonical 'f16' row."""
    from tools.reference_parity import canonical_reference_mode

    assert canonical_reference_mode("f16") == "float16"
    assert canonical_reference_mode("half") == "float16"
    assert canonical_reference_mode("f64") == "float64"
    assert canonical_reference_mode("fp32") == "float32"
    assert canonical_reference_mode("bf16") == "bf16"
    assert canonical_reference_mode("int4") == "int4"
    # Reference-parser synonyms collapse to ONE spelling each so every
    # alias keys the SAME committed cache file (a miss silently re-runs
    # the ~1 h torch reference).
    assert canonical_reference_mode("bfloat16") == "bf16"
    assert canonical_reference_mode("int4_sim") == "int4"
    assert canonical_reference_mode("int8_sim") == "int8"
    assert canonical_reference_mode("fp16") == "float16"
    with pytest.raises(ValueError, match="silently run FLOAT64"):
        canonical_reference_mode("f99")
    with pytest.raises(ValueError):
        canonical_reference_mode("")


def test_int4_drift_trajectory_matches_reference():
    import jax

    from tools.reference_parity import run_ours, run_reference
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(42), num_stars=200)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    ref_d, ref_pos, _ = run_reference(pos, vel, m, "int4", 200, 50)
    our_d, our_pos, _ = run_ours(pos, vel, m, "int4", 200, 50)
    # trajectory-level agreement, checkpoint by checkpoint
    np.testing.assert_allclose(our_d, ref_d, rtol=0.05, atol=0.02)


def test_float32_drift_matches_reference():
    import jax

    from tools.reference_parity import run_ours, run_reference
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(7), num_stars=200)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    ref_d, _, _ = run_reference(pos, vel, m, "float32", 200, 100)
    our_d, _, _ = run_ours(pos, vel, m, "float32", 200, 100)
    np.testing.assert_allclose(our_d, ref_d, atol=0.01)


def test_bf16_f16_drift_matches_reference():
    """bf16/f16 cast modes also track the torch reference trajectories."""
    import jax

    from tools.reference_parity import run_ours, run_reference
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(3), num_stars=150)
    import numpy as np

    pos, vel, m = map(np.asarray, (pos, vel, m))
    for mode in ("bfloat16", "float16"):
        ref_d, _, _ = run_reference(pos, vel, m, mode, 150, 50)
        our_d, _, _ = run_ours(pos, vel, m, mode, 150, 50)
        np.testing.assert_allclose(our_d, ref_d, atol=0.01)


def test_int8_custom_drift_matches_reference():
    """int8_sim and custom-level modes track the torch reference too —
    the full int ladder (quantization.py:58-68), not just int4."""
    import jax

    from tools.reference_parity import run_ours, run_reference
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(11), num_stars=200)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    for mode in ("int8", "custom"):
        ref_d, _, _ = run_reference(pos, vel, m, mode, 200, 50)
        our_d, _, _ = run_ours(pos, vel, m, mode, 200, 50)
        np.testing.assert_allclose(our_d, ref_d, rtol=0.05, atol=0.02,
                                   err_msg=mode)


def test_canonical_parity_report_complete():
    """The committed canonical 5000x2000 parity evidence must carry a
    PASSING row for every reference precision mode (the 7-mode ladder:
    quantization.py:58-68) with its reference trajectory cached."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    report = json.loads(
        (repo / "docs/reports/reference_parity_canonical.json").read_text())
    expected = {"float64", "float32", "bf16", "float16",
                "int8", "int4", "custom"}
    assert expected <= set(report), sorted(expected - set(report))
    for mode in expected:
        row = report[mode]
        assert row["drift_envelope_agree"], mode
        assert row["radius_agree"], mode
        cache = repo / ("tools/reference_cache/"
                        f"ref_s5000_t2000_i100_seed42_{mode}.json")
        assert cache.exists(), cache.name
