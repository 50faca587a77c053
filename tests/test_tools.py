"""Unit tests for the measurement tooling that feeds committed artifacts
(tools/packing_sweep.py budget math, parallel/scaling.py strong mode)."""

import numpy as np

from few_shot_transformer_tts_tpu.config import default_config, \
    small_test_config


def test_implied_b_matches_feeder_packing_rule():
    """implied_b replicates data/feeder.py _pack_into_batches: B bounded by
    the frame limit (B*Tout) and the quad proxy (B*(Tin^2+Tout^2)), floored
    to the batch lattice."""
    from tools.packing_sweep import implied_b
    # frame-limit binding: 16000/1024 = 15.6 -> 15; quad allows only 12 -> 8
    assert implied_b(16000, 14_000_000, 256, 1024) == 8
    # frame-limit binding at short Tout: 16000/256 = 62 -> 56 (lattice of 8)
    assert implied_b(16000, 14_000_000, 64, 256) == 56
    # below one lattice multiple: keep the raw B (the feeder emits it padded)
    assert implied_b(8000, 7_000_000, 256, 1024) == 6


def test_bench_scan_shapes_respect_shipped_budgets():
    from tools.packing_sweep import implied_b
    hp = default_config()
    for t_out in (256, 448, 832, 1024):
        t_in = -(-t_out // 4 // 32) * 32
        b = implied_b(hp.batch_frame_limit, hp.batch_frame_quad_limit,
                      t_in, t_out, b_mult=hp.batch_size_multiple)
        assert b * t_out <= hp.batch_frame_limit
        assert b * (t_in ** 2 + t_out ** 2) <= hp.batch_frame_quad_limit


def test_scaling_strong_mode_fixes_global_batch():
    from few_shot_transformer_tts_tpu.parallel.scaling import measure
    hp = small_test_config(n_iter=2, max_generation_frames=8)
    res = measure(hp, per_device_batch=2, t_in=8, t_out=8, degrees=[1, 2],
                  steps=2, mode="strong")
    assert [r["batch"] for r in res] == [4, 4]  # 2 * max(degrees), fixed
    assert res[0]["efficiency"] == 1.0
    assert all(np.isfinite(r["sec_per_step"]) for r in res)


def test_round5_tools_importable_and_skip_off_tpu():
    """The round-5 measurement tools must import cleanly and exit with a
    JSON skip line off-TPU (they are chip harnesses; a syntax or import
    regression should fail CI, not the next chip session)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    for tool, args in [
            ("tools/attn_fixed_cost.py", []),
            ("tools/fused_ln_check.py", []),
            ("tools/step_ab.py", ["--b", "conv_as_matmul=True"]),
    ]:
        r = subprocess.run(
            [sys.executable, os.path.join(repo, tool)] + args,
            capture_output=True, text=True, env=env, cwd=repo, timeout=300)
        assert r.returncode == 0, (tool, r.stderr[-500:])
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        assert json.loads(line).get("skip") == "no tpu backend", (tool, line)
