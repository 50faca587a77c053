"""Unit test for the fused-decode dispatch matrix (infer/synthesize.py).

Round 3 shipped a dispatch that selected the fused Pallas kernel for widths
its Mosaic tiling cannot compile; this pins every row of the documented
matrix (README "Fused-decode dispatch matrix") by capturing the ``use_fused``
flag synthesize_batch passes to the decode loop, without running a decode.
"""

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.infer import synthesize as syn


class _Captured(Exception):
    def __init__(self, use_fused):
        self.use_fused = use_fused


@pytest.fixture
def capture_dispatch(monkeypatch):
    def fake_decode_loop(*args, **kw):
        raise _Captured(kw["use_fused"])
    monkeypatch.setattr(syn, "_decode_loop", fake_decode_loop)

    def run(hp, *, deterministic=True, collect_self=False, backend=None,
            interpret_env=None):
        if backend is not None:
            monkeypatch.setattr(syn.jax, "default_backend", lambda: backend)
        if interpret_env is None:
            monkeypatch.delenv("FSTTS_PALLAS_INTERPRET", raising=False)
        else:
            monkeypatch.setenv("FSTTS_PALLAS_INTERPRET", interpret_env)
        batch = {"inputs": np.full((2, 8), 5, np.int32),
                 "input_lengths": np.asarray([8, 6], np.int32)}
        with pytest.raises(_Captured) as e:
            syn.synthesize_batch(None, {}, batch, hp,
                                 deterministic=deterministic,
                                 collect_self_alignments=collect_self)
        return e.value.use_fused
    return run


ALIGNED = small_test_config(decoder_hidden=128, use_pallas_decode=True)
UNALIGNED = small_test_config(use_pallas_decode=True)  # decoder_hidden=48


def test_fused_on_tpu_when_aligned_and_deterministic(capture_dispatch):
    assert capture_dispatch(ALIGNED, backend="tpu") is True


def test_xla_for_unaligned_width_on_tpu(capture_dispatch):
    """The round-3 crash row: width 48 must fall back, not Mosaic-fail."""
    assert capture_dispatch(UNALIGNED, backend="tpu") is False


def test_xla_for_dropout_on_sampling(capture_dispatch):
    assert capture_dispatch(ALIGNED, backend="tpu",
                            deterministic=False) is False


def test_xla_when_collecting_self_alignments(capture_dispatch):
    assert capture_dispatch(ALIGNED, backend="tpu",
                            collect_self=True) is False


def test_xla_on_cpu_without_interpret(capture_dispatch):
    assert capture_dispatch(ALIGNED, backend="cpu") is False


def test_interpreter_env_enables_fused_on_cpu_even_unaligned(capture_dispatch):
    """The interpreter enforces no lane tiling, so the CPU parity tests run
    the kernel at the 48-wide test config."""
    assert capture_dispatch(UNALIGNED, backend="cpu",
                            interpret_env="1") is True


def test_flag_off_always_xla(capture_dispatch):
    hp = ALIGNED.replace(use_pallas_decode=False)
    assert capture_dispatch(hp, backend="tpu") is False
