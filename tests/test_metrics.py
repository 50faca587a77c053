import numpy as np
import pytest

from few_shot_transformer_tts_tpu.utils import metrics
from few_shot_transformer_tts_tpu.utils.infolog import ValueWindow, LookupWindow


def test_levenshtein():
    assert metrics.levenshtein("kitten", "sitting") == 3
    assert metrics.levenshtein("", "abc") == 3
    assert metrics.levenshtein("abc", "abc") == 0


def test_basic_normalize():
    assert metrics.basic_normalize("Hello, World!", "en-us") == "hello world"
    # CJK locales drop spaces
    assert metrics.basic_normalize("你 好", "zh-cn") == "你好"
    # non-CJK keeps single spaces
    assert metrics.basic_normalize("a   b", "en-us") == "a b"


def test_cer():
    assert metrics.character_error_rate("abc", "abc") == 0.0
    assert metrics.character_error_rate("abc", "abd") == pytest.approx(1 / 3, rel=1e-6)
    assert metrics.character_error_rate("xyz", "") == 1.0  # capped


def test_dtw_identical_sequences():
    x = np.random.RandomState(0).randn(20, 4)
    dist, path = metrics.dtw_path(x, x)
    assert dist == pytest.approx(0.0, abs=1e-6)
    assert path == [(i, i) for i in range(20)]


def test_dtw_shifted():
    # y = x with a repeated frame; DTW should still align perfectly
    x = np.random.RandomState(1).randn(10, 3)
    y = np.concatenate([x[:5], x[4:5], x[5:]], axis=0)
    dist, path = metrics.dtw_path(x, y)
    assert dist == pytest.approx(0.0, abs=1e-6)


def test_calculate_mse_dtw():
    rng = np.random.RandomState(0)
    # positive-max frames so nothing is dropped as unvoiced
    x = np.abs(rng.randn(1, 15, 4)) + 0.1
    res = metrics.calculate_mse_dtw(x, [15], x.copy(), [15])
    assert res[0] == pytest.approx(0.0, abs=1e-12)
    # all-unvoiced target -> None
    y = -np.ones((1, 10, 4))
    res = metrics.calculate_mse_dtw(x, [15], y, [10])
    assert res[0] is None


def test_value_window():
    w = ValueWindow(3)
    for v in [1, 2, 3, 4]:
        w.append(v)
    assert w.count == 3
    assert w.average == pytest.approx(3.0)


def test_lookup_window_reductions():
    w = LookupWindow("cer", reduction="avg")
    w.update(["en", "en", "de"], [0.1, 0.3, 0.5])
    stats = dict(w.summary())
    assert stats["cer/en"] == pytest.approx(0.2)
    assert stats["cer/de"] == pytest.approx(0.5)
    w2 = LookupWindow("counts", reduction="total")
    w2.update(["en", "de", "en"], [1, 1, 1])
    stats = dict(w2.summary())
    assert stats["counts/en"] == pytest.approx(2 / 3)
    # None values skipped
    w3 = LookupWindow("m")
    w3.update(["a", "b"], [None, 1.0])
    assert dict(w3.summary()) == {"m/b": 1.0}
