from few_shot_transformer_tts_tpu.frontend import (
    text_to_byte_sequence, language_vec_to_id, is_sep, pad_id, eos_id, sos_id)


def test_special_ids():
    assert (pad_id, eos_id, sos_id) == (0, 1, 2)


def test_ascii_roundtrip():
    seq = text_to_byte_sequence("abc")
    assert seq == [2, 97, 98, 99, 1]


def test_no_sos_eos():
    assert text_to_byte_sequence("A", use_sos=False, use_eos=False) == [65]
    assert text_to_byte_sequence("A", use_sos=False) == [65, 1]
    assert text_to_byte_sequence("A", use_eos=False) == [2, 65]


def test_multibyte_utf8():
    # CJK and accented characters expand to their UTF-8 bytes.
    seq = text_to_byte_sequence("你", use_sos=False, use_eos=False)
    assert seq == list("你".encode("utf-8"))
    assert all(0 <= b < 256 for b in seq)


def test_language_vec_to_id():
    assert language_vec_to_id([0, 0, 1, 0]) == 2
    assert language_vec_to_id([0, 0, 0]) == -1


def test_is_sep():
    assert is_sep(" ")
    assert is_sep(",")
    assert not is_sep("a")
