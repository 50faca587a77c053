from .text import (  # noqa: F401
    pad_id, eos_id, sos_id, is_sep,
    text_to_byte_sequence, language_name_to_id, language_vec_to_id,
)
