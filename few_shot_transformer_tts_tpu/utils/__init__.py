import numpy as np


def dict_to_numpy(data: dict) -> dict:
    """Device arrays -> host numpy (analog of reference utils/__init__.py:3-14;
    H2D/D2H is implicit in JAX, so only the host-side pull is needed)."""
    out = {}
    for key, t in data.items():
        if hasattr(t, "device_buffer") or type(t).__module__.startswith("jax"):
            out[key] = np.asarray(t)
        else:
            out[key] = t
    return out
