from .tacotron import ByteToMel, compute_loss, learning_rate_schedule  # noqa: F401
