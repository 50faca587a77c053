from .synthesize import synthesize_batch, save_eval_results  # noqa: F401
