from .synthesize import synthesize_batch, save_eval_results, vocode_batch  # noqa: F401
