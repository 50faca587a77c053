"""Eval-service CLI — same surface as the reference's eval.py (reference
eval.py:221-251): watches model_dir for checkpoints, synthesizes eval batches,
computes DTW-MSE and (optionally) Azure CER."""

import argparse

from few_shot_transformer_tts_tpu.config import default_config
from few_shot_transformer_tts_tpu.infer import evalservice


def str2bool(v):
    """Strict bool parser.  The reference's ``type=bool`` (reference
    eval.py:236) treats every non-empty string — including "False" — as
    truthy; that footgun is deliberately fixed here."""
    if isinstance(v, bool):
        return v
    low = str(v).strip().lower()
    if low in ("1", "true", "yes", "y"):
        return True
    if low in ("0", "false", "no", "n", ""):
        return False
    raise argparse.ArgumentTypeError("expected a boolean, got %r" % v)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model-dir', required=True)
    parser.add_argument('--log-dir', required=True)
    parser.add_argument('--data-dir', required=True)
    parser.add_argument('--no_wait', type=str2bool, nargs='?', const=True,
                        default=False)
    parser.add_argument('--zipfilepath', type=str, default=None)
    parser.add_argument('--eval_meta', type=str, default=None)
    parser.add_argument('--eval_languages', type=str, default=None)
    parser.add_argument('--eval_speakers', type=str, default=None)
    parser.add_argument('--exclude_speakers', type=str, default=None)
    parser.add_argument('--recover_eval', type=str2bool, nargs='?', const=True,
                        default=False)
    parser.add_argument('--start_step', type=int, default=50000)
    parser.add_argument('--eval_steps', type=str, default=None)
    parser.add_argument('--eval_interval', type=int, default=10000)
    parser.add_argument('--scan_interval', type=int, default=600)
    parser.add_argument('--saver_pool', choices=['thread', 'process'],
                        default=None,
                        help='result-saver pool; default is the measured '
                             'winner (process — tools/saver_pool_ab.py)')
    parser.add_argument('--tpu_vocoder', action='store_true',
                        help='run batched Griffin-Lim on the accelerator '
                             'instead of per-sample CPU vocoding')
    parser.add_argument('--hparams', default='')
    return parser


if __name__ == '__main__':
    from few_shot_transformer_tts_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # JAX_PLATFORMS env is ignored by the TPU plugin here
    args, unparsed = build_parser().parse_known_args()
    print('unparsed:', unparsed)
    hp = default_config().parse(args.hparams)
    evalservice.main(args, hp)
