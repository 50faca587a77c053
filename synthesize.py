"""Direct synthesis CLI: checkpoint + script.txt -> wavs/mels.

A convenience superset of the reference's synthesis-only path (reference
README.md:271-289 uses eval.py with a dummy-length metadata file and no
mels.zip; that path also works here via eval.py).  Lines take the form
``SPEAKERNAME_FILEID|DUMMY_LENGTH|TEXT|LANG``."""

import argparse
import json
import logging
import os


def main():
    from few_shot_transformer_tts_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # JAX_PLATFORMS env is ignored by the TPU plugin here
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True,
                        help='model.ckpt-<step> file (native or reference torch)')
    parser.add_argument('--script', required=True,
                        help='metadata file: name|dummy_len|text|lang per line')
    parser.add_argument('--data-dir', required=True,
                        help='directory with lang_id.json / spk_id.json')
    parser.add_argument('--output-dir', required=True)
    parser.add_argument('--hparams', default='')
    parser.add_argument('--deterministic', action='store_true',
                        help='disable decoder dropout (reference keeps it on)')
    args = parser.parse_args()

    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.data import FeederEval
    from few_shot_transformer_tts_tpu.models.tacotron import ByteToMel
    from few_shot_transformer_tts_tpu.infer import (synthesize_batch,
                                                    save_eval_results)
    from few_shot_transformer_tts_tpu.utils import infolog

    infolog.set_logger()
    hp = default_config().parse(args.hparams)
    lang_to_id = json.load(open(os.path.join(args.data_dir, 'lang_id.json')))
    spk_to_id = json.load(open(os.path.join(args.data_dir, 'spk_id.json')))

    feeder = FeederEval(None, args.script, hp, spk_to_id=spk_to_id,
                        lang_to_id=lang_to_id, shuffle=False, keep_order=True)
    model = ByteToMel(hp)

    if _is_torch_checkpoint(args.checkpoint):
        from few_shot_transformer_tts_tpu.train.converter import \
            load_reference_checkpoint
        variables, step = load_reference_checkpoint(args.checkpoint)
        logging.info('Loaded reference torch checkpoint at step %s', step)
    else:
        variables = _load_native(model, hp, feeder, args.checkpoint)

    os.makedirs(args.output_dir, exist_ok=True)
    for batch in feeder.fetch_data():
        results = synthesize_batch(model, variables, batch, hp,
                                   deterministic=args.deterministic)
        save_eval_results(**results, output_dir=args.output_dir, hp=hp,
                          save_trimmed_wave=True)


def _is_torch_checkpoint(path):
    with open(path, 'rb') as f:
        magic = f.read(2)
    return magic in (b'PK', b'\x80\x02')  # torch zip / legacy pickle


def _load_native(model, hp, feeder, path):
    import jax
    import numpy as np
    from few_shot_transformer_tts_tpu.train.loop import (create_state,
                                                         device_batch)
    from few_shot_transformer_tts_tpu.train import checkpoint as ckpt_lib
    probe = dict(device_batch(feeder.data[0]))
    if 'mel_targets' not in probe:
        b = probe['inputs'].shape[0]
        probe['mel_targets'] = np.zeros((b, 8, hp.num_mels), np.float32)
        probe['target_lengths'] = np.full((b,), 8, np.int32)
    template = create_state(model, hp, 0, probe)
    state = ckpt_lib.load_state(path, template)
    return {'params': state.params, 'batch_stats': state.batch_stats}


if __name__ == '__main__':
    main()
