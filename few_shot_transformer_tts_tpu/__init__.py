"""few_shot_transformer_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of mutiann/few-shot-transformer-tts (Multilingual Byte2Speech TTS,
arXiv:2103.03541).

This is a from-scratch TPU-first implementation, not a port: the compute path is
JAX/Pallas compiled by XLA, parallelism is expressed as shardings over a
``jax.sharding.Mesh``, autoregressive decoding is a ``lax.while_loop`` with KV caches,
and the data pipeline emits shape-quantized batches so XLA compiles a bounded kernel
set.

Layout (mirrors SURVEY.md section 2 component inventory):
  config.py        typed hyperparameter system  (reference: hyperparams.py, utils/hparams.py)
  frontend/        byte-level text frontend     (reference: utils/text.py)
  ops/             DSP + Pallas kernels         (reference: utils/audio.py + torch kernels)
  models/          transformer byte2mel model   (reference: transformer/*.py)
  data/            feeder / packing / metadata  (reference: dataloader.py)
  parallel/        mesh + sharding utilities    (reference: NCCL DDP in train.py)
  train/           training runtime, checkpoint (reference: train.py, utils/checkpoint.py)
  infer/           AR synthesis + eval service  (reference: synthesize.py, eval.py)
  utils/           logging, metrics, plots      (reference: utils/infolog.py, utils/transcribe.py)
  corpora/         corpus preprocessors/packer  (reference: corpora/*)
"""

__version__ = "0.1.0"

from .config import Config, default_config  # noqa: F401
