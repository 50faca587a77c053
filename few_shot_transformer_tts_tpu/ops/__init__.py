from .dsp import (  # noqa: F401
    mel_filterbank, hann_window, stft, istft,
    get_spectrograms, mel_to_linear, mel2wav, griffin_lim,
    load_wav, save_wav, trim_silence_intervals, split_intervals,
)
