"""Low-level numerical ops: DSP, masking, splines, alignment search."""

from wetts_tpu.ops.masking import (
    sequence_mask,
    slice_segments,
    rand_slice_segments,
    generate_path,
    subsequent_mask,
)
from wetts_tpu.ops.spectral import (
    mel_filterbank,
    stft_magnitude,
    spectrogram,
    spec_to_mel,
    mel_spectrogram,
    dynamic_range_compression,
)
from wetts_tpu.ops.splines import (
    piecewise_rational_quadratic_transform,
)
from wetts_tpu.ops.mas import maximum_path

__all__ = [
    "sequence_mask",
    "slice_segments",
    "rand_slice_segments",
    "generate_path",
    "subsequent_mask",
    "mel_filterbank",
    "stft_magnitude",
    "spectrogram",
    "spec_to_mel",
    "mel_spectrogram",
    "dynamic_range_compression",
    "piecewise_rational_quadratic_transform",
    "maximum_path",
]
