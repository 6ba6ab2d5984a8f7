"""Import the reference torch implementation as a numerics oracle.

Builds the ORIGINAL wetts SynthesizerTrn (from /root/reference, read-only)
inside tests only, stubbing its unavailable deps (numba, torchaudio) with
functional equivalents, so converted weights can be validated end-to-end
against the published implementation. Nothing here ships in the framework.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types


def _mk_module(name: str) -> types.ModuleType:
    """Stub module with a proper __spec__ (importlib.find_spec-safe)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


class _SigType:
    """Stands in for numba type objects (int32[:, :, ::1] etc.)."""

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self


def _install_numba_stub():
    if "numba" in sys.modules:
        return
    numba = _mk_module("numba")

    def jit(*args, **kwargs):
        def deco(f):
            return f

        return deco

    numba.jit = jit
    numba.void = _SigType()
    numba.int32 = _SigType()
    numba.float32 = _SigType()
    sys.modules["numba"] = numba


def _install_torchaudio_stub():
    if "torchaudio" in sys.modules:
        return
    import torch

    torchaudio = _mk_module("torchaudio")
    transforms = _mk_module("torchaudio.transforms")

    class InverseSpectrogram(torch.nn.Module):
        def __init__(self, n_fft=1024, hop_length=256, win_length=1024,
                     center=True, **kw):
            super().__init__()
            self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
            self.center = center

        def forward(self, spec):
            return torch.istft(
                spec, self.n_fft, hop_length=self.hop, win_length=self.win,
                window=torch.hann_window(self.win), center=self.center)

    class Spectrogram(torch.nn.Module):
        def __init__(self, n_fft=400, hop_length=None, win_length=None,
                     power=2.0, **kw):
            super().__init__()
            self.n_fft = n_fft
            self.hop = hop_length or n_fft // 2
            self.win = win_length or n_fft
            self.power = power

        def forward(self, x):
            spec = torch.stft(
                x, self.n_fft, hop_length=self.hop, win_length=self.win,
                window=torch.hann_window(self.win), center=True,
                pad_mode="reflect", return_complex=True)
            if self.power is None:
                return spec
            return spec.abs() ** self.power

    class Resample(torch.nn.Module):
        def __init__(self, orig_freq, new_freq):
            super().__init__()

        def forward(self, x):
            return x

    transforms.InverseSpectrogram = InverseSpectrogram
    transforms.Spectrogram = Spectrogram
    transforms.Resample = Resample
    torchaudio.transforms = transforms
    sys.modules["torchaudio"] = torchaudio
    sys.modules["torchaudio.transforms"] = transforms


def _install_librosa_stub():
    if "librosa" in sys.modules:
        return
    import numpy as np

    librosa = _mk_module("librosa")
    util = _mk_module("librosa.util")
    filters = _mk_module("librosa.filters")

    def pad_center(data, size, axis=-1, **kwargs):
        n = data.shape[axis]
        lpad = (size - n) // 2
        lengths = [(0, 0)] * data.ndim
        lengths[axis] = (lpad, size - n - lpad)
        return np.pad(data, lengths, mode="constant")

    def tiny(x):
        return np.finfo(np.asarray(x).dtype).tiny

    def normalize(s, norm=np.inf, axis=0, **kwargs):
        s = np.asarray(s, dtype=float)
        if norm is None:
            return s
        if norm == np.inf:
            length = np.max(np.abs(s), axis=axis, keepdims=True)
        else:
            length = np.sum(np.abs(s) ** norm, axis=axis,
                            keepdims=True) ** (1.0 / norm)
        length[length < tiny(s)] = 1.0
        return s / length

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
        from wetts_tpu.ops.spectral import mel_filterbank

        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T

    util.pad_center = pad_center
    util.tiny = tiny
    util.normalize = normalize
    filters.mel = mel
    librosa.util = util
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.util"] = util
    sys.modules["librosa.filters"] = filters


def load_reference_vits():
    """Returns the reference `model.models` module (SynthesizerTrn etc.)."""
    _install_numba_stub()
    _install_torchaudio_stub()
    _install_librosa_stub()
    ref = "/root/reference/wetts/vits"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import model.models as ref_models  # noqa

    return ref_models
