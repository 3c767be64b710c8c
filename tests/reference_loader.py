"""Import reference PyTorch modules for numerical parity tests.

The reference package (mounted read-only at /root/reference) has top-level
imports that require packages absent from this environment (librosa,
g2p_en, lightning, ...).  Individual model modules are torch+numpy+einops
only, so we load them file-by-file under stub package entries, bypassing
``flamed/__init__``.

Tests importing this module compare OUR implementation's numerics against
the ACTUAL reference code — the strongest parity evidence available
without the (unreleased) pretrained checkpoints.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _ensure_pkg(name: str, path: str) -> None:
    if name in sys.modules:
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def load_reference():
    """Load the reference's model modules; returns a namespace object."""
    _ensure_pkg("flamed", f"{REF_ROOT}/flamed")
    _ensure_pkg("flamed.text", f"{REF_ROOT}/flamed/text")
    _ensure_pkg("flamed.utils", f"{REF_ROOT}/flamed/utils")
    _ensure_pkg("flamed.models", f"{REF_ROOT}/flamed/models")
    _ensure_pkg("flamed.models.module", f"{REF_ROOT}/flamed/models/module")
    _ensure_pkg(
        "flamed.models.module.transformer",
        f"{REF_ROOT}/flamed/models/module/transformer",
    )
    _ensure_pkg("flamed.models.synthesizer", f"{REF_ROOT}/flamed/models/synthesizer")
    _ensure_pkg("flamed.models.facodec", f"{REF_ROOT}/flamed/models/facodec")
    _ensure_pkg(
        "flamed.models.facodec.alias_free_torch",
        f"{REF_ROOT}/flamed/models/facodec/alias_free_torch",
    )
    _ensure_pkg(
        "flamed.models.facodec.quantize", f"{REF_ROOT}/flamed/models/facodec/quantize"
    )

    _load("flamed.text.cmudict", f"{REF_ROOT}/flamed/text/cmudict.py")
    _load("flamed.text.pinyin", f"{REF_ROOT}/flamed/text/pinyin.py")
    _load("flamed.text.symbols", f"{REF_ROOT}/flamed/text/symbols.py")
    _load("flamed.utils.tools", f"{REF_ROOT}/flamed/utils/tools.py")

    t = f"{REF_ROOT}/flamed/models/module/transformer"
    _load("flamed.models.module.transformer.Constants", f"{t}/Constants.py")
    _load("flamed.models.module.transformer.Modules", f"{t}/Modules.py")
    _load("flamed.models.module.transformer.SubLayers", f"{t}/SubLayers.py")
    _load("flamed.models.module.transformer.Layers", f"{t}/Layers.py")
    models = _load("flamed.models.module.transformer.Models", f"{t}/Models.py")
    # The synthesizer imports Encoder/Decoder from the package namespace.
    sys.modules["flamed.models.module"].Encoder = models.Encoder
    sys.modules["flamed.models.module"].Decoder = models.Decoder

    s = f"{REF_ROOT}/flamed/models/synthesizer"
    pva = _load("flamed.models.synthesizer.pva", f"{s}/pva.py")
    prior = _load("flamed.models.synthesizer.prior_generator", f"{s}/prior_generator.py")
    prob = _load("flamed.models.synthesizer.prob_generator", f"{s}/prob_generator.py")

    f = f"{REF_ROOT}/flamed/models/facodec"
    _load("flamed.models.facodec.gradient_reversal", f"{f}/gradient_reversal.py")
    # melspec imports librosa (absent); re-create it with torch ops + our
    # slaney filterbank (validated against torch STFT in
    # tests/test_facodec_extras.py::test_melspec_matches_torch_stft) so the
    # V2 codec variants are constructible for parity tests.
    if "flamed.models.facodec.melspec" not in sys.modules:
        import torch

        from flamed_tts_tpu.ops.melspec import mel_filterbank

        stub = types.ModuleType("flamed.models.facodec.melspec")

        class _MelSpectrogram(torch.nn.Module):
            """Reference melspec.py:39-102 conventions, librosa-free."""

            def __init__(self, n_fft, num_mels, sampling_rate, hop_size,
                         win_size, fmin, fmax, center=False):
                super().__init__()
                self.n_fft, self.hop_size, self.win_size = n_fft, hop_size, win_size
                self.center = center
                mel = mel_filterbank(sampling_rate, n_fft, num_mels, float(fmin), float(fmax))
                self.register_buffer("mel_basis", torch.from_numpy(mel).float())
                self.register_buffer("hann_window", torch.hann_window(win_size))

            def forward(self, y):
                pad = int((self.n_fft - self.hop_size) / 2)
                y = torch.nn.functional.pad(
                    y.unsqueeze(1), (pad, pad), mode="reflect"
                ).squeeze(1)
                spec = torch.stft(
                    y, self.n_fft, hop_length=self.hop_size,
                    win_length=self.win_size, window=self.hann_window,
                    center=self.center, pad_mode="reflect", normalized=False,
                    onesided=True, return_complex=True,
                )
                spec = torch.view_as_real(spec)
                spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
                spec = torch.matmul(self.mel_basis, spec)
                return torch.log(torch.clamp(spec, min=1e-5))

        stub.MelSpectrogram = _MelSpectrogram
        sys.modules["flamed.models.facodec.melspec"] = stub
    aft = f"{f}/alias_free_torch"
    _load("flamed.models.facodec.alias_free_torch.filter", f"{aft}/filter.py")
    _load("flamed.models.facodec.alias_free_torch.resample", f"{aft}/resample.py")
    _load("flamed.models.facodec.alias_free_torch.act", f"{aft}/act.py")
    afti = _load("flamed.models.facodec.alias_free_torch.__init__", f"{aft}/__init__.py")
    sys.modules["flamed.models.facodec.alias_free_torch"].__dict__.update(afti.__dict__)
    _load("flamed.models.facodec.quantize.fvq", f"{f}/quantize/fvq.py")
    _load("flamed.models.facodec.quantize.rvq", f"{f}/quantize/rvq.py")
    qi = _load("flamed.models.facodec.quantize.__init__", f"{f}/quantize/__init__.py")
    sys.modules["flamed.models.facodec.quantize"].__dict__.update(qi.__dict__)
    _load("flamed.models.facodec.transformer", f"{f}/transformer.py")
    facodec = _load("flamed.models.facodec.facodec", f"{f}/facodec.py")

    ns = types.SimpleNamespace(
        Models=models,
        pva=pva,
        prior_generator=prior,
        prob_generator=prob,
        facodec=facodec,
    )
    return ns
