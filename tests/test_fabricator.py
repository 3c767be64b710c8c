"""Fabricated-corpus acoustics: the properties the eval harness rests on.

Round-3 verdict: the fabricator emitted identical audio for every phone
and speaker, which made audio-level eval vacuous.  These tests pin the
fixed properties: distinct phones get distinct spectra, distinct
speakers get distinct voices."""

import numpy as np

from tools.fabricate_corpus import _phone_audio, make_speaker

SR = 16000


def _centroid(seg):
    spec = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), 1.0 / SR)
    return float((spec * freqs).sum() / (spec.sum() + 1e-9))


def _gen(phone, spk, n=6400, seed=0):
    return _phone_audio(phone, n, 0.25, spk, np.random.RandomState(seed))


def test_fricative_bands_ordered():
    spk = make_speaker(0)
    c_s = _centroid(_gen("S", spk))
    c_sh = _centroid(_gen("SH", spk))
    c_m = _centroid(_gen("M", spk))
    assert c_s > c_sh + 800, (c_s, c_sh)
    assert c_sh > c_m + 800, (c_sh, c_m)


def test_vowels_distinct():
    spk = make_speaker(1)
    iy = _gen("IY", spk)
    aa = _gen("AA", spk)
    # IY's F2 (2290 Hz) puts far more energy above 1.6 kHz than AA (1090)
    def hi_ratio(seg):
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), 1.0 / SR)
        return float(spec[freqs > 1600].sum() / (spec.sum() + 1e-9))

    assert hi_ratio(iy) > 2 * hi_ratio(aa)


def test_stops_have_closure_then_burst():
    spk = make_speaker(2)
    seg = _gen("T", spk, n=3200)
    closure_rms = float(np.sqrt((seg[:1600] ** 2).mean()))
    burst_rms = float(np.sqrt((seg[1800:2400] ** 2).mean()))
    assert burst_rms > 5 * closure_rms


def test_speakers_differ_in_f0_and_tract():
    f0s = [make_speaker(i)["f0"] for i in range(24)]
    assert max(f0s) / min(f0s) > 1.8, "speaker pool f0 spread collapsed"
    # deterministic: same id -> same voice
    assert make_speaker(7) == make_speaker(7)
    # audible difference between two speakers on the same phone
    a = _gen("AA", make_speaker(3), seed=5)
    b = _gen("AA", make_speaker(11), seed=5)
    assert abs(_centroid(a) - _centroid(b)) > 30 or (
        abs(make_speaker(3)["f0"] - make_speaker(11)["f0"]) > 10
    )


def test_silence_is_quiet():
    spk = make_speaker(0)
    sil = _gen("sil", spk)
    vowel = _gen("AA", spk)
    assert np.sqrt((sil ** 2).mean()) < 0.01 * np.sqrt((vowel ** 2).mean()) * 100
    assert np.sqrt((sil ** 2).mean()) < 0.05 * np.sqrt((vowel ** 2).mean())
