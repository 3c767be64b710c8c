"""Runtime/utility units: buckets, pytree io, audio io, textgrid, config."""

import os

import numpy as np
import pytest

from flamed_tts_tpu.config import ConfigDict, compose_training_config, load_default_config, save_yaml
from flamed_tts_tpu.runtime.buckets import pick_bucket
from flamed_tts_tpu.runtime.pytree_io import (
    flatten_pytree,
    load_pytree_npz,
    pytree_num_params,
    save_pytree_npz,
    unflatten_pytree,
)
from flamed_tts_tpu.utils.audio import load_wav, save_wav
from flamed_tts_tpu.utils.textgrid import read_textgrid


def test_pick_bucket():
    assert pick_bucket(1, [64, 128]) == 64
    assert pick_bucket(64, [64, 128]) == 64
    assert pick_bucket(65, [64, 128]) == 128
    assert pick_bucket(1000, [64, 128]) == 128  # clipped to largest


def test_pytree_npz_roundtrip(tmp_path):
    tree = {
        "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "blocks": [
            {"x": np.ones(3, np.float32)},
            {"x": np.zeros(2, np.int32)},
        ],
    }
    path = str(tmp_path / "t.npz")
    save_pytree_npz(path, tree)
    loaded = load_pytree_npz(path)
    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == 2
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(loaded["blocks"][1]["x"], tree["blocks"][1]["x"])
    assert pytree_num_params(tree) == 6 + 3 + 2


def test_flatten_unflatten_identity():
    tree = {"p": [{"q": np.zeros(2)}, {"q": np.ones(2)}], "r": np.arange(3)}
    assert flatten_pytree(unflatten_pytree(flatten_pytree(tree))).keys() == flatten_pytree(tree).keys()


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wav = (0.5 * np.sin(np.arange(sr) * 0.05)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    save_wav(path, wav, sr)
    back = load_wav(path, sr)
    assert back.shape == wav.shape
    assert np.abs(back - wav).max() < 1e-3  # 16-bit quantization


def test_wav_resample(tmp_path):
    sr = 22050
    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "y.wav")
    from scipy.io import wavfile

    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    out = load_wav(path, 16000)
    assert abs(out.shape[0] - 16000) <= 2


def test_textgrid_parser(tmp_path):
    tg = tmp_path / "a.TextGrid"
    tg.write_text(
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n'
        "xmin = 0\nxmax = 1.0\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n"
        '        class = "IntervalTier"\n'
        '        name = "phones"\n'
        "        xmin = 0\n        xmax = 1.0\n        intervals: size = 3\n"
        "        intervals [1]:\n            xmin = 0.0\n            xmax = 0.25\n"
        '            text = "HH"\n'
        "        intervals [2]:\n            xmin = 0.25\n            xmax = 0.5\n"
        '            text = ""\n'
        "        intervals [3]:\n            xmin = 0.5\n            xmax = 1.0\n"
        '            text = "AH0"\n'
    )
    tiers = read_textgrid(str(tg))
    assert "phones" in tiers
    phones = tiers["phones"]
    assert len(phones) == 3
    assert phones[0].text == "HH" and phones[1].text == "" and phones[2].text == "AH0"
    assert phones[2].start_time == 0.5


def test_config_compose_and_save(tmp_path):
    cfg = load_default_config()
    assert cfg.prior_generator.transformer.encoder_hidden == 192
    assert cfg["prob_generator"]["hidden_dim"] == 1024
    path = str(tmp_path / "merged.yaml")
    save_yaml(cfg, path)
    from flamed_tts_tpu.config import load_config

    cfg2 = load_config(path)
    assert cfg2["prior_generator"]["transformer"]["decoder_layers"] == [1, 2, 2, 3, 3, 3]
    assert cfg2.to_dict() == cfg.to_dict()


def test_dataset_alignment(tmp_path):
    """get_alignment folds trailing silences into the preceding phone."""
    from flamed_tts_tpu.data.dataset import TextCodesDataset
    from flamed_tts_tpu.utils.textgrid import Interval

    ds = TextCodesDataset.__new__(TextCodesDataset)
    ds.sampling_rate = 16000
    ds.down_factor = 200
    ds.sil_phones = ("sil", "sp", "spn", "")

    intervals = [
        Interval(0.0, 0.25, "HH"),     # 20 frames
        Interval(0.25, 0.375, "sp"),   # 10 frames silence
        Interval(0.375, 0.5, "AH0"),   # 10 frames
    ]
    phones, dur, sil = ds.get_alignment(intervals)
    # leading 'bos' relabeled to 'sp' with duration 0
    assert phones == ["sp", "HH", "AH0"]
    assert dur == [0, 20, 10]
    assert sil == [0, 10, 0]
