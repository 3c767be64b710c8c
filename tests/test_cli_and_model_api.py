"""CLI argument validation and Flamed.sample input contract."""

import argparse

import numpy as np
import pytest

import synthesize as syn


def _args(**kw):
    defaults = dict(
        metadata_file=None, prompt_list=None, prompt_dir="/tmp", text=None,
        batch_size=4,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_modes_mutually_exclusive():
    with pytest.raises(ValueError, match="but not both"):
        syn._validate_args(_args(metadata_file="x", prompt_list=["a.wav"]))
    with pytest.raises(ValueError, match="but not both"):
        syn._validate_args(_args())


def test_prompt_mode_requires_text():
    with pytest.raises(ValueError, match="--text is required"):
        syn._validate_args(_args(prompt_list=["a.wav"]))


def test_metadata_must_exist():
    with pytest.raises(ValueError, match="not found"):
        syn._validate_args(_args(metadata_file="/nonexistent/meta.txt", text="x"))


def test_prompt_dir_required():
    with pytest.raises(ValueError, match="prompt-dir"):
        syn._validate_args(_args(prompt_list=["a.wav"], text="hi", prompt_dir=None))


def test_batch_size_positive(tmp_path):
    meta = tmp_path / "m.txt"
    meta.write_text("a|b|c\n")
    with pytest.raises(ValueError, match="batch-size"):
        syn._validate_args(_args(metadata_file=str(meta), batch_size=0))


def test_sample_exclusivity_contract():
    """Flamed.sample raises the reference's exclusivity errors
    (flamed.py:114-124) without touching the device."""
    from flamed_tts_tpu.models.flamed import Flamed

    model = Flamed.__new__(Flamed)  # no params needed for validation
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.sample(text="hi", phonemes=np.array([1]), prompt_raw=np.zeros(10))
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.sample(text=None, phonemes=None, prompt_raw=np.zeros(10))
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.sample(text="hi", prompt_raw=np.zeros(10), prompt_processed=np.zeros((6, 4)))
    with pytest.raises(ValueError, match="timbre"):
        model.sample(text="hi", prompt_processed=np.zeros((6, 4), np.int32))
