"""End-to-end precompute tool: wav + TextGrid -> .npz -> trainable batch."""

import os
import subprocess
import sys

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = "HH"
        intervals [2]:
            xmin = 0.25
            xmax = 0.4
            text = ""
        intervals [3]:
            xmin = 0.4
            xmax = 0.8
            text = "AH0"
        intervals [4]:
            xmin = 0.8
            xmax = 1.0
            text = "L"
'''


def test_precompute_and_load(tmp_path):
    from flamed_tts_tpu.utils.audio import save_wav

    wav_path = str(tmp_path / "utt0.wav")
    save_wav(wav_path, (0.1 * np.sin(np.arange(16000) * 0.05)).astype(np.float32))
    tg_path = str(tmp_path / "utt0.TextGrid")
    with open(tg_path, "w") as f:
        f.write(TEXTGRID)
    manifest_in = str(tmp_path / "in.txt")
    with open(manifest_in, "w") as f:
        f.write(f"{wav_path}|{tg_path}|hello there world again\n")

    out_dir = str(tmp_path / "data")
    env = dict(os.environ, JAX_PLATFORMS="cpu", FLAMED_JAX_CACHE="off",
               FLAMED_NO_PALLAS="1")
    env.pop("PYTHONPATH", None)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "precompute_dataset.py"),
         "--manifest", manifest_in, "--out-dir", out_dir,
         "--codec-dir", "random", "--device", "cpu"],
        env=env, capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-2000:]

    sample = np.load(os.path.join(out_dir, "utt0.npz"))
    assert sample["code"].shape[0] == 6
    assert sample["code"].shape[1] == 16000 // 200  # 80 frames
    assert sample["emb"].shape == (80, 256)
    assert sample["spk"].shape == (256,)
    # leading bos (relabeled 'sp', dur 0) + HH + AH0 + L; the pause after
    # HH folds into HH's trailing silence (reference dataset.py:292-320)
    assert list(sample["phone_dur"].shape) == [4]
    assert sample["phone_dur"][0] == 0
    assert sample["sil_dur"][1] > 0

    # loads through the training dataset + collator
    from flamed_tts_tpu.data.dataset import BucketedCollator, PrecomputedDataset

    ds = PrecomputedDataset(data_root=out_dir, manifest="manifest.txt",
                            dur_min=0.1, dur_max=20, n_words_min=2)
    assert len(ds) == 1
    batch = BucketedCollator(vocab_size=1024, phoneme_buckets=[8],
                             frame_buckets=[128], prompt_max_len=40)( [ds[0]] )
    assert batch["codes"].shape == (1, 6, 128)
    assert int(batch["y_len"][0]) == 80
