"""Evaluation harness units."""

from tools.evaluate import word_error_rate

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


def test_wer_exact_match():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0


def test_wer_substitution():
    assert word_error_rate("the cat sat", "the dog sat") == 1 / 3


def test_wer_insert_delete():
    assert word_error_rate("a b c d", "a b d") == 0.25
    assert word_error_rate("a b", "a x b y") == 1.0


def test_wer_case_insensitive():
    assert word_error_rate("Hello World", "hello world") == 0.0


def test_wer_empty_reference():
    assert word_error_rate("", "anything here") == 0.0


def test_mel_stats_embedding_discriminates():
    """The independent embedder must give higher similarity for
    same-source audio than for spectrally different audio."""
    import numpy as np

    from tools.evaluate import _cosine, mel_stats_embedding

    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    tone_a1 = (0.2 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(16000)).astype(np.float32)
    tone_a2 = (0.2 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(16000)).astype(np.float32)
    noise = (0.2 * rng.randn(16000)).astype(np.float32)

    e_a1, e_a2, e_n = map(mel_stats_embedding, (tone_a1, tone_a2, noise))
    assert e_a1.shape == (320,)
    assert _cosine(e_a1, e_a2) > _cosine(e_a1, e_n)


def test_evaluate_cli_end_to_end(tmp_path):
    """Full harness run with a stub ASR command: every metric populated
    (VERDICT round-1 item 8).  The documented real-ASR invocation is e.g.
    --asr-cmd 'whisper --model base --output_format txt {wav} && cat ...'
    or a faster-whisper/wav2vec2 one-liner (docs/COMPONENTS.md)."""
    import json
    import subprocess
    import sys

    import numpy as np

    from flamed_tts_tpu.utils.audio import save_wav

    t = np.arange(16000) / 16000.0
    synth_dir = tmp_path / "synth"
    prompt_dir = tmp_path / "prompts"
    ref_dir = tmp_path / "refs"
    for d in (synth_dir, prompt_dir, ref_dir):
        d.mkdir()
    save_wav(str(synth_dir / "utt1.wav"), (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32))
    save_wav(str(prompt_dir / "p1.wav"), (0.2 * np.sin(2 * np.pi * 210 * t)).astype(np.float32))
    save_wav(str(ref_dir / "utt1.wav"), (0.2 * np.sin(2 * np.pi * 205 * t)).astype(np.float32))
    meta = tmp_path / "meta.txt"
    meta.write_text("utt1.wav|p1.wav|hello brave new world\n")

    # stub ASR: ignores the wav, prints a transcript with one error
    asr = "python -c \"print('hello brave old world')\" # {wav}"
    out = subprocess.run(
        [
            sys.executable, "tools/evaluate.py",
            "--synth-dir", str(synth_dir),
            "--metadata-file", str(meta),
            "--prompt-dir", str(prompt_dir),
            "--ref-dir", str(ref_dir),
            "--codec-dir", "random",
            "--asr-cmd", asr,
            "--device", "cpu",
        ],
        capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["n_evaluated"] == 1
    assert report["wer"] == 0.25
    assert report["speaker_similarity"] is not None
    assert report["speaker_similarity_melstats"] is not None
    assert report["mel_l2"] is not None
    assert report["avg_duration_sec"] == 1.0
