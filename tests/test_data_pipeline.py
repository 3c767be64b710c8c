"""Data pipeline units: bucketed collate, prompt masking, iterators."""

import numpy as np
import pytest

from flamed_tts_tpu.data.dataset import BucketedCollator, batch_iterator


def _item(rng, l, lf, n_q=6, emb_dim=256, vocab=1024):
    return {
        "phoneme": rng.randint(1, 300, l).astype(np.int32),
        "code": rng.randint(0, vocab, (n_q, lf)).astype(np.int32),
        "emb": rng.randn(lf, emb_dim).astype(np.float32),
        "spk": rng.randn(emb_dim).astype(np.float32),
        "phone_dur": rng.randint(1, 4, l).astype(np.int32),
        "sil_dur": rng.randint(0, 2, l).astype(np.int32),
    }


def test_collate_shapes_and_buckets():
    rng = np.random.RandomState(0)
    collator = BucketedCollator(
        vocab_size=1024, phoneme_buckets=[16, 32], frame_buckets=[64, 128], seed=0
    )
    batch = collator([_item(rng, 10, 50), _item(rng, 20, 100)])
    assert batch["phonemes"].shape == (2, 32)       # bucket of max(10, 20)
    assert batch["codes"].shape == (2, 6, 128)      # bucket of max(50, 100)
    assert batch["embs"].shape == (2, 128, 256)
    np.testing.assert_array_equal(batch["x_len"], [10, 20])
    np.testing.assert_array_equal(batch["y_len"], [50, 100])
    # padding values
    assert np.all(batch["phonemes"][0, 10:] == 0)
    assert np.all(batch["codes"][0, :, 50:] == 1024)


def test_collate_prompt_content_masked():
    rng = np.random.RandomState(1)
    collator = BucketedCollator(vocab_size=1024, prompt_max_len=40,
                                prompt_reduced_factor=0.8, seed=0)
    batch = collator([_item(rng, 8, 60), _item(rng, 8, 45)])
    prompts = batch["prompts"]
    # crop = 0.8 * min(45, 40) = 32
    assert prompts.shape == (2, 6, 32)
    # content quantizer rows masked to vocab_size (dataset.py:430)
    assert np.all(prompts[:, 1:3, :] == 1024)
    # other rows carry real codes
    assert np.any(prompts[:, 0, :] != 1024)


def test_batch_iterator_drop_last():
    rng = np.random.RandomState(2)
    items = [_item(rng, 8, 30) for _ in range(5)]
    collator = BucketedCollator(vocab_size=1024, seed=0)
    batches = list(batch_iterator(items, collator, batch_size=2, shuffle=False))
    assert len(batches) == 2  # 5 items, drop_last
    batches = list(
        batch_iterator(items, collator, batch_size=2, shuffle=False, drop_last=False)
    )
    assert len(batches) == 3
    assert batches[-1]["phonemes"].shape[0] == 1
