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


def test_collate_prompt_buckets_static_shape():
    """prompt_buckets pads the crop to a static length with masked codes
    and reports the true crop via prompt_lens (one jit signature per
    bucket triple — the round-3 compile-churn fix)."""
    rng = np.random.RandomState(3)
    collator = BucketedCollator(vocab_size=1024, prompt_max_len=40,
                                prompt_reduced_factor=0.8,
                                prompt_buckets=[48], seed=0)
    batch = collator([_item(rng, 8, 60), _item(rng, 8, 45)])
    prompts = batch["prompts"]
    assert prompts.shape == (2, 6, 48)              # static bucket
    np.testing.assert_array_equal(batch["prompt_lens"], [32, 32])
    assert np.all(prompts[:, :, 32:] == 1024)       # pad tail masked
    assert np.any(prompts[:, 0, :32] != 1024)       # real codes kept

    # Crop above the largest bucket truncates (sampler.py policy) so the
    # shape stays static.
    collator = BucketedCollator(vocab_size=1024, prompt_max_len=40,
                                prompt_reduced_factor=0.8,
                                prompt_buckets=[24], seed=0)
    batch = collator([_item(rng, 8, 60), _item(rng, 8, 45)])
    assert batch["prompts"].shape == (2, 6, 24)
    np.testing.assert_array_equal(batch["prompt_lens"], [24, 24])


def test_prompt_pad_is_loss_invariant():
    """Padding the prompt buffer with masked codes + prompt_lens must not
    change any loss (the prior decode masks the tail)."""
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from test import build_cfg, fabricate_dummy_training_batch
    from flamed_tts_tpu.models.flamed import Flamed
    from flamed_tts_tpu.train.losses import compute_losses

    cfg = build_cfg(small=True)
    model = Flamed(cfg, rng=jax.random.PRNGKey(0))
    batch = fabricate_dummy_training_batch(np.random.RandomState(0), cfg)
    key = jax.random.PRNGKey(1)
    base = compute_losses(model.prior_module, model.prob_module, model.params,
                          batch, key, train=False)
    b, n_q, p = batch["prompts"].shape
    vocab = cfg["prior_generator"]["codec"]["vocab_size"]
    pad = jnp.full((b, n_q, 24), vocab, jnp.int32)
    batch2 = dict(batch)
    batch2["prompts"] = jnp.concatenate([batch["prompts"], pad], axis=-1)
    batch2["prompt_lens"] = jnp.full((b,), p, jnp.int32)
    padded = compute_losses(model.prior_module, model.prob_module, model.params,
                            batch2, key, train=False)
    for k in base:
        np.testing.assert_allclose(float(base[k]), float(padded[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
