"""Flamed-TTS-TPU: a TPU-native zero-shot text-to-speech framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Flamed-TTS
(reference: nghiahuynh-ai/Flamed-TTS): given English text and a short prompt
WAV of an arbitrary speaker, synthesize the text in the prompt speaker's
voice at 16 kHz.

Pipeline (all device stages jitted with static shapes):

  text --host--> phoneme ids
  prompt wav --FaCodecEncoder--> latents --RVQ--> codes + timbre embedding
  phonemes  --PriorGenerator--> durations (flow matching) -> length-regulated
                                per-quantizer hidden conditions
  conditions --ProbGenerator--> FaCodec latents (flow-matching Euler loop,
                                attention-free ConvNeXt/adaLN denoiser)
  latents + timbre --FaCodecDecoder--> waveform

Layers (bottom to top):
  ops/       generic TPU-friendly NN ops (attention FFT blocks, ConvNeXt,
             gather-based length regulation, kaiser-sinc resampling)
  models/    prior generator, prob generator, FaCodec codec
  parallel/  device mesh + sharding rules (dp/tp over ICI)
  runtime/   bucketed static-shape sampling executor, checkpoints
  data/      manifest datasets + fixed-shape collation
  train/     optax training step, losses, pjit data-parallel loop
  text/      host-side phoneme frontend (keithito-compatible symbol ids)
"""

__version__ = "0.1.0"

from flamed_tts_tpu.config import load_config, load_yaml  # noqa: F401
