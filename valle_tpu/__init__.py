"""valle_tpu — a TPU-native (JAX/XLA/Pallas/pjit) zero-shot TTS framework.

A from-scratch rebuild of the capabilities of lifeiteng/vall-e ("Neural Codec
Language Models are Zero-Shot Text to Speech Synthesizers", arXiv:2301.02111),
re-designed for TPU hardware:

- pure-functional flax model core, jitted train/infer steps, static shapes
- fused attention paths (full-sequence masked attention for training/NAR;
  KV-cache incremental decode for the AR loop, which the reference lacks)
- data-parallel (and beyond) scaling via ``jax.sharding.Mesh`` + collectives
- EnCodec (SEANet + RVQ) ported to JAX so codec encode/decode run on TPU
- host-side text/audio I/O with a small C++ native library (wav I/O,
  polyphase resampling) replacing torchaudio/sox

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
