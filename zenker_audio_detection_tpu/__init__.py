"""zenker_audio_detection_tpu — TPU-native rebuild of daostler-tum/zenker-audio-detection.

A JAX/XLA/Pallas/pjit framework for two-stage Audio Spectrogram Transformer
(AST) classification of cervical-auscultation swallow sounds:

- Stage 1: 1-second window -> Idle (0) vs Swallow (1)
- Stage 2: swallow windows -> Healthy (0) vs Zenker (1)
- Patient decision: Zenker-to-Swallow Ratio (ZSR) over sliding windows.

Layering (bottom-up):
    ops/       fbank, attention, resample, losses, metrics (JAX/Pallas compute)
    models/    AST encoder, HF checkpoint converter, checkpointing
    audio/     WAV I/O, augmentations
    data/      CV splitters, normalization stats, loaders
    infer/     two-stage cascade engine, cache, aggregation, ROC/PR
    train/     fine-tuning loop (optax), early stopping, best-F1 selection
    parallel/  device mesh, sharding rules, pjit step builders
    cli/       reference-parity command-line entry points
"""

__version__ = "0.1.0"
