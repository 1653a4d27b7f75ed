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


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache: full-size AST programs take minutes
    to compile over this environment's remote-compile tunnel; caching makes
    every later process (bench, CLI, driver checks) hit warm executables.
    Opt out with ZENKER_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("ZENKER_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/zenker_jax_cache"))
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard dependency


_enable_persistent_compile_cache()
