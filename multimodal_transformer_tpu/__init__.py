"""multimodal_transformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multimodal time-series valence prediction.

Re-implements, TPU-first, the complete capability surface of the reference
PyTorch codebase for "Attending to Emotional Narratives" (ACII 2019): five model
families (MFT, SFT, B1-LSTM, B2-Trans, B3-MFN) over SENDv1 multimodal features,
with per-video CCC evaluation, reference-compatible checkpoints, and
PerfSave/PredSave artifact writers.

Layering (see SURVEY.md for the reference blueprint):
  data/      host-side SENDv1 reading, windowing, padding, batching
  ops/       pure-JAX numerics + Pallas TPU kernels
  models/    the five model families as functional param-pytree modules
  engine/    jitted train/eval steps, checkpointing, CSV/log writers
  parallel/  device-mesh sharding (data-parallel pjit/shard_map)
  utils/     configs, PRNG helpers, torch-compatible initializers
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (kept lazy so `import
    multimodal_transformer_tpu` stays light and jax-free until used)."""
    if name in ("Engine", "save_checkpoint", "load_checkpoint", "get_logger"):
        from . import engine
        return getattr(engine, name)
    if name == "ValencePredictor":
        from .serve import ValencePredictor
        return ValencePredictor
    if name in ("load_send", "window_pipeline", "generate_synthetic_send",
                "make_batches", "bucketed_eval_batches"):
        from . import data
        return getattr(data, name)
    if name in ("ModelConfig", "default_config", "build_model", "FAMILIES",
                "modalities_from_comb"):
        from . import models
        return getattr(models, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
