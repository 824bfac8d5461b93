"""seekmer_tpu: TPU-native RNA-seq quantification.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
GuanLab/seekmer (see SURVEY.md): transcriptome k-mer indexing, k-mer
pseudoalignment of reads to transcript equivalence classes, and EM-based
transcript abundance inference with bootstrap uncertainty — scaled over TPU
device meshes via pjit/shard_map.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compiles through this
    container's remote-compile tunnel take minutes; cache them across
    processes (safe no-op if unavailable)."""
    import os

    try:
        import jax

        path = os.environ.get(
            "SEEKMER_JAX_CACHE",
            os.path.expanduser("~/.cache/seekmer_tpu_jax"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .config import (  # noqa: F401
    EMConfig,
    IndexConfig,
    MapConfig,
    PipelineConfig,
    ShardConfig,
)
