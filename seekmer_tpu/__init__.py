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
        import hashlib

        import jax

        # Key the cache dir by the host's CPU feature set: XLA:CPU AOT
        # results compiled on a machine with more ISA extensions load on a
        # lesser host with "could lead to SIGILL" warnings when the cache
        # directory outlives the machine. (TPU programs recompile too on a
        # host change — correctness over reuse.)
        try:
            import platform

            with open("/proc/cpuinfo") as fh:
                # x86 uses "flags", aarch64 uses "Features"; include the
                # model line and machine so a host with NEITHER keyword
                # still gets a distinct fingerprint per CPU type
                stable = [l for l in fh
                          if l.startswith(("flags", "Features",
                                           "model name", "CPU part"))]
            fp = hashlib.sha1(
                ("".join(sorted(set(stable))) + platform.machine())
                .encode()).hexdigest()[:10]
        except OSError:
            # no /proc/cpuinfo (e.g. macOS): derive the fingerprint from
            # the platform identifiers so different CPU types still get
            # distinct cache dirs (a constant here would re-open the
            # stale-AOT-cache SIGILL hazard across machine types)
            import platform

            fp = hashlib.sha1(
                (platform.machine() + platform.processor()
                 + platform.system()).encode()).hexdigest()[:10]
        path = os.environ.get(
            "SEEKMER_JAX_CACHE",
            os.path.expanduser(f"~/.cache/seekmer_tpu_jax_{fp}"),
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
