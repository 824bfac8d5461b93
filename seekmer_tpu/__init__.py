"""seekmer_tpu: TPU-native RNA-seq quantification.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
GuanLab/seekmer (see SURVEY.md): transcriptome k-mer indexing, k-mer
pseudoalignment of reads to transcript equivalence classes, and EM-based
transcript abundance inference with bootstrap uncertainty — scaled over TPU
device meshes via pjit/shard_map.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    EMConfig,
    IndexConfig,
    MapConfig,
    PipelineConfig,
    ShardConfig,
)
