"""Multi-chip scale-out via jax.sharding over a device Mesh.

See `mesh.py` for why this exists (the reference's only parallelism is
rayon-over-batch; here that maps to dp sharding over ICI) and
`models/transformer.py` for the tp layout the flagship uses.
"""
from .pipeline import pipeline_forward  # noqa: F401
from .ring import ring_flash_attention  # noqa: F401
from .mesh import (  # noqa: F401
    DataParallel,
    data_parallel_sharding,
    distributed_init,
    make_global_batch,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DataParallel", "data_parallel_sharding", "distributed_init",
    "make_global_batch", "make_hybrid_mesh", "make_mesh",
    "replicated", "shard_batch", "pipeline_forward",
    "ring_flash_attention",
]
