"""Multi-chip SPMD execution: mesh construction + sharded fused pipeline.

The reference scales with OpenMP byte-range chunking over shared files
(SURVEY.md §2 parallelism table); here the same decomposition becomes a 2D
jax mesh:

- axis ``sp`` (sequence/position parallel): the eBWT position stream is
  range-sharded; the reference's boundary-straddle protocol
  (src/ClusterLCP.cpp:196-264) becomes a ppermute halo exchange.
- axis ``dp`` (read/data parallel): the similarity matrix is row-sharded by
  read; each device accumulates only its read rows (scatter with drop), so
  the cross-shard reduction is a psum over ``sp`` only, and classification
  runs on local rows with no further communication.
"""

from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    banded_fused_step,
    make_sharded_pipeline,
    run_sharded,
)
