"""Multi-chip entry points: mesh construction, sharded solvers, and the
sharded convex path.

The production beyond-VMEM paths are the fused hybrids (per-shard Pallas
streaming select kernels + collective argmax — see docs/DESIGN.md §4):
mp/omp/gomp/sp/fr/ompr/srr/rmp/foba_sharded_fused. The plain `omp_sharded` /
`omp_sharded_rows` are the XLA-loop references the hybrids are verified
against, and the row-sharded variant is the long-measurement-axis (n >> m)
strategy.
"""

from cstpu.parallel.mesh import make_mesh, shard_dictionary, shard_batch
from cstpu.parallel.sharded import (
    omp_sharded,
    omp_sharded_rows,
    omp_sharded_fused,
    gomp_sharded_fused,
    sp_sharded_fused,
    fr_sharded_fused,
    mp_sharded_fused,
    ompr_sharded_fused,
    srr_sharded_fused,
    rmp_sharded_fused,
    foba_sharded_fused,
)
from cstpu.parallel.sharded_sbl import fsbl_sharded, rmps_sharded
from cstpu.parallel.convex import (bp_sharded, bp_ard_sharded,
                                   bpd_sharded, bpd_candes_sharded,
                                   bpd_ard_sharded, bpd_secant_sharded,
                                   ista_sharded, fista_sharded)

__all__ = [
    "make_mesh", "shard_dictionary", "shard_batch",
    "omp_sharded", "omp_sharded_rows", "omp_sharded_fused",
    "gomp_sharded_fused", "sp_sharded_fused", "fr_sharded_fused",
    "mp_sharded_fused", "ompr_sharded_fused", "srr_sharded_fused",
    "rmp_sharded_fused", "foba_sharded_fused",
    "fsbl_sharded", "rmps_sharded",
    "bp_sharded", "bp_ard_sharded", "bpd_sharded", "bpd_candes_sharded",
    "bpd_ard_sharded", "bpd_secant_sharded", "ista_sharded",
    "fista_sharded",
]
