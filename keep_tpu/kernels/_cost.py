"""Cost-estimate helper shared by the Pallas kernels.

``pl.CostEstimate`` requires concrete ints. Under ``jax.export`` shape
polymorphism (compat/aot.py exports with a symbolic batch dim) shape
products are ``_DimExpr``s — in that case return None (no estimate) rather
than crash; the estimate only tunes the compiler's pipelining heuristics.
"""

from jax.experimental import pallas as pl


def maybe_cost_estimate(*, flops, bytes_accessed, transcendentals):
    vals = (flops, bytes_accessed, transcendentals)
    if all(isinstance(v, int) for v in vals):
        return pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                               transcendentals=transcendentals)
    return None


# shared scoped-VMEM budget for the megakernels (and the jit-level
# default in utils/compile.tpu_compiler_options — keep in sync by
# importing this, not by copying the number). 64 MiB measured as the
# plateau on v5e (96/112 MiB gain nothing; docs/PERF.md).
VMEM_LIMIT_BYTES = 64 * 2**20
