"""tsalign-tpu: a TPU-native template-switch pairwise sequence aligner.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sebschmi/template-switch-aligner (tsalign): minimum-cost global pairwise
alignment of DNA/RNA sequences under gap-affine edit costs, extended with
template-switch mutations (TSMs) priced by the four-point model.

Unlike the reference (a single-threaded sparse best-first search in Rust,
see /root/reference/generic_a_star and lib_tsalign), this framework computes
the same optimum with dense, windowed dynamic programming that maps onto the
TPU's vector units, and batches many pairs data-parallel across a device mesh.

Public API mirrors the reference's Python bindings
(python_bindings/src/lib.rs:59-152):

    >>> import tsalign_tpu
    >>> result = tsalign_tpu.align("ACGT", "ACGT")
    >>> result.cigar()
"""

__version__ = "0.1.0"

from .alphabet import Alphabet, get_alphabet  # noqa: F401
from .config import TemplateSwitchConfig  # noqa: F401
from .costs import INF, CostFunction, GapAffineCostTable  # noqa: F401
from .geometry import AlignmentRange  # noqa: F401

__all__ = [
    "Alphabet",
    "get_alphabet",
    "TemplateSwitchConfig",
    "CostFunction",
    "GapAffineCostTable",
    "INF",
    "AlignmentRange",
    "align",
    "Aligner",
]


def __getattr__(name):
    # Lazy imports to keep `import tsalign_tpu` cheap (no JAX import).
    if name in ("align", "Aligner", "TSPairwiseAlignment"):
        from . import aligner

        return getattr(aligner, name)
    raise AttributeError(f"module 'tsalign_tpu' has no attribute {name!r}")
