"""Dense DP engines replacing the reference's sparse A* search.

The reference explores the alignment graph with best-first search
(generic_a_star); on TPU the same optimum is computed with dense wavefront
dynamic programming over layered state:

  * primary_sweep — gap-affine M/I/D recurrence over flank-indexed layers,
    with arbitrary seed injection (TSM reentries).
  * tsm_edges — per-TSM-kind backward "inner" DP + windowed (min,+)
    contractions that price complete template switches as dense edge
    tensors between primary cells.
  * engine — fixpoint driver alternating sweeps and TSM edge application,
    plus exact host-side traceback.

The numpy implementations are the exact (int64) reference semantics; the JAX
implementations mirror them with int32 saturating arithmetic for the TPU.
"""
