"""TSTA-TPU: a TPU-native sequence-alignment engine.

A from-scratch reimplementation of the capabilities of the reference CPU tool
TSTA (striped-SIMD + anti-diagonal difference-method aligner, see
/root/reference):

* Global pairwise alignment (Needleman-Wunsch, affine gaps) with and without
  traceback -- exact int32 DP in JAX (``ops.psa_scan``) and a Pallas tiled
  wavefront kernel (``ops.psa_pallas``) for TPU speed.
* Progressive partial-order-alignment (POA) multiple sequence alignment with
  heaviest-bundle consensus -- a bit-exact "compat" engine (C, ``native/``)
  reproducing the reference's int8 difference/clamp semantics, and a
  TPU-native exact engine (``ops.msa_native``).
* Batched, sharded execution over a ``jax.sharding.Mesh`` (``parallel/``).

Scoring convention (matches reference psa/psa.c:114-117): match ``M`` (+2),
mismatch ``X`` (-5), gap-extend ``E`` (-2), gap-open ``O`` (-4); a gap of
length k costs ``O + k*E``.
"""

from tsta_tpu.config import AlignParams
from tsta_tpu.version import __version__

__all__ = ["AlignParams", "__version__"]
