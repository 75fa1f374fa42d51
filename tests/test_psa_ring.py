"""Ring-wavefront kernel (ops/psa_ring.py) vs the scan oracle.

Runs on the virtual 8-device CPU mesh in TPU interpret mode, which
simulates the inter-chip remote DMAs (SURVEY section 4 test plan (d)).
"""

import numpy as np
import pytest

import jax

from tsta_tpu.config import AlignParams
from tsta_tpu.ops import psa_ring, psa_scan


def _mesh(d):
    if len(jax.devices()) < d:
        pytest.skip("needs %d devices" % d)
    return jax.make_mesh((d,), ("seq",))


def _rand_pair(rng, n, m):
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = rng.integers(65, 69, m).astype(np.uint8)
    return a, b


@pytest.mark.parametrize("n,m,T,d", [
    (1024, 96, 32, 8),      # Rp=1 per device, padded rows
    (2048, 128, 32, 8),     # Rp=2 per device
    (1000, 100, 32, 8),     # ragged real lengths inside the padding
    (1024, 64, 32, 2),      # 2-device chain
    (512, 64, 32, 1),       # degenerate single device: no DMA at all
])
def test_ring_matches_oracle(n, m, T, d):
    rng = np.random.default_rng(n + m + d)
    a, b = _rand_pair(rng, n, m)
    params = AlignParams()
    mesh = _mesh(d)
    best, corner = psa_ring.align_long_ring(a, b, params, mesh=mesh, T=T)
    ref = psa_scan.psa_align(a, b, params)
    assert best == int(ref.score)
    assert corner == int(ref.last)


def test_ring_nondefault_params():
    rng = np.random.default_rng(5)
    a, b = _rand_pair(rng, 1024, 96)
    params = AlignParams(match=3, mismatch=-2, gap_extend=-1, gap_open=-6)
    mesh = _mesh(4)
    best, corner = psa_ring.align_long_ring(a, b, params, mesh=mesh, T=32)
    ref = psa_scan.psa_align(a, b, params)
    assert best == int(ref.score)
    assert corner == int(ref.last)


def test_ring_empty_rejected():
    mesh = _mesh(2)
    with pytest.raises(ValueError):
        psa_ring.align_long_ring(np.zeros(0, np.uint8),
                                 np.frombuffer(b"ACGT", np.uint8),
                                 AlignParams(), mesh=mesh)
