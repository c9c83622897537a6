"""Static-shape quantization — the TPU analogue of the reference's
fixed-size bin tables.

XLA compiles one program per static shape tuple.  The reference solves the
same problem on GPU with 13 fixed hash-table sizes (``inc/common.h:30-78``)
so every row, whatever its true size, runs a kernel compiled for one of a
small set of capacities.  Here every host-read dynamic size (stream length,
tile count, nnz(C), ...) is rounded up to a small geometric grid before it
becomes a jit static, so different matrices — and different iterations of a
growing workload — reuse the same compiled programs.  The grid ratio is
1.25 (mantissa {8, 10, 12, 14} x 2^k): at most 25% padded work per op, and
O(log_1.25 4e9) ~ 100 distinct sizes ever.
"""

from __future__ import annotations

import numpy as np

_MANTISSAS = (8, 10, 12, 14)


def quantize(n: int, min_size: int = 8) -> int:
    """Round ``n`` up to the next grid size {8,10,12,14} * 2^k."""
    n = max(int(n), min_size)
    if n <= _MANTISSAS[0]:
        return _MANTISSAS[0]
    # start at the 2^k block just below n, scan mantissas upward
    k = max(0, (n - 1).bit_length() - 4)
    while True:
        for m in _MANTISSAS:
            c = m << k
            if c >= n:
                return c
        k += 1


def quantize_pow2(n: int, min_size: int = 1) -> int:
    """Round up to the next power of two (for scan pass bounds)."""
    n = max(int(n), min_size)
    return 1 << (n - 1).bit_length() if n > 1 else 1


def pad1(x: np.ndarray, size: int, fill=0) -> np.ndarray:
    """Pad a 1-D host array to ``size`` with ``fill`` (no-op if exact)."""
    if x.shape[0] == size:
        return x
    assert x.shape[0] < size, (x.shape, size)
    out = np.full((size,), fill, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out
