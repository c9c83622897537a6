"""Error handling.

The reference wraps every CUDA call in ``CHECK_ERROR`` which throws a
``std::exception`` on failure (``inc/common.h:82-95``) and the benchmark
driver catches it, reports "failed", and scores 0 GFLOPS
(``src/main.cu:120-145``).  The TPU equivalent is a small exception
hierarchy plus a guard helper used by the pipeline driver.
"""

from __future__ import annotations


class SpGEMMError(Exception):
    """Base class for all mh_spgemm_tpu errors."""


class MatrixFormatError(SpGEMMError):
    """Raised when an input matrix (file or arrays) is malformed."""


class ShapeMismatchError(SpGEMMError):
    """Raised when operand shapes are incompatible (A.N != B.M)."""


class VerificationError(SpGEMMError):
    """Raised when a computed C fails comparison against the oracle."""


class DeviceError(SpGEMMError):
    """Raised when a device-side computation fails (OOM, compile error)."""


def require(cond: bool, exc_type, msg: str) -> None:
    """CHECK_ERROR-style guard: raise ``exc_type(msg)`` unless ``cond``."""
    if not cond:
        raise exc_type(msg)
