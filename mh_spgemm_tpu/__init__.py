"""mh_spgemm_tpu — TPU-native sparse general matrix-matrix multiplication.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
MH-SpGEMM (masking + hashing cooperative SpGEMM, CUDA): C = A @ B over CSR
matrices via a two-stage pipeline — compressed 32-column bitmap mask matrix
of B, exact tile-granularity symbolic stage, and mask-guided numeric
accumulation — expressed as fixed-shape vector programs XLA tiles onto the
TPU, plus multi-chip execution the single-GPU reference never had.
"""

import jax as _jax

# The reference computes in double precision (VALUE_TYPE double,
# inc/common.h:8) with a 1e-9 comparator tolerance; float64 on TPU requires
# the x64 flag.  Index math stays int32 throughout.
_jax.config.update("jax_enable_x64", True)

from .config import DEFAULT_CONFIG, SpGEMMConfig          # noqa: E402
from .csr import CSR, DeviceCSR                           # noqa: E402
from .errors import (DeviceError, MatrixFormatError,      # noqa: E402
                     ShapeMismatchError, SpGEMMError, VerificationError)
from .baseline import oracle_spgemm, timed_oracle_spgemm, verify  # noqa: E402
from .pipeline import SpGEMMPlan, make_plan, spgemm, spgemm_host  # noqa: E402
from .timing import Timing, gflops                        # noqa: E402
from .io.mmio import extract_matrix_name, read_mtx, write_mtx  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "CSR", "DeviceCSR", "SpGEMMConfig", "DEFAULT_CONFIG",
    "SpGEMMPlan", "make_plan", "spgemm", "spgemm_host",
    "oracle_spgemm", "timed_oracle_spgemm", "verify",
    "Timing", "gflops",
    "read_mtx", "write_mtx", "extract_matrix_name",
    "SpGEMMError", "MatrixFormatError", "ShapeMismatchError",
    "VerificationError", "DeviceError",
]
