"""mh_spgemm_tpu — TPU-native sparse general matrix-matrix multiplication.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
MH-SpGEMM (masking + hashing cooperative SpGEMM, CUDA): C = A @ B over CSR
matrices via a two-stage pipeline — compressed 32-column bitmap mask matrix
of B, exact tile-granularity symbolic stage, and mask-guided numeric
accumulation — expressed as fixed-shape vector programs XLA tiles onto the
TPU, plus multi-chip execution the single-GPU reference never had.
"""

import os as _os

import jax as _jax

# The reference computes in double precision (VALUE_TYPE double,
# inc/common.h:8) with a 1e-9 comparator tolerance; float64 on TPU requires
# the x64 flag.  Index math stays int32 throughout.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline jits a small set of
# capacity-quantized programs (ops/shapes.py); caching them on disk makes
# every process after the first start warm — the analogue of the reference
# shipping precompiled fatbins.  Opt out with MHSPGEMM_NO_COMPILE_CACHE=1.
if not _os.environ.get("MHSPGEMM_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "MHSPGEMM_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "mh_spgemm_tpu",
                      "xla"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimisation; never fail import
        pass

from .config import DEFAULT_CONFIG, SpGEMMConfig          # noqa: E402
from .csr import CSR, DeviceCSR                           # noqa: E402
from .errors import (DeviceError, MatrixFormatError,      # noqa: E402
                     ShapeMismatchError, SpGEMMError, VerificationError)
from .baseline import oracle_spgemm, timed_oracle_spgemm, verify  # noqa: E402
from .pipeline import (SpGEMMPlan, make_plan, spgemm,  # noqa: E402
                       spgemm_chunked, spgemm_host)
from .timing import Timing, gflops                        # noqa: E402
from .io.mmio import extract_matrix_name, read_mtx, write_mtx  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "CSR", "DeviceCSR", "SpGEMMConfig", "DEFAULT_CONFIG",
    "SpGEMMPlan", "make_plan", "spgemm", "spgemm_chunked",
    "spgemm_host",
    "oracle_spgemm", "timed_oracle_spgemm", "verify",
    "Timing", "gflops",
    "read_mtx", "write_mtx", "extract_matrix_name",
    "SpGEMMError", "MatrixFormatError", "ShapeMismatchError",
    "VerificationError", "DeviceError",
]
