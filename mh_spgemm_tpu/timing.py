"""Per-phase timing — the reference's ``Timing`` struct re-created.

Mirrors ``inc/Timing.h:3-21`` / ``src/Timing.cpp:4-42``: the same seven
phase fields, accumulate/average over iterations, ``print_step_time`` and a
``total`` that **excludes** ``form_mask_matrix_b`` (mask construction is
accounted as format conversion, not SpGEMM time — src/Timing.cpp:39-42).

On TPU the rdtsc ``fast_clock_time`` (``inc/common.h:97-133``) becomes
``time.perf_counter`` around ``block_until_ready`` fences, the equivalent of
bracketing phases with ``cudaDeviceSynchronize`` (src/main.cu:14-66).
"""

from __future__ import annotations

import dataclasses
import time


def fast_clock_time() -> float:
    """Seconds from a monotonic high-resolution clock."""
    return time.perf_counter()


_PHASES = ("mem_alloc", "form_mask_matrix_b", "symbolic_binning",
           "calculate_c_nnz", "malloc_c_col_val", "numeric_binning",
           "numeric")


@dataclasses.dataclass
class Timing:
    """Per-phase milliseconds."""

    mem_alloc: float = 0.0
    form_mask_matrix_b: float = 0.0
    symbolic_binning: float = 0.0
    calculate_c_nnz: float = 0.0
    malloc_c_col_val: float = 0.0
    numeric_binning: float = 0.0
    numeric: float = 0.0

    def __iadd__(self, other: "Timing") -> "Timing":
        for f in _PHASES:
            setattr(self, f, getattr(self, f) + getattr(other, f))
        return self

    def __itruediv__(self, k: float) -> "Timing":
        for f in _PHASES:
            setattr(self, f, getattr(self, f) / k)
        return self

    def total(self) -> float:
        """Total SpGEMM time in ms; mask build excluded
        (src/Timing.cpp:39-42)."""
        return (self.mem_alloc + self.symbolic_binning +
                self.calculate_c_nnz + self.malloc_c_col_val +
                self.numeric_binning + self.numeric)

    def print_step_time(self) -> None:
        print(f"mem_alloc          = {self.mem_alloc:9.3f} ms")
        print(f"Form_mask_matrix_B = {self.form_mask_matrix_b:9.3f} ms")
        print(f"symbolic_binning   = {self.symbolic_binning:9.3f} ms")
        print(f"Calculate_C_nnz    = {self.calculate_c_nnz:9.3f} ms")
        print(f"Malloc_C_col_val   = {self.malloc_c_col_val:9.3f} ms")
        print(f"numeric_binning    = {self.numeric_binning:9.3f} ms")
        print(f"Numeric            = {self.numeric:9.3f} ms")

    def as_dict(self) -> dict:
        d = {f: getattr(self, f) for f in _PHASES}
        d["total"] = self.total()
        return d


class PhaseTimer:
    """Context helper: ``with timer.phase(t, "numeric"): ...`` adds the
    block's wall time (caller must fence the device inside the block)."""

    class _Ctx:
        def __init__(self, timing: Timing, field: str):
            self.timing, self.field = timing, field

        def __enter__(self):
            self.t0 = fast_clock_time()
            return self

        def __exit__(self, *exc):
            dt = (fast_clock_time() - self.t0) * 1e3
            setattr(self.timing, self.field,
                    getattr(self.timing, self.field) + dt)
            return False

    @staticmethod
    def phase(timing: Timing, field: str) -> "PhaseTimer._Ctx":
        assert field in _PHASES, field
        return PhaseTimer._Ctx(timing, field)


def gflops(intprod: int, total_ms: float) -> float:
    """Reference protocol (src/main.cu:136): 2*intprod / (ms * 1e6)."""
    if total_ms <= 0:
        return 0.0
    return 2.0 * intprod / (total_ms * 1e6)


def device_fence(*arrays) -> None:
    """Hard device fence: fetch one element of each array.

    The ``cudaDeviceSynchronize`` analogue.  ``block_until_ready`` is used
    when available, but some transports (the axon TPU relay) complete it
    before execution finishes, so a tiny D2H fetch — which cannot return
    before the producing program ran — is the authoritative fence.
    """
    import numpy as np
    for a in arrays:
        np.asarray(a.reshape(-1)[:1])


_RTT_S: float | None = None


def fence_round_trip_s(refresh: bool = False) -> float:
    """Measured cost (seconds) of one ``device_fence`` on a fresh tiny
    array — the transport's synchronization price, NOT device compute.

    On a local runtime this is microseconds; through the axon relay it
    is one ~32 ms round trip.  Steady-state benchmarking (driver
    ``run_matrix``) dispatches all iterations back-to-back, fences once,
    and subtracts this — the honest analogue of the reference's
    cudaEvent timing (src/main.cu:14-66), which also excludes
    host<->device synchronization latency from the per-iteration time.
    """
    global _RTT_S
    if _RTT_S is None or refresh:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: x + 1)
        o = f(jnp.zeros((8,), jnp.int32))
        device_fence(o)                      # compile + drain
        best = float("inf")
        for _ in range(3):
            o = f(jnp.zeros((8,), jnp.int32))
            t0 = time.perf_counter()
            device_fence(o)
            best = min(best, time.perf_counter() - t0)
        _RTT_S = best
    return _RTT_S
