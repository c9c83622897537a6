"""Benchmark harness: CLI driver, suite runner, synthetic generators."""

from . import gen  # noqa: F401
