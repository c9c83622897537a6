"""Matrix I/O: Matrix Market reader/writer and benchmark suite lists."""

from .mmio import extract_matrix_name, read_mtx, write_mtx  # noqa: F401
