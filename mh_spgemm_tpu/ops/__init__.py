"""Device-side operators of the SpGEMM pipeline (the reference's L0/L1)."""

from . import binning, expand, mask, numeric, scan, symbolic  # noqa: F401
