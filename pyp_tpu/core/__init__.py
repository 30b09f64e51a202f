"""Core JAX math: FFT helpers, CTF model, geometry, filters, FSC."""

from pyp_tpu.core import ctf, fft, filters, fsc, geometry  # noqa: F401
