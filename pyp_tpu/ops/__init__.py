"""Compute kernels: motion correction, CTF fitting, picking, extraction,
refinement, reconstruction, tomography, CSP."""
