"""I/O: image and metadata codecs (MRC, TIFF, .par, .cistem, .star, npz bundles)."""

from pyp_tpu.io import cistem, metadata, mrc, parfile, star  # noqa: F401
