"""pyp_tpu — TPU-native cryo-EM/ET framework.

A from-scratch reimplementation of the capabilities of nextPYP/pyp with an
idiomatic JAX/XLA/Pallas design: the reference's wrapped native binaries
(cisTEM2, FREALIGN, CSP, TOMO/ITK, IMOD, MotionCor3) are replaced by a batched
TPU operator library, while pipeline semantics (split/swarm/merge, metadata
driven resume) and on-disk formats (MRC, .par, .cistem, .star) are preserved
for interoperability and regression testing.

Layout:
  pyp_tpu.io        — MRC / DM4 / TIFF / .par / .cistem / .star codecs, metadata store
  pyp_tpu.config    — declarative parameter schema -> CLI / project state
  pyp_tpu.core      — JAX math: FFT helpers, CTF model, geometry, filters, FSC
  pyp_tpu.ops       — compute kernels: motion, ctf-fit, pick, extract, refine3d,
                      reconstruct3d/merge3d, refine2d, tomo align/WBP, CSP
  pyp_tpu.parallel  — device meshes, shardings, collective merges
  pyp_tpu.pipeline  — pipeline stages (preprocess / refine loops) as pure functions
  pyp_tpu.sched     — split/swarm/merge job graph, local + SLURM executors
  pyp_tpu.utils     — timers, logging
"""

__version__ = "0.1.0"
