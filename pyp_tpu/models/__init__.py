"""Neural-network components (flax): learned particle picking and denoising.

TPU-native replacements for the reference's torch-based add-ons: the PYP NN
picker (detect/joint.py sprtrain/tomotrain), topaz-style picking, and
cryoCARE/noise2map-style denoising (SURVEY §2.1/§2.2 pixi GPU envs).
"""
