"""Postprocessing: masking, sharpening, corrected FSC, map statistics."""
