"""Particle coordinate files: EMAN .box and PYP .boxx formats.

Equivalent of the reference's inout/utils/pyp_edit_box_files.py
(`produce_box_files`, `produce_boxx_files_fast`): .box rows are
"x y w h" (corner-referenced); .boxx extends with two trailing flags
(inside-micrograph, kept-after-cleaning). Also reads/writes the tomo .spk
3D coordinate format (x y z per row).
"""

from __future__ import annotations

import numpy as np


def write_box(coords_yx, boxsize: int, path):
    """coords (N, 2) center (y, x) -> .box rows 'x_corner y_corner w h'."""
    coords = np.asarray(coords_yx)
    with open(path, "w") as f:
        for y, x in coords[:, :2]:
            f.write(f"{int(x) - boxsize // 2}\t{int(y) - boxsize // 2}\t{boxsize}\t{boxsize}\n")


def read_box(path, boxsize: int | None = None):
    """-> (coords (N, 2) centers (y, x), boxsize)."""
    rows = np.atleast_2d(np.loadtxt(path, ndmin=2))
    if rows.size == 0:
        return np.zeros((0, 2)), boxsize or 0
    w = int(rows[0, 2]) if rows.shape[1] > 2 else (boxsize or 0)
    centers = np.stack([rows[:, 1] + w // 2, rows[:, 0] + w // 2], axis=1)
    return centers, w


def write_boxx(coords_yx, boxsize: int, path, inside=None, kept=None):
    coords = np.asarray(coords_yx)
    n = len(coords)
    inside = np.ones(n, dtype=int) if inside is None else np.asarray(inside, dtype=int)
    kept = np.ones(n, dtype=int) if kept is None else np.asarray(kept, dtype=int)
    with open(path, "w") as f:
        for (y, x), i, k in zip(coords[:, :2], inside, kept):
            f.write(
                f"{int(x) - boxsize // 2}\t{int(y) - boxsize // 2}\t{boxsize}\t{boxsize}\t{int(i)}\t{int(k)}\n"
            )


def read_boxx(path):
    """-> (centers (N, 2) (y, x), boxsize, inside (N,), kept (N,))."""
    rows = np.atleast_2d(np.loadtxt(path, ndmin=2))
    if rows.size == 0:
        return np.zeros((0, 2)), 0, np.zeros(0, int), np.zeros(0, int)
    w = int(rows[0, 2])
    centers = np.stack([rows[:, 1] + w // 2, rows[:, 0] + w // 2], axis=1)
    inside = rows[:, 4].astype(int) if rows.shape[1] > 4 else np.ones(len(rows), int)
    kept = rows[:, 5].astype(int) if rows.shape[1] > 5 else np.ones(len(rows), int)
    return centers, w, inside, kept


def write_spk(coords_zyx, path):
    """3D picks (N, 3) (z, y, x) -> .spk rows 'x y z'."""
    coords = np.asarray(coords_zyx)
    with open(path, "w") as f:
        for z, y, x in coords[:, :3]:
            f.write(f"{x:.1f}\t{y:.1f}\t{z:.1f}\n")


def read_spk(path):
    rows = np.atleast_2d(np.loadtxt(path, ndmin=2))
    if rows.size == 0:
        return np.zeros((0, 3))
    return np.stack([rows[:, 2], rows[:, 1], rows[:, 0]], axis=1)
