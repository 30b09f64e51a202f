"""Euler-angle conventions and rotation utilities (FREALIGN/cisTEM ZYZ).

Conventions (matching the reference's analysis/geometry/core.py:49-210 and
FREALIGN docs): a particle orientation is (phi, theta, psi) in degrees with
rotation matrix

    R(phi, theta, psi) = Rz(psi) @ Ry(theta) @ Rz(phi)

mapping reference-volume coordinates to particle-image coordinates; the
projection is taken along the z axis of the rotated frame (central-slice
theorem: the image spectrum lives on the plane spanned by rows 0,1 of R).
Shifts (sx, sy) are applied to the image after projection, in pixels here
(FREALIGN .par files store Å; conversion at the I/O boundary).

All functions accept batched inputs and are jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _d2r(a):
    return a * (jnp.pi / 180.0)


def rot_z(angle_deg):
    a = _d2r(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def rot_y(angle_deg):
    a = _d2r(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)],
        -2,
    )


def rot_x(angle_deg):
    a = _d2r(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)],
        -2,
    )


def euler_to_matrix(phi, theta, psi):
    """ZYZ Euler angles (degrees) -> rotation matrix (..., 3, 3)."""
    return rot_z(psi) @ rot_y(theta) @ rot_z(phi)


def matrix_to_euler(R):
    """Rotation matrix (..., 3, 3) -> (phi, theta, psi) degrees, ZYZ.

    Inverse of euler_to_matrix up to gimbal ambiguity at theta in {0, 180}.
    """
    eps = 1e-7
    r22 = jnp.clip(R[..., 2, 2], -1.0, 1.0)
    theta = jnp.arccos(r22)
    degenerate = jnp.abs(r22) > 1.0 - eps
    # generic case
    psi_g = jnp.arctan2(R[..., 1, 2], R[..., 0, 2])
    phi_g = jnp.arctan2(R[..., 2, 1], -R[..., 2, 0])
    # theta ~ 0: R = Rz(psi+phi); put all rotation in phi
    phi_d = jnp.arctan2(R[..., 1, 0], R[..., 0, 0]) * jnp.sign(r22)
    phi = jnp.where(degenerate, phi_d, phi_g)
    psi = jnp.where(degenerate, 0.0, psi_g)
    r2d = 180.0 / jnp.pi
    return phi * r2d, theta * r2d, psi * r2d


def euler_zxz_to_zyz(z1, x, z2):
    """Convert ZXZ Euler angles (3DAVG/EMAN2 style) to our ZYZ triplet."""
    R = rot_z(z1) @ rot_x(x) @ rot_z(z2)
    return matrix_to_euler(R)


def angular_grid(angular_step_deg: float, psi_step_deg: float | None = None,
                 theta_max_deg: float = 180.0):
    """Quasi-uniform global search grid over SO(3).

    Projection directions (theta, phi) from latitude rings with
    longitude spacing scaled by 1/sin(theta) (the classic FREALIGN-style
    grid); in-plane psi sampled uniformly. Returns (N, 3) array of
    (phi, theta, psi) in degrees — a host-side numpy constant, suitable as a
    static input baked into a jitted search.
    """
    if psi_step_deg is None:
        psi_step_deg = angular_step_deg
    thetas = np.arange(0.0, theta_max_deg + 1e-6, angular_step_deg)
    dirs = []
    for t in thetas:
        st = np.sin(np.radians(max(t, 1e-3)))
        n_phi = max(1, int(round(360.0 * st / angular_step_deg)))
        if t in (0.0, 180.0):
            n_phi = 1
        for p in np.arange(n_phi) * (360.0 / n_phi):
            dirs.append((p, t))
    psis = np.arange(0.0, 360.0, psi_step_deg)
    grid = np.array([(phi, th, ps) for (phi, th) in dirs for ps in psis], dtype=np.float32)
    return grid


def normal_to_euler(nx, ny, nz):
    """Euler angles (phi, theta, psi) that carry the reference z-axis onto
    the given (unit) normal under the projection convention — used for
    surface-constrained picking priors (detect/tomo).

    Convention (verified empirically against fourier_slice.project): after
    euler_to_matrix(phi, theta, psi), the reference +z direction appears at
    polar angle theta from the beam with azimuth PSI; phi spins the
    reference about its own z first and does not move the axis — it is the
    free in-plane parameter of an axis prior."""
    theta = jnp.degrees(jnp.arccos(jnp.clip(nz, -1.0, 1.0)))
    psi = jnp.degrees(jnp.arctan2(ny, nx))
    return jnp.zeros_like(psi), theta, psi


def apply_symmetry_matrices(symmetry: str) -> np.ndarray:
    """Rotation matrices of a point group (host-side constant).

    Supports Cn, Dn, T, O, I (I = 60 rotations, ICS/I1 convention with
    two-fold on z... simplified: uses quaternion table generation).
    """
    sym = symmetry.upper().strip()
    mats = [np.eye(3)]
    if sym.startswith("C") and sym[1:].isdigit():
        n = int(sym[1:])
        mats = [_rz_np(360.0 * k / n) for k in range(n)]
    elif sym.startswith("D") and sym[1:].isdigit():
        n = int(sym[1:])
        cz = [_rz_np(360.0 * k / n) for k in range(n)]
        flip = _rx_np(180.0)
        mats = cz + [m @ flip for m in cz]
    elif sym == "T":
        mats = _tetrahedral()
    elif sym == "O":
        mats = _octahedral()
    elif sym.startswith("I"):
        mats = _icosahedral()
    return np.stack(mats).astype(np.float32)


def _rz_np(a):
    a = np.radians(a)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _rx_np(a):
    a = np.radians(a)
    c, s = np.cos(a), np.sin(a)
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


def _ry_np(a):
    a = np.radians(a)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


def _closure(gens, max_n):
    """Generate a finite rotation group from generators by closure."""
    mats = [np.eye(3)]

    def key(m):
        return tuple(np.round(m.flatten(), 5))

    seen = {key(np.eye(3))}
    frontier = [np.eye(3)]
    while frontier and len(mats) < max_n:
        new_frontier = []
        for m in frontier:
            for g in gens:
                c = g @ m
                k = key(c)
                if k not in seen:
                    seen.add(k)
                    mats.append(c)
                    new_frontier.append(c)
        frontier = new_frontier
    return mats


def _tetrahedral():
    return _closure([_rz_np(180.0), _ry_np(180.0), _axis_rot([1, 1, 1], 120.0)], 12)


def _octahedral():
    return _closure([_rz_np(90.0), _ry_np(90.0)], 24)


def _icosahedral():
    # orientation with 2-fold axes on x/y/z and 5-fold through vertex (0,1,phi)
    phi = (1 + np.sqrt(5)) / 2
    return _closure(
        [_axis_rot([0, 0, 1], 180.0), _axis_rot([0, 1, phi], 72.0)],
        120,
    )


def _axis_rot(axis, angle_deg):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(angle_deg)
    c, s = np.cos(a), np.sin(a)
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return np.eye(3) * c + s * K + (1 - c) * np.outer(axis, axis)


def divide_regions(bounds_min, bounds_max, grid):
    """Partition a 2D/3D bounding box into a regular grid of patches; returns
    per-region (lo, hi) corners. Equivalent of the reference's
    divide2regions (analysis/geometry/core.py:554) used for CSP patch
    refinement."""
    bounds_min = np.asarray(bounds_min, dtype=np.float64)
    bounds_max = np.asarray(bounds_max, dtype=np.float64)
    grid = np.asarray(grid, dtype=np.int64)
    steps = (bounds_max - bounds_min) / grid
    regions = []
    for idx in np.ndindex(*grid):
        lo = bounds_min + steps * np.asarray(idx)
        hi = lo + steps
        regions.append((lo, hi))
    return regions


def region_of(points, bounds_min, bounds_max, grid):
    """Assign each point (N, D) to its region index in the regular grid."""
    points = np.asarray(points, dtype=np.float64)
    bounds_min = np.asarray(bounds_min)
    bounds_max = np.asarray(bounds_max)
    grid = np.asarray(grid, dtype=np.int64)
    steps = (bounds_max - bounds_min) / grid
    idx = np.clip(((points - bounds_min) / steps).astype(np.int64), 0, grid - 1)
    flat = np.zeros(len(points), dtype=np.int64)
    for d in range(points.shape[1]):
        flat = flat * grid[d] + idx[:, d]
    return flat


def relion_tomo_projection_matrix(tilt_angle_deg, xf, thickness,
                                  image_dims, tomo_x, tomo_y):
    """Per-tilt 4x4 projection matrix in RELION's tomogram convention.

    Composes the IMOD-style alignment transform with the single-axis tilt
    projection and RELION's yz-flipped tomogram frame — the matrix the
    reference writes into `_rlnTomoProj{X,Y,Z,W}` rows of tomograms.star
    (semantics of analysis/geometry/core.py:777 `getRelionMatrix`;
    reimplemented from the IMOD->RELION coordinate conventions).

    tilt_angle_deg: stage tilt; xf: IMOD 6-element affine row
    (a11, a12, a21, a22, dx, dy); thickness: unbinned tomogram Z;
    image_dims: raw image (x, y); tomo_x/tomo_y: unbinned tomogram dims.
    """
    t = np.radians(float(tilt_angle_deg))
    ocx = (image_dims[0] - 1.0) / 2.0
    ocy = (image_dims[1] - 1.0) / 2.0
    acx = (tomo_x - 1.0) / 2.0
    acy = (tomo_y - 1.0) / 2.0

    def m4(rows):
        return np.asarray(rows, dtype=np.float64)

    # RELION tomogram frame: y <- thickness-1-z, z <- y
    yzflip = m4([[1, 0, 0, 0], [0, 0, -1, thickness - 1],
                 [0, 1, 0, 0], [0, 0, 0, 1]])
    to_imod_origin = m4([[1, 0, 0, -1], [0, 1, 0, -thickness / 2.0],
                         [0, 0, 1, -1], [0, 0, 0, 1]])
    # single-axis projection about y (IMOD tilt geometry), recentered to
    # the aligned-stack center
    tilt_m = m4([[np.cos(t), -np.sin(t), 0, acx], [0, 0, 1, acy],
                 [-np.sin(t), -np.cos(t), 0, 0], [0, 0, 0, 1]])
    to_origin = m4([[1, 0, 0, -acx], [0, 1, 0, 0],
                    [0, 0, 1, -acy], [0, 0, 0, 1]])
    xf_m = m4([[xf[0], xf[1], 0, xf[4]], [xf[2], xf[3], 0, xf[5]],
               [0, 0, 1, 0], [0, 0, 0, 1]])
    p = m4([[1, 0, 0, ocx], [0, 1, 0, ocy], [0, 0, 1, 0], [0, 0, 0, 1]])
    q = m4([[1, 0, 0, -acx], [0, 1, 0, -acy], [0, 0, 1, 0], [0, 0, 0, 1]])
    affine = p @ np.linalg.inv(xf_m) @ q
    return affine @ tilt_m @ to_origin @ to_imod_origin @ yzflip
