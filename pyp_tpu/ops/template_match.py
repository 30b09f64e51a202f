"""3D template matching and virion detection in tomograms.

Replaces the reference's TOMO/ITK binaries (SURVEY §2.2):
  * Correlation3DNew (detect/tomo/core.py:174) -> `match_template_3d`:
    FFT-based locally-normalized cross-correlation of a rotated template
    over the tomogram, running max over a rotation grid;
  * itkCLT Canny+Hough virion detection (:701) -> `detect_spheres`:
    spherical-shell correlation over a radius sweep (Hough-equivalent);
  * surface-constrained picking (detect_particles_from_surface :93) ->
    `match_on_surface`: score templates only at sphere-surface points with
    normal-aligned orientation priors;
  * mesh/normal generation (mesh_coordinate_generator :2511) ->
    `sphere_surface_points`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pyp_tpu.core.geometry import euler_to_matrix


def rotate_volume(vol, phi, theta, psi):
    """Rotate a cubic volume by ZYZ Euler angles about its center
    (trilinear resampling; out(v) = vol(R^T (v - c) + c))."""
    n = vol.shape[-1]
    c = n // 2
    R = euler_to_matrix(phi, theta, psi)
    ax = jnp.arange(n, dtype=jnp.float32) - c
    zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1)  # xyz order
    src = jnp.einsum("ij,abcj->abci", R.T, pts)  # R^T
    coords = [
        src[..., 2] + c,  # z
        src[..., 1] + c,  # y
        src[..., 0] + c,  # x
    ]
    return jax.scipy.ndimage.map_coordinates(vol, coords, order=1, mode="constant")


def _box_mean(vol, k: int):
    s = jax.lax.reduce_window(vol, 0.0, jax.lax.add, (k, k, k), (1, 1, 1), "SAME")
    return s / (k ** 3)


@functools.partial(jax.jit, static_argnames=("norm_size",))
def _ncc_one_rotation(tomo_f, tomo, template, local_var, norm_size: int = 0):
    """Correlation of one (already rotated, zero-mean) template with the
    tomogram via FFT; normalized by template norm and local tomogram sigma."""
    nz, ny, nx = tomo.shape
    t = template - jnp.mean(template)
    tnorm = jnp.sqrt(jnp.sum(t * t) + 1e-12)
    # pad template to tomogram size, centered at origin for correlation
    tz, ty, tx = t.shape
    padded = jnp.zeros_like(tomo)
    padded = jax.lax.dynamic_update_slice(padded, t, (0, 0, 0))
    # center the kernel: roll so template center sits at index 0
    padded = jnp.roll(padded, (-(tz // 2), -(ty // 2), -(tx // 2)), (0, 1, 2))
    tf = jnp.fft.rfftn(padded)
    cc = jnp.fft.irfftn(tomo_f * jnp.conj(tf), s=tomo.shape)
    return cc / (tnorm * jnp.sqrt(local_var + 1e-6))


def match_template_3d(tomogram, template, angles, norm_size: int | None = None):
    """Locally-normalized 3D template matching over a rotation grid.

    tomogram: (nz, ny, nx); template: (t, t, t); angles: (A, 3) ZYZ degrees.
    Returns (best_score (nz, ny, nx), best_angle_idx (nz, ny, nx))."""
    tomogram = jnp.asarray(tomogram, dtype=jnp.float32)
    template = jnp.asarray(template, dtype=jnp.float32)
    angles = np.asarray(angles, dtype=np.float32)
    t = template.shape[-1]
    if norm_size is None:
        norm_size = t
    mu = _box_mean(tomogram, norm_size)
    var = _box_mean(tomogram * tomogram, norm_size) - mu * mu
    local_var = jnp.maximum(var, 1e-6) * (norm_size ** 3)
    tomo_f = jnp.fft.rfftn(tomogram)

    best = jnp.full(tomogram.shape, -jnp.inf)
    best_idx = jnp.zeros(tomogram.shape, dtype=jnp.int32)
    for a, (phi, theta, psi) in enumerate(angles):
        rot = rotate_volume(template, float(phi), float(theta), float(psi))
        cc = _ncc_one_rotation(tomo_f, tomogram, rot, local_var)
        better = cc > best
        best = jnp.where(better, cc, best)
        best_idx = jnp.where(better, a, best_idx)
    return best, best_idx


def pick_peaks_3d(score, n_peaks: int, min_distance: int, threshold: float = 0.0):
    """Top-N local maxima of a 3D score volume with a distance constraint.

    Returns (coords (n_peaks, 3) as (z, y, x), values, valid mask)."""
    score = jnp.asarray(score)
    k = 2 * min_distance + 1
    mx = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (k, k, k),
                               (1, 1, 1), "SAME")
    cand = jnp.where((score >= mx) & (score > threshold), score, -jnp.inf)
    flat = cand.reshape(-1)
    vals, idx = jax.lax.top_k(flat, n_peaks)
    nz, ny, nx = score.shape
    z = idx // (ny * nx)
    y = (idx // nx) % ny
    x = idx % nx
    return jnp.stack([z, y, x], axis=1), vals, jnp.isfinite(vals)


def spherical_shell_template(radius_px: float, thickness_px: float = 2.0,
                             box: int | None = None):
    if box is None:
        box = int(2 * (radius_px + 3 * thickness_px) + 1)
    ax = np.arange(box) - box // 2
    r = np.sqrt(ax[:, None, None] ** 2 + ax[None, :, None] ** 2 + ax[None, None, :] ** 2)
    shell = np.exp(-0.5 * ((r - radius_px) / thickness_px) ** 2)
    return jnp.asarray(shell.astype(np.float32))


def detect_spheres(tomogram, radii_px, n_peaks: int = 32, min_distance=None,
                   invert: bool = True):
    """Virion/sphere detection: shell-correlation sweep over radii
    (Hough-transform equivalent of itkCLT). Returns
    (coords (N, 3), radii (N,), scores (N,), valid)."""
    tomo = jnp.asarray(tomogram, dtype=jnp.float32)
    if invert:
        tomo = -tomo
    # a shell template larger than the tomogram cannot be correlated (and
    # could not be a contained sphere anyway) — drop such radii up front
    fit = [r for r in radii_px
           if int(2 * (float(r) + 6.0) + 1) <= min(tomo.shape)]
    if not fit:
        coords = jnp.zeros((n_peaks, 3), dtype=jnp.int32)
        zeros = jnp.zeros(n_peaks)
        return coords, zeros, zeros, jnp.zeros(n_peaks, dtype=bool)
    best = jnp.full(tomo.shape, -jnp.inf)
    best_r = jnp.zeros(tomo.shape)
    for r in fit:
        shell = spherical_shell_template(float(r))
        score, _ = match_template_3d(tomo, shell, np.zeros((1, 3)),
                                     norm_size=shell.shape[0])
        better = score > best
        best = jnp.where(better, score, best)
        best_r = jnp.where(better, float(r), best_r)
    if min_distance is None:
        min_distance = int(min(fit))
    coords, vals, valid = pick_peaks_3d(best, n_peaks, min_distance)
    radii = best_r[coords[:, 0], coords[:, 1], coords[:, 2]]
    return coords, radii, vals, valid


def detect_spheres_template(tomogram, radii_px, n_peaks: int = 32,
                            min_distance=None):
    """tomo_vir_method=template: shell-NCC against the RAW densities (no
    contrast inversion) — picks membranes that correlate positively with
    the shell, the Correlation3DNew-style seeding; the default `auto`
    path inverts contrast first (dark virion interior, itkCLT-style)."""
    return detect_spheres(tomogram, radii_px, n_peaks, min_distance,
                          invert=False)


def sphere_surface_points(center, radius_px: float, n_points: int = 200):
    """Quasi-uniform points + outward normals on a sphere surface
    (Fibonacci lattice) — the mesh/normal generator for surface picking."""
    idx = np.arange(n_points) + 0.5
    ga = np.pi * (1 + 5**0.5) * idx
    z = 1 - 2 * idx / n_points
    r = np.sqrt(1 - z * z)
    normals = np.stack([z, r * np.sin(ga), r * np.cos(ga)], axis=1)  # (z,y,x)
    points = np.asarray(center)[None, :] + radius_px * normals
    return points.astype(np.float32), normals.astype(np.float32)


def match_on_surface(tomogram, template, points, normals, psi_step: float = 30.0):
    """Score the template at given surface points with orientation fixed to
    the surface normal (in-plane spin searched) — surface-constrained
    picking (detect_particles_from_surface). Returns (scores (N,),
    best in-plane angle (N,) — the phi slot of our ZYZ convention)."""
    from pyp_tpu.core.geometry import normal_to_euler
    from pyp_tpu.ops.extract import subvolume_gather

    tomo = jnp.asarray(tomogram, dtype=jnp.float32)
    t = template.shape[-1]
    coords = jnp.asarray(np.round(points).astype(np.int32))
    subs = subvolume_gather(tomo, coords, t)  # (N, t, t, t)
    subs = subs - jnp.mean(subs, axis=(1, 2, 3), keepdims=True)
    snorm = jnp.sqrt(jnp.sum(subs * subs, axis=(1, 2, 3)) + 1e-12)

    nrm = np.asarray(normals)
    # azimuth of the rotated z-axis lives in PSI under our ZYZ convention
    # (R z = [sin t cos p, sin t sin p, cos t]); phi is the free in-plane
    # spin about the template's own axis — that's what we search here.
    _, theta_n, azim_n = normal_to_euler(
        jnp.asarray(nrm[:, 2]), jnp.asarray(nrm[:, 1]), jnp.asarray(nrm[:, 0])
    )
    psis = np.arange(0.0, 360.0, psi_step, dtype=np.float32)
    best = jnp.full(coords.shape[0], -jnp.inf)
    best_psi = jnp.zeros(coords.shape[0])
    for psi in psis:
        # rotate template to each point's normal orientation is expensive;
        # approximate with shared orientation bins: round normals' euler to
        # 30-degree bins and rotate once per bin
        key = np.round(np.stack([np.asarray(azim_n), np.asarray(theta_n)], 1) / 30.0) * 30.0
        for azim_b, theta_b in np.unique(key, axis=0):
            sel = (key[:, 0] == azim_b) & (key[:, 1] == theta_b)
            if not sel.any():
                continue
            rot = rotate_volume(jnp.asarray(template), float(psi),
                                float(theta_b), float(azim_b))
            rot = rot - jnp.mean(rot)
            rnorm = jnp.sqrt(jnp.sum(rot * rot) + 1e-12)
            cc = jnp.sum(subs * rot[None], axis=(1, 2, 3)) / (snorm * rnorm)
            cc = jnp.where(jnp.asarray(sel), cc, -jnp.inf)
            better = cc > best
            best = jnp.where(better, cc, best)
            best_psi = jnp.where(better, psi, best_psi)
    return best, best_psi


def refine_virion_surface(tomogram, center, radius_px, n_points: int = 300,
                          search: float = 0.3, n_radial: int = 31,
                          dark_membrane: bool = True, smooth_iters: int = 2):
    """Refine a virion's membrane surface from a sphere seed — the role of
    the reference's level-set segmentation (virus_segment_membrane,
    detect/tomo/core.py:518): cast rays along Fibonacci directions, find the
    membrane density extremum within radius*(1 +/- search) on each ray, and
    smooth radii over surface neighbors. Returns (points (N, 3) (z, y, x),
    normals (N, 3), radii (N,))."""
    tomo = jnp.asarray(tomogram, dtype=jnp.float32)
    center = np.asarray(center, dtype=np.float32)
    _, normals = sphere_surface_points(center, 1.0, n_points)  # unit dirs
    rs = np.linspace(radius_px * (1 - search), radius_px * (1 + search), n_radial)
    # sample tomogram along every ray
    pts = center[None, None, :] + rs[None, :, None] * normals[:, None, :]
    coords = [jnp.asarray(pts[..., i]) for i in range(3)]
    profiles = jax.scipy.ndimage.map_coordinates(tomo, coords, order=1,
                                                 mode="nearest")
    profiles = np.asarray(profiles)  # (N, n_radial)
    idx = np.argmin(profiles, axis=1) if dark_membrane else np.argmax(profiles, axis=1)
    radii = rs[idx]
    # smooth radii over nearest surface neighbors
    for _ in range(smooth_iters):
        d = normals @ normals.T
        nn = np.argsort(-d, axis=1)[:, 1:7]  # 6 nearest directions
        radii = 0.5 * radii + 0.5 * radii[nn].mean(axis=1)
    points = center[None, :] + radii[:, None] * normals
    return points.astype(np.float32), normals, radii.astype(np.float32)


def _sh_basis(normals, l_max: int):
    """Real spherical-harmonics basis (N, (l_max+1)^2) at unit directions
    (z, y, x), plus per-coefficient l(l+1) curvature weights."""
    from scipy.special import sph_harm_y

    z, y, x = normals[:, 0], normals[:, 1], normals[:, 2]
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    phi = np.arctan2(y, x)
    cols, curv = [], []
    for l in range(l_max + 1):
        for m in range(-l, l + 1):
            ylm = sph_harm_y(l, abs(m), theta, phi)
            if m < 0:
                col = np.sqrt(2.0) * ylm.imag
            elif m == 0:
                col = ylm.real
            else:
                col = np.sqrt(2.0) * ylm.real
            cols.append(col)
            curv.append(float(l * (l + 1)))
    return (np.stack(cols, axis=1).astype(np.float32),
            np.asarray(curv, dtype=np.float32))


def refine_surface_sh(tomogram, center, radius_px, n_points: int = 400,
                      search: float = 0.3, l_max: int = 6,
                      dark_membrane: bool = True, iters: int = 80,
                      smoothness: float = 0.05, lr: float = 0.3,
                      n_radial: int = 31):
    """Level-set-grade closed-surface refinement: the radius field over the
    sphere is parameterized by real spherical harmonics up to degree `l_max`
    and the coefficients are optimized by autodiff to drive the surface onto
    the membrane density (gradient descent on trilinear samples of the
    tomogram), with an l(l+1) curvature penalty — the TPU-native equivalent
    of the reference's level-set evolution (virus_segment_membrane,
    detect/tomo/core.py:518): globally smooth by construction (band-limited
    surface) instead of per-ray extrema + ad-hoc smoothing. Returns
    (points (N, 3) (z, y, x), normals (N, 3), radii (N,)).
    """
    tomo = jnp.asarray(tomogram, dtype=jnp.float32)
    tomo = (tomo - jnp.mean(tomo)) / (jnp.std(tomo) + 1e-8)
    center = jnp.asarray(np.asarray(center, dtype=np.float32))
    _, normals = sphere_surface_points(np.zeros(3), 1.0, n_points)
    Y, curv = _sh_basis(normals, l_max)
    # seed r0 from the robust ray-cast extremum (median over rays)
    _, _, radii0 = refine_virion_surface(
        tomogram, np.asarray(center), radius_px, n_points=n_points,
        search=search, n_radial=n_radial, smooth_iters=0)
    r0 = float(np.median(radii0))
    Yj = jnp.asarray(Y)
    nj = jnp.asarray(normals)
    curvj = jnp.asarray(curv)
    sign = 1.0 if dark_membrane else -1.0
    lo, hi = radius_px * (1 - search), radius_px * (1 + search)

    def loss(c):
        r = jnp.clip(r0 + Yj @ c, lo, hi)  # (N,)
        pts = center[None, :] + r[:, None] * nj
        vals = jax.scipy.ndimage.map_coordinates(
            tomo, [pts[:, 0], pts[:, 1], pts[:, 2]], order=1, mode="nearest")
        return sign * jnp.mean(vals) + smoothness * jnp.mean(
            curvj * c * c) / max(radius_px, 1.0)

    grad = jax.jit(jax.value_and_grad(loss))
    c = jnp.zeros(Y.shape[1], dtype=jnp.float32)
    m = jnp.zeros_like(c)
    for i in range(iters):
        _, g = grad(c)
        m = 0.9 * m + g
        c = c - lr * m / (jnp.linalg.norm(g) + 1e-8)
    radii = np.asarray(jnp.clip(r0 + Yj @ c, lo, hi))
    points = np.asarray(center)[None, :] + radii[:, None] * normals
    return points.astype(np.float32), normals, radii.astype(np.float32)


def align_volumes(a, b, coarse_step: float = 30.0, iters: int = 60,
                  try_hand: bool = True):
    """Rigidly align volume `a` to volume `b` over rotations (+ optional
    hand flip): coarse ZYZ grid then autodiff gradient polish of the
    correlation through the trilinear resampler. Returns
    (cc, (phi, theta, psi), flipped, aligned_volume).

    Needed e.g. to validate ab-initio maps, whose global orientation and
    hand are arbitrary (a 45-degree grid alone scores an EXACT rotated copy
    of a 6 Å-featured map at only ~0.14 — see tests)."""
    import jax

    b_j = jnp.asarray(np.ascontiguousarray(b), dtype=jnp.float32)
    b_c = b_j - jnp.mean(b_j)
    b_n = b_c / (jnp.linalg.norm(b_c) + 1e-8)

    def cc_of(vol_j, p, t, s):
        r = rotate_volume(vol_j, p, t, s)
        rc = r - jnp.mean(r)
        return jnp.sum(rc * b_n) / (jnp.linalg.norm(rc) + 1e-8)

    cc_jit = jax.jit(cc_of)
    grad_fn = jax.jit(jax.grad(lambda angles, vol_j: cc_of(
        vol_j, angles[0], angles[1], angles[2]), argnums=0))

    best = (-2.0, (0.0, 0.0, 0.0), False)
    hands = (False, True) if try_hand else (False,)
    for flip in hands:
        va = np.ascontiguousarray(a[::-1]) if flip else np.ascontiguousarray(a)
        va_j = jnp.asarray(va, dtype=jnp.float32)
        for p in np.arange(0.0, 360.0, coarse_step):
            for t in np.arange(0.0, 181.0, coarse_step):
                for s in np.arange(0.0, 360.0, coarse_step):
                    c = float(cc_jit(va_j, p, t, s))
                    if c > best[0]:
                        best = (c, (p, t, s), flip)
    # gradient polish from the best coarse cell
    flip = best[2]
    va = np.ascontiguousarray(a[::-1]) if flip else np.ascontiguousarray(a)
    va_j = jnp.asarray(va, dtype=jnp.float32)
    angles = jnp.asarray(best[1], dtype=jnp.float32)
    m = jnp.zeros(3)
    for i in range(iters):
        g = grad_fn(angles, va_j)
        gn = g / (jnp.linalg.norm(g) + 1e-9)
        m = 0.7 * m + gn
        decay = 0.5 * (1 + np.cos(np.pi * i / iters))
        angles = angles + 3.0 * decay * m
    cc = float(cc_jit(va_j, angles[0], angles[1], angles[2]))
    if cc < best[0]:
        angles = jnp.asarray(best[1], dtype=jnp.float32)
        cc = best[0]
    aligned = np.asarray(rotate_volume(va_j, float(angles[0]),
                                       float(angles[1]), float(angles[2])))
    return cc, tuple(float(x) for x in angles), flip, aligned
