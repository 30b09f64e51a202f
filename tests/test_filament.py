"""Filament segmentation/tracing (the reference's MemBrain-Seg / TARDIS
role, docs/guide/segmentation.rst "Open surfaces and filaments"):
Frangi vesselness + tracing must find planted tubes, and the tangent
orientation priors must align with the true filament directions."""

import numpy as np

from pyp_tpu.ops.filament import pick_filaments, trace_filaments, vesselness

N = 64


def make_filament_tomo(seed=0, noise=0.25):
    """Two straight dark tubes (radius ~2 px) crossing the box."""
    rng = np.random.RandomState(seed)
    vol = np.zeros((N, N, N), dtype=np.float32)
    g = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"), -1)

    lines = [
        (np.array([20.0, 10.0, 8.0]), np.array([0.0, 0.55, 0.835])),
        (np.array([44.0, 50.0, 12.0]), np.array([0.3, -0.1, 0.949])),
    ]
    for p0, d in lines:
        d = d / np.linalg.norm(d)
        rel = g - p0
        t = rel @ d
        perp = rel - t[..., None] * d
        dist = np.linalg.norm(perp, axis=-1)
        inside = (dist < 2.0) & (t > -30) & (t < 60)
        vol[inside] -= 1.0
    vol += noise * rng.randn(N, N, N).astype(np.float32)
    return vol, lines


class TestVesselness:
    def test_peaks_on_tube(self):
        vol, lines = make_filament_tomo()
        V, axis = vesselness(vol, sigma_px=2.0, dark=True)
        V = np.asarray(V)
        p0, d = lines[0]
        on_tube = V[int(p0[0]), int(p0[1] + 20 * d[1]),
                    int(p0[2] + 20 * d[2])]
        off = V[50, 20, 40]
        assert on_tube > 5 * max(off, 1e-9), (on_tube, off)
        # local axis at a tube point matches the line direction
        a = np.asarray(axis)[int(p0[0]), int(p0[1] + 20 * d[1]),
                             int(p0[2] + 20 * d[2])]
        assert abs(np.dot(a, d)) > 0.9, (a, d)


class TestTracing:
    def test_links_collinear_points(self):
        pts = np.stack([np.full(10, 5.0), np.full(10, 5.0),
                        np.arange(10) * 3.0], 1)
        axes = np.tile([0.0, 0.0, 1.0], (10, 1))
        chains = trace_filaments(pts, axes, np.ones(10), link_dist=4.0)
        assert len(chains) == 1 and len(chains[0]) == 10

    def test_separates_divergent_directions(self):
        a = np.stack([np.full(6, 5.0), np.full(6, 5.0),
                      np.arange(6) * 3.0], 1)
        b = np.stack([np.full(6, 5.0), 8.0 + np.arange(6) * 3.0,
                      np.full(6, 15.0)], 1)
        pts = np.concatenate([a, b])
        axes = np.concatenate([np.tile([0.0, 0.0, 1.0], (6, 1)),
                               np.tile([0.0, 1.0, 0.0], (6, 1))])
        chains = trace_filaments(pts, axes, np.ones(12), link_dist=4.0,
                                 min_points=4)
        assert len(chains) == 2
        assert sorted(len(c) for c in chains) == [6, 6]


class TestMultiScale:
    def test_radius_range_finds_thin_and_thick(self):
        """Multi-scale sweep: one call finds tubes of different radii."""
        rng = np.random.RandomState(7)
        vol = 0.2 * rng.randn(N, N, N).astype(np.float32)
        g = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"), -1)
        for p0, d, rad in [
            (np.array([16.0, 16.0, 4.0]), np.array([0.0, 0.0, 1.0]), 1.5),
            (np.array([44.0, 44.0, 4.0]), np.array([0.0, 0.0, 1.0]), 4.0),
        ]:
            rel = g - p0
            t = rel @ d
            dist = np.linalg.norm(rel - t[..., None] * d, axis=-1)
            vol[(dist < rad) & (t > 0) & (t < 56)] -= 1.0

        coords, _, fil_id = pick_filaments(
            vol, radius_px=(1.5, 4.0), spacing_px=5.0, threshold=0.2)
        assert len(np.unique(fil_id)) >= 2
        # picks near BOTH tubes
        near_thin = sum(1 for c in coords
                        if abs(c[0] - 16) < 4 and abs(c[1] - 16) < 4)
        near_thick = sum(1 for c in coords
                         if abs(c[0] - 44) < 6 and abs(c[1] - 44) < 6)
        assert near_thin >= 3 and near_thick >= 3, (near_thin, near_thick)


class TestCurvedFilament:
    def test_traces_a_helix(self):
        """Curved filaments: tracing follows the local direction around a
        gentle helix, and tangent priors track the true tangent."""
        import jax.numpy as jnp

        from pyp_tpu.core.geometry import euler_to_matrix

        rng = np.random.RandomState(5)
        vol = 0.2 * rng.randn(N, N, N).astype(np.float32)
        t = np.linspace(0, 3.5 * np.pi, 400)
        # helix: radius 14 px, z pitch gentle; stays inside the box
        cz = 32 + 10 * t / t.max() - 5
        cy = 32 + 14 * np.sin(t)
        cx = 32 + 14 * np.cos(t)
        g = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"), -1)
        for p in np.stack([cz, cy, cx], 1)[::4]:
            d2 = np.sum((g - p) ** 2, axis=-1)
            vol[d2 < 4.0] = np.minimum(vol[d2 < 4.0], -1.0)

        coords, eulers, fil_id = pick_filaments(
            vol, radius_px=2.0, spacing_px=6.0, threshold=0.3)
        assert len(coords) >= 8, len(coords)

        # each pick lies near the helix curve
        curve = np.stack([cz, cy, cx], 1)
        d = [np.min(np.linalg.norm(curve - c[:3], axis=1)) for c in coords]
        assert np.median(d) < 3.0, np.median(d)

        # tangent priors align with the true helix tangent at the nearest
        # curve point
        tangent = np.gradient(curve, axis=0)
        tangent /= np.linalg.norm(tangent, axis=1, keepdims=True)
        dots = []
        for c, e in zip(coords, eulers):
            k = int(np.argmin(np.linalg.norm(curve - c[:3], axis=1)))
            R = np.asarray(euler_to_matrix(*[float(v) for v in e]))
            zrot = (R @ np.array([0.0, 0.0, 1.0]))[::-1]
            dots.append(abs(float(np.dot(zrot, tangent[k]))))
        assert np.median(dots) > 0.85, np.median(dots)


class TestSheetness:
    def test_segments_planted_sheet_with_normals(self):
        from pyp_tpu.ops.filament import segment_membranes, sheetness

        rng = np.random.RandomState(0)
        vol = 0.25 * rng.randn(N, N, N).astype(np.float32)
        # a gently curved dark sheet: z = 30 + 4 sin(2 pi x / N)
        g = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"), -1)
        zsurf = 30.0 + 4.0 * np.sin(2 * np.pi * g[..., 2] / N)
        dist = np.abs(g[..., 0] - zsurf)
        vol[dist < 1.5] -= 1.0

        mask, S, normals = segment_membranes(vol, thickness_px=3.0,
                                             threshold=0.3)
        # segmented voxels concentrate on the sheet
        on = mask[np.abs(g[..., 0] - zsurf) < 3.0].mean()
        off = mask[np.abs(g[..., 0] - zsurf) > 8.0].mean()
        assert on > 10 * max(off, 1e-4), (on, off)
        # normals near the sheet point along +-z (the surface is nearly
        # horizontal)
        sel = (np.abs(g[..., 0] - zsurf) < 1.0) & (mask > 0)
        nz = np.abs(normals[..., 0][sel])
        assert np.median(nz) > 0.9, np.median(nz)


class TestPickFilaments:
    def test_finds_planted_tubes_with_tangent_priors(self):
        import jax.numpy as jnp

        from pyp_tpu.core.geometry import euler_to_matrix

        vol, lines = make_filament_tomo()
        coords, eulers, fil_id = pick_filaments(
            vol, radius_px=2.0, spacing_px=4.0, threshold=0.25)
        assert len(coords) >= 10, len(coords)
        assert len(np.unique(fil_id)) >= 2

        # every pick lies near one of the true lines
        def dist_to_line(p, p0, d):
            rel = p - p0
            return np.linalg.norm(rel - (rel @ d) * d)

        dists = [min(dist_to_line(c[:3], p0, d / np.linalg.norm(d))
                     for p0, d in lines) for c in coords]
        assert np.median(dists) < 3.0, np.median(dists)

        # tangent priors: rotated z-axis (xyz -> flip to zyx) parallel to
        # the nearest line direction
        dots = []
        for c, e in zip(coords, eulers):
            p0, d = min(lines, key=lambda L: dist_to_line(
                c[:3], L[0], L[1] / np.linalg.norm(L[1])))
            d = d / np.linalg.norm(d)
            R = np.asarray(euler_to_matrix(*[float(v) for v in e]))
            zrot = (R @ np.array([0.0, 0.0, 1.0]))[::-1]  # xyz -> zyx
            dots.append(abs(float(np.dot(zrot, d))))
        assert np.median(dots) > 0.9, np.median(dots)
