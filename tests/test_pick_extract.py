"""Picking and extraction tests on synthetic micrographs with known particles."""

import jax.numpy as jnp
import numpy as np

from pyp_tpu.ops import extract, pick


def make_micrograph(n=512, n_particles=20, radius=16, contrast=-3.0, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(n, n).astype(np.float32)
    ax = np.arange(-radius * 2, radius * 2 + 1)
    blob = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (radius * radius / 1.5))
    coords = []
    while len(coords) < n_particles:
        y, x = rng.randint(radius * 3, n - radius * 3, 2)
        if all(abs(y - cy) + abs(x - cx) > radius * 4 for cy, cx in coords):
            coords.append((y, x))
    for y, x in coords:
        img[y - 2 * radius : y + 2 * radius + 1, x - 2 * radius : x + 2 * radius + 1] += contrast * blob
    return img, np.array(coords)


class TestPick:
    def test_finds_planted_particles(self):
        img, coords = make_micrograph()
        res = pick.pick_particles(jnp.asarray(img), particle_radius_px=16,
                                  max_picks=64, threshold_sigma=2.0, edge_px=16)
        found = np.asarray(res.coords)[np.asarray(res.valid)]
        assert len(found) >= len(coords) * 0.8, f"found only {len(found)}"
        # each planted particle should have a pick within radius
        hits = 0
        for y, x in coords:
            d = np.sqrt(((found - [y, x]) ** 2).sum(axis=1))
            if d.min() < 16:
                hits += 1
        assert hits >= len(coords) * 0.8, f"{hits}/{len(coords)} recovered"

    def test_no_picks_on_pure_noise(self):
        rng = np.random.RandomState(5)
        img = rng.randn(256, 256).astype(np.float32)
        res = pick.pick_particles(jnp.asarray(img), particle_radius_px=16,
                                  max_picks=64, threshold_sigma=4.0)
        assert int(jnp.sum(res.valid)) < 5

    def test_gold_beads_and_erase(self):
        img, coords = make_micrograph(n_particles=5, radius=6, contrast=-30.0)
        res = pick.detect_gold_beads(jnp.asarray(img), bead_radius_px=6, threshold_sigma=6.0)
        found = np.asarray(res.coords)[np.asarray(res.valid)]
        assert len(found) >= 4
        erased = pick.erase_blobs(jnp.asarray(img), res.coords, res.valid, 14.0)
        # the deep minima should be gone
        assert float(jnp.min(erased)) > float(np.min(img)) * 0.5


class TestExtract:
    def test_window_shapes_and_content(self):
        img = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
        coords = jnp.asarray(np.array([[32, 32], [10, 10]]))
        boxes = extract.window_particles(jnp.asarray(img), coords, 16)
        assert boxes.shape == (2, 16, 16)
        np.testing.assert_array_equal(np.asarray(boxes[0]), img[24:40, 24:40])

    def test_clamping_at_edges(self):
        img = np.zeros((64, 64), dtype=np.float32)
        coords = jnp.asarray(np.array([[0, 0], [63, 63]]))
        boxes = extract.window_particles(jnp.asarray(img), coords, 16)
        assert boxes.shape == (2, 16, 16)

    def test_extract_normalized(self):
        img, coords = make_micrograph(n_particles=6)
        stack = extract.extract_particles(jnp.asarray(img), jnp.asarray(coords), 64)
        assert stack.shape == (6, 64, 64)
        # normalized background: overall std near 1, particle (inverted) bright
        assert 0.5 < float(jnp.std(stack)) < 3.0
        center = np.asarray(stack[:, 24:40, 24:40]).mean()
        assert center > 0.5  # inverted contrast -> particles positive

    def test_downsample(self):
        img, coords = make_micrograph(n_particles=4)
        stack = extract.extract_particles(jnp.asarray(img), jnp.asarray(coords), 64, downsample_to=32)
        assert stack.shape == (4, 32, 32)

    def test_extract_from_frames(self):
        rng = np.random.RandomState(1)
        frames = rng.randn(3, 128, 128).astype(np.float32)
        coords = jnp.asarray(np.array([[64, 64], [40, 80]]))
        out = extract.extract_from_frames(jnp.asarray(frames), coords, 32, normalize=False, invert=False)
        assert out.shape == (2, 3, 32, 32)
        np.testing.assert_allclose(np.asarray(out[0, 1]), frames[1, 48:80, 48:80], atol=1e-6)

    def test_subvolume_gather(self):
        vol = np.arange(32 ** 3, dtype=np.float32).reshape(32, 32, 32)
        out = extract.subvolume_gather(jnp.asarray(vol), jnp.asarray(np.array([[16, 16, 16]])), 8)
        assert out.shape == (1, 8, 8, 8)
        np.testing.assert_array_equal(np.asarray(out[0]), vol[12:20, 12:20, 12:20])


class TestHotPixels:
    def test_removes_planted_hot_pixels(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        frames = rng.randn(3, 64, 64).astype(np.float32)
        spots = [(0, 10, 12), (1, 30, 40), (2, 50, 5)]
        for f, y, x in spots:
            frames[f, y, x] = 500.0
        out = np.asarray(pick.remove_hot_pixels(jnp.asarray(frames)))
        for f, y, x in spots:
            assert abs(out[f, y, x]) < 60, out[f, y, x]
        # untouched pixels unchanged
        mask = np.ones_like(frames, dtype=bool)
        for f, y, x in spots:
            mask[f, y, x] = False
        np.testing.assert_allclose(out[mask], frames[mask], atol=1e-5)


class TestVirionSurface:
    def test_refines_ellipsoid(self):
        from pyp_tpu.ops.template_match import refine_virion_surface

        rng = np.random.RandomState(1)
        n = 64
        zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = np.array([32.0, 32.0, 32.0])
        # ellipsoidal dark shell: radius 12 in z, 16 in y/x
        r_eff = np.sqrt(((zz - c[0]) / 12.0) ** 2 + ((yy - c[1]) / 16.0) ** 2
                        + ((xx - c[2]) / 16.0) ** 2)
        tomo = 0.1 * rng.randn(n, n, n).astype(np.float32)
        tomo -= np.exp(-0.5 * ((r_eff - 1.0) / 0.08) ** 2)
        pts, normals, radii = refine_virion_surface(tomo, c, 14.0, n_points=200)
        # radii along z-ish directions ~12, along xy-ish ~16
        z_dirs = np.abs(normals[:, 0]) > 0.9
        xy_dirs = np.abs(normals[:, 0]) < 0.3
        assert abs(radii[z_dirs].mean() - 12.0) < 1.5, radii[z_dirs].mean()
        assert abs(radii[xy_dirs].mean() - 16.0) < 1.5, radii[xy_dirs].mean()

    def test_sh_surface_recovers_ellipsoid_radii(self):
        """Spherical-harmonics level-set refinement: per-direction radius
        error against the true ellipsoid must be small everywhere (not just
        averaged over direction bands) despite noise."""
        from pyp_tpu.ops.template_match import refine_surface_sh

        rng = np.random.RandomState(2)
        n = 64
        zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = np.array([32.0, 32.0, 32.0])
        a_z, a_xy = 12.0, 16.0
        r_eff = np.sqrt(((zz - c[0]) / a_z) ** 2 + ((yy - c[1]) / a_xy) ** 2
                        + ((xx - c[2]) / a_xy) ** 2)
        tomo = 0.2 * rng.randn(n, n, n).astype(np.float32)
        tomo -= np.exp(-0.5 * ((r_eff - 1.0) / 0.08) ** 2)
        pts, normals, radii = refine_surface_sh(tomo, c, 14.0, n_points=300,
                                                l_max=4)
        # true ellipsoid radius along each direction
        denom = np.sqrt((normals[:, 0] / a_z) ** 2
                        + (normals[:, 1] / a_xy) ** 2
                        + (normals[:, 2] / a_xy) ** 2)
        r_true = 1.0 / denom
        err = np.abs(radii - r_true)
        assert np.median(err) < 1.0, np.median(err)
        assert err.max() < 3.0, err.max()


class TestPick3DDispatch:
    """pipeline.tomo.pick_particles_3d — the detect/tomo/core.py mode
    switch (auto / virions / template) on a reconstructed tomogram."""

    def test_surface_mode_finds_shell_and_picks(self):
        from pyp_tpu.pipeline.tomo import pick_particles_3d

        rng = np.random.RandomState(3)
        n = 64
        zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        c = np.array([32.0, 30.0, 34.0])
        r = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
        tomo = 0.15 * rng.randn(n, n, n).astype(np.float32)
        tomo -= np.exp(-0.5 * ((r - 12.0) / 1.5) ** 2)  # dark membrane r=12
        params = {"tomo_spk_method": "surface", "tomo_spk_rad": 40.0,
                  "tomo_vir_rad": 120.0, "tomo_vir_detect_max": 2,
                  "tomo_vir_points": 100}
        box, vir, _eul = pick_particles_3d(tomo, params, eff_pixel=10.0)
        assert vir is not None and len(vir) >= 1, vir
        assert np.linalg.norm(vir[0, :3] - c) < 3.0, vir[0]
        assert abs(vir[0, 3] - 12.0) < 2.0, vir[0, 3]  # refined radius
        # surface picks ~12 px from the center
        d = np.linalg.norm(box[:, :3] - vir[0, :3], axis=1)
        assert len(box) == 100 and np.median(np.abs(d - 12.0)) < 2.0
        # surface-normal orientation priors: the prior's rotated z-axis
        # must point along the outward radial direction at each pick
        from pyp_tpu.core.geometry import euler_to_matrix

        assert _eul is not None and len(_eul) == len(box)
        dots = []
        for b in range(0, len(box), 7):
            radial = (box[b, :3] - vir[0, :3])
            radial = radial / (np.linalg.norm(radial) + 1e-9)  # (z, y, x)
            R = np.asarray(euler_to_matrix(*[float(v) for v in _eul[b]]))
            zrot = R @ np.array([0.0, 0.0, 1.0])  # rotated z (x, y, z)
            dots.append(float(np.dot(zrot[::-1], radial)))
        assert np.median(dots) > 0.9, dots

    def test_filament_mode_traces_tube_with_priors(self):
        from tests.test_filament import make_filament_tomo
        from pyp_tpu.pipeline.tomo import pick_particles_3d

        tomo, lines = make_filament_tomo()
        params = {"tomo_spk_method": "filament", "tomo_spk_rad": 20.0,
                  "tomo_spk_fil_thresh": 0.25, "tomo_spk_fil_spacing": 40.0}
        box, vir, eul = pick_particles_3d(tomo, params, eff_pixel=10.0)
        assert vir is None
        assert len(box) >= 10 and eul is not None and len(eul) == len(box)
        # picks lie on the planted tubes
        dists = []
        for c in box:
            best = np.inf
            for p0, d in lines:
                d = d / np.linalg.norm(d)
                rel = c[:3] - p0
                best = min(best, np.linalg.norm(rel - (rel @ d) * d))
            dists.append(best)
        assert np.median(dists) < 3.0, np.median(dists)

    def test_template_mode_finds_planted_copies(self, tmp_path):
        from pyp_tpu.io import mrc
        from pyp_tpu.pipeline.tomo import pick_particles_3d

        rng = np.random.RandomState(4)
        t = 12
        g = np.mgrid[0:t, 0:t, 0:t].astype(np.float32) - t / 2
        template = np.exp(-0.5 * (np.sum(g**2, 0)) / 4.0).astype(np.float32)
        template[:, : t // 2, :] *= 0.3  # asymmetric so rotation matters
        tomo = 0.1 * rng.randn(48, 48, 48).astype(np.float32)
        spots = [(12, 14, 30), (32, 30, 12)]
        for z, y, x in spots:
            tomo[z - t // 2:z + t // 2, y - t // 2:y + t // 2,
                 x - t // 2:x + t // 2] += template
        ref = tmp_path / "ref.mrc"
        mrc.write(template, str(ref), pixel_size=10.0)
        params = {"tomo_spk_method": "template", "tomo_spk_rad": 60.0,
                  "tomo_pick_ref": str(ref), "tomo_pick_ang": 90.0,
                  "tomo_spk_max": 4, "tomo_spk_thresh": 0.5}
        box, vir, _eul = pick_particles_3d(tomo, params, eff_pixel=10.0)
        assert vir is None
        assert len(box) >= 2, box
        top2 = box[np.argsort(-box[:, 3])][:2, :3]
        for s in spots:
            dmin = np.min(np.linalg.norm(top2 - np.asarray(s), axis=1))
            assert dmin < 2.0, (s, top2)


class TestSubpixelExtraction:
    def test_fractional_coordinate_centers_particle(self):
        """A blob at a fractional position must land on the box center with
        subpixel=True (Fourier-shift residual), and be ~half a pixel off
        without it."""
        import jax.numpy as jnp

        from pyp_tpu.ops import extract as ex

        ny = nx = 96
        yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float32)
        cy, cx = 48.4, 47.6  # deliberately half-pixel-ish fractions
        mic = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
        coords = jnp.asarray(np.array([[cy, cx]], dtype=np.float32))

        def centroid(img):
            img = np.maximum(np.asarray(img), 0)
            ys, xs = np.mgrid[0:img.shape[0], 0:img.shape[1]]
            s = img.sum()
            return float((img * ys).sum() / s), float((img * xs).sum() / s)

        box = 32
        sub = ex.extract_particles(jnp.asarray(mic), coords, box,
                                   invert=False, normalize=False,
                                   subpixel=True)
        y1, x1 = centroid(sub[0])
        assert abs(y1 - box // 2) < 0.05 and abs(x1 - box // 2) < 0.05, (y1, x1)

        hard = ex.extract_particles(jnp.asarray(mic),
                                    coords, box,
                                    invert=False, normalize=False)
        y0, x0 = centroid(hard[0])
        # integer windowing leaves the fractional offset in place
        assert abs(y0 - box // 2) > 0.2 or abs(x0 - box // 2) > 0.2, (y0, x0)


class TestExtractionLadder:
    """Two-stage binning ladder (reference frealign.py:3786 pixel
    composition scope_pixel x data_bin x extract_bin): mid-project
    re-extraction at a finer bin must compose the stack pixel size from
    the bin factors while the refined table's poses — angles in degrees,
    shifts in ANGSTROMS — carry over unchanged."""

    def test_reextraction_composes_pixel_and_preserves_poses(self, tmp_path):
        import numpy as np

        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.pipeline.spr import extract_stack

        rng = np.random.RandomState(0)
        # one synthetic "micrograph" with two planted blobs
        img = rng.randn(128, 128).astype(np.float32)
        yy, xx = np.mgrid[:128, :128]
        coords = np.array([[40.0, 40.0], [88.0, 88.0]], dtype=np.float32)
        for cy, cx in coords:
            img -= 5.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 12.0)
        meta = ItemMetadata("mic0", tmp_path, mode="spr")
        meta["average"] = img
        meta["box"] = coords
        meta["ctf"] = np.array([15000.0, 14000.0, 30.0, 0.0, 0.0, 0.0])
        meta.save()

        params = {"scope_pixel": 1.05, "data_bin": 2, "extract_box": 16,
                  "extract_bin": 2, "scope_voltage": 300.0, "scope_cs": 2.7,
                  "scope_wgh": 0.07}
        stack2, table2 = extract_stack([{"name": "mic0"}], params,
                                       tmp_path, out_stack="bin2.mrc")
        assert stack2.shape == (2, 16, 16)
        assert np.allclose(table2["pixel_size"], 1.05 * 2 * 2)

        # the user refines at bin 2: the table carries poses in deg/Å
        table2["psi"] = np.array([33.0, 120.0])
        table2["x_shift"] = np.array([2.1, -1.3])  # Å

        # re-extract at extract_bin=1 (finer): same items, same order
        params["extract_bin"] = 1
        stack1, table1 = extract_stack([{"name": "mic0"}], params,
                                       tmp_path, out_stack="bin1.mrc")
        assert stack1.shape == (2, 16, 16)
        assert np.allclose(table1["pixel_size"], 1.05 * 2)
        # particle order is stable -> the refined poses transplant verbatim
        assert np.array_equal(table1["position_in_stack"],
                              table2["position_in_stack"])
        for col in ("psi", "x_shift"):
            table1[col] = table2[col]  # Å/deg: no rescaling needed
        # the finer stack covers half the field of the binned one: its
        # windows are the Fourier-crop-consistent center of the bin-2 ones
        # (both extracted the same particles; centers must agree)
        # extract_inv flips contrast: the planted dark blob becomes bright
        c2 = np.unravel_index(np.argmax(stack2[0]), stack2[0].shape)
        c1 = np.unravel_index(np.argmax(stack1[0]), stack1[0].shape)
        assert abs(c2[0] - 8) <= 1 and abs(c2[1] - 8) <= 1
        assert abs(c1[0] - 8) <= 1 and abs(c1[1] - 8) <= 1
