"""Diagnostic plots: CTF fits, drift trajectories, FSC curves, angular
distributions, class montages.

Equivalent of the reference's analysis/plot/ (plot/core.py: CTF fit curves,
drift, FSC, angular/defocus histograms, class contact sheets, .bild angular
distribution files for ChimeraX).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_ctf_fit(g_axis, radial, norm_radial, model, fit, out_path):
    """CTFFIND-style fit panel: radial spectrum vs fitted CTF^2."""
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    axes[0].plot(g_axis, radial, lw=0.8)
    axes[0].set_ylabel("power")
    axes[0].set_yscale("log")
    axes[1].plot(g_axis, norm_radial, lw=0.8, label="data (normalized)")
    axes[1].plot(g_axis, model, lw=0.8, label="CTF$^2$ fit")
    axes[1].set_xlabel("spatial frequency (1/Å)")
    axes[1].legend(loc="upper right", fontsize=8)
    axes[1].set_title(
        f"df1={float(fit.df1):.0f} Å  df2={float(fit.df2):.0f} Å  "
        f"ast={float(fit.angast):.1f}°  fit_res={float(fit.fit_res):.2f} Å",
        fontsize=9,
    )
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_drift(shifts, out_path):
    shifts = np.asarray(shifts)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(shifts[:, 1], shifts[:, 0], "o-", ms=3)
    ax.plot(shifts[0, 1], shifts[0, 0], "rs", label="first frame")
    ax.set_xlabel("x shift (px)")
    ax.set_ylabel("y shift (px)")
    ax.set_title("beam-induced motion")
    ax.legend()
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_fsc(freqs, curves, pixel_size, out_path, labels=None, thresholds=(0.5, 0.143)):
    freqs = np.asarray(freqs) / pixel_size
    fig, ax = plt.subplots(figsize=(6, 4))
    if np.ndim(curves[0]) == 0:
        curves = [curves]
    for i, c in enumerate(curves):
        label = labels[i] if labels else f"curve {i}"
        ax.plot(freqs, np.asarray(c), lw=1.2, label=label)
    for t in thresholds:
        ax.axhline(t, color="gray", lw=0.6, ls="--")
    ax.set_xlabel("spatial frequency (1/Å)")
    ax.set_ylabel("FSC")
    ax.set_ylim(-0.1, 1.05)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_angular_distribution(phi, theta, out_path):
    """Mollweide-projected heat map of viewing directions."""
    phi = np.radians(np.asarray(phi) % 360) - np.pi
    theta = np.radians(np.asarray(theta))
    lat = np.pi / 2 - theta
    fig = plt.figure(figsize=(7, 4))
    ax = fig.add_subplot(111, projection="mollweide")
    h = ax.hexbin(phi, lat, gridsize=30, mincnt=1, cmap="viridis")
    fig.colorbar(h, ax=ax, shrink=0.7, label="particles")
    ax.set_title("angular distribution")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_defocus_histogram(df1, df2, out_path):
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(0.5 * (np.asarray(df1) + np.asarray(df2)) / 1e4, bins=40)
    ax.set_xlabel("defocus (µm)")
    ax.set_ylabel("micrographs")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def class_montage(class_avgs, out_path, columns: int = 10, occupancy=None):
    """Contact sheet of 2D class averages (reference contact_sheet)."""
    avgs = np.asarray(class_avgs)
    K, n, _ = avgs.shape
    cols = min(columns, K)
    rows = (K + cols - 1) // cols
    sheet = np.zeros((rows * n, cols * n), dtype=np.float32)
    for k in range(K):
        r, c = divmod(k, cols)
        img = avgs[k]
        lo, hi = np.percentile(img, [1, 99])
        sheet[r * n:(r + 1) * n, c * n:(c + 1) * n] = np.clip(
            (img - lo) / max(hi - lo, 1e-6), 0, 1
        )
    fig, ax = plt.subplots(figsize=(cols, rows))
    ax.imshow(sheet, cmap="gray", interpolation="nearest")
    if occupancy is not None:
        for k in range(K):
            r, c = divmod(k, cols)
            ax.text(c * n + 2, r * n + 10, f"{int(occupancy[k])}",
                    color="yellow", fontsize=7)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return sheet


def write_bild_angular_distribution(phi, theta, out_path, radius: float = 50.0):
    """ChimeraX .bild file of the viewing-direction density (par2bild)."""
    from pyp_tpu.core.geometry import euler_to_matrix
    import jax.numpy as jnp

    R = np.asarray(euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                                   jnp.zeros(len(np.asarray(phi)))))
    views = R[:, 2, :]
    # bin on a Fibonacci sphere
    k = 500
    idx = np.arange(k) + 0.5
    ga = np.pi * (1 + 5**0.5) * idx
    z = 1 - 2 * idx / k
    r = np.sqrt(1 - z * z)
    seeds = np.stack([r * np.cos(ga), r * np.sin(ga), z], axis=1)
    counts = np.bincount(np.argmax(views @ seeds.T, axis=1), minlength=k)
    cmax = max(counts.max(), 1)
    with open(out_path, "w") as f:
        f.write(".comment pyp_tpu angular distribution\n")
        for s, cnt in zip(seeds, counts):
            if cnt == 0:
                continue
            h = cnt / cmax
            f.write(f".color {h:.2f} 0 {1 - h:.2f}\n")
            tip = s * radius * (1.0 + 0.3 * h)
            base = s * radius
            f.write(
                f".cylinder {base[0]:.2f} {base[1]:.2f} {base[2]:.2f} "
                f"{tip[0]:.2f} {tip[1]:.2f} {tip[2]:.2f} {0.5 + h:.2f}\n"
            )


def volume_montage(volume, out_path, axis: int = 0, n_slices: int = 9):
    """Slice montage of a 3D map (the reference's map montage in
    mreconstruct_post, frealign.py:2376)."""
    vol = np.asarray(volume)
    n = vol.shape[axis]
    picks = np.linspace(n // 6, n - n // 6 - 1, n_slices).astype(int)
    cols = int(np.ceil(np.sqrt(n_slices)))
    rows = int(np.ceil(n_slices / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis("off")
    for k, z in enumerate(picks):
        sl = np.take(vol, z, axis=axis)
        lo, hi = np.percentile(sl, [1, 99])
        axes[k].imshow(sl, cmap="gray", vmin=lo, vmax=hi)
        axes[k].set_title(f"{z}", fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
