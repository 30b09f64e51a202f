"""Contrast transfer function model (CTFFIND4/5-compatible conventions).

The CTF evaluated at spatial frequency g (1/Å) and azimuth theta:

    chi(g, t) = pi * lambda * g^2 * df(t) - pi/2 * Cs * lambda^3 * g^4
                + phase_shift
    CTF = -sqrt(1 - w^2) * sin(chi) - w * cos(chi)
        = -sin(chi + arctan(w / sqrt(1 - w^2)))

with df(t) = 0.5 * (df1 + df2 + (df1 - df2) * cos(2 * (t - angast))),
defocus in Å (positive = underfocus), Cs in mm, voltage in kV, amplitude
contrast w in [0, 1]. This matches the conventions the reference's wrapped
ctffind binaries use (reverse-spec'd from its stdin contract at
/root/reference/src/pyp/ctf/core.py:204-271 and the published CTFFIND4
paper), so fitted .ctf values are interchangeable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wavelength(voltage_kv):
    """Relativistic electron wavelength in Å (voltage in kV)."""
    v = voltage_kv * 1e3
    return 12.2639 / jnp.sqrt(v + 0.97845e-6 * v * v)


def wavelength_host(voltage_kv: float) -> float:
    """Python-scalar wavelength — safe to call AT TRACE TIME with a static
    kV (the jnp version stages a tracer even for Python inputs)."""
    import math

    v = float(voltage_kv) * 1e3
    return 12.2639 / math.sqrt(v + 0.97845e-6 * v * v)


def defocus_at_azimuth(df1, df2, angast_deg, azimuth_rad):
    """Effective defocus (Å) at the given azimuth(s)."""
    ang = jnp.deg2rad(angast_deg)
    return 0.5 * (df1 + df2 + (df1 - df2) * jnp.cos(2.0 * (azimuth_rad - ang)))


def chi(g, df, voltage_kv, cs_mm, phase_shift_rad=0.0):
    """Aberration phase at frequency g (1/Å) and defocus df (Å)."""
    lam = wavelength(voltage_kv)
    cs = cs_mm * 1e7  # mm -> Å
    return (
        jnp.pi * lam * g * g * df
        - 0.5 * jnp.pi * cs * lam**3 * g**4
        + phase_shift_rad
    )


def ctf_1d(g, df, voltage_kv, cs_mm, w=0.07, phase_shift_rad=0.0, bfactor=0.0):
    """CTF along a radial profile at constant defocus."""
    x = chi(g, df, voltage_kv, cs_mm, phase_shift_rad)
    amp = jnp.arctan2(w, jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0)))
    env = jnp.exp(-0.25 * bfactor * g * g)
    return -jnp.sin(x + amp) * env


def ctf_2d(
    shape,
    pixel_size,
    df1,
    df2,
    angast_deg,
    voltage_kv,
    cs_mm,
    w=0.07,
    phase_shift_rad=0.0,
    bfactor=0.0,
    rfft=True,
):
    """Evaluate the 2D CTF on an FFT-layout grid.

    shape = (ny, nx) of the real-space image. Parameters may be scalars or
    batched arrays broadcastable against each other; output has shape
    broadcast(...params) + (ny, nxf).
    """
    ny, nx = shape
    fy = jnp.fft.fftfreq(ny, d=pixel_size).reshape(ny, 1)
    fx = (jnp.fft.rfftfreq(nx, d=pixel_size) if rfft else jnp.fft.fftfreq(nx, d=pixel_size)).reshape(1, -1)
    g = jnp.sqrt(fy * fy + fx * fx)
    azim = jnp.arctan2(fy, fx)

    def bc(p):
        return jnp.asarray(p)[..., None, None]

    df = defocus_at_azimuth(bc(df1), bc(df2), bc(angast_deg), azim)
    x = chi(g, df, jnp.asarray(voltage_kv), jnp.asarray(cs_mm), bc(phase_shift_rad))
    amp = jnp.arctan2(w, jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0)))
    out = -jnp.sin(x + amp)
    if bfactor is not None:
        out = out * jnp.exp(-0.25 * jnp.asarray(bfactor)[..., None, None] * g * g)
    return out


def ctf_sqrt_power_1d(g, df, voltage_kv, cs_mm, w=0.07, phase_shift_rad=0.0):
    """|CTF| along a radial profile — what a fitted amplitude spectrum shows."""
    return jnp.abs(ctf_1d(g, df, voltage_kv, cs_mm, w, phase_shift_rad))


# ---------------------------------------------------------------------------
# dose weighting (Grant & Grigorieff 2015 critical-exposure model), the
# radiation-damage envelope the reference applies per frame/tilt
# (/root/reference/src/pyp/merge/weights.py:50 radDamage_weights_aux).
# ---------------------------------------------------------------------------

# Grant-Grigorieff critical-exposure constants; overridable for other
# detectors/voltages via set_dose_model (dose_critical_* params). Set them
# BEFORE the first jitted use — jit bakes the values at trace time.
_DOSE_ABC = (0.24499, -1.6649, 2.8141)


def set_dose_model(a: float, b: float, c: float):
    global _DOSE_ABC
    _DOSE_ABC = (float(a), float(b), float(c))


def critical_exposure(g):
    """Critical exposure Ne(g) in e-/Å² at frequency g (1/Å)."""
    a, b, c = _DOSE_ABC
    return a * jnp.power(jnp.maximum(g, 1e-6), b) + c


def dose_weight(g, cumulative_dose):
    """Per-frequency damage envelope exp(-dose / (2 Ne)).

    g: (...,) 1/Å; cumulative_dose: broadcastable e-/Å² (dose at frame end).
    """
    return jnp.exp(-jnp.asarray(cumulative_dose) / (2.0 * critical_exposure(g)))


def dose_weight_2d(shape, pixel_size, cumulative_doses, rfft=True):
    """2D dose-weight filters for a stack of frames.

    cumulative_doses: (n_frames,) -> output (n_frames, ny, nxf); per-frequency
    weights are normalized so that the sum of squares over frames is 1
    (unblur/summovie convention: keeps white-noise variance constant).
    """
    ny, nx = shape
    fy = jnp.fft.fftfreq(ny, d=pixel_size).reshape(ny, 1)
    fx = (jnp.fft.rfftfreq(nx, d=pixel_size) if rfft else jnp.fft.fftfreq(nx, d=pixel_size)).reshape(1, -1)
    g = jnp.sqrt(fy * fy + fx * fx)
    w = dose_weight(g[None], jnp.asarray(cumulative_doses)[:, None, None])
    norm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    return w / jnp.maximum(norm, 1e-8)


def frame_damage_weights(shape, frame_ranks, fraction: float = 4.0,
                         transition: float = 0.75, multiply: bool = True,
                         rfft=True):
    """Data-driven per-frame/tilt damage envelope (the reference's
    dose_weighting tab, merge/weights.py:76 `radDamage_weights`):

        Ne(g) = max_soft(exp(-|g|)^fraction, floor)   (tanh switch, not hard)
        w_f(g) = exp(-transition_eff * rank_f^4 / Ne(g))

    frame_ranks: (F,) damage order in [0, 1] (0 = least damaged — by
    acquisition time or inferred from per-frame scores). `fraction` steepens
    the frequency falloff (larger = fewer frames contribute at high res);
    `transition` scales the rank falloff; `multiply` scales it by the frame
    count (the reference's 'multiply by number of frames'). |g| is the
    NORMALIZED radius in cycles/px (box-relative, like the reference's
    0..0.5sqrt(2) bins — damage model relative to the sampling, not Å).
    Output (F, ny, nxf) normalized so sum of squares over frames = 1.
    """
    ny, nx = shape
    fy = jnp.fft.fftfreq(ny).reshape(ny, 1)
    fx = (jnp.fft.rfftfreq(nx) if rfft else jnp.fft.fftfreq(nx)).reshape(1, -1)
    g = jnp.sqrt(fy * fy + fx * fx)
    ne = jnp.exp(-g) ** fraction
    floor = float(np.exp(-0.5 * fraction) ** 37.0)  # reference switch_value
    switch = floor ** (1.0 / 37.0)
    sx = 0.5 * (1.0 + jnp.tanh((jnp.exp(-g) - switch) / 0.05))
    ne = sx * ne + (1.0 - sx) * floor
    ranks = jnp.asarray(frame_ranks, dtype=jnp.float32)[:, None, None]
    t_eff = transition * (len(np.asarray(frame_ranks)) if multiply else 1.0)
    w = jnp.exp(-t_eff * ranks ** 4 / ne[None])
    norm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
    return w / jnp.maximum(norm, 1e-8)
