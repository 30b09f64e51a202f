"""SPMD parallelism over TPU meshes.

The reference's parallelism is task decomposition over a SLURM cluster
(SURVEY §2.3); the numerical equivalents here map onto a `jax.sharding.Mesh`:

  * axis "data"  — particle/micrograph sharding (the reference's per-item
    swarm parallelism and particle-range splits, §2.3.1/§2.3.4);
  * axis "model" — frequency-space sharding of the scoring sums (the
    band/region decomposition axis, §2.3.7): mask points are split across
    chips and partial correlation sums are psum'ed over ICI;
  * reconstruction accumulators merge with one psum over "data" — the
    reference's two-level local_merge3d/merge3d dump-file reduction collapses
    into a single ICI collective (§2.3.5).

Everything uses shard_map so collectives are explicit and compile-time
checked; across hosts, jax.distributed extends the same mesh over DCN.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pyp_tpu.core.geometry import euler_to_matrix
from pyp_tpu.ops import refine3d as r3
from pyp_tpu.ops import reconstruct as rec
from pyp_tpu.ops.fourier_slice import (
    gather_2d_hermitian,
    gather_3d_hermitian,
    image_to_fourier,
)


def make_mesh(n_devices: int | None = None, model: int = 1) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    data = n_devices // model
    arr = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def _pose_score_sharded(pose, Xi, cp, Fref, mask_pts, pt_valid, n, pixel_size,
                        voltage_kv, cs_mm, w, model_axis):
    """CTF-weighted NCC with the frequency sum sharded over `model_axis`:
    each shard holds a slice of mask_pts; partial sums psum over ICI.
    `pt_valid` zeroes the contribution of padding points (G is padded to a
    multiple of the model axis — without the mask those pads would gather
    the volume's DC term and bias every score)."""
    phi, theta, psi, sy, sx = pose[0], pose[1], pose[2], pose[3], pose[4]
    vol_pad = Fref.shape[0] // n
    R = euler_to_matrix(phi, theta, psi)
    q = mask_pts[:, 1, None] * R[0, None, :] + mask_pts[:, 0, None] * R[1, None, :]
    u = gather_3d_hermitian(Fref, q[..., ::-1], scale=float(vol_pad))
    c = r3._ctf_at_points(mask_pts, n, pixel_size, cp[0], cp[1], cp[2],
                          voltage_kv, cs_mm, w, cp[3])
    xv = gather_2d_hermitian(Xi, mask_pts)
    ph = 2.0 * jnp.pi * (mask_pts[:, 0] * sy + mask_pts[:, 1] * sx) / n
    phasor = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    num = jnp.sum(pt_valid * jnp.real(jnp.conj(xv) * phasor * c * u))
    xn = jnp.sum(pt_valid * jnp.abs(xv) ** 2)
    cn = jnp.sum(pt_valid * c * c * jnp.abs(u) ** 2)
    num = jax.lax.psum(num, model_axis)
    xn = jax.lax.psum(xn, model_axis)
    cn = jax.lax.psum(cn, model_axis)
    return num / jnp.sqrt(xn * cn + 1e-12)


def sharded_refine_step(
    mesh: Mesh,
    stack,            # (B, n, n) — B divisible by mesh data size
    ctf_params,       # (B, 4)
    ref_volume,       # (n, n, n)
    init_poses,       # (B, 5)
    pixel_size: float,
    low_res: float = 40.0,
    high_res: float = 8.0,
    iters: int = 16,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
):
    """One local-refinement pass sharded (particles x frequency points).

    Returns (poses (B, 5), scores (B,)) fully replicated.
    """
    from pyp_tpu.ops.fourier_slice import volume_to_fourier

    n = stack.shape[-1]
    Fref = volume_to_fourier(jnp.asarray(ref_volume))
    mask_pts = r3.make_mask_points(n, pixel_size, low_res, high_res)
    model_size = mesh.shape["model"]
    # pad G to a multiple of the model axis
    G = mask_pts.shape[0]
    padG = (-G) % model_size
    pt_valid = np.concatenate([np.ones(G, np.float32), np.zeros(padG, np.float32)])
    mask_pts = np.concatenate([mask_pts, np.zeros((padG, 2), np.float32)])

    lr_angles, lr_shifts = 2.0, 0.4
    scale = jnp.array([lr_angles, lr_angles, lr_angles, lr_shifts, lr_shifts])

    def shard_fn(stack_s, ctf_s, poses_s, Fref_s, pts_s, valid_s):
        X = image_to_fourier(stack_s)

        def score_fn(pose, Xi, cp):
            return _pose_score_sharded(
                pose, Xi, cp, Fref_s, pts_s, valid_s, n, pixel_size,
                voltage_kv, cs_mm, amplitude_contrast, "model",
            )

        grad_fn = jax.grad(score_fn)

        def refine_one(pose0, Xi, cp):
            def step(carry, t):
                pose, m = carry
                g = grad_fn(pose, Xi, cp)
                gn = g / (jnp.linalg.norm(g) + 1e-8)
                m = 0.7 * m + gn
                decay = 0.5 * (1 + jnp.cos(jnp.pi * t / iters))
                return (pose + scale * decay * m, m), None

            (pose, _), _ = jax.lax.scan(step, (pose0, jnp.zeros_like(pose0)), jnp.arange(iters))
            sc0 = score_fn(pose0, Xi, cp)
            sc1 = score_fn(pose, Xi, cp)
            better = sc1 >= sc0
            return jnp.where(better, pose, pose0), jnp.where(better, sc1, sc0)

        poses_out, scores = jax.vmap(refine_one)(poses_s, X, ctf_s)
        return poses_out, scores

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(), P("model"), P("model")),
        out_specs=(P("data"), P("data")),
    )
    return jax.jit(fn)(
        jnp.asarray(stack), jnp.asarray(ctf_params), jnp.asarray(init_poses),
        Fref, jnp.asarray(mask_pts), jnp.asarray(pt_valid),
    )


# ---------------------------------------------------------------------------
# pipeline-grade DP wrappers: the production refine/reconstruct kernels run
# unchanged per particle shard, so multi-chip results match single-chip
# results (reconstruction differs only by psum summation order)
# ---------------------------------------------------------------------------


def _dp_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding axis 0 over every mesh axis (pure DP)."""
    return P(tuple(mesh.axis_names))


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def _pad_batch(arr, ndev: int):
    """Pad axis 0 to a multiple of ndev by repeating the last row."""
    arr = np.asarray(arr)
    padB = (-arr.shape[0]) % ndev
    if padB == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], padB, axis=0)])


def sharded_refine_batch(
    mesh: Mesh,
    stack,
    ctf_params,
    ref_volume,
    pixel_size: float,
    init_poses=None,
    shell_weights=None,
    **kw,
):
    """`refine3d.refine_batch` sharded over the mesh (pure DP): each chip
    runs the identical global+local kernels on its particle shard; outputs
    concatenate. This is the production multi-chip path of
    pipeline.refine.refinement_iteration (the reference's particle-range
    splits, SURVEY §2.3.4, frealign.py:3014)."""
    ndev = _mesh_size(mesh)
    B = np.asarray(stack).shape[0]
    stack_p = _pad_batch(stack, ndev)
    ctf_p = _pad_batch(ctf_params, ndev)
    spec = _dp_spec(mesh)
    ref_j = jnp.asarray(np.asarray(ref_volume))
    sw = None if shell_weights is None else jnp.asarray(np.asarray(shell_weights))

    if init_poses is not None:
        init_p = _pad_batch(init_poses, ndev)

        def shard_fn(stack_s, ctf_s, init_s, ref_s):
            return r3.refine_batch(
                stack_s, ctf_s, ref_s, pixel_size,
                init_poses=init_s, shell_weights=sw, **kw,
            )

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(spec, spec, spec, P()), out_specs=spec,
        )
        res = jax.jit(fn)(
            jnp.asarray(stack_p), jnp.asarray(ctf_p), jnp.asarray(init_p), ref_j
        )
    else:

        def shard_fn(stack_s, ctf_s, ref_s):
            return r3.refine_batch(
                stack_s, ctf_s, ref_s, pixel_size,
                init_poses=None, shell_weights=sw, **kw,
            )

        fn = shard_map(
            shard_fn, mesh=mesh, in_specs=(spec, spec, P()), out_specs=spec,
        )
        res = jax.jit(fn)(jnp.asarray(stack_p), jnp.asarray(ctf_p), ref_j)
    return r3.RefineResult(*(f[:B] for f in res))


def sharded_accumulate(
    mesh: Mesh,
    stack, poses, ctf_params, subset, weights,
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    symmetry: str = "C1",
    pad: int = 2,
    prev=None,
    doses=None,
    gridding: str = "trilinear",
    iewald: int = 0,
    lblur=None,
    ref_fourier=None,
):
    """`reconstruct.accumulate` sharded over the mesh with one psum merge —
    the TPU-native local_merge3d+merge3d (frealign.py:1838,:1910). Padding
    particles get weight 0, so the result equals the single-chip accumulate
    up to summation order. Returns replicated Accumulators."""
    ndev = _mesh_size(mesh)
    B = np.asarray(stack).shape[0]
    stack_p = _pad_batch(stack, ndev)
    poses_p = _pad_batch(poses, ndev)
    ctf_p = _pad_batch(ctf_params, ndev)
    subset_p = _pad_batch(np.asarray(subset), ndev)
    w_p = _pad_batch(np.asarray(weights, dtype=np.float32), ndev)
    w_p[B:] = 0.0
    dose_p = None if doses is None else _pad_batch(np.asarray(doses), ndev)
    spec = _dp_spec(mesh)
    axes = tuple(mesh.axis_names)

    def shard_fn(stack_s, poses_s, ctf_s, subset_s, w_s, dose_s):
        acc = rec.accumulate(
            stack_s, poses_s, ctf_s, subset_s, w_s, n, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast, symmetry, pad,
            doses=dose_s, gridding=gridding, iewald=iewald, lblur=lblur,
            ref_fourier=ref_fourier,
        )
        return jax.tree.map(lambda x: jax.lax.psum(x, axes), acc)

    if dose_p is None:
        def shard_fn2(stack_s, poses_s, ctf_s, subset_s, w_s):
            return shard_fn(stack_s, poses_s, ctf_s, subset_s, w_s, None)

        fn = shard_map(shard_fn2, mesh=mesh,
                       in_specs=(spec,) * 5, out_specs=P())
        acc = jax.jit(fn)(
            jnp.asarray(stack_p), jnp.asarray(poses_p), jnp.asarray(ctf_p),
            jnp.asarray(subset_p), jnp.asarray(w_p),
        )
    else:
        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(spec,) * 6, out_specs=P())
        acc = jax.jit(fn)(
            jnp.asarray(stack_p), jnp.asarray(poses_p), jnp.asarray(ctf_p),
            jnp.asarray(subset_p), jnp.asarray(w_p), jnp.asarray(dose_p),
        )
    if prev is not None:
        acc = rec.Accumulators(*(p + a for p, a in zip(prev, acc)))
    return acc


def sharded_accumulate_matrices(
    mesh: Mesh,
    windows, rotations, shifts, defoci, subset, weights,
    n: int,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    pad: int = 2,
    prev=None,
    iewald: int = 0,
    ref_fourier=None,
):
    """`reconstruct.accumulate_matrices` (the CSPT matrix-pose insertion,
    SURVEY §3.4) sharded over the mesh with one psum merge."""
    ndev = _mesh_size(mesh)
    B = np.asarray(windows).shape[0]
    win_p = _pad_batch(windows, ndev)
    rot_p = _pad_batch(rotations, ndev)
    sh_p = _pad_batch(shifts, ndev)
    df_p = _pad_batch(defoci, ndev)
    sub_p = _pad_batch(np.asarray(subset), ndev)
    w_p = _pad_batch(np.asarray(weights, dtype=np.float32), ndev)
    w_p[B:] = 0.0
    spec = _dp_spec(mesh)
    axes = tuple(mesh.axis_names)

    def shard_fn(win_s, rot_s, sh_s, df_s, sub_s, w_s):
        acc = rec.accumulate_matrices(
            win_s, rot_s, sh_s, df_s, sub_s, w_s, n, pixel_size,
            voltage_kv, cs_mm, amplitude_contrast, pad, iewald=iewald,
            ref_fourier=ref_fourier,
        )
        return jax.tree.map(lambda x: jax.lax.psum(x, axes), acc)

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec,) * 6, out_specs=P())
    acc = jax.jit(fn)(
        jnp.asarray(win_p), jnp.asarray(rot_p), jnp.asarray(sh_p),
        jnp.asarray(df_p), jnp.asarray(sub_p), jnp.asarray(w_p),
    )
    if prev is not None:
        acc = rec.Accumulators(*(p + a for p, a in zip(prev, acc)))
    return acc


def reconstruct_sharded(
    mesh: Mesh,
    stack, poses, ctf_params, pixel_size,
    subset=None, weights=None, symmetry: str = "C1",
    voltage_kv: float = 300.0, cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07, wiener: float = 0.5,
    batch: int = 256, pad: int = 2, crop_to: int = None,
    gridding: str = "trilinear", iewald: int = 0,
    lblur_nrot: int = 0, lblur_range: float = 20.0,
    ref_volume=None,
):
    """Mesh-parallel mirror of `reconstruct.reconstruct`: superbatches of
    batch*ndev particles accumulate with a psum merge, then finalize.
    crop_to: band-limited grid (host-side crop here; the mesh path is for
    multi-chip runs where host<->device bandwidth is not the tunnel)."""
    n = np.asarray(stack).shape[-1]
    B = np.asarray(stack).shape[0]
    ndev = _mesh_size(mesh)
    if subset is None:
        subset = np.arange(B) % 2
    if weights is None:
        weights = np.ones(B, dtype=np.float32)
    n_rec, ratio = n, 1.0
    if crop_to is not None and crop_to < n:
        n_rec, ratio = int(crop_to), int(crop_to) / float(n)
        # pad scaled by n/n_rec: finer gridding nodes on the crop grid,
        # measured worth ~1.5 A on e2e intermediates (see
        # reconstruct.reconstruct crop_to for the replicated evidence)
        pad = int(np.ceil(pad * n / float(n_rec)))
    pixel_rec = pixel_size / ratio
    lblur = rec.lblur_bank(lblur_nrot, lblur_range)
    ref_fourier = None
    if abs(iewald) >= 2 and ref_volume is not None:
        # reference-based Ewald unmixing: replicated padded ref spectrum
        from pyp_tpu.ops.fourier_slice import volume_to_fourier

        import jax.numpy as jnp

        rv = jnp.asarray(ref_volume, dtype=jnp.float32)
        if n_rec < n:
            from pyp_tpu.core.fft import fourier_crop_3d

            rv = fourier_crop_3d(rv, out_shape=(n_rec, n_rec, n_rec))
        ref_fourier = volume_to_fourier(rv, pad=2)
    acc = None
    step = batch * ndev
    for i in range(0, B, step):
        sl = slice(i, min(i + step, B))
        xb = np.asarray(stack[sl])
        pb = np.asarray(poses[sl])
        if n_rec < n:
            from pyp_tpu.ops.frm import _crop_jit
            import jax.numpy as jnp

            xb = np.asarray(_crop_jit(jnp.asarray(xb), n_rec))
            pb = np.array(pb, copy=True)
            pb[:, 3:5] *= ratio
        acc = sharded_accumulate(
            mesh, xb, pb,
            np.asarray(ctf_params[sl]), np.asarray(subset[sl]),
            np.asarray(weights[sl]), n_rec, pixel_rec, voltage_kv, cs_mm,
            amplitude_contrast, symmetry, pad, prev=acc, gridding=gridding,
            iewald=iewald, lblur=lblur, ref_fourier=ref_fourier,
        )
    return rec.finalize(acc, n_rec, pad, wiener, gridding)


def sharded_reconstruct(
    mesh: Mesh,
    stack, poses, ctf_params,
    pixel_size: float,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    pad: int = 2,
):
    """Particle-sharded insertion with a single psum merge over "data" —
    the TPU-native merge3d. Returns replicated Accumulators."""
    n = stack.shape[-1]
    B = stack.shape[0]

    def shard_fn(stack_s, poses_s, ctf_s, subset_s, w_s):
        X = image_to_fourier(stack_s)
        X = rec._shift_correct(X, poses_s[:, 3:5], n)
        ctfs = rec._ctf_grids(n, pixel_size, ctf_s, voltage_kv, cs_mm,
                              amplitude_contrast)
        R = euler_to_matrix(poses_s[:, 0], poses_s[:, 1], poses_s[:, 2])
        from pyp_tpu.ops.fourier_slice import insert_slices_halves

        n1, d1, n2, d2 = insert_slices_halves(X, ctfs, R, subset_s, w_s, n,
                                              pad=pad)
        out = rec.Accumulators(n1, d1, n2, d2)
        return jax.tree.map(lambda x: jax.lax.psum(x, "data"), out)

    subset = jnp.arange(B) % 2
    weights = jnp.ones(B)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    )
    return jax.jit(fn)(
        jnp.asarray(stack), jnp.asarray(poses), jnp.asarray(ctf_params),
        subset, weights,
    )


def csp_refine_batch_sharded(
    mesh: Mesh,
    params_b,            # CspParams, every leaf (S, ...)
    xv_b,                # (S, T, P, G) complex window samples
    window_centers_b,    # (S, T, P, 2)
    tilt_defocus_b,      # (S, T, 2)
    mask_pts, Fref,      # shared (replicated)
    tilt_weights_b,      # (S, T)
    valid_b,             # (S, T, P)
    offsets_by_mode, spin_offsets,
    modes: tuple,
    n: int,
    pixel_size: float,
    iters_per_mode: int = 20,
    lr: float = 0.3,
    reg_weight: float = 0.1,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amplitude_contrast: float = 0.07,
    step_tol: float = 0.0,
    value_tol: float = 0.0,
):
    """`ops.csp.csp_refine_batch` with the SERIES axis sharded over every
    mesh device (pure DP over ("data", "model") flattened — CSP has no
    model-parallel dimension; the reference instead fans one SLURM array
    element per series, local_run.py:363-463). Each device runs the fused
    mode schedule (`_schedule_core`) over its series shard sequentially at
    single-series activation memory; no collectives are needed until the
    downstream reconstruction psum. S pads to a multiple of the device
    count with zero-validity copies; outputs unpad before returning."""
    from pyp_tpu.ops.csp import CspParams, _schedule_core

    ndev = _mesh_size(mesh)
    S = int(valid_b.shape[0])
    axes = ("data", "model")
    spec = P(axes)

    def padS(x):
        x = jnp.asarray(x)
        short = (-x.shape[0]) % ndev
        if short:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], short, axis=0)])
        return x

    p_pad = CspParams(*(padS(leaf) for leaf in params_b))
    v_pad = padS(valid_b)
    if S % ndev:
        v_pad = v_pad.at[S:].set(0.0)

    def shard_fn(p_s, xv_s, wc_s, td_s, tw_s, v_s, mask_s, Fref_s,
                 offs_s, spin_s):
        def one(args):
            p, xv, c, d, tw, v = args
            return _schedule_core(
                p, xv, c, d, mask_s, Fref_s, tw, v, offs_s, spin_s,
                modes, n, pixel_size, iters_per_mode, lr, reg_weight,
                voltage_kv, cs_mm, amplitude_contrast,
                step_tol=step_tol, value_tol=value_tol)

        return jax.lax.map(one, (p_s, xv_s, wc_s, td_s, tw_s, v_s))

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, P(), P(), P(), P()),
        out_specs=(spec, spec, spec),
    )
    refined, mode_scores, pscores = jax.jit(fn)(
        p_pad, padS(xv_b), padS(window_centers_b), padS(tilt_defocus_b),
        padS(tilt_weights_b), v_pad, jnp.asarray(mask_pts), Fref,
        offsets_by_mode, spin_offsets)
    unpad = lambda x: x[:S]  # noqa: E731
    return (jax.tree.map(unpad, refined), unpad(mode_scores),
            unpad(pscores))
