"""Production-scale SPA run through the ACTUAL CLI project path, with a
kill/resume proof (VERDICT r4 item 6).

tools/benchmark_e2e_spa.py drives pipeline functions directly; this tool
proves the *user-visible* path at scale: every phase is `pyp_tpu.cli.main`
in its own subprocess against a file-backed project directory — exactly
what a user types (reference shape: the tutorial workflow
docs/tutorials/spa_empiar_10025.rst driven by the replay harness of
tests/test_pyp.py:374):

    pyp spr -data_path 'raw/*.mrc' ...   # preprocess swarm (motion+CTF+pick)
    pyp extract -extract_box B           # windowed particle stack
    pyp refine -refine_maxiter K ...     # FRM refinement loop
    pyp postprocess                      # masked FSC + sharpening

--kill-resume additionally proves checkpoint/resume at the durable
iteration boundary (reference: refine_resume / maps-as-durable-state,
SURVEY §5.4): the refine subprocess is SIGKILLed right after the first
completed iteration's maps/<ds>_rNN_II.{mrc,cistem} land, re-run, and the
relaunched process must (a) log "resuming", (b) leave the finished
iteration's durable files untouched, and (c) finish to the same final map
as an uninterrupted control run from the identical post-extract snapshot
(exact on the deterministic CPU backend; FSC-tolerance on TPU, where
scatter-add float ordering is nondeterministic).

Run (production shape, one TPU chip):
    python tools/cli_e2e_spa.py --workdir /tmp/cli256 --platform tpu \
        --mics 16 --mic-size 4096 --ppm 192 --box 256 --iters 5 --kill-resume

Small CPU check (what tests/test_cli_resume.py runs):
    python tools/cli_e2e_spa.py --workdir /tmp/cli32 --platform cpu \
        --mics 2 --mic-size 512 --ppm 24 --box 32 --iters 4 --kill-resume
"""

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _force_platform():
    plat = os.environ.get("PYP_E2E_PLATFORM")
    if plat and plat != "tpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        # sitecustomize pins jax_platforms to the axon TPU tunnel; the env
        # var alone is ignored, only jax.config wins (tests/conftest.py)
        jax.config.update("jax_platforms", plat)


# ---------------------------------------------------------------------------
# phase: gen — synthetic ground truth + micrograph movies on disk
# ---------------------------------------------------------------------------

def phase_gen(a):
    _force_platform()
    import jax.numpy as jnp
    import numpy as np

    from pyp_tpu.core import ctf as ctf_model
    from pyp_tpu.core.fft import shift_images
    from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
    from pyp_tpu.core.geometry import euler_to_matrix
    from pyp_tpu.io import mrc
    from pyp_tpu.ops import fourier_slice as fs

    rng = np.random.RandomState(a.seed)
    box, n, pixel = a.box, a.mic_size, a.pixel

    vol = rng.randn(box, box, box).astype(np.float32)
    vol *= np.asarray(soft_spherical_mask(box, box * 0.35, 4.0))
    vol = np.array(lowpass_filter_3d(
        jnp.asarray(vol), pixel, max(a.content_a, 2.0 * pixel))) * 10.0
    Fv = fs.volume_to_fourier(jnp.asarray(vol))

    raw = Path("raw")
    raw.mkdir(exist_ok=True)
    # initial model: the truth lowpassed well past the refinement target,
    # so the run has to actually refine (not just copy the input)
    init = np.array(lowpass_filter_3d(jnp.asarray(vol), pixel,
                                      max(4.0 * a.content_a, 20.0 * pixel)))
    mrc.write(init.astype(np.float32), "initial_model.mrc", pixel_size=pixel)
    mrc.write(vol, "ground_truth.mrc", pixel_size=pixel)

    half = box // 2
    # jittered grid dense enough for ppm particles
    import math

    cols = int(math.ceil(math.sqrt(a.ppm * n / max(n, 1))))
    cols = max(cols, int(math.ceil(math.sqrt(a.ppm))))
    spacing = (n - 2 * box) // max(cols, 1)
    for m in range(a.mics):
        mic = np.zeros((n, n), dtype=np.float32)
        placed = 0
        coords = []
        for i in range(cols * cols):
            if placed >= a.ppm:
                break
            gy = box + (i // cols) * spacing + rng.randint(-spacing // 4,
                                                           spacing // 4 + 1)
            gx = box + (i % cols) * spacing + rng.randint(-spacing // 4,
                                                          spacing // 4 + 1)
            if gy + half > n or gx + half > n or gy - half < 0 or gx - half < 0:
                continue
            coords.append((gy, gx))
            placed += 1
        P = len(coords)
        phi = rng.uniform(0, 360, P).astype(np.float32)
        theta = np.degrees(np.arccos(rng.uniform(-1, 1, P))).astype(np.float32)
        psi = rng.uniform(0, 360, P).astype(np.float32)
        R = euler_to_matrix(phi, theta, psi)
        projs = np.array(fs.fourier_to_image(fs.project(Fv, R, box), box))
        for p, (gy, gx) in enumerate(coords):
            mic[gy - half:gy + half, gx - half:gx + half] += -projs[p]
        df = rng.uniform(12000, 25000, 1)[0]
        c = np.asarray(ctf_model.ctf_2d(
            (n, n), pixel, df + 300, df - 300, rng.uniform(0, 180),
            a.voltage, a.cs))
        mic = np.fft.irfft2(np.fft.rfft2(mic) * np.sign(c) * np.abs(c),
                            s=(n, n)).astype(np.float32)
        mic += a.noise * rng.randn(n, n).astype(np.float32)
        drift = np.cumsum(rng.uniform(-1.5, 1.5, (a.frames, 2)),
                          axis=0).astype(np.float32)
        frames = np.array(shift_images(
            jnp.repeat(jnp.asarray(mic)[None], a.frames, 0),
            jnp.asarray(drift)))
        frames += (a.noise / 2) * rng.randn(*frames.shape).astype(np.float32)
        mrc.write(frames.astype(np.float32), raw / f"mic{m:03d}.mrc",
                  pixel_size=pixel)
        print(f"[gen] mic{m:03d}: {P} particles, df {df:.0f}", flush=True)
    return 0


# ---------------------------------------------------------------------------
# CLI phases — each is pyp_tpu.cli.main in THIS subprocess
# ---------------------------------------------------------------------------

def _cli(argv):
    _force_platform()
    from pyp_tpu.cli import main

    return main(argv)


def phase_spr(a):
    detect_rad = a.detect_rad or 0.33 * a.box * a.pixel
    return _cli([
        "spr", "-data_path", "raw/mic*.mrc",
        "-scope_pixel", str(a.pixel), "-scope_voltage", str(a.voltage),
        "-scope_cs", str(a.cs),
        "-detect_rad", str(detect_rad), "-detect_thresh", "1.2",
        "-ctf_min_def", "8000", "-ctf_max_def", "30000",
        "-ctf_max_res", str(max(4.0 * a.pixel, 5.0)),
        "-extract_box", str(a.box), "-movie_search", "8",
        "-slurm_tasks", "1",
    ])


def phase_extract(a):
    return _cli(["extract", "-extract_box", str(a.box)])


def refine_argv(a):
    argv = ["refine", "-refine_maxiter", str(a.iters),
            "-refine_rhref", a.rhref, "-refine_dang", str(a.dang),
            "-particle_sym", "C1", "-data_set", a.dataset]
    if a.refine_extra:
        argv += a.refine_extra.split()
    return argv


def phase_refine(a):
    return _cli(refine_argv(a))


def phase_postprocess(a):
    return _cli(["postprocess", "-data_set", a.dataset])


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _spawn(a, phase, log_path=None):
    cmd = [sys.executable, str(Path(__file__).resolve()), "--phase", phase]
    cmd += _passthrough(a)
    env = dict(os.environ, PYP_E2E_PLATFORM=a.platform,
               PYTHONPATH=str(REPO) + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = open(log_path, "ab") if log_path else None
    return subprocess.Popen(cmd, cwd=a.workdir, env=env,
                            stdout=out or None,
                            stderr=subprocess.STDOUT if out else None)


def _run(a, phase, log_path=None):
    t0 = time.perf_counter()
    p = _spawn(a, phase, log_path)
    rc = p.wait()
    dt = time.perf_counter() - t0
    print(f"[driver] phase {phase}: rc={rc} in {dt:.1f}s", flush=True)
    if rc != 0:
        raise SystemExit(f"phase {phase} failed rc={rc}")
    return dt


def _passthrough(a):
    out = []
    for k in ("mics", "mic_size", "ppm", "box", "frames", "iters", "seed"):
        out += [f"--{k.replace('_', '-')}", str(getattr(a, k))]
    for k in ("pixel", "noise", "content_a", "voltage", "cs", "dang",
              "detect_rad"):
        out += [f"--{k.replace('_', '-')}", str(getattr(a, k))]
    out += ["--rhref", a.rhref, "--dataset", a.dataset,
            "--platform", a.platform]
    if a.refine_extra:
        out += ["--refine-extra", a.refine_extra]
    return out


def _wait_for_durable(maps_dir, dataset, iteration, proc, timeout=7200):
    """Block until iteration's durable pair exists (or proc dies)."""
    m = maps_dir / f"{dataset}_r01_{iteration:02d}.mrc"
    t = maps_dir / f"{dataset}_r01_{iteration:02d}.cistem"
    t0 = time.time()
    while time.time() - t0 < timeout:
        if m.exists() and t.exists():
            # small grace so the writer finishes both files
            time.sleep(2.0)
            return True
        if proc.poll() is not None:
            return False
        time.sleep(2.0)
    return False


def kill_resume_refine(a, report):
    """SIGKILL refine after the first durable iteration, resume, verify."""
    import numpy as np

    work = Path(a.workdir)
    maps_dir = work / "maps"
    first_it = 2  # refine_loop starts at refine_iter (default 2)

    log1 = work / "refine_killed.log"
    p = _spawn(a, "refine", log_path=log1)
    ok = _wait_for_durable(maps_dir, a.dataset, first_it, p)
    if not ok:
        p.kill()
        raise SystemExit("refine never produced a durable iteration "
                         f"(see {log1})")
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    print(f"[driver] refine SIGKILLed after iteration {first_it} landed",
          flush=True)
    durable = [maps_dir / f"{a.dataset}_r01_{first_it:02d}.mrc",
               maps_dir / f"{a.dataset}_r01_{first_it:02d}.cistem"]
    mtimes = {str(f): f.stat().st_mtime for f in durable}

    log2 = work / "refine_resumed.log"
    t_resume = _run(a, "refine", log_path=log2)
    text = log2.read_text(errors="replace")
    resumed = f"resuming at iteration {first_it + 1}" in text
    untouched = all(Path(f).stat().st_mtime == t for f, t in mtimes.items())
    report["resume"] = {
        "resumed_log_line": resumed,
        "finished_iteration_untouched": untouched,
        "resume_wall_s": round(t_resume, 1),
    }
    if not resumed:
        raise SystemExit(f"resumed run did not log a resume (see {log2})")
    if not untouched:
        raise SystemExit("resume rewrote the finished iteration's durable "
                         "files — it redid completed work")
    return report


def control_compare(a, snapshot, report):
    """Uninterrupted control from the post-extract snapshot; compare.

    Pure numpy in the driver process — importing jax here would land on
    the axon TPU (sitecustomize pins the platform) and contend with
    whatever production run owns the chip."""
    import numpy as np

    from pyp_tpu.io import mrc

    ctrl = Path(a.workdir) / "ctrl"
    if ctrl.exists():
        shutil.rmtree(ctrl)
    ctrl.mkdir()
    for f in snapshot.glob("*"):
        shutil.copy2(f, ctrl / f.name)
    a_ctrl = argparse.Namespace(**vars(a))
    a_ctrl.workdir = str(ctrl)
    _run(a_ctrl, "refine", log_path=ctrl / "refine.log")

    final = int(a.iters) + 1
    m1 = Path(a.workdir) / "maps" / f"{a.dataset}_r01_{final:02d}.mrc"
    m2 = ctrl / "maps" / f"{a.dataset}_r01_{final:02d}.mrc"
    v1 = np.asarray(mrc.read(m1), np.float32)
    v2 = np.asarray(mrc.read(m2), np.float32)
    scale = max(1.0, float(np.abs(v2).max()))
    exact = bool(np.allclose(v1, v2, atol=1e-5 * scale))
    corr = float(np.corrcoef(v1.ravel(), v2.ravel())[0, 1])
    report["control"] = {
        "exact_match": exact,
        "max_abs_diff_rel": round(float(np.abs(v1 - v2).max()) / scale, 7),
        "corr_vs_control": round(corr, 6),
    }
    # CPU backend is deterministic -> resumed == control bit-for-bit (up to
    # atol); TPU scatter-add float ordering is not — correlation is the bar
    if a.platform == "cpu" and not exact:
        raise SystemExit("CPU resume diverged from the uninterrupted control")
    if corr < 0.999 and not exact:
        raise SystemExit(f"resumed/control maps disagree (corr {corr:.4f})")
    return report


def drive(a):
    work = Path(a.workdir)
    work.mkdir(parents=True, exist_ok=True)
    report = {"shape": {k: getattr(a, k) for k in
                        ("mics", "mic_size", "ppm", "box", "frames",
                         "iters", "pixel")},
              "platform": a.platform, "phases": {}}
    report["phases"]["gen"] = round(_run(a, "gen"), 1)
    report["phases"]["spr"] = round(_run(a, "spr"), 1)
    report["phases"]["extract"] = round(_run(a, "extract"), 1)

    # post-extract snapshot for the control run
    snapshot = work / "snapshot"
    if snapshot.exists():
        shutil.rmtree(snapshot)
    snapshot.mkdir()
    for name in ("stack.mrc", "stack.cistem", "initial_model.mrc",
                 ".pyp_tpu_config.toml"):
        src = work / name
        if src.exists():
            shutil.copy2(src, snapshot / name)

    t0 = time.perf_counter()
    if a.kill_resume:
        kill_resume_refine(a, report)
        control_compare(a, snapshot, report)
    else:
        report["phases"]["refine"] = round(_run(a, "refine"), 1)
    report["phases"]["refine_total"] = round(time.perf_counter() - t0, 1)
    report["phases"]["postprocess"] = round(_run(a, "postprocess"), 1)

    hist = work / "maps" / f"{a.dataset}_r01_history.json"
    if hist.exists():
        entries = json.loads(hist.read_text())
        report["iterations"] = entries
        if entries:
            report["final_fsc143_A"] = entries[-1].get("resolution")
    # CLI history replay-ability (the reference's regression shape)
    history = work / ".pyp_history"
    report["history_modes"] = []
    if history.exists():
        for line in history.read_text().splitlines():
            parts = line.split()
            if len(parts) >= 3 and not line.startswith("#"):
                report["history_modes"].append(parts[2])
    out = Path(a.out or (work / "cli_e2e_report.json"))
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1), flush=True)
    return 0


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="drive",
                    choices=["drive", "gen", "spr", "extract", "refine",
                             "postprocess"])
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--mics", type=int, default=2)
    ap.add_argument("--mic-size", type=int, default=512)
    ap.add_argument("--ppm", type=int, default=24)
    ap.add_argument("--box", type=int, default=32)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pixel", type=float, default=1.0)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--content-a", type=float, default=2.5)
    ap.add_argument("--voltage", type=float, default=300.0)
    ap.add_argument("--cs", type=float, default=2.7)
    ap.add_argument("--dang", type=float, default=25.0)
    ap.add_argument("--detect-rad", type=float, default=0.0)
    ap.add_argument("--rhref", default="12:8:6:5")
    ap.add_argument("--dataset", default="cli_e2e")
    ap.add_argument("--refine-extra", default="")
    ap.add_argument("--kill-resume", action="store_true")
    ap.add_argument("--out", default="")
    return ap.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    if a.phase == "drive":
        return drive(a)
    # phase subprocesses are spawned with cwd=workdir already (_spawn)
    return {"gen": phase_gen, "spr": phase_spr, "extract": phase_extract,
            "refine": phase_refine, "postprocess": phase_postprocess}[a.phase](a)


if __name__ == "__main__":
    sys.exit(main())
