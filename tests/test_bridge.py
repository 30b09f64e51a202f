"""SLURM/multi-host bridge: submission wiring + 2-process jax.distributed.

VERDICT r2 item 3: JobGraph -> sbatch scripts -> worker payloads ->
PYP_TPU_COORDINATOR env -> init_distributed. Reference shapes:
streampyp/jobs.py:137-345 (arrays + bundling + dependencies),
singularity.py:73-133 (ssh submission).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _write_movie(path, n=32, frames=3, seed=0):
    from pyp_tpu.io import mrc

    rng = np.random.RandomState(seed)
    mrc.write(rng.rand(frames, n, n).astype(np.float32), path)


class TestSlurmEmission:
    def test_spr_slurm_emits_submittable_arrays(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli

        for i in range(3):
            _write_movie(tmp_path / f"mov_{i}.mrc", seed=i)
        rc = cli.main(["spr", "-data_path", str(tmp_path / "mov_*.mrc"),
                       "-slurm_queue", "gpuq", "-slurm_bundle", "2",
                       "-slurm_gres", "tpu:1"])
        assert rc == 0
        sd = tmp_path / "swarm"
        swarm = (sd / "sprswarm.sbatch").read_text()
        assert "#SBATCH --array=1-2" in swarm        # 3 items, bundle 2
        assert "#SBATCH --partition=gpuq" in swarm
        assert "#SBATCH --gres=tpu:1" in swarm
        merge = (sd / "sprmerge.sbatch").read_text()
        assert "sprmerge" in merge
        # payloads: one per item + merge, slurm flags stripped, item narrowed
        p0 = json.loads((sd / "spr_00000.json").read_text())
        assert p0["mode"] == "spr"
        assert "-slurm_queue" not in p0["argv"] and "gpuq" not in p0["argv"]
        assert p0["argv"][-2:] == ["-data_path", str(tmp_path / "mov_0.mrc")]
        pm = json.loads((sd / "spr_merge.json").read_text())
        assert pm["argv"][:2] == ["-data_path", str(tmp_path / "mov_*.mrc")]
        # command lines reference the worker entry
        cmds = (sd / "sprswarm.swarm").read_text().splitlines()
        assert len(cmds) == 3 and all("pyp_tpu.cli worker" in c for c in cmds)

    def test_distributed_refine_script(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from pyp_tpu import cli

        rc = cli.main(["refine", "-slurm_queue", "q", "-slurm_nodes", "2"])
        assert rc == 0
        script = (tmp_path / "swarm" / "refinedist.sbatch").read_text()
        assert "#SBATCH --nodes=2" in script
        assert "#SBATCH --ntasks=2" in script
        assert "PYP_TPU_COORDINATOR=" in script
        assert "PYP_TPU_PROC_ID=$SLURM_PROCID" in script
        assert "srun" in script
        payload = json.loads(
            (tmp_path / "swarm" / "refine_dist.json").read_text())
        assert not any(a.startswith("-slurm") for a in payload["argv"])

    def test_worker_env_blocks_resubmission(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("PYP_TPU_WORKER", "1")
        from pyp_tpu.sched import bridge

        assert not bridge.slurm_requested({"slurm_queue": "q"})

    def test_strip_slurm_flags(self):
        from pyp_tpu.sched import bridge

        argv = ["-data_path", "x/*.mrc", "-slurm_queue", "gpuq",
                "-slurm_submit", "-refine_dang", "5", "-slurm_nodes", "4"]
        assert bridge.strip_slurm_flags(argv) == [
            "-data_path", "x/*.mrc", "-refine_dang", "5"]


_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
pid, nprocs, port, data, out = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4], sys.argv[5])
sys.path.insert(0, sys.argv[6])
from pyp_tpu.parallel import init_distributed
os.environ["PYP_TPU_COORDINATOR"] = f"localhost:{port}"
os.environ["PYP_TPU_NUM_PROCS"] = str(nprocs)
os.environ["PYP_TPU_PROC_ID"] = str(pid)
assert init_distributed()
import numpy as np
from pyp_tpu.parallel.multihost import process_range, distributed_reconstruct
d = np.load(data)
lo, hi = process_range(len(d["stack"]))
outv = distributed_reconstruct(
    d["stack"][lo:hi], d["poses"][lo:hi], d["ctf"][lo:hi], 1.0,
    subset=d["subset"][lo:hi], batch=64)
if pid == 0:
    np.savez(out, volume=np.asarray(outv.volume),
             half1=np.asarray(outv.half1))
"""


class TestTwoProcessDistributed:
    @pytest.mark.slow
    def test_matches_single_process(self, tmp_path):
        import jax.numpy as jnp

        from pyp_tpu.core.filters import lowpass_filter_3d, soft_spherical_mask
        from pyp_tpu.core.geometry import euler_to_matrix
        from pyp_tpu.ops import fourier_slice as fs
        from pyp_tpu.ops import reconstruct as rec

        n, B = 32, 48
        rng = np.random.RandomState(0)
        vol = rng.randn(n, n, n).astype(np.float32)
        vol *= np.asarray(soft_spherical_mask(n, n * 0.35, 3.0))
        vol = np.array(lowpass_filter_3d(jnp.asarray(vol), 1.0, 4.0))
        phi = rng.uniform(0, 360, B).astype(np.float32)
        theta = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
        psi = rng.uniform(0, 360, B).astype(np.float32)
        poses = np.stack([phi, theta, psi,
                          np.zeros(B, np.float32), np.zeros(B, np.float32)], 1)
        df = rng.uniform(10000, 20000, B).astype(np.float32)
        ctf = np.stack([df, df, np.zeros(B), np.zeros(B)], 1).astype(np.float32)
        Fv = fs.volume_to_fourier(jnp.asarray(vol))
        R = euler_to_matrix(jnp.asarray(phi), jnp.asarray(theta),
                            jnp.asarray(psi))
        imgs = np.asarray(fs.fourier_to_image(fs.project(Fv, R, n), n))
        subset = np.arange(B) % 2

        single = rec.reconstruct(imgs, poses, ctf, 1.0, subset=subset,
                                 batch=64)
        v_single = np.asarray(single.volume)

        data = tmp_path / "data.npz"
        np.savez(data, stack=imgs, poses=poses, ctf=ctf, subset=subset)
        out = tmp_path / "dist.npz"
        script = tmp_path / "worker.py"
        script.write_text(_WORKER)
        with socket.socket() as s:
            s.bind(("", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS",)}
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port),
             str(data), str(out), str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in (0, 1)]
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        assert all(p.returncode == 0 for p in procs), "\n".join(outs)
        dist = np.load(out)
        v_dist = dist["volume"]
        scale = np.abs(v_single).max()
        assert np.abs(v_dist - v_single).max() < 1e-3 * scale
