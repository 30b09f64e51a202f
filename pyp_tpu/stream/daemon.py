"""On-the-fly session daemon: watch, process, incrementally classify.

Rebuild of the reference's streaming layer (stream/pyp_daemon.py:65
`pyp_daemon`: watch the microscope output directory, transfer/compress new
movies, launch per-file processing; stream/fyp_daemon.py:765 `fyp_daemon`:
accumulate new particles and update 2D classes incrementally). Single
process, poll-based; each new file runs the same per-micrograph pipeline as
batch mode, and every `classify_every` new micrographs the accumulated
particle stack is re-classified with class averages warm-started from the
previous pass.
"""

from __future__ import annotations

import glob
import time
from pathlib import Path

import numpy as np

from pyp_tpu.utils import get_logger

logger = get_logger("stream")


class SessionDaemon:
    def __init__(self, watch_pattern: str, params: dict, work_dir=".",
                 poll_interval: float = 5.0, classify_every: int = 0,
                 n_classes: int = 10):
        self.watch_pattern = watch_pattern
        self.params = params
        self.work_dir = Path(work_dir)
        self.poll_interval = poll_interval
        # class2d tab streaming thresholds ([tabs.class2d], the fyp_daemon
        # accumulation contract): enable switches incremental 2D on, `min`
        # particles gate the first run, `inc` new particles space re-runs
        self.class2d_enable = bool(params.get("class2d_enable"))
        if self.class2d_enable and not classify_every:
            classify_every = 1  # particle thresholds drive the cadence
        self.classify_every = classify_every
        self.classify_min_particles = int(params.get("class2d_min") or 0)
        self.classify_inc_particles = int(params.get("class2d_inc") or 0)
        self._last_classify_particles = 0
        self.n_classes = int(params.get("class2d_num")
                             or params.get("stream_classes") or n_classes)
        self.processed: set[str] = set()
        self._settle: dict = {}  # path -> consecutive stable-size polls
        self.summaries: list[dict] = []
        self._last_classify_count = 0
        self.class_result = None
        from pyp_tpu.stream.params import ParamsWatcher

        # live-retune protocol: the web platform (or operator) can drop/
        # update a session params file; changes merge in between polls
        # (streampyp/params.py role)
        self._params_watcher = ParamsWatcher(work_dir)
        # session metadata store (streampyp metadb daemon role)
        self.metadb = None
        self._db_ids = (str(params.get("stream_group") or "group"),
                        str(params.get("data_set") or "session"))
        uri = str(params.get("stream_metadb") or "")
        if uri:
            from pyp_tpu.stream.metadb import MetaDB

            self.metadb = MetaDB(uri)
            self.metadb.write_session(*self._db_ids, {
                "pattern": watch_pattern, "status": "running",
            })

    def scan(self):
        """New files, oldest first, skipping ones still being written
        (size must be stable across two stats)."""
        new = []
        for path in sorted(glob.glob(self.watch_pattern)):
            if path in self.processed:
                continue
            p = Path(path)
            try:
                s1 = p.stat().st_size
                time.sleep(0.01)
                s2 = p.stat().st_size
            except FileNotFoundError:
                continue
            if s1 != s2 or s1 == 0:
                self._settle.pop(path, None)
                continue  # still transferring
            need = int(self.params.get("stream_settle_polls") or 1)
            seen = self._settle.get(path, 0) + 1
            if seen < need:
                self._settle[path] = seen
                continue  # stable, but not for long enough yet
            self._settle.pop(path, None)
            new.append(path)
        return new

    def process_one(self, path: str) -> dict:
        # transfer step (reference pyp_daemon: move off the microscope-side
        # watch dir before touching the data, stream/pyp_daemon.py:65)
        tdir = str(self.params.get("stream_transfer_dir") or "")
        if tdir:
            import shutil

            src_size = Path(path).stat().st_size
            Path(tdir).mkdir(parents=True, exist_ok=True)
            dst = Path(tdir) / Path(path).name
            # move/copy/link (reference stream tab transfer_operation;
            # link keeps the microscope-side copy and costs no IO)
            op = str(self.params.get("stream_transfer_operation") or "move")
            if op == "copy":
                shutil.copy2(path, dst)
            elif op == "link":
                if dst.exists():
                    dst.unlink()
                try:
                    dst.hardlink_to(path)
                except OSError:  # cross-device: fall back to symlink
                    dst.symlink_to(Path(path).resolve())
            else:
                shutil.move(path, dst)
            if (self.params.get("stream_transfer_verify")
                    and dst.stat().st_size != src_size):
                raise OSError(
                    f"transfer verification failed for {dst}: "
                    f"{dst.stat().st_size} != {src_size} bytes")
            path = str(dst)
        item = {"name": Path(path).stem, "path": path}
        # session mode (data_mode): tomo sessions assemble + process a
        # tilt-series per mdoc (or by file count when the session declares
        # its tilt scheme up front); spr sessions preprocess one micrograph
        num_tilts = int(self.params.get("stream_num_tilts") or 1)
        if (str(self.params.get("data_mode") or "spr") == "tomo"
                and path.endswith(".mdoc")):
            from pyp_tpu.pipeline import tomo as tomo_pipe

            item.update(tomo_pipe.assemble_tilt_series(path, self.params))
            summary = tomo_pipe.process_tilt_series(
                item, self.params, self.work_dir)
        elif (str(self.params.get("data_mode") or "spr") == "tomo"
              and num_tilts > 1):
            # mdoc-less session: the scheme comes from the session params
            # (reference stream tab num_tilts / tilt_angles / tilt_order)
            done = self._collect_tilt(path, num_tilts)
            if done is None:
                self.processed.add(path)
                return {"name": item["name"], "pending_tilts": True}
            from pyp_tpu.pipeline import tomo as tomo_pipe

            summary = tomo_pipe.process_tilt_series(
                done, self.params, self.work_dir)
        else:
            from pyp_tpu.pipeline import spr

            summary = spr.process_micrograph(item, self.params, self.work_dir)
        self.processed.add(path)
        self.summaries.append(summary)
        if self.metadb is not None:
            self.metadb.write_micrograph(*self._db_ids, item["name"], {
                k: v for k, v in summary.items()
                if isinstance(v, (int, float, str, bool))
            })
        if self.params.get("stream_compress") and Path(path).suffix in (
                ".mrc", ".tif", ".tiff", ".dm4"):
            # archive the raw movie (the reference's pbzip2 compression,
            # inout/image/core.py:1338); load_movie reads .bz2 directly
            import bz2

            with open(path, "rb") as f_in, bz2.open(path + ".bz2", "wb",
                                                    compresslevel=1) as f_out:
                f_out.write(f_in.read())
            Path(path).unlink()
        logger.info("stream: processed %s (%d particles)", item["name"],
                    summary.get("particles", 0))
        return summary

    def _collect_tilt(self, path: str, num_tilts: int):
        """Accumulate mdoc-less session tilts; return the assembled item
        once a series has all `num_tilts` files, else None. Series key =
        file stem with its trailing tilt counter stripped; angles come
        from stream_tilt_angles, acquisition order from stream_tilt_order
        (base-0, maps arrival order -> angle index)."""
        import re

        if not hasattr(self, "_pending_tilts"):
            self._pending_tilts = {}
        key = re.sub(r"[_\-][0-9]+$", "", Path(path).stem)
        group = self._pending_tilts.setdefault(key, [])
        group.append(path)
        if len(group) < num_tilts:
            logger.info("stream: %s tilt %d/%d collected", key,
                        len(group), num_tilts)
            return None
        del self._pending_tilts[key]
        angles_raw = str(self.params.get("stream_tilt_angles") or "")
        if angles_raw:
            angles = np.asarray([float(a) for a in angles_raw.split(",")],
                                dtype=np.float32)[:num_tilts]
        else:  # symmetric scheme fallback
            angles = np.linspace(-60.0, 60.0, num_tilts).astype(np.float32)
        order_raw = str(self.params.get("stream_tilt_order") or "")
        order = ([int(o) for o in order_raw.split(",")][:num_tilts]
                 if order_raw else list(range(num_tilts)))
        from pyp_tpu.pipeline.spr import load_movie

        tilt_imgs = [None] * num_tilts
        tilt_angles = [0.0] * num_tilts
        for arrival, p in enumerate(group):
            idx = order[arrival] if arrival < len(order) else arrival
            frames = load_movie(p, self.params)
            tilt_imgs[idx] = np.asarray(frames, dtype=np.float32).mean(0)
            tilt_angles[idx] = float(angles[idx]) if idx < len(angles) else 0.0
        srt = np.argsort(np.asarray(tilt_angles))
        stack = np.stack([tilt_imgs[i] for i in srt])
        return {"name": key, "tilts": stack,
                "angles": np.asarray(tilt_angles, dtype=np.float32)[srt],
                "order": np.asarray(srt, dtype=np.float32)}

    def maybe_classify(self):
        """Incremental 2D classification over everything processed so far
        (the fyp_daemon role)."""
        if not self.classify_every:
            return None
        if len(self.summaries) - self._last_classify_count < self.classify_every:
            return None
        total_particles = sum(s.get("particles", 0) or 0
                              for s in self.summaries)
        if self.class2d_enable:
            if total_particles < self.classify_min_particles:
                return None
            if (self.classify_inc_particles and self._last_classify_particles
                    and total_particles - self._last_classify_particles
                    < self.classify_inc_particles):
                return None
        from pyp_tpu.pipeline import spr as spr_pipe
        from pyp_tpu.ops import refine2d
        from pyp_tpu.pipeline.refine import table_to_ctf_params

        items = [{"name": s["name"]} for s in self.summaries]
        stack, table = spr_pipe.extract_stack(items, self.params, self.work_dir,
                                              out_stack="stream_stack.mrc")
        if stack is None or len(stack) < max(
                self.n_classes * 2, self.classify_min_particles):
            return None
        res = refine2d.classify2d(
            stack, table_to_ctf_params(table), self.n_classes,
            float(self.params["scope_pixel"]),
            iters=3 if self.class_result is not None else 6,
            high_res=float(self.params.get("class_rhcls") or 10.0),
        )
        self.class_result = res
        self._last_classify_count = len(self.summaries)
        self._last_classify_particles = total_particles
        from pyp_tpu.analysis.plots import class_montage

        montage_path = self.work_dir / "stream_classes.png"
        class_montage(np.asarray(res.class_avgs), montage_path,
                      occupancy=np.asarray(res.occupancy))
        # website contact-sheet push (the fyp_daemon montage update,
        # stream/fyp_daemon.py:406/:1268 -> Web.write_classes); the Web
        # client journals when no host is configured
        if not hasattr(self, "_web"):
            from pyp_tpu.stream.web import Web

            self._web = Web(
                host=str(self.params.get("web_host") or "") or None,
                token=str(self.params.get("web_token") or "") or None)
        self._web.write_classes(
            str(self.params.get("data_set") or "session"),
            montage_path, np.asarray(res.occupancy).tolist())
        if self.metadb is not None:
            self.metadb.write_twod_classes(*self._db_ids, {
                "n_classes": int(self.n_classes),
                "occupancy": np.asarray(res.occupancy).tolist(),
                "particles": int(len(stack)),
            })
        logger.info("stream: updated %d classes from %d particles",
                    self.n_classes, len(stack))
        return res

    def run(self, max_iterations: int | None = None, idle_exit: int | None = None):
        """Poll loop. max_iterations/idle_exit bound the loop for testing and
        for session end detection (the reference's daemon timeout)."""
        idle = 0
        it = 0
        while True:
            updates = self._params_watcher.refresh()
            if updates:
                self.params = {**self.params, **updates}
                if "class_num" in updates:
                    self.n_classes = int(updates["class_num"])
                logger.info("stream: live params update (%d keys)",
                            len(updates))
            min_free = float(self.params.get("stream_min_free_gb") or 0.0)
            if min_free > 0:
                import shutil as _shutil

                free_gb = _shutil.disk_usage(self.work_dir).free / 2**30
                if free_gb < min_free:
                    # disk guard (reference pyp_daemon space check): leave
                    # arrivals in the watch dir until space is recovered
                    logger.warning(
                        "stream: %.1f GB free < stream_min_free_gb=%.1f — "
                        "pausing ingest", free_gb, min_free)
                    time.sleep(self.poll_interval)
                    it += 1
                    if max_iterations is not None and it >= max_iterations:
                        break
                    continue
            new = self.scan()
            if new:
                idle = 0
                for path in new:
                    try:
                        self.process_one(path)
                    except Exception as e:  # noqa: BLE001
                        logger.warning("stream: failed on %s: %s", path, e)
                        self.processed.add(path)  # don't retry forever
                self.maybe_classify()
            else:
                idle += 1
                if idle_exit is not None and idle >= idle_exit:
                    break
                time.sleep(self.poll_interval)
            it += 1
            if max_iterations is not None and it >= max_iterations:
                break
        return self.summaries
