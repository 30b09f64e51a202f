"""DM4 codec round-trip and web RPC client tests."""

import numpy as np

from pyp_tpu.io import dm
from pyp_tpu.stream.web import Web


class TestDM4:
    def test_roundtrip_2d(self, tmp_path):
        data = (np.random.RandomState(0).rand(24, 36) * 1000).astype(np.float32)
        p = tmp_path / "img.dm4"
        dm.write_dm4(data, p)
        back = dm.read(p)
        assert back.shape == data.shape
        np.testing.assert_allclose(back, data)

    def test_roundtrip_int16(self, tmp_path):
        data = (np.random.RandomState(1).rand(16, 16) * 100).astype(np.int16)
        p = tmp_path / "img16.dm4"
        dm.write_dm4(data, p)
        np.testing.assert_array_equal(dm.read(p), data)

    def test_roundtrip_stack(self, tmp_path):
        data = np.random.RandomState(2).rand(3, 8, 12).astype(np.float32)
        p = tmp_path / "stack.dm4"
        dm.write_dm4(data, p)
        assert dm.read(p).shape == (3, 8, 12)


class TestWeb:
    def test_inactive_noop_journal(self, monkeypatch):
        monkeypatch.delenv("PYP_TPU_WEBHOST", raising=False)
        web = Web()
        assert not web.exists
        web.slurm_started(42)
        web.write_micrograph("mic1", {"particles": 10, "df1": np.float32(21000.0)})
        web.write_reconstruction("ds", 3, 4.5, fsc=np.linspace(1, 0, 5))
        assert len(web.sent) == 3
        # numpy values are jsonable in the journal
        import json

        json.dumps(web.sent)

    def test_active_posts_to_host(self, monkeypatch):
        # spin an in-process HTTP server to receive the RPC
        import http.server
        import threading

        received = []

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                received.append(self.rfile.read(n))
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"result": "ok"}')

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            web = Web(host=f"http://127.0.0.1:{srv.server_port}")
            out = web.log("hello from pyp_tpu")
            assert out == {"result": "ok"}
            assert b"hello from pyp_tpu" in received[0]
        finally:
            srv.shutdown()


class TestEER:
    def test_bitstream_roundtrip(self):
        from pyp_tpu.io import eer

        rng = np.random.RandomState(0)
        size = 256
        frame = (rng.rand(size, size) < 0.01).astype(np.uint16)  # sparse events
        raw = eer.encode_frame(frame)
        back = eer.decode_frame(raw, eer.COMPRESSION_EER7, size, upsampling=1)
        np.testing.assert_array_equal(back, frame)

    def test_eer8_variant(self):
        from pyp_tpu.io import eer

        rng = np.random.RandomState(1)
        size = 128
        frame = (rng.rand(size, size) < 0.02).astype(np.uint16)
        raw = eer.encode_frame(frame, compression=eer.COMPRESSION_EER8)
        back = eer.decode_frame(raw, eer.COMPRESSION_EER8, size)
        np.testing.assert_array_equal(back, frame)

    def test_upsampled_rendering_conserves_counts(self):
        from pyp_tpu.io import eer

        rng = np.random.RandomState(2)
        size = 128
        frame = (rng.rand(size, size) < 0.02).astype(np.uint16)
        raw = eer.encode_frame(frame)
        up = eer.decode_frame(raw, eer.COMPRESSION_EER7, size, upsampling=2)
        assert up.shape == (256, 256)
        assert up.sum() == frame.sum()


class TestMetaDB:
    def test_file_store_crud(self, tmp_path):
        from pyp_tpu.stream.metadb import MetaDB

        db = MetaDB(str(tmp_path / "meta.json"))
        db.write_session("g", "s1", {"status": "running"})
        assert db.get_session("g", "s1")["status"] == "running"
        db.write_micrograph("g", "s1", "m001", {"particles": 42, "ctf": 3.2})
        db.write_micrograph("g", "s1", "m002", {"particles": 7})
        db.write_micrograph("g", "s2", "m001", {"particles": 1})
        assert db.count_micrographs("g", "s1") == 2
        assert [m["particles"] for m in db.micrographs("g", "s1")] == [42, 7]
        db.write_twod_classes("g", "s1", {"n_classes": 10, "occupancy": [1.0]})
        assert db.get_twod_classes("g", "s1")["n_classes"] == 10
        db.delete_micrographs("g", "s1")
        assert db.count_micrographs("g", "s1") == 0
        assert db.count_micrographs("g", "s2") == 1
        # persistence across re-open
        db2 = MetaDB(str(tmp_path / "meta.json"))
        assert db2.get_session("g", "s1")["status"] == "running"

    def test_daemon_pushes_to_metadb(self, tmp_path, monkeypatch):
        import numpy as np

        from pyp_tpu.io import mrc
        from pyp_tpu.stream.daemon import SessionDaemon
        from pyp_tpu.stream.metadb import MetaDB

        monkeypatch.chdir(tmp_path)
        rng = np.random.RandomState(0)
        mrc.write(rng.randn(3, 64, 64).astype(np.float32), "a.mrc")
        from pyp_tpu.config.params import defaults

        params = defaults()
        params.update({"scope_pixel": 1.0,
                       "stream_metadb": str(tmp_path / "db.json"),
                       "data_set": "sess1", "ctf_tile": 64,
                       "detect_max": 8, "extract_box": 16})
        d = SessionDaemon("*.mrc", params, work_dir=".")
        d.run(max_iterations=1)
        db = MetaDB(str(tmp_path / "db.json"))
        assert db.count_micrographs("group", "sess1") == 1
        assert db.get_session("group", "sess1")["status"] == "running"

    def test_daemon_builds_and_pushes_class_montage(self, tmp_path,
                                                    monkeypatch):
        """Streaming contact-sheet parity (fyp_daemon montage loop,
        stream/fyp_daemon.py:406): after N new micrographs the daemon
        reclassifies, writes stream_classes.png, and pushes write_classes
        through the Web client (journaled when no host configured)."""
        import numpy as np

        from pyp_tpu.io import mrc
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        monkeypatch.delenv("PYP_TPU_WEBHOST", raising=False)
        rng = np.random.RandomState(0)
        # blobs so the picker finds particles
        for i in range(2):
            img = rng.randn(3, 96, 96).astype(np.float32)
            yy, xx = np.mgrid[:96, :96]
            for cy, cx in ((30, 30), (30, 66), (66, 30), (66, 66)):
                img -= 4.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                    / 18.0)[None]
            mrc.write(img, f"m{i}.mrc")
        from pyp_tpu.config.params import defaults

        params = defaults()
        params.update({"scope_pixel": 1.0, "data_set": "sess2",
                       "ctf_tile": 64, "detect_rad": 6.0, "detect_max": 8,
                       "extract_box": 32, "class_rhcls": 5.0,
                       "class_num": 2})
        d = SessionDaemon("*.mrc", params, work_dir=".", classify_every=2,
                          n_classes=2)
        d.run(max_iterations=1)
        assert (tmp_path / "stream_classes.png").exists()
        pushes = [s for s in d._web.sent if s.get("method") == "write_classes"]
        assert pushes, d._web.sent
        assert pushes[-1]["params"]["dataset"] == "sess2"
        assert len(pushes[-1]["params"]["occupancy"]) == 2


class TestSessionControl:
    """Control-flag protocol + retention + multi-session manager
    (reference stream/pyp_daemon.py pypd.start/stop/restart/clear and
    the per-session {group}/{name} directory contract)."""

    def _mkparams(self, tmp_path, **over):
        from pyp_tpu.config.params import defaults

        params = defaults()
        params.update({"scope_pixel": 1.0, "data_set": "s",
                       "ctf_tile": 64, "detect_max": 8, "extract_box": 16})
        params.update(over)
        return params

    def _mkmovie(self, path, seed=0, n=3, size=64):
        import numpy as np

        from pyp_tpu.io import mrc

        rng = np.random.RandomState(seed)
        mrc.write(rng.randn(n, size, size).astype(np.float32), str(path))

    def test_stop_flag_exits_and_start_flag_raised(self, tmp_path,
                                                   monkeypatch):
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        self._mkmovie("a.mrc")
        d = SessionDaemon("*.mrc", self._mkparams(tmp_path), work_dir=".")
        (tmp_path / "pypd.stop").touch()
        d.run(max_iterations=5)
        assert (tmp_path / "pypd.start").exists()
        assert not (tmp_path / "pypd.stop").exists()  # consumed
        assert len(d.summaries) == 0  # stop honored before processing

    def test_restart_flag_invalidates_changed_stage(self, tmp_path,
                                                    monkeypatch):
        """A restart flag carrying a changed ctf_* param drops the ctf
        metadata entry and reprocesses; the untouched movie alignment
        entry survives resume (parameter_force_check + clean_pkl_items)."""
        from pyp_tpu.io.metadata import ItemMetadata
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        self._mkmovie("a.mrc")
        d = SessionDaemon("*.mrc", self._mkparams(tmp_path), work_dir=".")
        d.run(max_iterations=1)
        assert len(d.summaries) == 1
        meta = ItemMetadata("a", tmp_path, mode="spr").load()
        assert "ctf" in meta.arrays
        before_ctf = float(d.summaries[0].get("ctf_df", 0.0) or 0.0)
        (tmp_path / "pypd.restart").write_text("ctf_max_res = 6.0\n")
        assert not d.check_flags()
        assert d.params["ctf_max_res"] == 6.0
        assert len(d.summaries) == 1  # reprocessed, not duplicated
        assert not (tmp_path / "pypd.restart").exists()
        _ = before_ctf  # value may legitimately match; presence is the test

    def test_clear_flag_wipes_derived_and_reprocesses(self, tmp_path,
                                                      monkeypatch):
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        self._mkmovie("a.mrc")
        d = SessionDaemon("*.mrc", self._mkparams(tmp_path), work_dir=".")
        d.run(max_iterations=1)
        assert (tmp_path / "a.meta.npz").exists()
        (tmp_path / "pypd.clear").touch()
        assert not d.check_flags()
        assert not (tmp_path / "pypd.clear").exists()
        # derived products were rebuilt by the reprocess pass
        assert (tmp_path / "a.meta.npz").exists()
        assert len(d.summaries) == 1

    def test_retention_max_items_prunes_oldest(self, tmp_path, monkeypatch):
        import os
        import time as _time

        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        for i in range(3):
            self._mkmovie(f"m{i}.mrc", seed=i)
            # stagger mtimes so "oldest" is deterministic
            t = _time.time() - (3 - i) * 3600
            os.utime(f"m{i}.mrc", (t, t))
        params = self._mkparams(tmp_path, stream_retention_max_items=2)
        d = SessionDaemon("*.mrc", params, work_dir=".")
        d.run(max_iterations=1)
        assert len(d.summaries) == 3
        assert not (tmp_path / "m0.mrc").exists()  # oldest pruned
        assert not (tmp_path / "m0.meta.npz").exists()
        assert (tmp_path / "m1.mrc").exists()
        assert (tmp_path / "m2.mrc").exists()

    def test_session_manager_multiplexes_and_ledgers(self, tmp_path,
                                                     monkeypatch):
        """Two sessions under {group}/{name} run in one manager; the
        sessions.json ledger records both; a stop flag retires one
        without touching the other."""
        import json

        from pyp_tpu.stream.daemon import SessionManager

        monkeypatch.chdir(tmp_path)
        root = tmp_path / "sessions"
        for g, s in (("krios1", "sessA"), ("krios2", "sessB")):
            sdir = root / g / s
            sdir.mkdir(parents=True)
            (sdir / "session.toml").write_text('data_path = "*.mrc"\n')
            self._mkmovie(sdir / "a.mrc")
        mgr = SessionManager(root, defaults=self._mkparams(tmp_path),
                             poll_interval=0.01)
        mgr.step()
        assert len(mgr.daemons) == 2
        mgr.step()  # process
        ledger = json.loads((root / "sessions.json").read_text())
        assert ledger["krios1/sessA"]["items"] == 1
        assert ledger["krios2/sessB"]["items"] == 1
        # retire one session
        (root / "krios1" / "sessA" / "pypd.stop").touch()
        mgr.step()
        assert ("krios1", "sessA") not in mgr.daemons
        assert ("krios2", "sessB") in mgr.daemons
        ledger = json.loads((root / "sessions.json").read_text())
        assert ledger["krios1/sessA"]["status"] == "stopped"
        assert ledger["krios2/sessB"]["status"] == "running"

    def test_clear_with_copy_transfer_does_not_double_ingest(self, tmp_path,
                                                             monkeypatch):
        """ADVICE r4: with transfer_operation=copy the watch-dir original
        survives; after pypd.clear the reprocess pass must re-mark the
        ORIGINAL processed, or the next scan() ingests every item twice
        (duplicate summaries / doubled particle counts)."""
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        (tmp_path / "raw").mkdir()
        self._mkmovie("raw/a.mrc")
        params = self._mkparams(
            tmp_path, stream_transfer_dir=str(tmp_path / "xfer"),
            stream_transfer_operation="copy")
        d = SessionDaemon("raw/*.mrc", params, work_dir=".")
        d.run(max_iterations=1)
        assert len(d.summaries) == 1
        assert (tmp_path / "raw" / "a.mrc").exists()  # copy left original
        (tmp_path / "pypd.clear").touch()
        assert not d.check_flags()
        assert len(d.summaries) == 1  # reprocessed once
        d.step()  # the regression: scan() used to re-ingest raw/a.mrc
        assert len(d.summaries) == 1

    def test_bz2_reprocess_keeps_item_name(self, tmp_path, monkeypatch):
        """ADVICE r4: stream_compress leaves foo.mrc.bz2; reprocessing it
        must keep the item name 'foo' (not drift to 'foo.mrc'), so the
        refreshed metadata bundle is the one actually consulted."""
        from pyp_tpu.stream.daemon import SessionDaemon

        monkeypatch.chdir(tmp_path)
        self._mkmovie("a.mrc")
        params = self._mkparams(tmp_path, stream_compress=True)
        d = SessionDaemon("*.mrc", params, work_dir=".")
        d.run(max_iterations=1)
        assert len(d.summaries) == 1
        assert d.summaries[0]["name"] == "a"
        # compression replaced the raw file
        assert (tmp_path / "a.mrc.bz2").exists()
        (tmp_path / "pypd.clear").touch()
        assert not d.check_flags()
        assert len(d.summaries) == 1
        assert d.summaries[0]["name"] == "a"  # no 'a.mrc' drift
        assert not (tmp_path / "a.mrc.meta.npz").exists()

    def test_session_manager_survives_bad_typed_value(self, tmp_path,
                                                      monkeypatch):
        """ADVICE r4: a session.toml with a bad typed value retires that
        session only — the manager keeps serving the healthy one."""
        from pyp_tpu.stream.daemon import SessionManager

        monkeypatch.chdir(tmp_path)
        for name, extra in (("good", ""),
                            ("bad", 'stream_classify_every = "nope"\n')):
            sdir = tmp_path / "g" / name
            sdir.mkdir(parents=True)
            self._mkmovie(sdir / "a.mrc", seed=1)
            (sdir / "session.toml").write_text(
                'data_path = "*.mrc"\n' + extra)
        mgr = SessionManager(tmp_path, self._mkparams(tmp_path))
        mgr.discover()
        assert ("g", "good") in mgr.daemons
        assert ("g", "bad") in mgr.retired
