"""checks / settings / autobatch / logger utilities."""

from pathlib import Path

import numpy as np
import pytest

from fce_yolo_tpu.utils.checks import check_imgsz, check_version


def test_check_imgsz():
    assert check_imgsz(640) == 640
    assert check_imgsz(641) == 672
    assert check_imgsz([100, 200], stride=32) == [128, 224]
    assert check_imgsz(10, stride=32) == 32


def test_check_version():
    assert check_version("2.1.0", ">=2.0")
    assert not check_version("1.9", ">=2.0")
    assert check_version("1.2.3", "==1.2.3")
    assert check_version("1.2.3", "")


def test_settings_manager(tmp_path):
    from fce_yolo_tpu.utils.settings import SettingsManager

    p = tmp_path / "settings.json"
    s = SettingsManager(p)
    assert p.exists() and s["runs_dir"] == "runs"
    s.update(runs_dir="elsewhere")
    s2 = SettingsManager(p)
    assert s2["runs_dir"] == "elsewhere"
    with pytest.raises(KeyError):
        s.update(bogus=1)
    s2.reset()
    assert SettingsManager(p)["runs_dir"] == "runs"


def test_autobatch_scaling():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.utils.autobatch import autobatch, device_memory_bytes

    assert device_memory_bytes() > 1e9

    def make_fn(b):
        return lambda x: (x @ x.transpose(0, 2, 1)).sum()

    def example(b):
        return (jax.ShapeDtypeStruct((b, 256, 256), jnp.float32),)

    b = autobatch(make_fn, example, probe_batch=4, fraction=0.5)
    assert b >= 4 and (b & (b - 1)) == 0  # power of two


def test_profile_and_system_logger():
    import time

    from fce_yolo_tpu.utils.logger import Profile, SystemLogger

    with Profile() as t:
        time.sleep(0.01)
    assert 0.005 < t.t < 1.0
    snap = SystemLogger().snapshot()
    assert "time" in snap and "ram_used_frac" in snap


def test_jsonl_sink(tmp_path):
    import json

    from fce_yolo_tpu.utils.callbacks import CallbackList
    from fce_yolo_tpu.utils.integrations import JSONLSink

    cbs = CallbackList()
    JSONLSink(str(tmp_path / "metrics.jsonl")).register(cbs)
    cbs.fire("on_pretrain_routine_end", trainer=None)
    cbs.fire("on_fit_epoch_end", trainer=None, epoch=0, metrics={"loss": 1.5, "mAP50": 0.2})
    cbs.fire("on_fit_epoch_end", trainer=None, epoch=1, metrics={"loss": 1.2, "mAP50": 0.3})
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["event"] == "start"
    assert lines[1] == {"epoch": 0, "loss": 1.5, "mAP50": 0.2}
    assert lines[2]["loss"] == 1.2


def test_mlflow_file_sink(tmp_path):
    """The sink writes the mlflow FILE-STORE layout (meta.yaml + params/ +
    metrics/ '<ts> <value> <step>' lines) that `mlflow ui` can open —
    reference utils/callbacks/mlflow.py contract with zero dependencies."""
    from types import SimpleNamespace

    from fce_yolo_tpu.utils.callbacks import CallbackList
    from fce_yolo_tpu.utils.integrations import MLflowFileSink

    cbs = CallbackList()
    sink = MLflowFileSink(str(tmp_path / "mlruns"))
    sink.register(cbs)
    trainer = SimpleNamespace(cfg=SimpleNamespace(lr0=0.01, epochs=3, model="yolo11n"))
    cbs.fire("on_pretrain_routine_end", trainer=trainer)
    cbs.fire("on_fit_epoch_end", trainer=trainer, epoch=0, metrics={"metrics/mAP50-95(B)": 0.4})
    cbs.fire("on_fit_epoch_end", trainer=trainer, epoch=1, metrics={"metrics/mAP50-95(B)": 0.5})
    cbs.fire("on_train_end", trainer=trainer)

    run_dir = sink.run_dir
    assert (run_dir / "meta.yaml").exists()
    assert (run_dir / "params" / "lr0").read_text() == "0.01"
    rows = (run_dir / "metrics" / "metrics_mAP50-95B").read_text().splitlines()
    assert len(rows) == 2
    ts, val, step = rows[1].split()
    assert float(val) == 0.5 and step == "1"
    assert "end_time: null" not in (run_dir / "meta.yaml").read_text()


# ---------------------------------------------------------------- utils.files
def test_increment_path(tmp_path):
    from fce_yolo_tpu.utils.files import increment_path

    p = tmp_path / "train"
    assert increment_path(p) == p  # free slot: unchanged
    p.mkdir()
    p2 = increment_path(p)
    assert p2 == tmp_path / "train2"
    assert increment_path(p, exist_ok=True) == p  # resume semantics
    p2.mkdir()
    assert increment_path(p) == tmp_path / "train3"
    # file paths keep their suffix
    f = tmp_path / "r.csv"
    f.write_text("x")
    assert increment_path(f).name == "r2.csv"
    made = increment_path(tmp_path / "new" / "dir", mkdir=True)
    assert made.is_dir()


def test_file_size_and_latest_run(tmp_path):
    from fce_yolo_tpu.utils.files import file_size, get_latest_run

    f = tmp_path / "blob.bin"
    f.write_bytes(b"0" * (1 << 20))
    assert file_size(f) == pytest.approx(1.0)
    assert file_size(tmp_path) >= 1.0
    assert file_size(tmp_path / "missing") == 0.0

    (tmp_path / "a" / "weights" / "last").mkdir(parents=True)
    (tmp_path / "a" / "weights" / "last" / "meta.json").write_text("{}")
    assert get_latest_run(str(tmp_path)).endswith("a/weights/last")
    assert get_latest_run(str(tmp_path / "nothing")) == ""


def test_working_directory_and_spaces(tmp_path):
    import os

    from fce_yolo_tpu.utils.files import WorkingDirectory, spaces_in_path

    before = os.getcwd()
    with WorkingDirectory(tmp_path):
        assert os.getcwd() == str(tmp_path.resolve())
    assert os.getcwd() == before

    d = tmp_path / "with space"
    d.mkdir()
    (d / "x.txt").write_text("1")
    with spaces_in_path(d) as clean:
        assert " " not in str(clean) and (Path(clean) / "x.txt").exists()
        (Path(clean) / "y.txt").write_text("2")
    assert (d / "y.txt").exists()  # synced back


def test_unicode_safe_image_io(tmp_path):
    """imread/imwrite round-trip through non-ASCII (CJK) paths — the fork's
    user base (reference utils/patches.py:14-70)."""
    import cv2

    from fce_yolo_tpu.utils.patches import imread, imwrite

    img = np.random.RandomState(0).randint(0, 255, (32, 48, 3), np.uint8)
    p = tmp_path / "图像目录"
    p.mkdir()
    f = p / "测试_imagé.png"
    assert imwrite(f, img)
    back = imread(f)
    assert back is not None and back.shape == img.shape
    np.testing.assert_array_equal(back, img)  # png lossless
    assert imread(tmp_path / "missing.png") is None
    # dataset pipeline reads through the same wrapper
    from fce_yolo_tpu.data.dataset import YOLODataset  # noqa: F401  (import check)


class TestSysinfo:
    """GitRepo/CPUInfo (reference utils/git.py, utils/cpu.py analogs)."""

    def test_gitrepo_reads_this_repo(self):
        from fce_yolo_tpu.utils.sysinfo import GitRepo

        repo = GitRepo("/root/repo/fce_yolo_tpu")
        assert repo.is_repo
        assert repo.branch == "main"
        assert repo.commit and len(repo.commit) == 40

    def test_gitrepo_synthetic(self, tmp_path):
        from fce_yolo_tpu.utils.sysinfo import GitRepo

        g = tmp_path / "proj" / ".git"
        (g / "refs" / "heads").mkdir(parents=True)
        (g / "HEAD").write_text("ref: refs/heads/dev\n")
        # packed ref resolution path (no loose file)
        (g / "packed-refs").write_text(
            "# pack-refs with: peeled\nabc123 refs/heads/dev\n")
        (g / "config").write_text(
            '[remote "origin"]\n\turl = https://example.com/x.git\n')
        repo = GitRepo(tmp_path / "proj" / "src")
        assert repo.branch == "dev"
        assert repo.commit == "abc123"
        assert repo.origin == "https://example.com/x.git"
        assert not GitRepo(tmp_path).is_repo or (tmp_path / ".git").exists()

    def test_cpuinfo_clean(self):
        from fce_yolo_tpu.utils.sysinfo import CPUInfo

        assert CPUInfo._clean("Intel(R) Xeon(R) CPU @ 2.20GHz") == "Intel Xeon 2.20GHz"
        assert CPUInfo.name()  # non-empty on this box


class TestEventsAndTPUInfo:
    """Events local-spool analog (reference utils/events.py) + TPUInfo
    (reference utils/autodevice.py GPUInfo)."""

    def test_events_disabled_by_default(self, tmp_path):
        from fce_yolo_tpu.utils.events import Events

        ev = Events(path=tmp_path / "events.jsonl")
        assert not ev.enabled  # sync=False default AND under pytest
        ev({"task": "detect", "mode": "train", "model": "yolo11n"})
        assert not (tmp_path / "events.jsonl").exists()

    def test_events_spool_and_rate_limit(self, tmp_path):
        import json

        from fce_yolo_tpu.utils.events import Events

        ev = Events(path=tmp_path / "events.jsonl")
        ev.enabled = True  # opt-in
        ev.rate_limit = 0.0
        ev({"task": "segment", "mode": "val", "model": "yolo11n-seg"})
        lines = (tmp_path / "events.jsonl").read_text().splitlines()
        assert len(lines) == 1
        e = json.loads(lines[0])
        assert e["name"] == "val" and e["params"]["task"] == "segment"
        assert "version" in e["params"] and "cpu" in e["params"]
        # non-standard task/mode fall back to "other" like the reference
        ev({"task": "alchemy", "mode": "transmute"})
        e2 = json.loads((tmp_path / "events.jsonl").read_text().splitlines()[-1])
        assert e2["name"] == "other" and e2["params"]["task"] == "other"
        # rate limit: queue but don't write
        ev.rate_limit = 3600.0
        ev({"task": "detect", "mode": "train"})
        assert len((tmp_path / "events.jsonl").read_text().splitlines()) == 2
        assert len(ev.events) == 1

    def test_tpuinfo_inventory_and_selection(self):
        from fce_yolo_tpu.utils.sysinfo import TPUInfo

        info = TPUInfo()  # CPU-only test env: empty inventory, no crash
        info.print_status()
        assert isinstance(info.device_stats, list)
        sel = info.select_idle_device(count=2)
        assert isinstance(sel, list) and len(sel) <= 2
        # ranking logic on synthetic stats
        info.refresh_stats = lambda: None
        info.device_stats = [
            {"index": 0, "name": "tpu", "platform": "tpu",
             "memory_total": 100, "memory_used": 90, "memory_free": 10},
            {"index": 1, "name": "tpu", "platform": "tpu",
             "memory_total": 100, "memory_used": 10, "memory_free": 90},
        ]
        assert info.select_idle_device(count=1) == [1]
        assert info.select_idle_device(count=2, min_memory_fraction=0.5) == [1]


class TestRF100Benchmark:
    """Local-checkout analog of reference RF100Benchmark (benchmarks.py:228)."""

    def _make_checkout(self, tmp_path, tiny_dataset):
        """Lay a Roboflow-style `<ds>/data.yaml` checkout over the tiny set."""
        import shutil

        import yaml as _yaml

        src = _yaml.safe_load(open(tiny_dataset))
        for name in ("ds-alpha", "ds-beta"):
            d = tmp_path / "rf-100" / name
            (d / "train").mkdir(parents=True)
            (d / "valid").mkdir(parents=True)
            root = Path(src["path"])
            shutil.copytree(root / "images" / "train", d / "train" / "images")
            shutil.copytree(root / "labels" / "train", d / "train" / "labels")
            shutil.copytree(root / "images" / "val", d / "valid" / "images")
            shutil.copytree(root / "labels" / "val", d / "valid" / "labels")
            (d / "data.yaml").write_text(
                "train: wrong/images\nval: also/wrong\n"
                "names:\n  0: circle\n  1: square\n  2: tri\n")
        return tmp_path / "rf-100"

    def test_parse_fix_and_evaluate(self, tmp_path, tiny_dataset):
        from fce_yolo_tpu.utils.benchmarks import RF100Benchmark

        bench = RF100Benchmark()
        with pytest.raises(RuntimeError, match="egress"):
            bench.set_key("k")
        root = self._make_checkout(tmp_path, tiny_dataset)
        names, cfgs = bench.parse_dataset(str(root))
        assert names == ["ds-alpha", "ds-beta"] and len(cfgs) == 2
        import yaml as _yaml
        fixed = _yaml.safe_load(cfgs[0].read_text())
        assert fixed["train"] == "train/images" and fixed["val"] == "valid/images"

        class FakeModel:  # validator contract only; e2e val is covered elsewhere
            def val(self, data, **kw):
                assert Path(data).exists()
                return {"metrics/mAP50(B)": 0.5, "metrics/mAP50-95(B)": 0.3}

        log = tmp_path / "eval.txt"
        out = bench.run(FakeModel(), str(root), str(log))
        assert out == {"ds-alpha": 0.5, "ds-beta": 0.5}
        assert log.read_text() == "ds-alpha: 0.5\nds-beta: 0.5\n"
