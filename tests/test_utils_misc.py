"""checks / settings / autobatch / logger utilities."""

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
