"""Progress bar (utils/tqdm.py, reference utils/tqdm.py:18 analog)."""

import io
import time

from fce_yolo_tpu.utils import TQDM


class _Tty(io.StringIO):
    def isatty(self):
        return True


def test_iterates_and_counts():
    out = io.StringIO()
    assert list(TQDM(range(5), file=out)) == list(range(5))


def test_tty_renders_carriage_return_bar():
    out = _Tty()
    bar = TQDM(total=10, desc="cache", unit="img", file=out, mininterval=0.0)
    for _ in range(10):
        bar.update(1)
    bar.close()
    s = out.getvalue()
    assert "\r" in s and "cache:" in s and "100%" in s and "█" in s
    assert "10/10" in s and "img/s" in s


def test_noninteractive_is_sparse():
    out = io.StringIO()  # isatty() False -> log mode
    bar = TQDM(total=1000, file=out)
    for _ in range(1000):
        bar.update(1)
    bar.close()
    lines = [l for l in out.getvalue().splitlines() if l]
    # every-10%-or-30s throttle: far fewer lines than updates, no \r
    assert 0 < len(lines) <= 12
    assert "\r" not in out.getvalue()


def test_unknown_total_and_postfix():
    out = _Tty()
    with TQDM(desc="scan", file=out, mininterval=0.0) as bar:
        bar.update(3)
        bar.set_postfix(loss=0.25)
        bar.update(1)
        bar.set_description("scan2")
        bar.refresh()
    s = out.getvalue()
    assert "4it" in s and "loss=0.25" in s and "scan2" in s
    assert "%" not in s  # no percentage without a total


def test_disable_silences():
    out = _Tty()
    for _ in TQDM(range(3), disable=True, file=out):
        pass
    assert out.getvalue() == ""


def test_rate_and_eta_format():
    out = _Tty()
    bar = TQDM(total=4, file=out, mininterval=0.0)
    bar._start = time.perf_counter() - 2.0  # pretend 2s elapsed
    bar.update(2)
    bar.close()
    assert "00:02<" in out.getvalue()  # elapsed<eta timing block
