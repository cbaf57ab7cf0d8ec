"""Environment introspection: git state + CPU model (reference utils/git.py,
utils/cpu.py analogs).

Both read the filesystem directly — no `git` binary or subprocess — so they
work in minimal containers; results feed `yolo-tpu checks`
(utils/checks.py collect_system_info).
"""

from __future__ import annotations

import platform
import re
from pathlib import Path

__all__ = ["GitRepo", "CPUInfo", "TPUInfo"]


class GitRepo:
    """Read-only git metadata from the .git directory (reference git.py:9).

    Resolves worktree-style `.git` *files* (gitdir: pointers), symbolic HEAD
    refs, loose ref files and packed-refs — enough to report
    branch/commit/origin without invoking git.
    """

    def __init__(self, path: str | Path | None = None):
        start = Path(path) if path else Path(__file__).resolve()
        self.root: Path | None = None
        self.gitdir: Path | None = None
        for p in [start, *start.parents]:
            g = p / ".git"
            if g.is_dir():
                self.root, self.gitdir = p, g
                break
            if g.is_file():  # worktree/submodule: ".git" is a pointer file
                target = g.read_text().partition("gitdir:")[2].strip()
                if target:
                    self.root, self.gitdir = p, (p / target).resolve()
                break

    @property
    def is_repo(self) -> bool:
        return self.gitdir is not None

    def _read(self, rel: str) -> str | None:
        try:
            return (self.gitdir / rel).read_text().strip()  # type: ignore[operator]
        except (OSError, TypeError):
            return None

    def _resolve_ref(self, ref: str) -> str | None:
        """ref name -> commit sha, via loose ref file then packed-refs."""
        loose = self._read(ref)
        if loose:
            return loose
        packed = self._read("packed-refs") or ""
        for line in packed.splitlines():
            if line.endswith(" " + ref):
                return line.split(" ", 1)[0]
        return None

    @property
    def branch(self) -> str | None:
        head = self._read("HEAD")
        if head and head.startswith("ref:"):
            return head.split("/", 2)[-1]
        return None  # detached HEAD

    @property
    def commit(self) -> str | None:
        head = self._read("HEAD")
        if head is None:
            return None
        if head.startswith("ref:"):
            return self._resolve_ref(head.split(None, 1)[1])
        return head  # detached: HEAD holds the sha itself

    @property
    def origin(self) -> str | None:
        cfg = self._read("config") or ""
        in_origin = False
        for line in cfg.splitlines():
            s = line.strip()
            if s.startswith("["):
                in_origin = s.replace('"', "") == "[remote origin]"
            elif in_origin and s.startswith("url"):
                return s.split("=", 1)[1].strip()
        return None


class CPUInfo:
    """Human-readable CPU model string (reference cpu.py:12)."""

    @staticmethod
    def name() -> str:
        try:
            text = Path("/proc/cpuinfo").read_text()
            m = re.search(r"model name\s*:\s*(.+)", text)
            if m:
                return CPUInfo._clean(m.group(1))
        except OSError:
            pass
        return platform.processor() or platform.machine() or "unknown"

    @staticmethod
    def _clean(s: str) -> str:
        """Strip trademark/frequency noise: 'Intel(R) Xeon(R) CPU @ 2.20GHz'
        -> 'Intel Xeon 2.20GHz'."""
        s = re.sub(r"\((?:R|TM|r|tm)\)|CPU|Processor", "", s)
        s = re.sub(r"\s*@\s*", " ", s)
        return re.sub(r"\s+", " ", s).strip()

    def __str__(self) -> str:
        return self.name()


class TPUInfo:
    """Accelerator inventory + idle-device selection (reference
    utils/autodevice.py GPUInfo, TPU-native).

    The reference queries NVML for per-GPU utilization/memory and picks the
    most idle cards. The JAX analog reads ``device.memory_stats()`` (HBM
    bytes_in_use / bytes_limit) for every local accelerator and ranks by
    free HBM — the metric that actually gates placement on TPUs.
    """

    def __init__(self) -> None:
        self.device_stats: list[dict] = []
        self.refresh_stats()

    def refresh_stats(self) -> None:
        """Re-query every local non-CPU JAX device; never raises."""
        self.device_stats = []
        try:
            import jax

            for d in jax.local_devices():
                if d.platform == "cpu":
                    continue
                stats = {}
                try:
                    stats = d.memory_stats() or {}
                except Exception:
                    pass
                limit = int(stats.get("bytes_limit", 0))
                used = int(stats.get("bytes_in_use", 0))
                self.device_stats.append({
                    "index": d.id,
                    "name": getattr(d, "device_kind", d.platform),
                    "platform": d.platform,
                    "memory_total": limit,
                    "memory_used": used,
                    "memory_free": max(limit - used, 0),
                })
        except Exception:
            pass

    def print_status(self) -> None:
        """Compact per-device table like the reference's print_status."""
        from fce_yolo_tpu.utils.logger import LOGGER

        if not self.device_stats:
            LOGGER.info("TPUInfo: no accelerator devices visible")
            return
        for s in self.device_stats:
            gib = 1 << 30
            LOGGER.info(
                f"  device {s['index']}: {s['name']} "
                f"({s['memory_used'] / gib:.2f}/{s['memory_total'] / gib:.2f} GiB HBM used)")

    def select_idle_device(self, count: int = 1, min_memory_fraction: float = 0.0) -> list[int]:
        """Indices of the `count` devices with the most free HBM.

        Devices whose free fraction is below ``min_memory_fraction`` are
        excluded (reference select_idle_gpu semantics).
        """
        self.refresh_stats()
        ok = [s for s in self.device_stats
              if not s["memory_total"] or s["memory_free"] >= min_memory_fraction * s["memory_total"]]
        ok.sort(key=lambda s: s["memory_free"], reverse=True)
        return [s["index"] for s in ok[:count]]
