"""File/path utilities (reference utils/files.py): run-dir incrementing,
file ages/sizes, latest-run lookup, working-directory context."""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
from datetime import datetime
from pathlib import Path

__all__ = ["increment_path", "file_age", "file_date", "file_size",
           "get_latest_run", "WorkingDirectory", "spaces_in_path"]


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "",
                   mkdir: bool = False) -> Path:
    """Increment a path to the next free runs/exp{N} slot (reference
    files.py:106): runs/train -> runs/train2, runs/train3, ... With
    ``exist_ok=True`` the path is returned unchanged (resume semantics)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path: str | Path = __file__) -> int:
    """Days since last modification (reference files.py:153)."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path: str | Path = __file__) -> str:
    """'YYYY-M-D' modification date (reference files.py:159)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path: str | Path) -> float:
    """File or directory size in MB (reference files.py:165)."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent 'last' checkpoint under search_dir, for resume=True with
    no explicit path (reference files.py:177 looks for last*.pt; here the
    checkpoint is an orbax dir holding meta.json)."""
    cands = glob.glob(f"{search_dir}/**/weights/last/meta.json", recursive=True)
    return max(cands, key=os.path.getctime).rsplit("/meta.json", 1)[0] if cands else ""


class WorkingDirectory(contextlib.ContextDecorator):
    """chdir context manager/decorator (reference files.py:15)."""

    def __init__(self, new_dir: str | Path):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, *exc):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path: str | Path):
    """If a path contains spaces, yield a space-free temp copy and sync it
    back on exit (reference files.py:57 — some tools break on spaces)."""
    if " " not in str(path):
        yield path
        return
    path = Path(path)
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            tmp_path.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(path, tmp_path)
        try:
            yield tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)
