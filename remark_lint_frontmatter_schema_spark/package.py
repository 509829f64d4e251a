"""Build the spark-submit artifact: a zip of this package for
``--py-files`` plus a minimal ``lint.py`` entry script.

The north-star deployment is ``spark-submit --py-files engine.zip
lint.py <args>`` on a multi-executor cluster (spark-submit ships the
zip to every executor's PYTHONPATH; the entry script runs on the
driver). This module is the one place that knows how to produce both::

    python -m remark_lint_frontmatter_schema_spark.package dist/

emits ``dist/engine.zip`` (the package, sources only, deterministic
ordering and timestamps so re-builds of identical sources are
byte-identical — artifact caches and content-addressed stores see ONE
object) and ``dist/lint.py`` (a three-line shim: spark-submit takes a
script path, not ``-m``).
"""

from __future__ import annotations

import os
import sys
import zipfile

_SHIM = """\
#!/usr/bin/env python
\"\"\"spark-submit entry shim: spark-submit wants a script path, not -m.
Usage: spark-submit --py-files engine.zip lint.py <cli args>\"\"\"
import sys

from remark_lint_frontmatter_schema_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
"""

# fixed DOS timestamp (2020-01-01) -> byte-identical rebuilds
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build(dist_dir: str) -> tuple[str, str]:
    """Write ``engine.zip`` + ``lint.py`` under ``dist_dir``; returns
    their paths."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_root)
    os.makedirs(dist_dir, exist_ok=True)
    zip_path = os.path.join(dist_dir, "engine.zip")
    entries = []
    for root, _dirs, files in os.walk(pkg_root):
        if "__pycache__" in root:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            arc = os.path.join(pkg_name, os.path.relpath(full, pkg_root))
            entries.append((arc, full))
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    shim_path = os.path.join(dist_dir, "lint.py")
    with open(shim_path, "w") as fh:
        fh.write(_SHIM)
    return zip_path, shim_path


def main(argv: list[str]) -> int:
    dist = argv[0] if argv else "dist"
    zip_path, shim_path = build(dist)
    print(f"wrote {zip_path} and {shim_path}")
    print(f"run: spark-submit --py-files {zip_path} {shim_path} --help")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
