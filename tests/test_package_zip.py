"""spark-submit artifact: engine.zip is importable exactly the way
--py-files delivers it (zip on sys.path in a FRESH interpreter, no repo
checkout), the shim wires the CLI, and rebuilds are byte-identical."""

import os
import subprocess
import sys

from remark_lint_frontmatter_schema_spark.package import build


def test_zip_imports_and_compiles_in_fresh_interpreter(tmp_path):
    zip_path, shim = build(str(tmp_path / "dist"))
    assert os.path.exists(zip_path) and os.path.exists(shim)
    # driver-side (JVM-free) surfaces: bundling, hashing, format
    # registry — proves the zip is the package, not just that it unzips
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "from remark_lint_frontmatter_schema_spark.plans.bundler import "
        "bundle\n"
        "from remark_lint_frontmatter_schema_spark.plans.compiler import "
        "ruleset_hash\n"
        "from remark_lint_frontmatter_schema_spark.functions.formats "
        "import FORMAT_REGEX\n"
        "import json, pathlib\n"
        "pathlib.Path('rs.json').write_text(json.dumps("
        "{'properties': {'v': {'minimum': 0}}}).replace(chr(39), chr(34)))\n"
        "doc = bundle('rs.json')\n"
        "print('HASH', ruleset_hash(doc), len(FORMAT_REGEX))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", probe, zip_path], env=env,
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("HASH ")


def test_rebuild_is_byte_identical(tmp_path):
    z1, _ = build(str(tmp_path / "d1"))
    z2, _ = build(str(tmp_path / "d2"))
    assert open(z1, "rb").read() == open(z2, "rb").read()


def test_shim_mentions_cli_main(tmp_path):
    _, shim = build(str(tmp_path / "dist"))
    src = open(shim).read()
    assert "remark_lint_frontmatter_schema_spark.cli" in src
    assert "main(sys.argv[1:])" in src
