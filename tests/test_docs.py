"""Docs stay true: every import statement shown in docs/API.md must
resolve, so the quick reference cannot rot as modules move."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_md_imports_resolve():
    text = open(os.path.join(REPO, "docs", "API.md")).read()
    # Join parenthesized multi-line imports, then pick import statements.
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert blocks, "API.md lost its code blocks?"
    src = "\n".join(blocks)
    src = re.sub(r"\(([^)]*)\)", lambda m: m.group(1).replace("\n", " "),
                 src)
    imports = [ln.strip() for ln in src.splitlines()
               if ln.strip().startswith(("from sert_tpu", "import sert_tpu"))]
    assert len(imports) >= 15
    ns = {}
    for stmt in imports:
        exec(stmt, ns)  # ImportError here = stale doc


def test_readme_cli_commands_exist():
    """Every `python -m sert_tpu <cmd>` the README shows is a real
    subcommand."""
    from sert_tpu.cli import main
    text = open(os.path.join(REPO, "README.md")).read()
    cmds = set(re.findall(r"python -m sert_tpu (\w+)", text))
    assert cmds
    import argparse
    import unittest.mock as mock
    # Probe the parser: invalid subcommand exits with argparse error 2.
    for cmd in cmds:
        with mock.patch("sys.stderr"):
            try:
                main([cmd, "--help"])
            except SystemExit as e:
                assert e.code == 0, f"README names unknown command {cmd!r}"
