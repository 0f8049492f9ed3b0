"""Every docs example must run (keeps the cookbook honest)."""

import pathlib
import runpy
import sys

import pytest

_DOCS = pathlib.Path(__file__).parents[2] / "docs"
EXAMPLES = sorted((_DOCS / "examples").glob("*.py")) + sorted(
    (_DOCS / "cookbook").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path, capsys):
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "nan" not in out.lower()
