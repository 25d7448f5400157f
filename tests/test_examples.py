"""Every example executes end-to-end in smoke mode.

The 31 examples are the de-facto integration notebook (the reference
lost its own notebook to git-LFS rot, README.md:27-31 /
`.MISSING_LARGE_BLOBS:1`; SURVEY §4.3) — running them under
``BI_EXAMPLE_SMOKE=1`` (tiny pools/iterations, honored inside each
example) keeps them from rotting silently as the API moves.  Slow-marked:
``pytest -m slow -k examples`` runs all of them."""

import glob
import os
import runpy

import pytest

EXAMPLES = sorted(
    glob.glob(
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "[0-9]*.py"
        )
    )
)


def test_examples_discovered():
    assert len(EXAMPLES) >= 31, EXAMPLES


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", EXAMPLES, ids=[os.path.basename(p).split(".")[0] for p in EXAMPLES]
)
def test_example_smoke(path, monkeypatch, tmp_path):
    monkeypatch.setenv("BI_EXAMPLE_SMOKE", "1")
    # examples save figures / artifacts via relative paths -> tmp
    monkeypatch.chdir(tmp_path)
    runpy.run_path(path, run_name="__main__")
