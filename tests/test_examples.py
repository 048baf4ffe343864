"""Execute every example script (quick mode) so examples cannot rot.

Runs in-process via runpy (a subprocess would lose the CPU-backend forcing
— this platform's site module overrides JAX_PLATFORMS); the
NMF_TPU_EXAMPLE_QUICK knob shrinks sizes, not code paths.
"""

import os
import runpy
import sys

import pytest

# slow: each example is a full pipeline of fresh-config compiles
pytestmark = pytest.mark.slow

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


@pytest.mark.parametrize(
    "name",
    ["basic_usage", "advanced_features", "distributed", "separation_demo",
     "serving_pipeline"],
)
def test_example_runs(name, monkeypatch, capsys):
    monkeypatch.setenv("NMF_TPU_EXAMPLE_QUICK", "1")
    # the COO section of advanced_features demos the deprecated prototype
    import warnings

    path = os.path.join(EXAMPLES_DIR, f"{name}.py")
    argv = [path]
    monkeypatch.setattr(sys, "argv", argv)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
    assert "nan" not in out.lower().replace("nndsvda", "")
