"""Examples are the front door (reference role ``ds_test.py:17-44``): run
each one end-to-end in tiny synthetic mode so a bitrotted example fails the
hermetic suite instead of shipping silently.

``DEEPSENSORNZ_EXAMPLE_TINY=1`` shrinks data sizes / epochs / channels
inside each example's ``main``; the code path is otherwise the shipped one.
"""

import importlib.util
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).resolve().parents[1] / "examples"

EXAMPLES = [
    "quickstart",
    "all_variables",
    "data_explore",
    "station_placement",
    "validation_study",
]


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"_example_{name}", EXAMPLES_DIR / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_tiny(name, tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPSENSORNZ_EXAMPLE_TINY", "1")
    mod = _load(name)
    mod.main(str(tmp_path / name))
