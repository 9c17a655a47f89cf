"""Run every example script's main() — the tutorial-as-golden-test strategy
(reference tests/test_tutorials)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), '..', 'examples')) if f.endswith('.py')
)


@pytest.mark.parametrize('script', EXAMPLES)
def test_example_runs(script):
    path = os.path.join(os.path.dirname(__file__), '..', 'examples', script)
    spec = importlib.util.spec_from_file_location(script[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
