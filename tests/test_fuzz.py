"""Quick differential fuzz trials vs the reference binaries.

Full campaign: python scripts/fuzz_parity.py N SEED. Here: two fixed
seeds (one SE-shaped, one PE-shaped) that reuse the test suite's jit
shapes, skipped when .ref_build is absent.
"""

import importlib.util
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "fuzz_parity", os.path.join(ROOT, "scripts", "fuzz_parity.py"))
fuzz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fuzz)

needs_ref = pytest.mark.skipif(
    not os.path.exists(fuzz.BWAMEM), reason="reference binaries not built")


@needs_ref
@pytest.mark.slow
@pytest.mark.parametrize("seed", [4242, 4247])
def test_fuzz_trial(seed, tmp_path):
    errs = fuzz.run_trial(seed, str(tmp_path / f"fuzz{seed}"))
    assert not errs, errs
