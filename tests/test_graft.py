"""Driver entry points compile and run (single-chip + virtual multi-chip)."""

import pytest

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, example_args = graft.entry()
    img, segs = jax.jit(fn)(*example_args)
    img = np.asarray(img)
    assert img.shape == (72, 128, 3)
    assert np.isfinite(img).all()
    assert float(segs) > 0


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
