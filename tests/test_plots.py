"""Plot harness smoke tests: each figure family renders from a tiny CSV.

The reference publishes four benchmark figure families
(ref ``benchmarks/plot_benchmark.py``); these tests pin that our
counterpart functions produce files from representative rows (pure
pandas/matplotlib — no device work).
"""

import importlib.util
import os
import sys

import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "plot_benchmark",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "plot_benchmark.py"),
)
plot_benchmark = importlib.util.module_from_spec(_SPEC)
sys.modules["plot_benchmark"] = plot_benchmark
_SPEC.loader.exec_module(plot_benchmark)


def _rows():
    rows = []
    for mode in ("nojit", "coldjit", "warmjit"):
        for p in (10, 1000, 100000):
            rows.append({
                "model": f"CVMatrix-tpu-tpu-{mode}", "weights": True,
                "P": p, "N": 100000, "K": 500, "M": 10,
                "center_X": True, "center_Y": True,
                "scale_X": True, "scale_Y": True,
                "time": 1.0 / p + (10.0 if mode == "coldjit" else 0.1),
                "fit_time": 0.1, "folds_time": 0.5,
                "folds_per_sec": p, "gbps": 300.0, "version": "t",
            })
    rows.append({
        "model": "NaiveOracle", "weights": True, "P": 10, "N": 100000,
        "K": 500, "M": 10, "center_X": True, "center_Y": True,
        "scale_X": True, "scale_Y": True, "time": 50.0, "fit_time": "",
        "folds_time": "", "folds_per_sec": "", "gbps": None, "version": "t",
    })
    return pd.DataFrame(rows)


@pytest.mark.parametrize("fn,name", [
    (plot_benchmark.plot_vs_naive, "vs_naive.png"),
    (plot_benchmark.plot_combos, "combos.png"),
    (plot_benchmark.plot_roofline, "roofline.png"),
    (plot_benchmark.plot_jit_modes, "jit_modes.png"),
])
def test_figure_families_render(tmp_path, fn, name):
    out = str(tmp_path / name)
    fn(_rows(), out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_jit_modes_skips_single_mode(tmp_path):
    """With only warmjit rows the comparison figure is (correctly) skipped."""
    df = _rows()
    df = df[df.model.str.endswith("warmjit") | (df.model == "NaiveOracle")]
    out = str(tmp_path / "skip.png")
    plot_benchmark.plot_jit_modes(df, out)
    assert not os.path.exists(out)
