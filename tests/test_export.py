"""Export tests: DXF/SVG writers (native C++ and python fallback) produce
consistent, parseable output."""

import os
import re

import numpy as np
import pytest

from metalens_tpu.export import make_dxf, make_svg, _native_lib
from metalens_tpu.units import nm, um


XYRRA = np.array([
    [0.0, 0.0, 100 * nm, 100 * nm, 0.0],            # circle
    [500 * nm, -200 * nm, 150 * nm, 80 * nm, 0.3],  # rotated ellipse
    [-1 * um, 1 * um, 60 * nm, 60 * nm, 0.0],
])


def test_dxf_python_writer(tmp_path):
    path = str(tmp_path / "a.dxf")
    make_dxf(XYRRA, path, use_native=False)
    text = open(path).read()
    assert text.startswith("0\nSECTION")
    assert text.rstrip().endswith("EOF")
    assert text.count("CIRCLE") == 2
    assert text.count("POLYLINE") == 1
    assert text.count("VERTEX") == 16
    # circle radius in um
    assert "0.100000" in text


def test_svg_python_writer(tmp_path):
    path = str(tmp_path / "a.svg")
    make_svg(XYRRA, path, use_native=False)
    text = open(path).read()
    assert text.count("<circle") == 2
    assert text.count("<ellipse") == 1
    assert 'r="0.100000"' in text


@pytest.mark.skipif(not _native_lib(), reason="no native toolchain")
def test_native_matches_python(tmp_path):
    p1 = str(tmp_path / "n.dxf")
    p2 = str(tmp_path / "p.dxf")
    make_dxf(XYRRA, p1, use_native=True)
    make_dxf(XYRRA, p2, use_native=False)
    assert open(p1).read() == open(p2).read()
    s1 = str(tmp_path / "n.svg")
    s2 = str(tmp_path / "p.svg")
    make_svg(XYRRA, s1, use_native=True)
    make_svg(XYRRA, s2, use_native=False)
    assert open(s1).read() == open(s2).read()


@pytest.mark.skipif(not _native_lib(), reason="no native toolchain")
def test_native_throughput_large_layout(tmp_path):
    import time
    n = 200_000
    rng = np.random.default_rng(0)
    xyrra = np.zeros((n, 5))
    xyrra[:, 0:2] = rng.uniform(-1e-3, 1e-3, size=(n, 2))
    xyrra[:, 2] = xyrra[:, 3] = 100 * nm
    path = str(tmp_path / "big.dxf")
    t0 = time.perf_counter()
    make_dxf(xyrra, path)
    dt = time.perf_counter() - t0
    assert os.path.getsize(path) > n * 20
    assert n / dt > 200_000  # > 200k shapes/sec (reference: ~10k/s + prints)
