"""Export tests: DXF/SVG/GDSII writers (native C++ and python fallback)
produce consistent, parseable output."""

import os
import re
import struct

import numpy as np
import pytest

from metalens_tpu.export import make_dxf, make_gds, make_svg, _gds_real, \
    _native_lib
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


def _parse_gds(path):
    """Minimal GDSII stream reader: returns (records, polygons) where
    polygons is a list of (layer, Nx2 int array in db units)."""
    raw = open(path, "rb").read()
    i, records = 0, []
    while i < len(raw):
        (length, rt_dt) = struct.unpack(">HH", raw[i:i + 4])
        assert length >= 4
        records.append((rt_dt, raw[i + 4:i + length]))
        i += length
    assert i == len(raw)
    polygons, layer = [], None
    for rt_dt, data in records:
        if rt_dt == 0x0D02:
            (layer,) = struct.unpack(">H", data)
        elif rt_dt == 0x1003:
            xy = np.frombuffer(data, dtype=">i4").astype(np.int64)
            polygons.append((layer, xy.reshape(-1, 2)))
    return records, polygons


def _gds_real_decode(b):
    e = (b[0] & 0x7F) - 64
    mant = int.from_bytes(b[1:8], "big") / 2.0 ** 56
    v = mant * 16.0 ** e
    return -v if b[0] & 0x80 else v


def test_gds_real_encoding():
    # known byte patterns for the standard UNITS values; the last mantissa
    # byte may differ by one ulp from decimal-arithmetic encoders (the
    # double 1e-3 scaled by 2^56 is exactly ...f0; truncating INFINITE
    # precision 1e-3 gives the often-quoted ...ef) -- readers decode both
    # to the same double
    def close(b, ref):
        return abs(int.from_bytes(b, "big") - int.from_bytes(
            bytes.fromhex(ref), "big")) <= 1
    assert close(_gds_real(1e-3), "3e4189374bc6a7ef")
    assert close(_gds_real(1e-9), "3944b82fa09b5a54")
    for v in (0.0, 1.0, -1.0, 0.25, 1e-3, 2.5e7, -3.1e-11):
        assert _gds_real_decode(_gds_real(v)) == pytest.approx(v, rel=1e-14)


def test_gds_python_writer_roundtrip(tmp_path):
    path = str(tmp_path / "a.gds")
    make_gds(XYRRA, path, ellipse_segments=32, layer=3, use_native=False)
    records, polygons = _parse_gds(path)
    rtypes = [r for r, _ in records]
    # stream structure: HEADER, BGNLIB, LIBNAME, UNITS, BGNSTR, STRNAME ...
    assert rtypes[:6] == [0x0002, 0x0102, 0x0206, 0x0305, 0x0502, 0x0606]
    assert rtypes[-2:] == [0x0700, 0x0400]
    units = dict(records)[0x0305]
    assert _gds_real_decode(units[:8]) == pytest.approx(1e-3)
    assert _gds_real_decode(units[8:]) == pytest.approx(1e-9)
    assert len(polygons) == len(XYRRA)
    for (layer, xy), row in zip(polygons, XYRRA):
        assert layer == 3
        assert xy.shape == (33, 2)          # closed: first point repeated
        assert (xy[0] == xy[-1]).all()
        # vertices lie on the rotated ellipse (db unit = 1 nm)
        x0, y0, rx, ry, a = row
        dx = (xy[:-1, 0] * nm - x0)
        dy = (xy[:-1, 1] * nm - y0)
        xp = dx * np.cos(a) + dy * np.sin(a)
        yp = -dx * np.sin(a) + dy * np.cos(a)
        r2 = (xp / rx) ** 2 + (yp / ry) ** 2
        assert np.allclose(r2, 1.0, atol=0.05)


@pytest.mark.skipif(not _native_lib(), reason="no native toolchain")
def test_gds_native_matches_python(tmp_path):
    p1 = str(tmp_path / "n.gds")
    p2 = str(tmp_path / "p.gds")
    make_gds(XYRRA, p1, use_native=True)
    make_gds(XYRRA, p2, use_native=False)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_gds_segment_bounds(tmp_path):
    with pytest.raises((ValueError, OSError)):
        make_gds(XYRRA, str(tmp_path / "b.gds"), ellipse_segments=2)


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


def test_gds_rejects_bad_args_before_native_dispatch(tmp_path):
    """Out-of-range segments/layer must raise a ValueError up front on BOTH
    paths (the native writer would otherwise return an opaque error code,
    or silently truncate the 16-bit layer field)."""
    import pytest
    xyrra = np.array([[0.0, 0.0, 100e-9, 100e-9, 0.0]])
    for kw in ({"ellipse_segments": 2}, {"ellipse_segments": 9000},
               {"layer": -1}, {"layer": 300}):
        for use_native in (True, False):
            with pytest.raises(ValueError):
                make_gds(xyrra, str(tmp_path / "bad.gds"),
                         use_native=use_native, **kw)


def test_export_accepts_empty_and_1d_inputs(tmp_path):
    """An empty layout writes a valid (pillar-free) file; a bare
    [x,y,rx,ry,a] row is treated as one pillar (both used to IndexError)."""
    from metalens_tpu.export import make_dxf, make_svg, make_gds
    for maker, name in ((make_dxf, "e.dxf"), (make_svg, "e.svg"),
                        (make_gds, "e.gds")):
        p = str(tmp_path / name)
        maker([], p)
        assert os.path.getsize(p) > 0
    one = [0.1e-6, -0.2e-6, 0.05e-6, 0.04e-6, 0.3]
    p2 = str(tmp_path / "one.dxf")
    make_dxf(one, p2)
    assert os.path.getsize(p2) > 0
