"""Fabrication export: DXF and SVG files of full pillar layouts.

Reference parity for ``make_dxf`` / ``make_dxf2`` / ``make_svg``
(``design_collimator.py:317-381``) without the dxfwrite/ezdxf/svgwrite
dependencies: the writers are self-contained (DXF R12 subset, plain SVG),
with a native C++ fast path (``native/fastexport.cpp``, via ctypes) that
streams millions of pillars per second -- the reference progress-prints
every 10k ellipses and takes minutes for large lenses.

Coordinates are written in micrometres, circles as CIRCLE entities and
ellipses as closed polylines (16 segments by default), matching the
reference's output conventions.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .units import um, pi

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastexport.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "fastexport.cpp")
_lib = None


def _native_lib():
    """Load (building on first use) the native exporter; None if the
    toolchain is unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.isfile(_LIB_PATH)
                or os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o",
                            _LIB_PATH, _SRC_PATH], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.write_dxf_r12.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_long, ctypes.c_int]
        lib.write_dxf_r12.restype = ctypes.c_int
        lib.write_svg.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_long]
        lib.write_svg.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _xyrra_in_um(xyrra_list):
    a = np.ascontiguousarray(np.asarray(xyrra_list, dtype=np.float64))
    out = a.copy()
    out[:, 0:4] /= um
    return out


def make_dxf(xyrra_list, filename="test.dxf", ellipse_segments=16,
             use_native=True, progress=False):
    """Write a DXF file of the layout (reference ``make_dxf``/``make_dxf2``,
    ``design_collimator.py:317-361``)."""
    data = _xyrra_in_um(xyrra_list)
    lib = _native_lib() if use_native else None
    if lib:
        rc = lib.write_dxf_r12(
            filename.encode(), data.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            data.shape[0], ellipse_segments)
        if rc != 0:
            raise OSError(f"native dxf writer failed with code {rc}")
        return filename
    with open(filename, "w") as f:
        f.write("0\nSECTION\n2\nENTITIES\n")
        for i, (x, y, rx, ry, a) in enumerate(data):
            if progress and i % 10000 == 0:
                print(data.shape[0] - i,
                      "ellipses remaining in dxf creation...", flush=True)
            if rx == ry:
                f.write(f"0\nCIRCLE\n8\n0\n10\n{x:.6f}\n20\n{y:.6f}\n"
                        f"40\n{rx:.6f}\n")
            else:
                f.write("0\nPOLYLINE\n8\n0\n66\n1\n70\n1\n")
                ts = np.linspace(0, 2 * pi, ellipse_segments, endpoint=False)
                dx, dy = rx * np.cos(ts), ry * np.sin(ts)
                ca, sa = np.cos(a), np.sin(a)
                for px, py in zip(x + dx * ca - dy * sa,
                                  y + dx * sa + dy * ca):
                    f.write(f"0\nVERTEX\n8\n0\n10\n{px:.6f}\n20\n{py:.6f}\n")
                f.write("0\nSEQEND\n")
        f.write("0\nENDSEC\n0\nEOF\n")
    return filename


# reference exposes both make_dxf and the faster make_dxf2; here they are the
# same native-backed writer
make_dxf2 = make_dxf


def make_svg(xyrra_list, filename="test.svg", use_native=True,
             progress=False):
    """Write an SVG file of the layout (reference ``make_svg``,
    ``design_collimator.py:363-381``)."""
    data = _xyrra_in_um(xyrra_list)
    lib = _native_lib() if use_native else None
    if lib:
        rc = lib.write_svg(filename.encode(), data.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)), data.shape[0])
        if rc != 0:
            raise OSError(f"native svg writer failed with code {rc}")
        return filename
    with open(filename, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n'
                '<svg xmlns="http://www.w3.org/2000/svg" version="1.1">\n')
        for i, (x, y, rx, ry, a) in enumerate(data):
            if progress and i % 10000 == 0:
                print(data.shape[0] - i,
                      "ellipses remaining in svg creation...", flush=True)
            if rx == ry:
                f.write(f'<circle cx="{x:.6f}" cy="{y:.6f}" r="{rx:.6f}" />\n')
            else:
                deg = a * 180.0 / pi
                f.write(f'<ellipse cx="{x:.6f}" cy="{y:.6f}" rx="{rx:.6f}" '
                        f'ry="{ry:.6f}" transform="rotate({deg:.4f} '
                        f'{x:.6f} {y:.6f})" />\n')
        f.write("</svg>\n")
    return filename
