"""Fabrication export: DXF, SVG, and GDSII files of full pillar layouts.

Reference parity for ``make_dxf`` / ``make_dxf2`` / ``make_svg``
(``design_collimator.py:317-381``) without the dxfwrite/ezdxf/svgwrite
dependencies: the writers are self-contained (DXF R12 subset, plain SVG,
binary GDSII stream -- the format mask shops actually take, which the
reference lacks), with a native C++ fast path (``native/fastexport.cpp``,
via ctypes) that streams millions of pillars per second -- the reference
progress-prints every 10k ellipses and takes minutes for large lenses.

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
        # rebuild only when the source exists and is newer; a prebuilt .so
        # shipped without the source stays usable
        have_src = os.path.isfile(_SRC_PATH)
        stale = (have_src and os.path.isfile(_LIB_PATH)
                 and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH))
        if not os.path.isfile(_LIB_PATH) or stale:
            if not have_src:
                raise FileNotFoundError(_SRC_PATH)
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
        lib.write_gds.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.write_gds.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _xyrra_in_um(xyrra_list):
    out = np.array(xyrra_list, dtype=np.float64, order="C", copy=True)
    out = out.reshape(-1, 5) if out.size else out.reshape(0, 5)
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


def _gds_real(v: float) -> bytes:
    """GDSII 8-byte real: sign bit, excess-64 base-16 exponent, 56-bit
    mantissa in [1/16, 1)."""
    if v == 0.0:
        return b"\x00" * 8
    sign = 0
    if v < 0:
        sign, v = 0x80, -v
    e = 0
    while v >= 1.0:
        v /= 16.0
        e += 1
    while v < 1.0 / 16.0:
        v *= 16.0
        e -= 1
    mant = int(v * 2 ** 56)      # truncate: matches canonical encoders
    if mant >= 2 ** 56:
        mant >>= 4
        e += 1
    return bytes([sign | (e + 64)]) + mant.to_bytes(7, "big")


def _gds_rec(rtype_dtype: int, data: bytes = b"") -> bytes:
    return ((len(data) + 4).to_bytes(2, "big")
            + rtype_dtype.to_bytes(2, "big") + data)


def make_gds(xyrra_list, filename="test.gds", ellipse_segments=64,
             layer=0, use_native=True):
    """Write a GDSII stream file of the layout.

    Beyond reference parity: the reference exports only DXF/SVG
    (``design_collimator.py:317-381``) while mask shops and e-beam writers
    take GDSII.  Self-contained stream writer (no gdstk/gdspy dependency;
    native C++ fast path byte-identical to the python fallback): every
    pillar -- circles included, GDSII has no curved primitive -- becomes a
    closed BOUNDARY polygon with ``ellipse_segments`` vertices on ``layer``,
    database unit 1 nm, user unit 1 um, zeroed timestamps so output is
    deterministic.
    """
    # validate BEFORE dispatching: the native path would surface these only
    # as an opaque nonzero return code (segments) or silently truncate the
    # 16-bit layer field (layer)
    if not 3 <= ellipse_segments <= 8000:
        raise ValueError("ellipse_segments must be in [3, 8000] (the XY "
                         "record holds at most 8191 points)")
    if not 0 <= int(layer) <= 255:
        raise ValueError("layer must be in [0, 255] (GDSII layer range)")
    data = _xyrra_in_um(xyrra_list)
    lib = _native_lib() if use_native else None
    if lib:
        rc = lib.write_gds(
            filename.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            data.shape[0], ellipse_segments, layer)
        if rc != 0:
            raise OSError(f"native gds writer failed with code {rc}")
        return filename
    # float association below matches the native writer operation for
    # operation (cos(2*pi*k/S) with this exact bracketing; radii scaled to
    # nm BEFORE the cos/sin products) so the byte-identical contract pinned
    # by test_gds_native_matches_python holds to the last ulp
    ts = 2 * pi * np.arange(ellipse_segments) / ellipse_segments
    ct, st = np.cos(ts), np.sin(ts)
    with open(filename, "wb") as f:
        f.write(_gds_rec(0x0002, (600).to_bytes(2, "big")))     # HEADER
        f.write(_gds_rec(0x0102, b"\x00" * 24))                 # BGNLIB
        f.write(_gds_rec(0x0206, b"METALENS"))                  # LIBNAME
        f.write(_gds_rec(0x0305, _gds_real(1e-3) + _gds_real(1e-9)))
        f.write(_gds_rec(0x0502, b"\x00" * 24))                 # BGNSTR
        f.write(_gds_rec(0x0606, b"LENS"))                      # STRNAME
        lay = int(layer).to_bytes(2, "big")
        dt = (0).to_bytes(2, "big")
        for x, y, rx, ry, a in data:
            ca, sa = np.cos(a), np.sin(a)
            dx, dy = (rx * 1000.0) * ct, (ry * 1000.0) * st     # um -> nm
            # round-half-away-from-zero, matching the native writer's lround
            fx = x * 1000.0 + dx * ca - dy * sa
            fy = y * 1000.0 + dx * sa + dy * ca
            px = (np.sign(fx) * np.floor(np.abs(fx) + 0.5)).astype(np.int64)
            py = (np.sign(fy) * np.floor(np.abs(fy) + 0.5)).astype(np.int64)
            px = np.append(px, px[0])
            py = np.append(py, py[0])
            xy = np.empty(2 * px.size, dtype=">i4")
            xy[0::2], xy[1::2] = px, py
            f.write(_gds_rec(0x0800))                           # BOUNDARY
            f.write(_gds_rec(0x0D02, lay))                      # LAYER
            f.write(_gds_rec(0x0E02, dt))                       # DATATYPE
            f.write(_gds_rec(0x1003, xy.tobytes()))             # XY
            f.write(_gds_rec(0x1100))                           # ENDEL
        f.write(_gds_rec(0x0700))                               # ENDSTR
        f.write(_gds_rec(0x0400))                               # ENDLIB
    return filename


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
