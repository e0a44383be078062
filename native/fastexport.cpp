// Fast fabrication-file writer for pillar layouts.
//
// The reference exports DXF/SVG through python libraries at ~10k
// ellipses/sec with progress prints (reference design_collimator.py:317-381).
// Full lenses reach millions of pillars; this native writer streams the same
// formats at >1M shapes/sec.  Called from Python via ctypes
// (metalens_tpu/export.py); units: input coordinates in micrometres.
//
// Build: g++ -O3 -shared -fPIC -o libfastexport.so fastexport.cpp

#include <cmath>
#include <cstdio>
#include <cstring>

extern "C" {

// xyrra: n rows of [x, y, rx, ry, angle_rad], all lengths already in um.
// Returns 0 on success, nonzero on file error.
int write_dxf_r12(const char* path, const double* xyrra, long n,
                  int ellipse_segments) {
    FILE* f = fopen(path, "w");
    if (!f) return 1;
    fputs("0\nSECTION\n2\nENTITIES\n", f);
    for (long i = 0; i < n; ++i) {
        const double x = xyrra[5 * i + 0];
        const double y = xyrra[5 * i + 1];
        const double rx = xyrra[5 * i + 2];
        const double ry = xyrra[5 * i + 3];
        const double a = xyrra[5 * i + 4];
        if (rx == ry) {
            fprintf(f, "0\nCIRCLE\n8\n0\n10\n%.6f\n20\n%.6f\n40\n%.6f\n",
                    x, y, rx);
        } else {
            // closed lightweight polyline approximating the ellipse
            fputs("0\nPOLYLINE\n8\n0\n66\n1\n70\n1\n", f);
            const double ca = std::cos(a), sa = std::sin(a);
            for (int k = 0; k < ellipse_segments; ++k) {
                const double t = 2.0 * M_PI * k / ellipse_segments;
                const double dx = rx * std::cos(t), dy = ry * std::sin(t);
                fprintf(f, "0\nVERTEX\n8\n0\n10\n%.6f\n20\n%.6f\n",
                        x + dx * ca - dy * sa, y + dx * sa + dy * ca);
            }
            fputs("0\nSEQEND\n", f);
        }
    }
    fputs("0\nENDSEC\n0\nEOF\n", f);
    return fclose(f) == 0 ? 0 : 2;
}

// ---- GDSII stream writer ----
//
// The reference stops at DXF/SVG (design_collimator.py:317-381); e-beam /
// stepper mask shops take GDSII, so the rebuild adds it as a first-class
// export.  Self-contained binary stream format (no library): big-endian
// records, BOUNDARY polygons (GDSII has no ellipse primitive), 1 nm
// database unit.  Timestamps are zeroed so output is deterministic
// byte-for-byte (pinned against the python fallback in tests).

static void put_u16be(unsigned char* p, unsigned v) {
    p[0] = (unsigned char)(v >> 8);
    p[1] = (unsigned char)(v & 0xff);
}

static void put_i32be(unsigned char* p, long v) {
    unsigned long u = (unsigned long)v;
    p[0] = (unsigned char)((u >> 24) & 0xff);
    p[1] = (unsigned char)((u >> 16) & 0xff);
    p[2] = (unsigned char)((u >> 8) & 0xff);
    p[3] = (unsigned char)(u & 0xff);
}

// GDSII 8-byte real: sign bit, excess-64 base-16 exponent, 56-bit mantissa
// in [1/16, 1).
static void put_gds_real(unsigned char* p, double v) {
    std::memset(p, 0, 8);
    if (v == 0.0) return;
    unsigned sign = 0;
    if (v < 0) { sign = 0x80; v = -v; }
    int e = 0;
    while (v >= 1.0) { v /= 16.0; ++e; }
    while (v < 1.0 / 16.0) { v *= 16.0; --e; }
    unsigned long long mant =                   // v * 2^56, truncated
        (unsigned long long)(v * 72057594037927936.0);        // (canonical)
    if (mant >= 72057594037927936ULL) { mant >>= 4; ++e; }
    p[0] = (unsigned char)(sign | (unsigned)(e + 64));
    for (int k = 0; k < 7; ++k)
        p[1 + k] = (unsigned char)((mant >> (8 * (6 - k))) & 0xff);
}

static void rec(FILE* f, unsigned rtype_dtype, const unsigned char* data,
                unsigned nbytes) {
    unsigned char hdr[4];
    put_u16be(hdr, nbytes + 4);
    put_u16be(hdr + 2, rtype_dtype);
    fwrite(hdr, 1, 4, f);
    if (nbytes) fwrite(data, 1, nbytes, f);
}

// xyrra: n rows of [x, y, rx, ry, angle_rad], lengths in um.  Every shape
// (circles included) becomes a closed BOUNDARY with ellipse_segments
// vertices on the given layer, coordinates in integer nm.
int write_gds(const char* path, const double* xyrra, long n,
              int ellipse_segments, int layer) {
    if (ellipse_segments < 3 || ellipse_segments > 8000) return 3;
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    unsigned char buf[64016];
    // HEADER: version 600
    put_u16be(buf, 600);
    rec(f, 0x0002, buf, 2);
    // BGNLIB / BGNSTR: 12 zeroed timestamp shorts (deterministic output)
    std::memset(buf, 0, 24);
    rec(f, 0x0102, buf, 24);
    rec(f, 0x0206, (const unsigned char*)"METALENS", 8);      // LIBNAME
    // UNITS: 1 db unit = 1e-3 user units (um) = 1e-9 m
    put_gds_real(buf, 1e-3);
    put_gds_real(buf + 8, 1e-9);
    rec(f, 0x0305, buf, 16);
    std::memset(buf, 0, 24);
    rec(f, 0x0502, buf, 24);
    rec(f, 0x0606, (const unsigned char*)"LENS", 4);          // STRNAME
    const int S = ellipse_segments;
    double* ct = new double[S];
    double* st = new double[S];
    for (int k = 0; k < S; ++k) {
        const double t = 2.0 * M_PI * k / S;
        ct[k] = std::cos(t);
        st[k] = std::sin(t);
    }
    unsigned char lay[2], dt[2];
    put_u16be(lay, (unsigned)layer);
    put_u16be(dt, 0);
    for (long i = 0; i < n; ++i) {
        const double x = xyrra[5 * i + 0] * 1000.0;   // um -> nm
        const double y = xyrra[5 * i + 1] * 1000.0;
        const double rx = xyrra[5 * i + 2] * 1000.0;
        const double ry = xyrra[5 * i + 3] * 1000.0;
        const double a = xyrra[5 * i + 4];
        const double ca = std::cos(a), sa = std::sin(a);
        rec(f, 0x0800, NULL, 0);                      // BOUNDARY
        rec(f, 0x0D02, lay, 2);                       // LAYER
        rec(f, 0x0E02, dt, 2);                        // DATATYPE
        // XY: S+1 points, closed (first repeated)
        for (int k = 0; k <= S; ++k) {
            const int kk = (k == S) ? 0 : k;
            const double dx = rx * ct[kk], dy = ry * st[kk];
            const double px = x + dx * ca - dy * sa;
            const double py = y + dx * sa + dy * ca;
            put_i32be(buf + 8 * k, std::lround(px));
            put_i32be(buf + 8 * k + 4, std::lround(py));
        }
        rec(f, 0x1003, buf, 8 * (S + 1));
        rec(f, 0x1100, NULL, 0);                      // ENDEL
    }
    delete[] ct;
    delete[] st;
    rec(f, 0x0700, NULL, 0);                          // ENDSTR
    rec(f, 0x0400, NULL, 0);                          // ENDLIB
    return fclose(f) == 0 ? 0 : 2;
}

int write_svg(const char* path, const double* xyrra, long n) {
    FILE* f = fopen(path, "w");
    if (!f) return 1;
    fputs("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n"
          "<svg xmlns=\"http://www.w3.org/2000/svg\" version=\"1.1\">\n", f);
    for (long i = 0; i < n; ++i) {
        const double x = xyrra[5 * i + 0];
        const double y = xyrra[5 * i + 1];
        const double rx = xyrra[5 * i + 2];
        const double ry = xyrra[5 * i + 3];
        const double a = xyrra[5 * i + 4] * 180.0 / M_PI;
        if (rx == ry) {
            fprintf(f, "<circle cx=\"%.6f\" cy=\"%.6f\" r=\"%.6f\" />\n",
                    x, y, rx);
        } else {
            fprintf(f,
                    "<ellipse cx=\"%.6f\" cy=\"%.6f\" rx=\"%.6f\" "
                    "ry=\"%.6f\" transform=\"rotate(%.4f %.6f %.6f)\" />\n",
                    x, y, rx, ry, a, x, y);
        }
    }
    fputs("</svg>\n", f);
    return fclose(f) == 0 ? 0 : 2;
}

}  // extern "C"
