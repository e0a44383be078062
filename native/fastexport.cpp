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
