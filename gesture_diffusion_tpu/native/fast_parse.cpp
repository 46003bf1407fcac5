// Native bulk float parser for BVH motion blocks (and any whitespace-
// separated float text).  The data-loader analogue of the reference's
// pandas-based pymo parser (/root/reference/datasets/pymo/parsers.py:207-260,
// which builds per-frame Python tuples): one C pass with strtod.
//
// Built on demand by gesture_diffusion_tpu/native/__init__.py with
//   g++ -O3 -shared -fPIC fast_parse.cpp -o fast_parse.so
// and loaded via ctypes (no pybind11 in this environment).
//
// Caveat: strtod honours LC_NUMERIC; callers run in the "C" locale.

#include <cstdlib>

extern "C" {

// Parse up to max_out whitespace-separated doubles from the
// null-terminated buffer s (len bytes, excluding the terminator).
// Returns the number parsed; stops early at the first non-numeric token.
long gdt_parse_floats(const char *s, long len, double *out, long max_out) {
    const char *p = s;
    const char *end = s + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' ||
                           *p == '\t')) {
            ++p;
        }
        if (p >= end) {
            break;
        }
        char *next;
        double v = strtod(p, &next);
        if (next == p) {
            break;
        }
        out[n++] = v;
        p = next;
    }
    return n;
}

}  // extern "C"
