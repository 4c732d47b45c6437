// Native host-side kernels for kge_tpu (the TPU-framework counterpart
// of the reference's numba/C++ host paths). Compiled on demand by
// kge_tpu/native/__init__.py with g++ into _hostops.so and loaded via
// ctypes; every caller has a pure-numpy fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>

extern "C" {

// Parse whitespace-separated integer triples (first three fields per
// non-empty line; trailing fields ignored) into out[rows][3].
// Returns rows parsed; -1 on I/O error, -2 on a malformed line.
// ~10x np.loadtxt on large .del files (single pass, no tokenizer
// objects); Wikidata5M's 21M-triple train split is the target.
long parse_triples(const char* path, int32_t* out, long max_rows) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc((size_t)sz + 1);
    if (!buf) {
        fclose(f);
        return -1;
    }
    long rd = (long)fread(buf, 1, (size_t)sz, f);
    fclose(f);
    buf[rd] = 0;
    long rows = 0;
    const char* p = buf;
    const char* end = buf + rd;
    while (p < end && rows < max_rows) {
        while (p < end && (*p == '\n' || *p == '\r')) p++;
        if (p >= end) break;
        int64_t vals[3] = {0, 0, 0};
        bool bad = false;
        for (int field = 0; field < 3; field++) {
            while (p < end && (*p == ' ' || *p == '\t')) p++;
            bool neg = false;
            if (p < end && *p == '-') {
                neg = true;
                p++;
            }
            if (p >= end || *p < '0' || *p > '9') {
                bad = true;
                break;
            }
            int64_t v = 0;
            while (p < end && *p >= '0' && *p <= '9') {
                v = v * 10 + (*p - '0');
                p++;
            }
            vals[field] = neg ? -v : v;
        }
        while (p < end && *p != '\n') p++;
        if (bad) {
            free(buf);
            return -2;
        }
        out[rows * 3 + 0] = (int32_t)vals[0];
        out[rows * 3 + 1] = (int32_t)vals[1];
        out[rows * 3 + 2] = (int32_t)vals[2];
        rows++;
    }
    free(buf);
    return rows;
}

}  // extern "C"
