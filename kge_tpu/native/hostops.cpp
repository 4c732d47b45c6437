// Native host-side kernels for kge_tpu (the TPU-framework counterpart
// of the reference's numba/C++ host paths). Compiled on demand by
// kge_tpu/native/__init__.py with g++ into _hostops.so and loaded via
// ctypes; every caller has a pure-numpy fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

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

// Padded-CSR row blocks (see kge_tpu/models/rgnn/encoder._row_blocks):
// each aggregation node's incident edges chunked into rows of K slots.
// O(E) counting sort replacing numpy argsort + [total, K] fancy-index
// temporaries (measured 150s+ at 20M edges in numpy — this is the
// per-epoch cost under negative_sampling.graph_sampling at Wikidata
// scale). Stability contract: edges of one node keep input order,
// matching numpy argsort(kind="stable").
//
// Phase 1 fills counts[N] and returns total rows; phase 2 writes the
// padded buffers. Returns <0 on allocation failure / inconsistency.
long row_blocks_total(const int32_t* agg, long E, long N, long K,
                      int64_t* counts) {
    for (long i = 0; i < N; i++) counts[i] = 0;
    for (long e = 0; e < E; e++) {
        // out-of-range ids (corrupt data / understated num_entities)
        // must fail cleanly, not write out of bounds
        if (agg[e] < 0 || agg[e] >= N) return -4;
        counts[agg[e]]++;
    }
    long total = 0;
    for (long i = 0; i < N; i++) total += (counts[i] + K - 1) / K;
    return total;
}

long row_blocks_fill(const int32_t* agg, const int32_t* nbr,
                     const int32_t* typ, const int64_t* posv, long E,
                     long N, long K, const int64_t* counts,
                     int32_t* nbr_out, int32_t* typ_out,
                     int32_t* pos_out, int32_t* node_out, long total) {
    int64_t* row_off = (int64_t*)malloc(sizeof(int64_t) * ((size_t)N + 1));
    if (!row_off) return -1;
    int64_t acc = 0;
    for (long i = 0; i < N; i++) {
        row_off[i] = acc;
        acc += (counts[i] + K - 1) / K;
    }
    row_off[N] = acc;
    if (acc != total) {
        free(row_off);
        return -2;
    }
    // padding: nbr/typ zero, pos -1 (int32 -1 is all 0xFF bytes)
    memset(nbr_out, 0, sizeof(int32_t) * (size_t)(total * K));
    memset(typ_out, 0, sizeof(int32_t) * (size_t)(total * K));
    memset(pos_out, 0xFF, sizeof(int32_t) * (size_t)(total * K));
    for (long i = 0; i < N; i++)
        for (int64_t r = row_off[i]; r < row_off[i + 1]; r++)
            node_out[r] = (int32_t)i;
    // a node's rows are contiguous, so its k-th edge lands at flat slot
    // row_off[v]*K + k — one cursor per node, no div/mod
    int64_t* cur = (int64_t*)malloc(sizeof(int64_t) * (size_t)N);
    if (!cur) {
        free(row_off);
        return -1;
    }
    for (long i = 0; i < N; i++) cur[i] = row_off[i] * K;
    for (long e = 0; e < E; e++) {
        int32_t v = agg[e];
        int64_t slot = cur[v]++;
        nbr_out[slot] = nbr[e];
        typ_out[slot] = typ[e];
        pos_out[slot] = (int32_t)posv[e];
    }
    free(cur);
    free(row_off);
    return 0;
}

// Stable counting sort by int32 key in [0, N): writes the permutation
// (numpy argsort(kind="stable") equivalent) in O(E + N).
long counting_argsort(const int32_t* keys, long E, long N,
                      int64_t* order_out) {
    int64_t* off = (int64_t*)calloc((size_t)N + 1, sizeof(int64_t));
    if (!off) return -1;
    for (long e = 0; e < E; e++) {
        if (keys[e] < 0 || keys[e] >= N) {
            free(off);
            return -4;
        }
        off[keys[e] + 1]++;
    }
    for (long i = 0; i < N; i++) off[i + 1] += off[i];
    for (long e = 0; e < E; e++) order_out[off[keys[e]]++] = e;
    free(off);
    return 0;
}

// Transpose row blocks in one pass: block the (neighbor -> forward-row)
// incidence used by the symmetric backward
// (layers._rowblock_gather_sum), WITHOUT materializing the forward
// blocks' [total, K] boolean masks in numpy. Edges must be fed in
// forward-block order (sorted stable by agg node) — pass the
// counting_argsort permutation. fwd_row[e] = the forward block row of
// edge order[e]; computed here from counts_fwd.
long row_blocks_transpose_fill(
    const int32_t* agg, const int32_t* nbr, const int64_t* posv,
    const int64_t* order, long E, long N, long K,
    const int64_t* counts_fwd, const int64_t* counts_t,
    int32_t* trow_out, int32_t* tpos_out, int32_t* tnode_out,
    long total_t) {
    int64_t* row_off = (int64_t*)malloc(sizeof(int64_t) * ((size_t)N + 1));
    int64_t* cur = (int64_t*)malloc(sizeof(int64_t) * (size_t)N);
    int64_t* fwd_row_off = (int64_t*)malloc(sizeof(int64_t) * (size_t)N);
    if (!row_off || !cur || !fwd_row_off) {
        free(row_off); free(cur); free(fwd_row_off);
        return -1;
    }
    int64_t acc = 0;
    for (long i = 0; i < N; i++) {
        row_off[i] = acc;
        acc += (counts_t[i] + K - 1) / K;
    }
    row_off[N] = acc;
    if (acc != total_t) {
        free(row_off); free(cur); free(fwd_row_off);
        return -2;
    }
    memset(trow_out, 0, sizeof(int32_t) * (size_t)(total_t * K));
    memset(tpos_out, 0xFF, sizeof(int32_t) * (size_t)(total_t * K));
    for (long i = 0; i < N; i++)
        for (int64_t r = row_off[i]; r < row_off[i + 1]; r++)
            tnode_out[r] = (int32_t)i;
    for (long i = 0; i < N; i++) cur[i] = row_off[i] * K;
    int64_t facc = 0;
    for (long i = 0; i < N; i++) {
        fwd_row_off[i] = facc;
        facc += (counts_fwd[i] + K - 1) / K;
    }
    // walk edges in forward-block order; ord-within-node k gives the
    // forward row fwd_row_off[v] + k/K
    long idx = 0;
    for (long v = 0; v < N; v++) {
        for (int64_t k = 0; k < counts_fwd[v]; k++, idx++) {
            long e = (long)order[idx];
            int32_t dst = nbr[e];
            int64_t slot = cur[dst]++;
            trow_out[slot] = (int32_t)(fwd_row_off[v] + k / K);
            tpos_out[slot] = (int32_t)posv[e];
        }
    }
    free(row_off); free(cur); free(fwd_row_off);
    return idx == E ? 0 : -3;
}

}  // extern "C"
