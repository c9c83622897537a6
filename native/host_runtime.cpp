// Native host runtime for mh_spgemm_tpu.
//
// The reference's host runtime is C++ (Matrix Market parsing, scans, CSR
// transpose — src/utils.cpp, inc/mmio_read.h); the TPU rebuild keeps those
// host-side hot paths native.  Exposed through a C ABI consumed by ctypes
// (mh_spgemm_tpu/utils/native.py).  Build: native/build.sh.
//
// Functions:
//   mh_parse_mtx_body  — memory-mapped tokenizer for coordinate .mtx
//                        bodies (real/integer/pattern/complex), returning
//                        0-based COO triples; ~20x faster than numpy
//                        loadtxt on multi-GB files.
//   mh_intprod         — Sigma_i nnz(B[A.col[i]]) (benchmark protocol).
//   mh_exclusive_scan  — in-place exclusive prefix sum.
//   mh_csr_transpose   — counting-sort CSR -> CSC relabel.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

void mh_free(void *p) { free(p); }

static inline const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

static inline const char *parse_ll(const char *p, const char *end,
                                   long long *out) {
    p = skip_ws(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
    long long v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return p;
}

static inline const char *parse_double(const char *p, const char *end,
                                       double *out) {
    p = skip_ws(p, end);
    char *q = nullptr;
    *out = strtod(p, &q);
    return q ? q : p;
}

// Parse the body of a coordinate-format Matrix Market file.
// Returns 0 on success.  dims = {M, N, nnz}.  Arrays are malloc'd; caller
// frees with mh_free.  Indices are converted to 0-based.
long long mh_parse_mtx_body(const char *path, int is_pattern,
                            int is_complex, long long *dims,
                            long long **rows_out, long long **cols_out,
                            double **vals_out) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t len = (size_t)st.st_size;
    const char *buf =
        (const char *)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (buf == MAP_FAILED) return -3;
    const char *p = buf, *end = buf + len;

    // skip banner and comments
    while (p < end && (*p == '%' || *p == '\n')) {
        while (p < end && *p != '\n') p++;
        if (p < end) p++;
    }
    long long M = 0, N = 0, nnz = 0;
    p = parse_ll(p, end, &M);
    p = parse_ll(p, end, &N);
    p = parse_ll(p, end, &nnz);
    while (p < end && *p != '\n') p++;
    if (p < end) p++;
    if (M <= 0 || N <= 0 || nnz < 0) { munmap((void *)buf, len); return -4; }

    long long *rows = (long long *)malloc(sizeof(long long) * (size_t)nnz);
    long long *cols = (long long *)malloc(sizeof(long long) * (size_t)nnz);
    double *vals = (double *)malloc(sizeof(double) * (size_t)nnz);
    if (!rows || !cols || !vals) {
        free(rows); free(cols); free(vals);
        munmap((void *)buf, len);
        return -5;
    }

    long long i = 0;
    for (; i < nnz && p < end; i++) {
        long long r, c;
        p = parse_ll(p, end, &r);
        p = parse_ll(p, end, &c);
        if (is_pattern) {
            vals[i] = 1.0;
        } else {
            double v;
            p = parse_double(p, end, &v);
            vals[i] = v;
            if (is_complex) {  // imaginary part dropped (reference
                               // inc/mmio_read.h:101)
                double im;
                p = parse_double(p, end, &im);
            }
        }
        rows[i] = r - 1;
        cols[i] = c - 1;
        while (p < end && *p != '\n') p++;
        if (p < end) p++;
    }
    munmap((void *)buf, len);
    if (i != nnz) { free(rows); free(cols); free(vals); return -6; }

    dims[0] = M; dims[1] = N; dims[2] = nnz;
    *rows_out = rows; *cols_out = cols; *vals_out = vals;
    return 0;
}

// Sigma_i nnz(B[A.col[i]]) — benchmark intermediate-product count
// (reference src/main.cu:102-107).
long long mh_intprod(const int *a_col, const int *b_ptr, long long nnz_a,
                     const int *unused) {
    (void)unused;
    long long total = 0;
#pragma omp parallel for reduction(+ : total) schedule(static)
    for (long long i = 0; i < nnz_a; i++) {
        int k = a_col[i];
        total += (long long)(b_ptr[k + 1] - b_ptr[k]);
    }
    return total;
}

// In-place exclusive prefix sum (reference exclusive_scan, src/utils.cpp:3).
void mh_exclusive_scan(int *data, long long n) {
    int run = 0;
    for (long long i = 0; i < n; i++) {
        int v = data[i];
        data[i] = run;
        run += v;
    }
}

// CSR -> CSC relabel transpose (reference matrix_transposition,
// src/utils.cpp:20-46).  Output arrays must be preallocated by caller:
// t_ptr[N+1], t_col[nnz], t_val[nnz].
void mh_csr_transpose(long long M, long long N, const int *ptr,
                      const int *col, const double *val, int *t_ptr,
                      int *t_col, double *t_val) {
    long long nnz = ptr[M];
    memset(t_ptr, 0, sizeof(int) * (size_t)(N + 1));
    for (long long j = 0; j < nnz; j++) t_ptr[col[j] + 1]++;
    for (long long c = 0; c < N; c++) t_ptr[c + 1] += t_ptr[c];
    int *fill = (int *)calloc((size_t)N, sizeof(int));
    for (long long r = 0; r < M; r++) {
        for (int j = ptr[r]; j < ptr[r + 1]; j++) {
            int c = col[j];
            int d = t_ptr[c] + fill[c]++;
            t_col[d] = (int)r;
            t_val[d] = val[j];
        }
    }
    free(fill);
}

}  // extern "C"


// ---------------------------------------------------------------------------
// Bucket-plan entry builder (the planning hot loop of ops/bucketed.py):
// for each class row (in order), emit one descriptor per A entry whose
// referenced B row is nonempty: destination slot, B source start, length,
// and A-entry index — laid out [nchunks, eb] with rb rows per chunk.
// Three fused passes (count, per-chunk prefix, emit) replace ~10 numpy
// passes over the entry stream.  Returns the number of entries that did
// not fit eb (0 on success).
// ---------------------------------------------------------------------------
extern "C" long long mh_bucket_entries(
    const int32_t *a_ptr, const int32_t *a_col, const int32_t *b_ptr,
    const int32_t *rows, long long nrows, int32_t rb, int32_t w,
    int32_t eb, int32_t *ent_dst, int32_t *ent_src, int32_t *ent_len,
    int32_t *ent_aidx) {
    long long *cnt = (long long *)malloc(sizeof(long long) * (nrows + 1));
    if (!cnt) return -1;
#pragma omp parallel for schedule(static)
    for (long long t = 0; t < nrows; t++) {
        const int32_t r = rows[t];
        long long c = 0;
        for (int32_t e = a_ptr[r]; e < a_ptr[r + 1]; e++)
            if (b_ptr[a_col[e] + 1] - b_ptr[a_col[e]] > 0) c++;
        cnt[t] = c;
    }
    // per-chunk exclusive prefix (chunks are contiguous runs of rb rows)
    const long long nchunks = (nrows + rb - 1) / rb;
    long long bad = 0;
#pragma omp parallel for schedule(static) reduction(+:bad)
    for (long long ch = 0; ch < nchunks; ch++) {
        const long long lo = ch * rb;
        const long long hi = lo + rb < nrows ? lo + rb : nrows;
        long long run = 0;
        for (long long t = lo; t < hi; t++) {
            const long long c = cnt[t];
            cnt[t] = run;
            run += c;
        }
        if (run > eb) bad += run - eb;
    }
    if (bad) { free(cnt); return bad; }
#pragma omp parallel for schedule(static)
    for (long long t = 0; t < nrows; t++) {
        const int32_t r = rows[t];
        const int32_t slot = (int32_t)(t % rb);
        long long at = (t / rb) * (long long)eb + cnt[t];
        int32_t off = 0;
        for (int32_t e = a_ptr[r]; e < a_ptr[r + 1]; e++) {
            const int32_t k = a_col[e];
            const int32_t len = b_ptr[k + 1] - b_ptr[k];
            if (len <= 0) continue;
            ent_dst[at] = slot * w + off;
            ent_src[at] = b_ptr[k];
            ent_len[at] = len;
            ent_aidx[at] = e;
            at++;
            off += len;
        }
    }
    free(cnt);
    return 0;
}
