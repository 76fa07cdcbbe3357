// Native codec for Fortran unformatted sequential record files and the
// obs bucket counting sort.
//
// The reference stores all observation files as Fortran sequential records
// (reference: scale/common/common_obs_scale.f90 — read_obs :2148,
// write_obs :2213, radar variant with 3 scalar header records :2411-2596).
// Each record is framed as [int32 len][payload][int32 len]. This codec
// reads/writes those framings directly, validating markers, so million-obs
// radar files decode at memcpy speed; obs/io.py falls back to a NumPy
// implementation when the shared library is unavailable.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Read fixed-size float32 records of length `nrec` after skipping
// `skip_records` arbitrary records. Returns number of records read,
// or -1 on framing error, -2 on open failure.
long fortseq_read_f32(const char* path, long skip_records, int nrec,
                      float* out, long max_records) {
    FILE* f = fopen(path, "rb");
    if (!f) return -2;
    int32_t head, tail;
    for (long s = 0; s < skip_records; ++s) {
        if (fread(&head, 4, 1, f) != 1) { fclose(f); return -1; }
        if (fseek(f, head, SEEK_CUR) != 0) { fclose(f); return -1; }
        if (fread(&tail, 4, 1, f) != 1 || tail != head) { fclose(f); return -1; }
    }
    long n = 0;
    const int32_t want = nrec * 4;
    while (n < max_records) {
        size_t got = fread(&head, 4, 1, f);
        if (got != 1) break;  // EOF
        if (head != want) { fclose(f); return -1; }
        if (fread(out + n * nrec, 4, nrec, f) != (size_t)nrec) {
            fclose(f); return -1;
        }
        if (fread(&tail, 4, 1, f) != 1 || tail != head) { fclose(f); return -1; }
        ++n;
    }
    fclose(f);
    return n;
}

// Read `count` scalar float32 records (e.g. the radar site header).
int fortseq_read_scalars_f32(const char* path, float* out, int count) {
    FILE* f = fopen(path, "rb");
    if (!f) return -2;
    int32_t head, tail;
    for (int i = 0; i < count; ++i) {
        if (fread(&head, 4, 1, f) != 1 || head != 4) { fclose(f); return -1; }
        if (fread(out + i, 4, 1, f) != 1) { fclose(f); return -1; }
        if (fread(&tail, 4, 1, f) != 1 || tail != 4) { fclose(f); return -1; }
    }
    fclose(f);
    return 0;
}

// Write: optional scalar header records followed by fixed-size records.
// append != 0 appends to an existing file. Returns 0 or -2 on open failure.
int fortseq_write_f32(const char* path, const float* header, int n_header,
                      const float* data, long n_records, int nrec,
                      int append) {
    FILE* f = fopen(path, append ? "ab" : "wb");
    if (!f) return -2;
    int32_t four = 4;
    for (int i = 0; i < n_header; ++i) {
        fwrite(&four, 4, 1, f);
        fwrite(header + i, 4, 1, f);
        fwrite(&four, 4, 1, f);
    }
    const int32_t len = nrec * 4;
    for (long i = 0; i < n_records; ++i) {
        fwrite(&len, 4, 1, f);
        fwrite(data + i * nrec, 4, nrec, f);
        fwrite(&len, 4, 1, f);
    }
    fclose(f);
    return 0;
}

// Count fixed-size records after skipping a header (by framing walk).
long fortseq_count_f32(const char* path, long skip_records, int nrec) {
    FILE* f = fopen(path, "rb");
    if (!f) return -2;
    int32_t head, tail;
    for (long s = 0; s < skip_records; ++s) {
        if (fread(&head, 4, 1, f) != 1) { fclose(f); return -1; }
        if (fseek(f, head, SEEK_CUR) != 0) { fclose(f); return -1; }
        if (fread(&tail, 4, 1, f) != 1 || tail != head) { fclose(f); return -1; }
    }
    long start = ftell(f);
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f) - start;
    fclose(f);
    long rec_bytes = (long)nrec * 4 + 8;
    if (bytes % rec_bytes != 0) return -1;
    return bytes / rec_bytes;
}

// Counting sort of observations into mesh buckets (the host-side step of
// the obs selection; reference: letkf_obs.f90:746-806 two-scan counting
// sort). Writes a (ncy*ncx*cap) int32 table filled with -1 padding.
// Returns number of dropped obs (capacity overflow).
long bucket_sort(const double* x, const double* y, long n,
                 double x0, double y0, double sx, double sy,
                 int ncx, int ncy, int cap, int32_t* table) {
    long cells = (long)ncx * ncy;
    std::vector<int32_t> fill(cells, 0);
    for (long c = 0; c < cells * cap; ++c) table[c] = -1;
    long dropped = 0;
    for (long i = 0; i < n; ++i) {
        long ci = (long)((x[i] - x0) / sx);
        long cj = (long)((y[i] - y0) / sy);
        if (ci < 0) ci = 0; if (ci >= ncx) ci = ncx - 1;
        if (cj < 0) cj = 0; if (cj >= ncy) cj = ncy - 1;
        long cell = cj * ncx + ci;
        int32_t s = fill[cell];
        if (s < cap) {
            table[cell * cap + s] = (int32_t)i;
            fill[cell] = s + 1;
        } else {
            ++dropped;
        }
    }
    return dropped;
}

// Max bucket occupancy for capacity sizing (first scan of the 2-scan sort).
int bucket_max_count(const double* x, const double* y, long n,
                     double x0, double y0, double sx, double sy,
                     int ncx, int ncy) {
    long cells = (long)ncx * ncy;
    std::vector<int32_t> fill(cells, 0);
    int m = 0;
    for (long i = 0; i < n; ++i) {
        long ci = (long)((x[i] - x0) / sx);
        long cj = (long)((y[i] - y0) / sy);
        if (ci < 0) ci = 0; if (ci >= ncx) ci = ncx - 1;
        if (cj < 0) cj = 0; if (cj >= ncy) cj = ncy - 1;
        int32_t v = ++fill[cj * ncx + ci];
        if (v > m) m = v;
    }
    return m;
}

}  // extern "C"
