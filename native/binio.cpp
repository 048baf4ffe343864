// Native .bin matrix I/O for nmf_tpu.
//
// Byte-compatible with the reference format (cuda/nmf.cu:188-259): an
// 8-byte header of two little-endian uint32s (rows, cols) followed by
// rows*cols float32 words in column-major order.
//
// This is the TPU framework's counterpart of the reference's C++ host I/O
// layer (read_matrix/write_matrix, nmf.cu:188-259).  It exists for large-file
// throughput: reads use a single bulk pread into the destination and a
// cache-blocked transpose to C order (the layout the Python/JAX layer wants),
// which avoids NumPy's strided-copy path and an extra intermediate buffer.
// Exposed to Python through ctypes (nmf_tpu/io/native.py) with a pure-NumPy
// fallback, so the framework works without the compiled library.
//
// Error codes are negative errno-style constants; 0 means success.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <new>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrShortRead = -2;
constexpr int kErrShortWrite = -3;
constexpr int kErrHeader = -4;
constexpr int kErrSize = -5;

// Cache-blocked out-of-place transpose: src is rows x cols column-major
// (i.e. src[i + j*rows]); dst becomes rows x cols C-order (dst[i*cols + j]).
void transpose_to_c_order(const float* src, float* dst, uint64_t rows, uint64_t cols) {
    constexpr uint64_t B = 64;  // 64x64 f32 tiles = 16 KiB working set
    for (uint64_t jb = 0; jb < cols; jb += B) {
        const uint64_t jend = jb + B < cols ? jb + B : cols;
        for (uint64_t ib = 0; ib < rows; ib += B) {
            const uint64_t iend = ib + B < rows ? ib + B : rows;
            for (uint64_t j = jb; j < jend; ++j) {
                const float* col = src + j * rows;
                for (uint64_t i = ib; i < iend; ++i) {
                    dst[i * cols + j] = col[i];
                }
            }
        }
    }
}

// C-order src -> column-major dst.
void transpose_to_f_order(const float* src, float* dst, uint64_t rows, uint64_t cols) {
    constexpr uint64_t B = 64;
    for (uint64_t ib = 0; ib < rows; ib += B) {
        const uint64_t iend = ib + B < rows ? ib + B : rows;
        for (uint64_t jb = 0; jb < cols; jb += B) {
            const uint64_t jend = jb + B < cols ? jb + B : cols;
            for (uint64_t i = ib; i < iend; ++i) {
                const float* row = src + i * cols;
                for (uint64_t j = jb; j < jend; ++j) {
                    dst[j * rows + i] = row[j];
                }
            }
        }
    }
}

bool read_exact(int fd, void* buf, uint64_t count, uint64_t offset) {
    uint8_t* p = static_cast<uint8_t*>(buf);
    while (count > 0) {
        ssize_t got = pread(fd, p, count, static_cast<off_t>(offset));
        if (got <= 0) return false;
        p += got;
        offset += static_cast<uint64_t>(got);
        count -= static_cast<uint64_t>(got);
    }
    return true;
}

bool write_exact(int fd, const void* buf, uint64_t count) {
    const uint8_t* p = static_cast<const uint8_t*>(buf);
    while (count > 0) {
        ssize_t put = write(fd, p, count);
        if (put <= 0) return false;
        p += put;
        count -= static_cast<uint64_t>(put);
    }
    return true;
}

}  // namespace

extern "C" {

int nmf_native_abi_version() { return 1; }

// Probe the header.  rows/cols are outputs.
int nmf_read_header(const char* path, uint32_t* rows, uint32_t* cols) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return kErrOpen;
    uint32_t hdr[2];
    bool ok = read_exact(fd, hdr, sizeof(hdr), 0);
    close(fd);
    if (!ok) return kErrHeader;
    *rows = hdr[0];
    *cols = hdr[1];
    return kOk;
}

// Read the payload into `out` (caller-allocated, rows*cols floats).
// c_order != 0: `out` receives C-order (row-major) data — the transpose of
// the on-disk column-major payload, matching what read_matrix() in Python
// returns.  c_order == 0: raw column-major copy.
int nmf_read_matrix(const char* path, float* out, uint32_t rows, uint32_t cols,
                    int c_order) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return kErrOpen;

    struct stat st;
    const uint64_t count = static_cast<uint64_t>(rows) * cols;
    const uint64_t payload_bytes = count * sizeof(float);
    if (fstat(fd, &st) != 0 ||
        static_cast<uint64_t>(st.st_size) < 8 + payload_bytes) {
        close(fd);
        return kErrSize;
    }
#ifdef POSIX_FADV_SEQUENTIAL
    posix_fadvise(fd, 0, 0, POSIX_FADV_SEQUENTIAL);
#endif

    int rc = kOk;
    if (!c_order || rows == 1 || cols == 1) {
        // layouts coincide for vectors; bulk read straight into out
        if (!read_exact(fd, out, payload_bytes, 8)) rc = kErrShortRead;
    } else {
        float* tmp = new (std::nothrow) float[count];
        if (tmp == nullptr) {
            close(fd);
            return kErrSize;
        }
        if (!read_exact(fd, tmp, payload_bytes, 8)) {
            rc = kErrShortRead;
        } else {
            transpose_to_c_order(tmp, out, rows, cols);
        }
        delete[] tmp;
    }
    close(fd);
    return rc;
}

// Read columns [j0, j1) of the payload into `out` (caller-allocated,
// rows*(j1-j0) floats).  Column blocks are CONTIGUOUS in the column-major
// on-disk layout, so this is one bulk pread at offset 8 + j0*rows*4 — the
// host-side read stage of the out-of-core streaming solver
// (nmf_tpu/models/streaming.py).  c_order semantics as nmf_read_matrix.
int nmf_read_columns(const char* path, float* out, uint32_t rows, uint32_t cols,
                     uint32_t j0, uint32_t j1, int c_order) {
    if (j1 < j0 || j1 > cols) return kErrSize;
    int fd = open(path, O_RDONLY);
    if (fd < 0) return kErrOpen;

    const uint64_t bn = static_cast<uint64_t>(j1) - j0;
    const uint64_t count = bn * rows;
    const uint64_t offset = 8 + static_cast<uint64_t>(j0) * rows * sizeof(float);
    struct stat st;
    if (fstat(fd, &st) != 0 ||
        static_cast<uint64_t>(st.st_size) < offset + count * sizeof(float)) {
        close(fd);
        return kErrSize;
    }
#ifdef POSIX_FADV_SEQUENTIAL
    posix_fadvise(fd, static_cast<off_t>(offset),
                  static_cast<off_t>(count * sizeof(float)),
                  POSIX_FADV_SEQUENTIAL);
#endif

    int rc = kOk;
    if (!c_order || rows == 1 || bn == 1) {
        if (!read_exact(fd, out, count * sizeof(float), offset)) rc = kErrShortRead;
    } else {
        float* tmp = new (std::nothrow) float[count];
        if (tmp == nullptr) {
            close(fd);
            return kErrSize;
        }
        if (!read_exact(fd, tmp, count * sizeof(float), offset)) {
            rc = kErrShortRead;
        } else {
            transpose_to_c_order(tmp, out, rows, bn);
        }
        delete[] tmp;
    }
    close(fd);
    return rc;
}

// Write rows x cols floats from `data` to `path` in the reference format.
// c_order != 0 means `data` is C-order (the usual NumPy layout) and is
// transposed to the on-disk column-major order.
int nmf_write_matrix(const char* path, const float* data, uint32_t rows,
                     uint32_t cols, int c_order) {
    int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) return kErrOpen;

    const uint64_t count = static_cast<uint64_t>(rows) * cols;
    uint32_t hdr[2] = {rows, cols};
    int rc = kOk;
    if (!write_exact(fd, hdr, sizeof(hdr))) {
        close(fd);
        return kErrShortWrite;
    }
    if (!c_order || rows == 1 || cols == 1) {
        if (!write_exact(fd, data, count * sizeof(float))) rc = kErrShortWrite;
    } else {
        float* tmp = new (std::nothrow) float[count];
        if (tmp == nullptr) {
            close(fd);
            return kErrSize;
        }
        transpose_to_f_order(data, tmp, rows, cols);
        if (!write_exact(fd, tmp, count * sizeof(float))) rc = kErrShortWrite;
        delete[] tmp;
    }
    close(fd);
    return rc;
}

}  // extern "C"
