// Native dataset loader: mmap + multithreaded strided extraction for the
// fvecs/ivecs/bvecs family and DiskANN-style .bin files.
//
// The reference reads these formats with per-row ifstream loops
// (CNNS/src/utils/aux_util.cpp:8-31, hnswlib/tests/cpp/sift_1m.cpp:233-258)
// and ships a libaio-based aligned reader (CNNS/src/utils/
// linux_aligned_file_reader.cpp). This is the TPU framework's equivalent
// host-side IO runtime: zero-syscall-per-row (mmap), parallel payload
// extraction saturating memory bandwidth, exposed through a plain C ABI for
// ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libxvecs_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
    const char *ptr = nullptr;
    size_t size = 0;
    int fd = -1;
    bool ok() const { return ptr != nullptr; }
};

Mapped map_file(const char *path) {
    Mapped m;
    m.fd = ::open(path, O_RDONLY);
    if (m.fd < 0) return m;
    struct stat st;
    if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
        ::close(m.fd);
        m.fd = -1;
        return m;
    }
    void *p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
    if (p == MAP_FAILED) {
        ::close(m.fd);
        m.fd = -1;
        return m;
    }
    m.ptr = static_cast<const char *>(p);
    m.size = st.st_size;
    ::madvise(p, st.st_size, MADV_SEQUENTIAL);
    return m;
}

void unmap(Mapped &m) {
    if (m.ptr) ::munmap(const_cast<char *>(m.ptr), m.size);
    if (m.fd >= 0) ::close(m.fd);
    m.ptr = nullptr;
    m.fd = -1;
}

void parallel_rows(int64_t n, int n_threads,
                   const std::function<void(int64_t, int64_t)> &fn) {
    if (n_threads <= 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto &t : ts) t.join();
}

}  // namespace

extern "C" {

// Probe an xvecs file: fills *n (rows) and *dim. elem_size: 4 for
// fvecs/ivecs, 1 for bvecs. Returns 0 on success, negative errno-style on
// failure (-1 open/map, -2 malformed).
int xvecs_probe(const char *path, int elem_size, int64_t *n, int32_t *dim) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (m.size < 4) {
        unmap(m);
        return -2;
    }
    int32_t d;
    std::memcpy(&d, m.ptr, 4);
    size_t row = 4 + size_t(d) * elem_size;
    if (d <= 0 || m.size % row != 0) {
        unmap(m);
        return -2;
    }
    *n = m.size / row;
    *dim = d;
    unmap(m);
    return 0;
}

// Read the payload of an xvecs file into a contiguous caller buffer of
// n*dim*elem_size bytes, dropping the per-row dim headers. Multithreaded.
int xvecs_read(const char *path, int elem_size, char *out, int64_t n,
               int32_t dim, int n_threads) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    size_t payload = size_t(dim) * elem_size;
    size_t row = 4 + payload;
    if (m.size < size_t(n) * row) {
        unmap(m);
        return -2;
    }
    const char *base = m.ptr;
    parallel_rows(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            std::memcpy(out + size_t(i) * payload,
                        base + size_t(i) * row + 4, payload);
        }
    });
    unmap(m);
    return 0;
}

// Write an xvecs file from a contiguous buffer (adds per-row dim headers).
int xvecs_write(const char *path, int elem_size, const char *data,
                int64_t n, int32_t dim) {
    FILE *f = fopen(path, "wb");
    if (!f) return -1;
    size_t payload = size_t(dim) * elem_size;
    std::vector<char> rowbuf(4 + payload);
    std::memcpy(rowbuf.data(), &dim, 4);
    for (int64_t i = 0; i < n; i++) {
        std::memcpy(rowbuf.data() + 4, data + size_t(i) * payload, payload);
        if (fwrite(rowbuf.data(), 1, rowbuf.size(), f) != rowbuf.size()) {
            fclose(f);
            return -2;
        }
    }
    fclose(f);
    return 0;
}

// Probe/read DiskANN-style .bin (int32 npts, int32 dim, payload).
int bin_probe(const char *path, int64_t *n, int32_t *dim) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (m.size < 8) {
        unmap(m);
        return -2;
    }
    int32_t np, d;
    std::memcpy(&np, m.ptr, 4);
    std::memcpy(&d, m.ptr + 4, 4);
    *n = np;
    *dim = d;
    unmap(m);
    return 0;
}

int bin_read(const char *path, char *out, int64_t nbytes) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (m.size < size_t(nbytes) + 8) {
        unmap(m);
        return -2;
    }
    std::memcpy(out, m.ptr + 8, nbytes);
    unmap(m);
    return 0;
}

}  // extern "C"
