// Host-side native ops for TurboDiffusion-TPU.
//
// The TPU compute path is Pallas/Mosaic (compiled native TPU kernels — the
// platform's counterpart of the reference's CuTe/Triton layer,
// turbodiffusion/ops/*). This library covers the *host* hot paths that the
// reference leaves to torch's C++ core: pixel-format conversion around video
// IO (imaginaire/utils/io.py:100-112) and PSNR parity metrics. Exposed via
// ctypes (no pybind11 in this environment); turbodiffusion_tpu/utils/host_ops.py
// falls back to numpy when the library isn't built.
//
// Build: make -C csrc

#include <cstdint>
#include <cstddef>
#include <cmath>

extern "C" {

// uint8 [0,255] -> float32 in [-1, 1]   (load_image / encode input path)
void u8_to_f32_norm(const uint8_t* src, float* dst, size_t n) {
    const float scale = 2.0f / 255.0f;
    for (size_t i = 0; i < n; ++i) {
        dst[i] = static_cast<float>(src[i]) * scale - 1.0f;
    }
}

// float32 in [0, 1] -> uint8 with clip + round  (save_video output path,
// matching (v*255 + 0.5) truncation in io.py:100-112)
void f32_to_u8(const float* src, uint8_t* dst, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = src[i];
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        dst[i] = static_cast<uint8_t>(v * 255.0f + 0.5f);
    }
}

// mean squared error between two float32 buffers (PSNR parity metric)
double mse_f32(const float* a, const float* b, size_t n) {
    double acc = 0.0;
    for (size_t i = 0; i < n; ++i) {
        const double d = static_cast<double>(a[i]) - static_cast<double>(b[i]);
        acc += d * d;
    }
    return n ? acc / static_cast<double>(n) : 0.0;
}

// PSNR in dB for a given peak value
double psnr_f32(const float* a, const float* b, size_t n, double peak) {
    const double m = mse_f32(a, b, n);
    if (m <= 0.0) return 1e9;
    return 10.0 * std::log10(peak * peak / m);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native tar-shard reader (webdataset loader fast path).
//
// The reference's data path leans on webdataset's C-backed tar streaming;
// the Python tarfile module is the single-host-core bottleneck for
// data-heavy training. This indexes a ustar/pax archive (skipping pax/GNU
// metadata entries) and serves batched byte-range reads with threaded
// pread(2). Exposed via ctypes (utils/host_ops.py), numpy/tarfile fallback.
// ---------------------------------------------------------------------------

#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

long octal_field(const char* p, size_t n) {
    // octal or GNU base-256 (high bit set on first byte)
    if (static_cast<unsigned char>(p[0]) & 0x80) {
        long v = static_cast<unsigned char>(p[0]) & 0x7f;
        for (size_t i = 1; i < n; ++i)
            v = (v << 8) | static_cast<unsigned char>(p[i]);
        return v;
    }
    long v = 0;
    for (size_t i = 0; i < n && p[i]; ++i) {
        if (p[i] < '0' || p[i] > '7') continue;
        v = v * 8 + (p[i] - '0');
    }
    return v;
}

}  // namespace

extern "C" {

// Index regular-file members of a tar archive.
//   names_out: max_members rows of name_stride bytes (NUL-terminated)
//   offsets_out/sizes_out: data offset and size per member
// Returns the member count, or -1 on IO error, -2 if max_members exceeded.
long tar_index(const char* path, char* names_out, long name_stride,
               long* offsets_out, long* sizes_out, long max_members) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    char hdr[512];
    long count = 0;
    long pos = 0;
    while (std::fread(hdr, 1, 512, f) == 512) {
        pos += 512;
        if (hdr[0] == '\0') break;  // end-of-archive zero block
        const long size = octal_field(hdr + 124, 12);
        const char type = hdr[156];
        const long data_blocks = (size + 511) / 512;
        if (type == '0' || type == '\0') {  // regular file
            if (count == max_members) { std::fclose(f); return -2; }
            // name = prefix '/' name (ustar split long paths)
            char full[257];
            full[0] = '\0';
            if (hdr[345]) {
                std::snprintf(full, sizeof(full), "%.155s/%.100s",
                              hdr + 345, hdr);
            } else {
                std::snprintf(full, sizeof(full), "%.100s", hdr);
            }
            std::strncpy(names_out + count * name_stride, full,
                         name_stride - 1);
            names_out[count * name_stride + name_stride - 1] = '\0';
            offsets_out[count] = pos;
            sizes_out[count] = size;
            ++count;
        }
        // skip data (and pax 'x'/'g', GNU 'L'/'K' payloads alike)
        pos += data_blocks * 512;
        if (std::fseek(f, pos, SEEK_SET) != 0) { std::fclose(f); return -1; }
    }
    std::fclose(f);
    return count;
}

// Threaded batched range reads: member i lands at out + out_offsets[i].
// Returns 0 on success, -1 on any IO failure.
int tar_read_ranges(const char* path, const long* offsets, const long* sizes,
                    long n, uint8_t* out, const long* out_offsets,
                    int n_threads) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return -1;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = static_cast<int>(n);
    std::vector<std::thread> threads;
    std::vector<int> errs(n_threads, 0);
    for (int t = 0; t < n_threads; ++t) {
        threads.emplace_back([=, &errs]() {
            for (long i = t; i < n; i += n_threads) {
                long done = 0;
                while (done < sizes[i]) {
                    ssize_t r = ::pread(fd, out + out_offsets[i] + done,
                                        sizes[i] - done, offsets[i] + done);
                    if (r <= 0) { errs[t] = -1; return; }
                    done += r;
                }
            }
        });
    }
    for (auto& th : threads) th.join();
    ::close(fd);
    for (int e : errs) if (e) { return -1; }
    return 0;
}

}  // extern "C"
