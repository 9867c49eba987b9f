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
