// Native data-path helpers for boltzmann_machines_tpu.
//
// The reference's only native layer is TensorFlow's runtime (SURVEY.md
// section 2.9); this library's host-side native layer accelerates the data
// plumbing that feeds the TPU: raw IDX/CIFAR decoding straight into float32
// buffers and the x10 CIFAR augmentation (4 one-pixel shifts + horizontal
// mirror, reference examples/dbm_cifar.py:57-106) which is a slow
// python-loop in the original.
//
// Exposed as a plain C ABI consumed through ctypes
// (boltzmann_machines_tpu/utils/native.py); buffers are allocated by numpy
// on the python side.
//
// Build: g++ -O3 -march=native -shared -fPIC bm_native.cpp -o libbm_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

inline uint32_t read_be32(const unsigned char* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

}  // namespace

extern "C" {

// Read an IDX3 image file: header gives (magic, n, rows, cols); pixel bytes
// are converted to float32 (scaled by `scale`, e.g. 1/255).  Returns number
// of images read, or -1 on error.  `out` must hold n_max*rows*cols floats.
long long bm_load_idx3(const char* path, float* out, long long n_max,
                       long long* rows_out, long long* cols_out,
                       float scale) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char header[16];
    if (fread(header, 1, 16, f) != 16) { fclose(f); return -1; }
    uint32_t magic = read_be32(header);
    if (magic != 0x00000803u) { fclose(f); return -1; }
    long long n = read_be32(header + 4);
    long long rows = read_be32(header + 8);
    long long cols = read_be32(header + 12);
    if (rows_out) *rows_out = rows;
    if (cols_out) *cols_out = cols;
    if (n > n_max) n = n_max;

    const long long chunk = 1 << 20;
    unsigned char* buf = new unsigned char[chunk];
    long long total = n * rows * cols;
    long long done = 0;
    while (done < total) {
        long long want = total - done < chunk ? total - done : chunk;
        long long got = (long long)fread(buf, 1, (size_t)want, f);
        if (got <= 0) break;
        for (long long i = 0; i < got; ++i) {
            out[done + i] = scale * (float)buf[i];
        }
        done += got;
    }
    delete[] buf;
    fclose(f);
    return done == total ? n : -1;
}

// Read an IDX1 label file into int32. Returns count or -1.
long long bm_load_idx1(const char* path, int32_t* out, long long n_max) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char header[8];
    if (fread(header, 1, 8, f) != 8) { fclose(f); return -1; }
    uint32_t magic = read_be32(header);
    if (magic != 0x00000801u) { fclose(f); return -1; }
    long long n = read_be32(header + 4);
    if (n > n_max) n = n_max;
    unsigned char* buf = new unsigned char[(size_t)n];
    long long got = (long long)fread(buf, 1, (size_t)n, f);
    for (long long i = 0; i < got; ++i) out[i] = (int32_t)(int8_t)buf[i];
    delete[] buf;
    fclose(f);
    return got == n ? n : -1;
}

// Decode a CIFAR-10 binary batch file (data_batch_N.bin layout: per record
// 1 label byte + 3072 channel-major pixel bytes).  Writes float32 pixels
// (scaled) and int32 labels.  Returns number of records, or -1.
long long bm_load_cifar_bin(const char* path, float* data, int32_t* labels,
                            long long n_max, float scale) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    const long long rec = 3073;
    unsigned char* buf = new unsigned char[rec];
    long long n = 0;
    while (n < n_max && (long long)fread(buf, 1, rec, f) == rec) {
        labels[n] = (int32_t)buf[0];
        float* row = data + n * 3072;
        for (int i = 0; i < 3072; ++i) row[i] = scale * (float)buf[1 + i];
        ++n;
    }
    delete[] buf;
    fclose(f);
    return n;
}

// One-pixel shift of an (H, W, C) float image, zero-filling vacated pixels
// (matches utils/augmentation.shift).
static void shift_img(const float* src, float* dst, long long H, long long W,
                      long long C, int dy, int dx) {
    memset(dst, 0, sizeof(float) * (size_t)(H * W * C));
    for (long long y = 0; y < H; ++y) {
        long long sy = y - dy;
        if (sy < 0 || sy >= H) continue;
        for (long long x = 0; x < W; ++x) {
            long long sx = x - dx;
            if (sx < 0 || sx >= W) continue;
            memcpy(dst + (y * W + x) * C, src + (sy * W + sx) * C,
                   sizeof(float) * (size_t)C);
        }
    }
}

// x10 CIFAR augmentation (reference examples/dbm_cifar.py:69-88):
// out[0:N] = in; out[kN:(k+1)N] = shift_k(in) for the 4 unit shifts;
// out[5N:10N] = horizontal mirror of out[0:5N].
// in: (N, H, W, C) float32; out: (10N, H, W, C) float32.
void bm_augment_x10(const float* in, float* out, long long N, long long H,
                    long long W, long long C) {
    const long long img = H * W * C;
    memcpy(out, in, sizeof(float) * (size_t)(N * img));
    const int offsets[4][2] = {{1, 0}, {-1, 0}, {0, 1}, {0, -1}};
    for (int k = 0; k < 4; ++k) {
        for (long long i = 0; i < N; ++i) {
            shift_img(in + i * img, out + ((k + 1) * N + i) * img, H, W, C,
                      offsets[k][0], offsets[k][1]);
        }
    }
    // horizontal mirror of the first 5N images
    for (long long i = 0; i < 5 * N; ++i) {
        const float* src = out + i * img;
        float* dst = out + (5 * N + i) * img;
        for (long long y = 0; y < H; ++y) {
            for (long long x = 0; x < W; ++x) {
                memcpy(dst + (y * W + x) * C,
                       src + (y * W + (W - 1 - x)) * C,
                       sizeof(float) * (size_t)C);
            }
        }
    }
}

// Fused x10 augmentation producing the on-disk cache layout directly:
// uint8 pixels (truncating clamp(v*255, 0, 255); equal to numpy's
// float->uint8 astype on the documented in-range [0,1] inputs, and defined
// -- saturating -- on out-of-range ones where the bare cast would be UB),
// flattened CHANNEL-MAJOR (utils/dataset.im_flatten: (H, W, C) -> C*H*W).
// Writing uint8 instead of float32 quarters the output first-touch
// footprint, which dominates wall-clock in sandboxed VMs where new-page
// faults cost ~0.4 ms (measured); the *255/transpose passes fuse in.
// in: (N, H, W, C) float32 in [0, 1]; out: (10N, C*H*W) uint8.
void bm_augment_x10_u8(const float* in, unsigned char* out, long long N,
                       long long H, long long W, long long C) {
    const long long img = H * W * C;
    // variant v in [0, 10): base, 4 shifts, then mirrors of those five
    const int offsets[5][2] = {{0, 0}, {1, 0}, {-1, 0}, {0, 1}, {0, -1}};
    for (int v = 0; v < 10; ++v) {
        const int dy = offsets[v % 5][0], dx = offsets[v % 5][1];
        const int mirror = v >= 5;
        for (long long i = 0; i < N; ++i) {
            const float* src = in + i * img;
            unsigned char* dst = out + (v * N + i) * img;
            for (long long y = 0; y < H; ++y) {
                const long long sy = y - dy;
                const int row_ok = (sy >= 0 && sy < H);
                for (long long x = 0; x < W; ++x) {
                    // mirror applies AFTER the shift (reference builds the
                    // mirrored set from the already-shifted images)
                    const long long xl = mirror ? (W - 1 - x) : x;
                    const long long sx = xl - dx;
                    const int ok = row_ok && sx >= 0 && sx < W;
                    for (long long c = 0; c < C; ++c) {
                        const float val =
                            ok ? src[(sy * W + sx) * C + c] : 0.f;
                        // clamp before the cast: float->u8 conversion is UB
                        // outside [0,255], so inputs outside the documented
                        // [0,1] range would otherwise produce platform-
                        // dependent garbage (advisor round 3)
                        float p = val * 255.0f;
                        p = p < 0.f ? 0.f : (p > 255.f ? 255.f : p);
                        dst[c * H * W + y * W + x] = (unsigned char)p;
                    }
                }
            }
        }
    }
}

}  // extern "C"
