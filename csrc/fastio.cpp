// Native IO runtime: fast ascii-PLY / OBJ frame export.
//
// The reference's per-frame export path goes through taichi's PLYWriter and
// trimesh (reference main.py:189-200). Python ascii formatting costs O(100ms)
// per 100k-particle frame; this C++ writer does the same format at memory
// bandwidth. Loaded from Python via ctypes (utils/io.py) with a pure-Python
// fallback when the shared object is unavailable.
//
// Build: g++ -O2 -shared -fPIC -o libfastio.so fastio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// Fast float -> ascii with 6 significant digits (%g-equivalent quality for
// simulation coordinates), appended to buf; returns chars written.
inline int write_float(char* buf, float v) {
    return std::snprintf(buf, 32, "%.6g", static_cast<double>(v));
}

}  // namespace

extern "C" {

// Write an ascii PLY point cloud. rgba may be null. Returns 0 on success.
int write_ply_ascii(const char* path, const float* pos, const uint8_t* rgba,
                    int64_t n) {
    FILE* f = std::fopen(path, "w");
    if (!f) return 1;
    std::fprintf(f,
                 "ply\nformat ascii 1.0\nelement vertex %lld\n"
                 "property float x\nproperty float y\nproperty float z\n",
                 static_cast<long long>(n));
    if (rgba) {
        std::fputs(
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "property uchar alpha\n",
            f);
    }
    std::fputs("end_header\n", f);

    // Chunked formatting into a local buffer to avoid per-value fputs.
    constexpr int64_t kChunk = 4096;
    constexpr int kMaxLine = 128;
    char* buf = new char[kChunk * kMaxLine];
    for (int64_t start = 0; start < n; start += kChunk) {
        int64_t end = start + kChunk < n ? start + kChunk : n;
        char* p = buf;
        for (int64_t i = start; i < end; ++i) {
            p += write_float(p, pos[3 * i + 0]);
            *p++ = ' ';
            p += write_float(p, pos[3 * i + 1]);
            *p++ = ' ';
            p += write_float(p, pos[3 * i + 2]);
            if (rgba) {
                p += std::snprintf(p, 20, " %u %u %u %u", rgba[4 * i],
                                   rgba[4 * i + 1], rgba[4 * i + 2],
                                   rgba[4 * i + 3]);
            }
            *p++ = '\n';
        }
        std::fwrite(buf, 1, static_cast<size_t>(p - buf), f);
    }
    delete[] buf;
    std::fclose(f);
    return 0;
}

// Write a triangle-mesh OBJ. Returns 0 on success.
int write_obj(const char* path, const float* verts, int64_t nv,
              const int32_t* faces, int64_t nf) {
    FILE* f = std::fopen(path, "w");
    if (!f) return 1;
    constexpr int64_t kChunk = 4096;
    constexpr int kMaxLine = 128;
    char* buf = new char[kChunk * kMaxLine];
    for (int64_t start = 0; start < nv; start += kChunk) {
        int64_t end = start + kChunk < nv ? start + kChunk : nv;
        char* p = buf;
        for (int64_t i = start; i < end; ++i) {
            *p++ = 'v';
            *p++ = ' ';
            p += write_float(p, verts[3 * i + 0]);
            *p++ = ' ';
            p += write_float(p, verts[3 * i + 1]);
            *p++ = ' ';
            p += write_float(p, verts[3 * i + 2]);
            *p++ = '\n';
        }
        std::fwrite(buf, 1, static_cast<size_t>(p - buf), f);
    }
    for (int64_t start = 0; start < nf; start += kChunk) {
        int64_t end = start + kChunk < nf ? start + kChunk : nf;
        char* p = buf;
        for (int64_t i = start; i < end; ++i) {
            p += std::snprintf(p, kMaxLine, "f %d %d %d\n", faces[3 * i] + 1,
                               faces[3 * i + 1] + 1, faces[3 * i + 2] + 1);
        }
        std::fwrite(buf, 1, static_cast<size_t>(p - buf), f);
    }
    delete[] buf;
    std::fclose(f);
    return 0;
}

}  // extern "C"
