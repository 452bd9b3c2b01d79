// Fast OBJ serialization + masked-mesh compaction (native runtime component).
//
// The benchmarked export path (reference scripts/eval/dreamfusion.sh ->
// SaverMixin.save_obj, threestudio/utils/saving.py:491-594) serializes
// ~100k-500k vertices + faces per mesh. Python string formatting takes
// seconds per mesh at that scale; this C++ writer compacts the
// fixed-capacity masked buffers (drops invalid slots, remaps face indices)
// and streams the file with to_chars-style formatting in tens of
// milliseconds. Loaded via ctypes (no pybind11 dependency).
//
// Build: make -C native  (produces libobjwriter.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// minimal fast float formatter: %.6f-equivalent without locale overhead
inline char* fmt_float(char* p, float v) {
    if (v < 0) { *p++ = '-'; v = -v; }
    long long ip = (long long)v;
    long long frac = (long long)((v - (double)ip) * 1000000.0 + 0.5);
    if (frac >= 1000000) { ip += 1; frac -= 1000000; }
    p += snprintf(p, 24, "%lld", ip);
    *p++ = '.';
    for (long long d = 100000; d >= 1; d /= 10) *p++ = '0' + (char)((frac / d) % 10);
    return p;
}

inline char* fmt_int(char* p, long long v) {
    p += snprintf(p, 24, "%lld", v);
    return p;
}

}  // namespace

extern "C" {

// Returns 0 on success. Buffers:
//   verts  [nv, 3] float32      colors [nv, 3] float32 or nullptr
//   faces  [nf, 3] int32        vmask/fmask [nv]/[nf] uint8 or nullptr
int write_obj(const char* path,
              const float* verts, const float* colors, const int32_t* faces,
              const uint8_t* vmask, const uint8_t* fmask,
              int64_t nv, int64_t nf) {
    std::vector<int32_t> remap(nv, -1);
    int64_t n_out_v = 0;
    for (int64_t i = 0; i < nv; ++i) {
        if (!vmask || vmask[i]) remap[i] = (int32_t)n_out_v++;
    }

    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    // 4 MiB stream buffer
    std::vector<char> iobuf(4 << 20);
    setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());

    std::vector<char> line(256);
    for (int64_t i = 0; i < nv; ++i) {
        if (remap[i] < 0) continue;
        char* p = line.data();
        *p++ = 'v'; *p++ = ' ';
        p = fmt_float(p, verts[i * 3 + 0]); *p++ = ' ';
        p = fmt_float(p, verts[i * 3 + 1]); *p++ = ' ';
        p = fmt_float(p, verts[i * 3 + 2]);
        if (colors) {
            for (int c = 0; c < 3; ++c) {
                *p++ = ' ';
                float col = colors[i * 3 + c];
                if (col < 0.f) col = 0.f;
                if (col > 1.f) col = 1.f;
                p = fmt_float(p, col);
            }
        }
        *p++ = '\n';
        fwrite(line.data(), 1, (size_t)(p - line.data()), f);
    }
    for (int64_t i = 0; i < nf; ++i) {
        if (fmask && !fmask[i]) continue;
        int32_t a = faces[i * 3 + 0], b = faces[i * 3 + 1], c = faces[i * 3 + 2];
        if (a < 0 || a >= nv || b < 0 || b >= nv || c < 0 || c >= nv) continue;
        int32_t ra = remap[a], rb = remap[b], rc = remap[c];
        if (ra < 0 || rb < 0 || rc < 0) continue;
        char* p = line.data();
        *p++ = 'f'; *p++ = ' ';
        p = fmt_int(p, ra + 1); *p++ = ' ';
        p = fmt_int(p, rb + 1); *p++ = ' ';
        p = fmt_int(p, rc + 1);
        *p++ = '\n';
        fwrite(line.data(), 1, (size_t)(p - line.data()), f);
    }
    fclose(f);
    return 0;
}

// compact a masked mesh in-memory (for downstream host consumers):
// writes compacted verts/colors/faces into the out buffers, returns counts
// via out params. Out buffers must be caller-allocated at full capacity.
int compact_mesh(const float* verts, const float* colors, const int32_t* faces,
                 const uint8_t* vmask, const uint8_t* fmask,
                 int64_t nv, int64_t nf,
                 float* out_verts, float* out_colors, int32_t* out_faces,
                 int64_t* out_nv, int64_t* out_nf) {
    std::vector<int32_t> remap(nv, -1);
    int64_t v_count = 0;
    for (int64_t i = 0; i < nv; ++i) {
        if (!vmask || vmask[i]) {
            memcpy(out_verts + v_count * 3, verts + i * 3, 3 * sizeof(float));
            if (colors && out_colors)
                memcpy(out_colors + v_count * 3, colors + i * 3, 3 * sizeof(float));
            remap[i] = (int32_t)v_count++;
        }
    }
    int64_t f_count = 0;
    for (int64_t i = 0; i < nf; ++i) {
        if (fmask && !fmask[i]) continue;
        int32_t a = faces[i * 3], b = faces[i * 3 + 1], c = faces[i * 3 + 2];
        if (a < 0 || b < 0 || c < 0 || a >= nv || b >= nv || c >= nv) continue;
        int32_t ra = remap[a], rb = remap[b], rc = remap[c];
        if (ra < 0 || rb < 0 || rc < 0) continue;
        out_faces[f_count * 3] = ra;
        out_faces[f_count * 3 + 1] = rb;
        out_faces[f_count * 3 + 2] = rc;
        ++f_count;
    }
    *out_nv = v_count;
    *out_nf = f_count;
    return 0;
}

}  // extern "C"
