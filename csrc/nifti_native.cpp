// Native NIfTI decode core.
//
// The reference framework's input hot spot is per-case NIfTI load: gunzip +
// parse + float cast + canonical reorientation, executed per DataLoader
// worker (reference: src/datasets/hecktor21.py:25-28, SURVEY.md §3.4). The
// pure-Python path materializes three intermediate buffers (inflated bytes,
// float cast, transposed copy). This C++ core fuses the post-inflate work
// into a single pass writing the final (D,H,W)=(Z,Y,X) float32 layout the
// datasets feed to the device, and exposes a zlib inflate that runs with the
// GIL released (ctypes FFI), so the threaded HostLoader scales across cores.
//
// Build: g++ -O3 -march=native -shared -fPIC nifti_native.cpp -o libnifti_native.so -lz

#include <cstdint>
#include <cstring>
#include <zlib.h>

extern "C" {

// Inflate a gzip stream. Returns bytes written, or -1 on error, -2 if the
// output buffer is too small.
long long nn_gunzip(const uint8_t* src, long long src_len,
                    uint8_t* dst, long long dst_cap) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    // 16 + MAX_WBITS: gzip container
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return -1;
    zs.next_in = const_cast<uint8_t*>(src);
    zs.avail_in = static_cast<uInt>(src_len);
    zs.next_out = dst;
    zs.avail_out = static_cast<uInt>(dst_cap);

    long long total = 0;
    int ret;
    for (;;) {
        ret = inflate(&zs, Z_NO_FLUSH);
        if (ret == Z_STREAM_END) {
            total = static_cast<long long>(zs.total_out);
            // support multi-member gzip files (valid per RFC 1952)
            if (zs.avail_in > 0) {
                if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) { inflateEnd(&zs); return -1; }
                continue;
            }
            break;
        }
        if (ret == Z_OK) {
            if (zs.avail_out == 0) { inflateEnd(&zs); return -2; }
            continue;
        }
        inflateEnd(&zs);
        return -1;
    }
    inflateEnd(&zs);
    return total;
}

}  // extern "C"  (template below needs C++ linkage)

// Fused cast + scale + flip + permute:
//   input : raw voxel bytes, dtype_code, Fortran-ordered (x fastest), shape (nx,ny,nz)
//   output: float32, C-ordered (Z,Y,X) i.e. out[z][y][x], with optional
//           per-input-axis flips (applied in input index space) and
//           slope/inter intensity scaling.
//
// dtype codes match the NIfTI datatype field (subset):
//   2=u8 4=i16 8=i32 16=f32 64=f64 256=i8 512=u16 768=u32
//
// The (X,Y,Z)->(Z,Y,X) transpose + flips are folded into the index math of
// ONE write pass; inner loop walks x (input-contiguous) for stream reads.
template <typename T>
static void cast_loop(const T* in, float* out,
                      long long nx, long long ny, long long nz,
                      int fx, int fy, int fz,
                      float slope, float inter) {
    for (long long z = 0; z < nz; ++z) {
        long long zi = fz ? (nz - 1 - z) : z;
        for (long long y = 0; y < ny; ++y) {
            long long yi = fy ? (ny - 1 - y) : y;
            const T* row = in + (zi * ny + yi) * nx;
            float* orow = out + (z * ny + y) * nx;
            if (fx) {
                for (long long x = 0; x < nx; ++x)
                    orow[x] = static_cast<float>(row[nx - 1 - x]) * slope + inter;
            } else {
                for (long long x = 0; x < nx; ++x)
                    orow[x] = static_cast<float>(row[x]) * slope + inter;
            }
        }
    }
}

extern "C" int nn_cast_reorient_f32(const uint8_t* raw, int dtype_code,
                         long long nx, long long ny, long long nz,
                         int fx, int fy, int fz,
                         float slope, float inter,
                         float* out) {
    switch (dtype_code) {
        case 2:   cast_loop(reinterpret_cast<const uint8_t*>(raw),  out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 4:   cast_loop(reinterpret_cast<const int16_t*>(raw),  out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 8:   cast_loop(reinterpret_cast<const int32_t*>(raw),  out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 16:  cast_loop(reinterpret_cast<const float*>(raw),    out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 64:  cast_loop(reinterpret_cast<const double*>(raw),   out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 256: cast_loop(reinterpret_cast<const int8_t*>(raw),   out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 512: cast_loop(reinterpret_cast<const uint16_t*>(raw), out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        case 768: cast_loop(reinterpret_cast<const uint32_t*>(raw), out, nx, ny, nz, fx, fy, fz, slope, inter); break;
        default: return -1;
    }
    return 0;
}


