// Native I/O kernels: SciDAC/DML site-rotated CRC32 checksum and
// big-endian byte swaps for ILDG gauge-configuration I/O.
//
// Reference: io/dml.c (`DML_checksum_accum`: per-site CRC32 combined as
// suma ^= rotl(crc, rank % 29), sumb ^= rotl(crc, rank % 31)) and the
// byte-swap helpers of io/utils.c.  These are the host-side hot loops of
// checkpoint write/read at production volumes (32^3 x 64 = 2M sites x 1152
// bytes), so they are native C++ like the reference's; the Python layer
// falls back to a vectorized numpy implementation when the shared object
// is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o _native.so checksum.cpp  (see
// tmlqcd_tpu/native/__init__.py, which compiles and caches on first use).

#include <cstdint>
#include <cstddef>

namespace {

// CRC-32 (IEEE 802.3, poly 0xEDB88320), table-driven — matches zlib's crc32.
struct Crc32Table {
    uint32_t t[256];
    Crc32Table() {
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t c = i;
            for (int k = 0; k < 8; ++k)
                c = (c & 1u) ? 0xEDB88320u ^ (c >> 1) : (c >> 1);
            t[i] = c;
        }
    }
};
const Crc32Table kCrc;

inline uint32_t crc32_bytes(const uint8_t* p, size_t n) {
    uint32_t c = 0xFFFFFFFFu;
    for (size_t i = 0; i < n; ++i)
        c = kCrc.t[(c ^ p[i]) & 0xFFu] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

inline uint32_t rotl32(uint32_t x, uint32_t s) {
    s &= 31u;
    return s ? ((x << s) | (x >> (32u - s))) : x;
}

}  // namespace

extern "C" {

// DML/SciDAC checksum over `nsites` consecutive sites of `site_bytes` each,
// with global lexicographic ranks starting at `rank0`.  Accumulates into
// *suma/*sumb (callers zero-init or chain across shards).
void tmlqcd_scidac_checksum(const uint8_t* data, uint64_t site_bytes,
                            uint64_t nsites, uint64_t rank0,
                            uint32_t* suma, uint32_t* sumb) {
    uint32_t a = *suma, b = *sumb;
    for (uint64_t s = 0; s < nsites; ++s) {
        uint32_t crc = crc32_bytes(data + s * site_bytes, site_bytes);
        uint64_t rank = rank0 + s;
        a ^= rotl32(crc, (uint32_t)(rank % 29u));
        b ^= rotl32(crc, (uint32_t)(rank % 31u));
    }
    *suma = a;
    *sumb = b;
}

// In-place 64-bit byte swap of n elements (ILDG binary data is big-endian).
void tmlqcd_byteswap64(uint8_t* data, uint64_t n) {
    for (uint64_t i = 0; i < n; ++i) {
        uint8_t* p = data + 8 * i;
        uint8_t t;
        t = p[0]; p[0] = p[7]; p[7] = t;
        t = p[1]; p[1] = p[6]; p[6] = t;
        t = p[2]; p[2] = p[5]; p[5] = t;
        t = p[3]; p[3] = p[4]; p[4] = t;
    }
}

// In-place 32-bit byte swap.
void tmlqcd_byteswap32(uint8_t* data, uint64_t n) {
    for (uint64_t i = 0; i < n; ++i) {
        uint8_t* p = data + 4 * i;
        uint8_t t;
        t = p[0]; p[0] = p[3]; p[3] = t;
        t = p[1]; p[1] = p[2]; p[2] = t;
    }
}

}  // extern "C"
