// Native CZI subblock decoder + plane assembler.
//
// The reference ingests CZI through a JVM (javabridge + bioformats,
// spectral_image_measurement.py:31) — a per-process virtual machine on the
// hot ingest path. Here the host-side runtime is a small C++ library: the
// Python layer (hiprfish_tpu/io/czi.py) parses the ZISRAW directory once and
// hands this library a flat table of subblock descriptors; the library
// reads, decompresses (zstd) and type-converts pixel data with a thread pool
// and scatters each block into the caller's (Y, X, C) float32 plane.
//
// Build: g++ -O3 -march=native -shared -fPIC czi_native.cc -o libczi_native.so -lzstd -lpthread
// ABI: plain C (ctypes).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>
#include <atomic>

#include <zstd.h>
#include <jpeglib.h>

// -- libjpeg plumbing (CZI compression id 1; the reference reads these
// through bioformats' bundled codec, spectral_image_measurement.py:145) --

namespace {
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr ci) {
  JpegErr* e = reinterpret_cast<JpegErr*>(ci->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG byte stream into caller-provided u8 buffer (row-major,
// interleaved components). Returns true on success.
bool decode_jpeg_u8(const uint8_t* buf, size_t len, uint8_t* out,
                    size_t out_cap, int32_t* w, int32_t* h, int32_t* nc) {
  jpeg_decompress_struct ci;
  JpegErr err;
  ci.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  jpeg_create_decompress(&ci);
  jpeg_mem_src(&ci, const_cast<unsigned char*>(buf), len);
  if (jpeg_read_header(&ci, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  jpeg_start_decompress(&ci);
  const size_t row = (size_t)ci.output_width * ci.output_components;
  if (out_cap < row * ci.output_height) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  while (ci.output_scanline < ci.output_height) {
    JSAMPROW rows[1] = {out + (size_t)ci.output_scanline * row};
    jpeg_read_scanlines(&ci, rows, 1);
  }
  *w = ci.output_width;
  *h = ci.output_height;
  *nc = ci.output_components;
  jpeg_finish_decompress(&ci);
  jpeg_destroy_decompress(&ci);
  return true;
}
}  // namespace

extern "C" {

// From jxr.cc (linked into this library): the from-scratch T.832 codec.
int jxr_decode(const uint8_t* buf, int64_t size, uint8_t* out,
               int64_t out_cap, int32_t* w, int32_t* h, int32_t* channels,
               int32_t* bytes_per_sample);

struct SubblockDesc {
  int64_t data_pos;      // absolute file offset of pixel data
  int64_t data_size;     // stored (possibly compressed) byte size
  int32_t y0, x0, c0;    // placement in the output plane
  int32_t sy, sx, sc;    // stored extent
  int32_t pixel_type;    // ZISRAW pixel type id
  int32_t compression;   // 0 = none, 5/6 = zstd0/zstd1
};

static bool decode_block(FILE* f, const SubblockDesc& d, float* out,
                         int64_t H, int64_t W, int64_t C) {
  // Defense in depth: the Python glue validates descriptors against the
  // file and plane, but a write outside (H, W, C) or an unbounded
  // allocation must be impossible even with a hostile descriptor.
  if (d.data_size < 0 || d.data_size > (int64_t{1} << 33)) return false;
  if (d.sy <= 0 || d.sx <= 0 || d.sc <= 0) return false;
  if (d.y0 < 0 || d.x0 < 0 || d.c0 < 0 || d.y0 + d.sy > H ||
      d.x0 + d.sx > W || d.c0 + d.sc > C)
    return false;
  std::vector<uint8_t> raw(d.data_size);
#if defined(_WIN32)
  return false;
#else
  if (fseeko(f, d.data_pos, SEEK_SET) != 0) return false;
#endif
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return false;

  const uint8_t* data = raw.data();
  size_t data_len = raw.size();
  std::vector<uint8_t> scratch;
  if (d.compression == 5 || d.compression == 6) {
    size_t skip = 0;
    if (d.compression == 6 && data_len > 0) skip = 1 + data[0];
    if (skip >= data_len) return false;
    unsigned long long want =
        ZSTD_getFrameContentSize(data + skip, data_len - skip);
    // A valid frame never exceeds the declared plane extent (widest pixel
    // type is 8 bytes); a corrupt frame header must not drive the resize.
    const unsigned long long cap = (unsigned long long)d.sy * d.sx * d.sc * 8;
    if (want == ZSTD_CONTENTSIZE_ERROR || want == ZSTD_CONTENTSIZE_UNKNOWN ||
        want > cap)
      want = cap;
    scratch.resize(want);
    size_t got = ZSTD_decompress(scratch.data(), scratch.size(),
                                 data + skip, data_len - skip);
    if (ZSTD_isError(got)) return false;
    data = scratch.data();
    data_len = got;
  } else if (d.compression == 1) {  // JPEG (libjpeg)
    scratch.resize((size_t)d.sy * d.sx * d.sc);
    int32_t jw, jh, jc;
    if (!decode_jpeg_u8(data, data_len, scratch.data(), scratch.size(),
                        &jw, &jh, &jc))
      return false;
    if (jw != d.sx || jh != d.sy || jc != d.sc) return false;
    // JPEG payloads are interleaved u8 (Y, X, C); place directly.
    for (int64_t y = 0; y < d.sy; ++y) {
      float* dst = out + ((d.y0 + y) * W + d.x0) * C + d.c0;
      const uint8_t* src = scratch.data() + (size_t)y * d.sx * d.sc;
      for (int64_t x = 0; x < d.sx; ++x)
        for (int64_t c = 0; c < d.sc; ++c)
          dst[x * C + c] = src[x * d.sc + c] / 255.0f;
    }
    return true;
  } else if (d.compression == 4) {  // JPEG XR (jxr.cc)
    if (d.sc != 1 || (d.pixel_type != 0 && d.pixel_type != 1))
      return false;
    int bps = d.pixel_type == 1 ? 2 : 1;
    scratch.resize((size_t)d.sy * d.sx * bps);
    int32_t jw, jh, jc, jbps;
    if (jxr_decode(data, (int64_t)data_len, scratch.data(),
                   (int64_t)scratch.size(), &jw, &jh, &jc, &jbps) != 0)
      return false;
    if (jw != d.sx || jh != d.sy || jc != 1 || jbps != bps) return false;
    float scale = bps == 2 ? 65535.0f : 255.0f;
    for (int64_t y = 0; y < d.sy; ++y) {
      float* dst = out + ((d.y0 + y) * W + d.x0) * C + d.c0;
      if (bps == 2) {
        const uint16_t* src =
            (const uint16_t*)scratch.data() + (size_t)y * d.sx;
        for (int64_t x = 0; x < d.sx; ++x) dst[x * C] = src[x] / scale;
      } else {
        const uint8_t* src = scratch.data() + (size_t)y * d.sx;
        for (int64_t x = 0; x < d.sx; ++x) dst[x * C] = src[x] / scale;
      }
    }
    return true;
  } else if (d.compression != 0) {
    return false;
  }

  const int64_t n = (int64_t)d.sy * d.sx * d.sc;
  auto place = [&](auto convert) {
    // Stored layout: (C, Y, X) when sc > 1, else (Y, X).
    for (int64_t c = 0; c < d.sc; ++c) {
      for (int64_t y = 0; y < d.sy; ++y) {
        float* dst = out + ((d.y0 + y) * W + d.x0) * C + (d.c0 + c);
        const int64_t src_row = (c * d.sy + y) * d.sx;
        for (int64_t x = 0; x < d.sx; ++x) {
          dst[x * C] = convert(src_row + x);
        }
      }
    }
  };

  switch (d.pixel_type) {
    case 0: {  // Gray8
      if (data_len < (size_t)n) return false;
      const uint8_t* p = data;
      place([&](int64_t i) { return p[i] / 255.0f; });
      break;
    }
    case 1: {  // Gray16
      if (data_len < (size_t)n * 2) return false;
      const uint16_t* p = (const uint16_t*)data;
      place([&](int64_t i) { return p[i] / 65535.0f; });
      break;
    }
    case 2: {  // Gray32Float
      if (data_len < (size_t)n * 4) return false;
      const float* p = (const float*)data;
      place([&](int64_t i) { return p[i]; });
      break;
    }
    case 12: {  // Gray32
      if (data_len < (size_t)n * 4) return false;
      const int32_t* p = (const int32_t*)data;
      place([&](int64_t i) { return (float)p[i]; });
      break;
    }
    default:
      return false;
  }
  return true;
}

// Standalone JPEG decode for the Python codec registry (io/czi.py
// register_decompressor). Writes interleaved u8 into `out`; returns 0 on
// success, -1 on decode failure / insufficient capacity.
int czi_decode_jpeg(const uint8_t* buf, int64_t len, uint8_t* out,
                    int64_t out_cap, int32_t* w, int32_t* h, int32_t* nc) {
  return decode_jpeg_u8(buf, (size_t)len, out, (size_t)out_cap, w, h, nc)
             ? 0
             : -1;
}

// Assemble one (H, W, C) float32 plane from n subblocks. Returns 0 on
// success, else the number of failed blocks.
int czi_assemble_plane(const char* path, const SubblockDesc* descs,
                       int32_t n, float* out, int64_t H, int64_t W,
                       int64_t C, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    FILE* f = fopen(path, "rb");
    if (!f) { failures += 1; return; }
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (!decode_block(f, descs[i], out, H, W, C)) failures += 1;
    }
    fclose(f);
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
