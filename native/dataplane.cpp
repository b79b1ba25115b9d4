// DSRL-TPU native data plane: threaded PNG decode + fused label translation.
//
// The training input pipeline's host-side cost is PNG decode of 1024x2048
// Cityscapes frames (the reference spent it inside PIL/torchvision worker
// processes, /root/reference/command_handlers/train_or_resume.py:147-153).
// This library decodes image/label pairs on a C++ thread pool (libpng +
// zlib), applies the 34->19 label LUT during the decode pass, and writes
// straight into the caller-provided batch buffer — zero Python-side copies.
//
// Exposed C ABI (consumed via ctypes from
// dualsuperreslearningforsemseg_tpu/data/native.py):
//   dp_version() -> int
//   dp_decode_png(path, out, cap, &h, &w, &c) -> 0/err
//   dp_decode_pair_batch(img_paths, seg_paths, n, imgs_out, segs_out,
//                        h, w, lut_or_null, threads) -> 0/err
//   dp_warp_pair_batch(...) -> 0/err      (affine warp, see below)
//   dp_labels_g16_t(segs, n, oh, ow, out, threads) -> 0/err
//                                         (fused-tail label layout)

// DP_FORCE_ZLIB compile-checks the fallback branch on hosts that do have
// libdeflate (`make check-zlib-fallback`).
#if !defined(DP_FORCE_ZLIB) && defined(__has_include)
#  if __has_include(<libdeflate.h>)
#    define DP_HAVE_LIBDEFLATE 1
#  endif
#endif
#ifdef DP_HAVE_LIBDEFLATE
#include <libdeflate.h>  // ~2x faster inflate than zlib; optional
#endif
#include <png.h>
#include <zlib.h>  // inflate fallback + crc32 (always linked via libpng)
#if defined(__SSE4_1__)
#include <immintrin.h>
#endif

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <utility>
#include <vector>

namespace {

struct DecodeResult {
  int height = 0;
  int width = 0;
  int channels = 0;
  int error = 0;  // 0 ok; 1 open; 2 not-png; 3 decode; 4 overflow
};

// Decode one PNG into `out` (row-major, tightly packed, 8-bit). If
// force_channels is 3 the output is RGB (gray/palette/RGBA converted); if 1
// the output is a single channel (assumes grayscale source - label maps).
DecodeResult decode_png(const char* path, uint8_t* out, size_t out_cap,
                        int force_channels) {
  DecodeResult res;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    res.error = 1;
    return res;
  }
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    res.error = 2;
    return res;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {  // allocation failure: report, don't deref null in png_jmpbuf
    std::fclose(fp);
    res.error = 6;
    return res;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    res.error = 6;
    return res;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    res.error = 3;
    return res;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (force_channels == 3) {
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    // Drop alpha if present.
    png_set_strip_alpha(png);
  } else if (force_channels == 1) {
    if (color_type == PNG_COLOR_TYPE_RGB ||
        color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
        color_type == PNG_COLOR_TYPE_PALETTE)
      png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  int channels = static_cast<int>(rowbytes / width);
  if (rowbytes * height > out_cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    res.error = 4;
    return res;
  }
  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  res.height = static_cast<int>(height);
  res.width = static_cast<int>(width);
  res.channels = channels;
  return res;
}

// ---------------------------------------------------------------------------
// Fast-path PNG decode: whole-file read -> chunk walk -> one libdeflate
// inflate -> unfilter straight into the caller's batch buffer.  libpng's
// incremental row machinery costs ~3x more on large frames (measured 47 ms
// vs ~14 ms per 1024x2048 Cityscapes-sized pair on one core); training-input
// decode is the host pipeline's dominant cost so the common case — 8-bit
// non-interlaced gray/RGB, which is exactly what Cityscapes ships — takes
// this path and everything else falls back to decode_png() above.
// ---------------------------------------------------------------------------

// Paeth predictor (PNG spec pseudocode).
inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

#if defined(__SSE4_1__)
// Paeth unfilter for RGB rows, SIMD across the 3 channels.  The recurrence
// is serial in pixels (each output feeds the next pixel's `a`), so the win
// is doing the 16-bit predictor math for all channels at once — ~3x over
// the scalar chain (scalar Paeth was 18 of the 39 ms/pair decode cost on
// Cityscapes-sized frames; adaptive PNG encoders pick Paeth for ~40% of
// photographic rows).  Same selection/tie-break order as paeth() above.
inline void paeth_row_bpp3_simd(uint8_t* dst, const uint8_t* prev, size_t n) {
  const __m128i zero = _mm_setzero_si128();
  __m128i a = zero, c = zero;  // left / upper-left, u16 lanes
  size_t i = 0;
  // 4-byte loads/stores read one byte past the 3 consumed; the next
  // iteration overwrites it, so stop while a full 4 bytes remain.
  for (; i + 4 <= n; i += 3) {
    // memcpy'd 4-byte loads/stores: same movd codegen as a reinterpret_cast
    // but without the unaligned, non-char-direction aliasing UB (the int
    // accesses would be allowed to reorder against the uint8_t row stores).
    uint32_t raw, prv;
    std::memcpy(&raw, dst + i, 4);
    std::memcpy(&prv, prev + i, 4);
    __m128i b = _mm_unpacklo_epi8(
        _mm_cvtsi32_si128(static_cast<int>(prv)), zero);
    __m128i x = _mm_unpacklo_epi8(_mm_cvtsi32_si128(static_cast<int>(raw)), zero);
    const __m128i pa = _mm_abs_epi16(_mm_sub_epi16(b, c));  // |p-a| = |b-c|
    const __m128i pb = _mm_abs_epi16(_mm_sub_epi16(a, c));  // |p-b| = |a-c|
    const __m128i pc = _mm_abs_epi16(
        _mm_add_epi16(_mm_sub_epi16(b, c), _mm_sub_epi16(a, c)));
    const __m128i smallest = _mm_min_epi16(pc, _mm_min_epi16(pa, pb));
    // nearest = pa smallest ? a : (pb smallest ? b : c)  (pa-first ties)
    __m128i nearest = _mm_blendv_epi8(
        _mm_blendv_epi8(c, b, _mm_cmpeq_epi16(smallest, pb)), a,
        _mm_cmpeq_epi16(smallest, pa));
    x = _mm_and_si128(_mm_add_epi16(x, nearest), _mm_set1_epi16(0xff));
    const __m128i packed = _mm_packus_epi16(x, x);
    // Write 3 result bytes; byte 3 must stay the next pixel's RAW value
    // (it is reloaded as input next iteration).
    const uint32_t outw =
        (static_cast<uint32_t>(_mm_cvtsi128_si32(packed)) & 0x00ffffffu) |
        (raw & 0xff000000u);
    std::memcpy(dst + i, &outw, 4);
    c = b;
    a = x;
  }
  for (; i < n; ++i)  // final pixel's bytes (or whole sub-pixel rows), scalar
    dst[i] += paeth(i >= 3 ? dst[i - 3] : 0, prev[i],
                    i >= 3 ? prev[i - 3] : 0);
}
#endif  // __SSE4_1__

// Undo one row's filter in place.  `row` holds the filtered bytes, `prev` the
// previous UNFILTERED row (nullptr for the first).  `n` bytes, `bpp` bytes
// per pixel.
void unfilter_row(int filter, uint8_t* row, const uint8_t* prev, size_t n,
                  size_t bpp) {
  switch (filter) {
    case 0:
      break;
    case 1:  // Sub
      for (size_t i = bpp; i < n; ++i) row[i] += row[i - bpp];
      break;
    case 2:  // Up
      if (prev)
        for (size_t i = 0; i < n; ++i) row[i] += prev[i];
      break;
    case 3:  // Average
      if (prev) {
        for (size_t i = 0; i < bpp; ++i) row[i] += prev[i] >> 1;
        for (size_t i = bpp; i < n; ++i)
          row[i] += static_cast<uint8_t>((row[i - bpp] + prev[i]) >> 1);
      } else {
        for (size_t i = bpp; i < n; ++i) row[i] += row[i - bpp] >> 1;
      }
      break;
    case 4:  // Paeth
      if (prev) {
#if defined(__SSE4_1__)
        if (bpp == 3) {
          paeth_row_bpp3_simd(row, prev, n);
          break;
        }
#endif
        for (size_t i = 0; i < bpp; ++i) row[i] += prev[i];  // a = c = 0
        for (size_t i = bpp; i < n; ++i)
          row[i] += paeth(row[i - bpp], prev[i], prev[i - bpp]);
      } else {
        for (size_t i = bpp; i < n; ++i) row[i] += row[i - bpp];  // b = c = 0
      }
      break;
    default:
      break;
  }
}

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Attempt the fast path.  Returns true when it handled the file (res filled
// in, success or hard error); false means "format outside the fast path —
// use libpng".
bool decode_png_fast(const char* path, uint8_t* out, size_t out_cap,
                     int force_channels, DecodeResult* res) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    res->error = 1;
    return true;
  }
  std::fseek(fp, 0, SEEK_END);
  long fsz = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  if (fsz < 45) {  // signature + IHDR + one empty IDAT + IEND
    std::fclose(fp);
    return false;
  }
  if (fsz > (1L << 30)) {  // not a dataset frame: don't slurp multi-GB files
    std::fclose(fp);      // (libpng streams; its out_cap check rejects them)
    return false;
  }
  std::vector<uint8_t> file(static_cast<size_t>(fsz));
  if (std::fread(file.data(), 1, file.size(), fp) != file.size()) {
    std::fclose(fp);
    res->error = 3;
    return true;
  }
  std::fclose(fp);

  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(file.data(), kSig, 8) != 0) {
    res->error = 2;
    return true;
  }

  // Walk chunks: IHDR first, gather the IDAT spans.
  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  // (offset, length) of each IDAT payload in `file`.
  std::vector<std::pair<size_t, size_t>> idats;
  size_t idat_total = 0;
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    const uint8_t* type = &file[pos + 4];
    size_t data = pos + 8;
    if (data + len + 4 > file.size()) break;  // truncated
    if (std::memcmp(type, "IHDR", 4) == 0 && len >= 13) {
      // IHDR fields steer buffer geometry, so verify this one chunk's CRC
      // (covers type + data); pixel-data integrity is the zlib adler32's
      // job (see the inflate call below).
      if (crc32(crc32(0, type, 4), &file[data], len) != be32(&file[data + len])) {
        res->error = 2;
        return true;
      }
      width = be32(&file[data]);
      height = be32(&file[data + 4]);
      bit_depth = file[data + 8];
      color_type = file[data + 9];
      interlace = file[data + 12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idats.emplace_back(data, len);
      idat_total += len;
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos = data + len + 4;  // skip CRC
  }
  // Fast path only for 8-bit non-interlaced gray (0) and RGB (2).
  // Dimension sanity mirrors libpng's default 1M-pixel-per-side limit:
  // IHDR is untrusted input, and without the bound `rowbytes * height`
  // (size_t) can WRAP for crafted headers — sliding a giant image under
  // out_cap — while huge-but-non-wrapping dims would throw bad_alloc
  // across this extern "C" boundary and terminate the process.
  if (width == 0 || height == 0 || width > 1000000u || height > 1000000u ||
      bit_depth != 8 || interlace != 0 ||
      (color_type != 0 && color_type != 2) || idats.empty())
    return false;
  int channels = color_type == 2 ? 3 : 1;
  if (channels != force_channels) return false;  // conversion -> libpng

  const size_t rowbytes = static_cast<size_t>(width) * channels;
  if (rowbytes * height > out_cap) {  // bounded above: cannot wrap
    res->error = 4;
    return true;
  }

  // One contiguous zlib stream across all IDAT chunks.
  const uint8_t* zsrc = &file[idats[0].first];
  std::vector<uint8_t> joined;
  if (idats.size() > 1) {
    joined.reserve(idat_total);
    for (auto& span : idats)
      joined.insert(joined.end(), &file[span.first],
                    &file[span.first] + span.second);
    zsrc = joined.data();
  }

  const size_t raw_size = (rowbytes + 1) * height;  // +1 filter byte per row
  std::vector<uint8_t> raw(raw_size);
  // Integrity: the zlib container's adler32 (verified by both inflaters
  // below) covers every pixel byte, so per-chunk IDAT CRCs add no coverage
  // and are skipped; IHDR's CRC IS checked above because its fields steer
  // the unfilter geometry and are not under the adler.
#ifdef DP_HAVE_LIBDEFLATE
  libdeflate_decompressor* dec = libdeflate_alloc_decompressor();
  size_t actual = 0;
  libdeflate_result zr = libdeflate_zlib_decompress(
      dec, zsrc, idat_total, raw.data(), raw_size, &actual);
  libdeflate_free_decompressor(dec);
  if (zr != LIBDEFLATE_SUCCESS || actual != raw_size) {
    res->error = 3;
    return true;
  }
#else
  uLongf actual = raw_size;
  uLong srclen = idat_total;
  if (uncompress2(raw.data(), &actual, zsrc, &srclen) != Z_OK ||
      actual != raw_size) {
    res->error = 3;
    return true;
  }
#endif

  // Unfilter each row straight into the output buffer.
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* src = &raw[(rowbytes + 1) * y];
    if (src[0] > 4) {  // malformed filter byte: reject, don't emit garbage
      res->error = 5;
      return true;
    }
    uint8_t* dst = out + rowbytes * y;
    std::memcpy(dst, src + 1, rowbytes);
    unfilter_row(src[0], dst, prev, rowbytes, channels);
    prev = dst;
  }

  res->height = static_cast<int>(height);
  res->width = static_cast<int>(width);
  res->channels = channels;
  res->error = 0;
  return true;
}

// Fast path when applicable, libpng otherwise.  The catch is load-bearing:
// an exception (bad_alloc from the file/raw vectors on a pathological
// input) must not unwind across the extern "C"/ctypes boundary or escape a
// worker thread — either std::terminate()s the whole training process where
// the Python layer expects an error code.
DecodeResult decode_png_auto(const char* path, uint8_t* out, size_t out_cap,
                             int force_channels) {
  DecodeResult res;
  try {
    if (decode_png_fast(path, out, out_cap, force_channels, &res)) return res;
    return decode_png(path, out, out_cap, force_channels);
  } catch (...) {
    res.error = 6;
    return res;
  }
}

// Shared body of the pair-batch decode exports.  On failure, stores the
// error code AND the batch index of the failing pair via one
// compare-exchange so concurrent failures report one coherent (code, index)
// pair; `bad_index` may be null (legacy export).
int decode_pair_batch_impl(const char** img_paths, const char** seg_paths,
                           int n, uint8_t* imgs_out, uint8_t* segs_out, int h,
                           int w, const uint8_t* lut, int threads,
                           int* bad_index) {
  if (threads < 1) threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> err{0};
  std::atomic<int> bad{-1};
  const size_t img_sz = static_cast<size_t>(h) * w * 3;
  const size_t seg_sz = static_cast<size_t>(h) * w;

  auto fail = [&](int code, int index) {
    int expected = 0;  // first failure wins; later ones keep its identity
    if (err.compare_exchange_strong(expected, code)) bad.store(index);
  };

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      DecodeResult ri =
          decode_png_auto(img_paths[i], imgs_out + i * img_sz, img_sz, 3);
      if (ri.error || ri.height != h || ri.width != w || ri.channels != 3) {
        fail(ri.error ? ri.error : 7, i);  // 7: unexpected dimensions
        return;
      }
      uint8_t* seg = segs_out + i * seg_sz;
      DecodeResult rs = decode_png_auto(seg_paths[i], seg, seg_sz, 1);
      if (rs.error || rs.height != h || rs.width != w || rs.channels != 1) {
        fail(rs.error ? rs.error : 7, i);
        return;
      }
      if (lut != nullptr) {
        for (size_t p = 0; p < seg_sz; ++p) seg[p] = lut[seg[p]];
      }
    }
  };

  std::vector<std::thread> pool;
  int nt = threads < n ? threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  if (bad_index != nullptr) *bad_index = bad.load();
  return err.load();
}

}  // namespace

extern "C" {

// ABI version of this library.  Bump whenever an export is added/changed so
// data/native.py can detect a stale .so left over from an older build and
// rebuild instead of loading it (v2: dp_warp_pair_batch, dp_labels_positions_t;
// v3: libdeflate fast-path decode; v4: dp_labels_g16_t replaces
// dp_labels_positions_t — the fused tail's cols-layout label operand;
// v5: dp_decode_pair_batch2 reports the failing pair's index, dimension
// mismatch gets its own code 7, alloc-failure paths return 6 instead of
// aborting the process).
int dp_version() { return 5; }

int dp_decode_png(const char* path, uint8_t* out, int64_t out_cap, int* h,
                  int* w, int* c, int force_channels) {
  DecodeResult r =
      decode_png_auto(path, out, static_cast<size_t>(out_cap), force_channels);
  *h = r.height;
  *w = r.width;
  *c = r.channels;
  return r.error;
}

// Decode n (image, label) pairs into contiguous batch buffers.
//   imgs_out: n * h * w * 3 bytes;  segs_out: n * h * w bytes.
// Each file must decode to exactly (h, w). `lut` (256 bytes) is applied to
// label pixels when non-null. Returns 0 or the first nonzero error code.
int dp_decode_pair_batch(const char** img_paths, const char** seg_paths,
                         int n, uint8_t* imgs_out, uint8_t* segs_out, int h,
                         int w, const uint8_t* lut, int threads) {
  return decode_pair_batch_impl(img_paths, seg_paths, n, imgs_out, segs_out,
                                h, w, lut, threads, nullptr);
}

// v5 variant: `bad_index` (non-null) receives the batch index of the first
// failing pair, -1 on success — so a corrupt file in a 3000-image epoch is
// reported by NAME at the Python layer instead of as a bare code.
int dp_decode_pair_batch2(const char** img_paths, const char** seg_paths,
                          int n, uint8_t* imgs_out, uint8_t* segs_out, int h,
                          int w, const uint8_t* lut, int threads,
                          int* bad_index) {
  return decode_pair_batch_impl(img_paths, seg_paths, n, imgs_out, segs_out,
                                h, w, lut, threads, bad_index);
}

// Affine-warp n (image, label) pairs: bilinear for images (fill 0), nearest
// for labels (fill 255, then LUT).  ``mats`` holds n row-major 2x3 matrices
// mapping OUTPUT pixel coords to SOURCE coords (center convention), matching
// data/augment.py's _sample_affine composition.  This removes the warp's
// dynamic gathers from the TPU program — profiling showed each 4M-row gather
// costs ~180 ms on-device while the MXU sits idle.
int dp_warp_pair_batch(const uint8_t* imgs_in, const uint8_t* segs_in, int n,
                       int h0, int w0, const float* mats, int oh, int ow,
                       uint8_t* imgs_out, uint8_t* segs_out,
                       const uint8_t* lut, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next{0};
  const size_t in_img = static_cast<size_t>(h0) * w0 * 3;
  const size_t in_seg = static_cast<size_t>(h0) * w0;
  const size_t out_img = static_cast<size_t>(oh) * ow * 3;
  const size_t out_seg = static_cast<size_t>(oh) * ow;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* src = imgs_in + i * in_img;
      const uint8_t* sseg = segs_in + i * in_seg;
      uint8_t* dst = imgs_out + i * out_img;
      uint8_t* dseg = segs_out + i * out_seg;
      const float m00 = mats[i * 6 + 0], m01 = mats[i * 6 + 1],
                  m02 = mats[i * 6 + 2], m10 = mats[i * 6 + 3],
                  m11 = mats[i * 6 + 4], m12 = mats[i * 6 + 5];
      // LUT hoisted to an always-valid table so the hot loop is branch-free.
      uint8_t ident[256];
      const uint8_t* L = lut;
      if (L == nullptr) {
        for (int v = 0; v < 256; ++v) ident[v] = static_cast<uint8_t>(v);
        L = ident;
      }
      // Full-precision sample of one output pixel; bounds-checked with the
      // fill/clamp conventions above.  Used for the row borders.
      auto sample_px = [&](float sx, float sy, uint8_t* px, uint8_t* pl) {
        if (sx >= 0.f && sx <= w0 - 1.f && sy >= 0.f && sy <= h0 - 1.f) {
          int x0 = static_cast<int>(sx);
          int y0 = static_cast<int>(sy);
          int x1 = x0 + 1 < w0 ? x0 + 1 : w0 - 1;
          int y1 = y0 + 1 < h0 ? y0 + 1 : h0 - 1;
          float fx = sx - x0, fy = sy - y0;
          const uint8_t* p00 = src + (static_cast<size_t>(y0) * w0 + x0) * 3;
          const uint8_t* p01 = src + (static_cast<size_t>(y0) * w0 + x1) * 3;
          const uint8_t* p10 = src + (static_cast<size_t>(y1) * w0 + x0) * 3;
          const uint8_t* p11 = src + (static_cast<size_t>(y1) * w0 + x1) * 3;
          const float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
          const float w10 = (1 - fx) * fy, w11 = fx * fy;
          for (int c = 0; c < 3; ++c) {
            float v = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
            px[c] = static_cast<uint8_t>(v + 0.5f);
          }
        } else {
          px[0] = px[1] = px[2] = 0;
        }
        int xr = static_cast<int>(sx + 0.5f);
        int yr = static_cast<int>(sy + 0.5f);
        uint8_t label = 255;
        if (xr >= 0 && xr < w0 && yr >= 0 && yr < h0 && sx >= -0.5f && sy >= -0.5f) {
          label = sseg[static_cast<size_t>(yr) * w0 + xr];
        }
        *pl = L[label];
      };
      // Interval of x where sx = m00*x + b stays inside [lo, hi], with a
      // margin absorbing the 16.16 fixed-point drift of the interior loop.
      // The drift bound is (ow + 1) * 0.5/65536 px (rounding of the start
      // coord plus ow accumulations of a rounded increment), so the margin
      // SCALES with ow instead of assuming a width class — a fixed 0.02
      // would silently stop covering the loop beyond ~2600-wide outputs and
      // let near-edge interior pixels read out of bounds.
      auto span = [](float m, float b, float lo, float hi, int ow_) {
        const double margin = 1e-3 + (ow_ + 1) * (0.5 / 65536.0);
        double a = lo + margin, z = hi - margin;
        double xa = 0, xb = ow_;
        if (m > 1e-12) { xa = (a - b) / m; xb = (z - b) / m; }
        else if (m < -1e-12) { xa = (z - b) / m; xb = (a - b) / m; }
        else if (b < a || b > z) { return std::pair<int, int>(0, 0); }
        int ia = static_cast<int>(std::ceil(std::min(std::max(0.0, xa),
                                                     static_cast<double>(ow_))));
        int ib = static_cast<int>(std::floor(std::min(static_cast<double>(ow_), xb + 1)));
        return std::pair<int, int>(ia, ib < ia ? ia : ib);
      };
      const int32_t dsxf = static_cast<int32_t>(std::lrint(m00 * 65536.0));
      const int32_t dsyf = static_cast<int32_t>(std::lrint(m10 * 65536.0));
      for (int y = 0; y < oh; ++y) {
        const float base_x = m01 * y + m02;
        const float base_y = m11 * y + m12;
        uint8_t* drow = dst + static_cast<size_t>(y) * ow * 3;
        uint8_t* lrow = dseg + static_cast<size_t>(y) * ow;
        // Interior: every bilinear tap in-bounds WITHOUT clamping
        // (sx < w0-1 so x0+1 is valid; same for y), nearest label too.
        auto sx_span = span(m00, base_x, 0.f, w0 - 1.f, ow);
        auto sy_span = span(m10, base_y, 0.f, h0 - 1.f, ow);
        int xa = sx_span.first > sy_span.first ? sx_span.first : sy_span.first;
        int xb = sx_span.second < sy_span.second ? sx_span.second : sy_span.second;
        if (xb <= xa) { xa = xb = 0; }
        for (int x = 0; x < xa; ++x)
          sample_px(m00 * x + base_x, m10 * x + base_y, drow + x * 3, lrow + x);
        // Measured rejection (round 3): an SSE two-stage formulation
        // (pmaddwd horizontal lerp + pmulld vertical, bit-identical
        // expansion of the same integer expression) gained only 1.21x over
        // this scalar loop — the compiler already auto-vectorizes the
        // address-independent arithmetic, and per-pixel gathers can't be
        // vectorized on this (gather-mitigated) host.  Not worth the
        // complexity; revisit only if the warp dominates a profile.
        // Branch-free fixed-point core: 16.16 coords advanced incrementally,
        // 8-bit bilinear weights (identity transforms hit fx=fy=0 and stay
        // bit-exact; elsewhere the quantization is < 1 gray level).
        int32_t sxf = static_cast<int32_t>(std::lrint((m00 * xa + base_x) * 65536.0));
        int32_t syf = static_cast<int32_t>(std::lrint((m10 * xa + base_y) * 65536.0));
        for (int x = xa; x < xb; ++x, sxf += dsxf, syf += dsyf) {
          const uint32_t x0 = static_cast<uint32_t>(sxf) >> 16;
          const uint32_t y0 = static_cast<uint32_t>(syf) >> 16;
          const uint32_t fx = (static_cast<uint32_t>(sxf) >> 8) & 0xFF;
          const uint32_t fy = (static_cast<uint32_t>(syf) >> 8) & 0xFF;
          const uint8_t* p00 = src + (static_cast<size_t>(y0) * w0 + x0) * 3;
          const uint8_t* p10 = p00 + static_cast<size_t>(w0) * 3;
          const uint32_t w11 = fx * fy;
          const uint32_t w01 = (fx << 8) - w11;
          const uint32_t w10 = (fy << 8) - w11;
          const uint32_t w00 = 65536 - w01 - w10 - w11;
          uint8_t* px = drow + x * 3;
          px[0] = static_cast<uint8_t>(
              (w00 * p00[0] + w01 * p00[3] + w10 * p10[0] + w11 * p10[3] + 32768) >> 16);
          px[1] = static_cast<uint8_t>(
              (w00 * p00[1] + w01 * p00[4] + w10 * p10[1] + w11 * p10[4] + 32768) >> 16);
          px[2] = static_cast<uint8_t>(
              (w00 * p00[2] + w01 * p00[5] + w10 * p10[2] + w11 * p10[5] + 32768) >> 16);
          const uint32_t xr = static_cast<uint32_t>(sxf + 0x8000) >> 16;
          const uint32_t yr = static_cast<uint32_t>(syf + 0x8000) >> 16;
          lrow[x] = L[sseg[static_cast<size_t>(yr) * w0 + xr]];
        }
        for (int x = xb < xa ? xa : xb; x < ow; ++x)
          sample_px(m00 * x + base_x, m10 * x + base_y, drow + x * 3, lrow + x);
      }
    }
  };

  std::vector<std::thread> pool;
  int nt = threads < n ? threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Re-layout n warped label maps (n, oh, ow) into the fused tail kernel's
// g16-major operand (dualsuperreslearningforsemseg_tpu/ops/pallas/
// fused_tail.py): out[g*4 + p][(b, hh, ww)] = segs[b][4*hh + 2*(g/2) + p/2]
//                                                    [4*ww + 2*(g%2) + p%2],
// g = first-ConvT 2x2 position (nested group), p = final-ConvT position —
// row g*4 + p is the full nested g16 index, columns are plain (b, y, x)
// pixel order matching the cols-layout activation rows.  A pure memory
// shuffle here (~3 ms over the decode thread pool, fully overlapped with
// device compute); the same permutation inside the XLA train program costs
// ~7 ms/step of device time at (16,512,1024) on v5e because layout
// assignment stages it through pathological relayouts.
int dp_labels_g16_t(const uint8_t* segs, int n, int oh, int ow,
                    uint8_t* out, int threads) {
  if (oh % 4 || ow % 4) return 1;
  if (threads < 1) threads = 1;
  const int hh = oh / 4, ww = ow / 4;
  const size_t in_seg = static_cast<size_t>(oh) * ow;
  const size_t m = static_cast<size_t>(n) * hh * ww;  // columns per g16 row
  std::atomic<int> next{0};

  auto worker = [&]() {
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= n) return;
      const uint8_t* src = segs + b * in_seg;
      for (int g16 = 0; g16 < 16; ++g16) {
        const int g = g16 >> 2, p = g16 & 3;
        const int row = 2 * (g >> 1) + (p >> 1);   // 2i + k
        const int col = 2 * (g & 1) + (p & 1);     // 2j + l
        uint8_t* dst = out + g16 * m + static_cast<size_t>(b) * hh * ww;
        for (int y = 0; y < hh; ++y) {
          const uint8_t* r = src + static_cast<size_t>(4 * y + row) * ow + col;
          uint8_t* d = dst + static_cast<size_t>(y) * ww;
          for (int x = 0; x < ww; ++x) d[x] = r[4 * x];
        }
      }
    }
  };

  std::vector<std::thread> pool;
  int nt = threads < n ? threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
