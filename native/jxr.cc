// JPEG XR (ITU-T T.832 / ISO 29199-2) codec for CZI compression=4
// subblocks — decoder + encoder, no external dependencies.
//
// The reference pipeline reads JPEG XR-compressed CZIs transparently
// through bioformats' bundled codec (JVM loaders,
// hiprfish-image-analysis-biofilm/hiprfish_imaging_biofilm_analysis.py:55-132;
// hiprfish-image-analysis-ecoli/hiprfish_imaging_spectral_image_measurement.py:145).
// This module replaces that with a native implementation exposed to
// Python over ctypes (hiprfish_tpu/io/jxr.py) and auto-registered for
// CZI compression id 4 (hiprfish_tpu/io/czi.py).
//
// SCOPE AND FIDELITY. The container (TIFF-like, II BC 01), codestream
// headers (IMAGE_HEADER "WMPHOTO", IMAGE_PLANE_HEADER), band structure
// (DC / LP / HP + inline flexbits), two-level 4x4 lapped transform with
// OVERLAP_MODE 0/1/2, quantizer index mapping, adaptive DC/LP/HP
// prediction, adaptive coefficient scan reordering, and
// backward-adaptive VLC table switching follow the T.832 architecture.
// The exact VLC code tables and the lifting rounding of the overlap
// operators are this implementation's own (documented below): no JPEG XR
// implementation, golden file, or network egress exists in this build
// environment to validate bit-level interop against, so bit-exact
// decoding of third-party (e.g. Zeiss service-pack) streams is NOT
// claimed — see docs/jxr_residual_risk note in io/jxr.py. What IS
// guaranteed, and covered by tests/test_jxr.py: encode->decode is
// bit-exact lossless at qp<=1 for Gray8/Gray16/RGB24 at arbitrary image
// sizes, tile grids, and overlap modes; lossy rates track the quantizer
// monotonically; corrupt/truncated input fails with an error code, never
// a crash or unbounded allocation.
//
// Features: SPATIAL mode; YONLY + (RGB via reversible RCT) YUV444
// internal; BD8 / BD16 unsigned; soft tiling (overlap filters cross tile
// boundaries, entropy contexts reset per tile) with an index table.
// Rejected with clear errors: FREQUENCY mode, alpha planes, windowing
// margins, chroma subsampling, float/signed bit depths.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace jxr {

// ---------------------------------------------------------------------------
// Error codes (mirrored in hiprfish_tpu/io/jxr.py)
// ---------------------------------------------------------------------------
enum {
  JXR_OK = 0,
  JXR_E_TRUNCATED = -1,     // input ends mid-structure
  JXR_E_SIGNATURE = -2,     // not a JPEG XR container / codestream
  JXR_E_UNSUPPORTED = -3,   // valid but outside the supported subset
  JXR_E_CORRUPT = -4,       // structurally invalid stream
  JXR_E_BUFFER = -5,        // caller buffer too small
  JXR_E_ARGS = -6,          // bad encode arguments
};

// ---------------------------------------------------------------------------
// Bit IO — MSB-first within bytes (T.832 codestream bit order).
// ---------------------------------------------------------------------------
struct BitReader {
  const uint8_t* buf;
  int64_t size;     // bytes
  int64_t pos;      // bit position
  bool overrun;
  BitReader(const uint8_t* b, int64_t n) : buf(b), size(n), pos(0),
                                           overrun(false) {}
  uint32_t bit() {
    if (pos >= size * 8) { overrun = true; return 0; }
    uint32_t v = (buf[pos >> 3] >> (7 - (pos & 7))) & 1;
    pos++;
    return v;
  }
  uint32_t bits(int n) {            // n <= 32
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | bit();
    return v;
  }
  uint64_t bits64(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | bit();
    return v;
  }
  void align() { pos = (pos + 7) & ~int64_t(7); }
  int64_t byte_pos() const { return (pos + 7) >> 3; }
  void seek_byte(int64_t byte) { pos = byte * 8; if (byte > size) overrun = true; }
};

struct BitWriter {
  std::vector<uint8_t> out;
  uint32_t acc;
  int nacc;
  BitWriter() : acc(0), nacc(0) {}
  void bit(uint32_t v) {
    acc = (acc << 1) | (v & 1);
    if (++nacc == 8) { out.push_back(uint8_t(acc)); acc = 0; nacc = 0; }
  }
  void bits(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) bit((v >> i) & 1);
  }
  void bits64(uint64_t v, int n) {
    for (int i = n - 1; i >= 0; i--) bit(uint32_t((v >> i) & 1));
  }
  void align() { while (nacc) bit(0); }
  int64_t byte_size() const { return int64_t(out.size()) + (nacc ? 1 : 0); }
};

// Exp-Golomb order 0 (gamma code of v+1): prefix of z zeros, then v+1 in
// z+1 bits. Used for VLC escapes and long zero runs.
static void eg_write(BitWriter& bw, uint32_t v) {
  uint32_t x = v + 1;
  int z = 0;
  for (uint32_t t = x; t > 1; t >>= 1) z++;
  bw.bits(0, z);
  bw.bits(x, z + 1);
}
static uint32_t eg_read(BitReader& br) {
  int z = 0;
  while (!br.overrun && br.bit() == 0) { if (++z > 31) { br.overrun = true; return 0; } }
  if (br.overrun) return 0;
  uint32_t x = 1;
  for (int i = 0; i < z; i++) x = (x << 1) | br.bit();
  return x - 1;
}

// ---------------------------------------------------------------------------
// Canonical Huffman tables + backward-adaptive table selection.
//
// T.832 switches among a fixed ladder of code tables per syntax element
// using a running discriminant of code-length differences (its
// "adaptive VLC" layer). Same mechanism here; the ladders below are this
// implementation's own (skewed -> flat), each a full Kraft tree, checked
// at startup.
// ---------------------------------------------------------------------------
struct HuffTable {
  int n;                    // alphabet size (<= 16)
  uint8_t len[16];          // code lengths
  uint16_t code[16];        // canonical codes, MSB-first
  void build() {
    // canonical: sort by (len, symbol)
    uint16_t next = 0;
    for (int l = 1; l <= 15; l++) {
      for (int s = 0; s < n; s++)
        if (len[s] == l) code[s] = next++;
      next <<= 1;
    }
  }
  bool kraft_full() const {
    int64_t sum = 0;
    for (int s = 0; s < n; s++) sum += int64_t(1) << (15 - len[s]);
    return sum == (int64_t(1) << 15);
  }
};

struct AdaptiveHuff {
  const HuffTable* tables;
  int ntables;
  int cur;
  int discr;                // drift toward neighbour tables
  static const int THRESH = 8;
  void reset(const HuffTable* t, int nt) {
    tables = t; ntables = nt; cur = 0; discr = 0;
  }
  void adapt(int sym) {
    // positive discr: the next (flatter) table would have been cheaper
    if (cur + 1 < ntables)
      discr += int(tables[cur].len[sym]) - int(tables[cur + 1].len[sym]);
    else if (cur > 0)
      discr += int(tables[cur].len[sym]) - int(tables[cur - 1].len[sym]);
    if (discr > THRESH) {
      if (cur + 1 < ntables) cur++;
      discr = 0;
    } else if (discr < -THRESH) {
      if (cur > 0) cur--;
      discr = 0;
    }
  }
  void write(BitWriter& bw, int sym) {
    const HuffTable& t = tables[cur];
    bw.bits(t.code[sym], t.len[sym]);
    adapt(sym);
  }
  int read(BitReader& br) {
    const HuffTable& t = tables[cur];
    uint16_t acc = 0;
    int l = 0;
    while (l < 15) {
      acc = (acc << 1) | uint16_t(br.bit());
      l++;
      for (int s = 0; s < t.n; s++)
        if (t.len[s] == l && t.code[s] == acc) { adapt(s); return s; }
      if (br.overrun) return 0;
    }
    br.overrun = true;  // no symbol matched: corrupt stream
    return 0;
  }
};

// Ladders. HIGH8: magnitude-class alphabet {0..6, 7=escape}.
static HuffTable g_high8[3];
// RUNLAST6: joint (last in block? x run-class {0,1,>=2}).
static HuffTable g_runlast6[2];
// CBPQ16: 4-bit quad patterns.
static HuffTable g_cbpq16[2];

static bool g_tables_ready = false;
static void init_tables() {
  if (g_tables_ready) return;
  static const uint8_t h8a[8] = {1, 2, 3, 4, 5, 6, 7, 7};
  static const uint8_t h8b[8] = {2, 2, 2, 3, 4, 5, 6, 6};
  static const uint8_t h8c[8] = {3, 3, 3, 3, 3, 3, 3, 3};
  static const uint8_t rl6a[6] = {1, 3, 3, 3, 4, 4};
  static const uint8_t rl6b[6] = {2, 2, 3, 3, 3, 3};
  static const uint8_t cq16a[16] = {1, 2, 3, 4, 5, 6, 7, 8,
                                    9, 10, 11, 12, 13, 14, 15, 15};
  static const uint8_t cq16b[16] = {4, 4, 4, 4, 4, 4, 4, 4,
                                    4, 4, 4, 4, 4, 4, 4, 4};
  auto fill = [](HuffTable& t, const uint8_t* lens, int n) {
    t.n = n;
    memcpy(t.len, lens, n);
    t.build();
    if (!t.kraft_full()) abort();   // programming error, caught in CI
  };
  fill(g_high8[0], h8a, 8); fill(g_high8[1], h8b, 8); fill(g_high8[2], h8c, 8);
  fill(g_runlast6[0], rl6a, 6); fill(g_runlast6[1], rl6b, 6);
  fill(g_cbpq16[0], cq16a, 16); fill(g_cbpq16[1], cq16b, 16);
  g_tables_ready = true;
}

// ---------------------------------------------------------------------------
// Magnitude model: per band x component-class adaptive FLC split
// (T.832's "model bits" / inline flexbits). A magnitude m >= 0 is coded
// as (high = m >> bits) via HIGH8 (+ Exp-Golomb escape) and `bits` raw
// low bits. The split adapts per macroblock from the coded energy.
// ---------------------------------------------------------------------------
struct MagModel {
  int bits;
  int64_t mb_high;          // sum of high parts this MB
  int64_t mb_cnt;
  void reset(int b) { bits = b; mb_high = 0; mb_cnt = 0; }
  void tally(uint32_t high) { mb_high += high; mb_cnt++; }
  void end_mb() {
    if (mb_cnt) {
      if (mb_high > mb_cnt && bits < 14) bits++;
      else if (mb_high == 0 && bits > 0) bits--;
    }
    mb_high = 0; mb_cnt = 0;
  }
};

static void mag_write(BitWriter& bw, AdaptiveHuff& ah, MagModel& m,
                      uint32_t mag) {
  uint32_t high = mag >> m.bits;
  uint32_t sym = high < 7 ? high : 7;
  ah.write(bw, int(sym));
  if (sym == 7) eg_write(bw, high - 7);
  if (m.bits) bw.bits(mag & ((1u << m.bits) - 1), m.bits);
  m.tally(high);
}
static uint32_t mag_read(BitReader& br, AdaptiveHuff& ah, MagModel& m) {
  uint32_t sym = uint32_t(ah.read(br));
  uint32_t high = sym < 7 ? sym : 7 + eg_read(br);
  uint32_t low = m.bits ? br.bits(m.bits) : 0;
  m.tally(high);
  return (high << m.bits) | low;
}

// Signed value (DC residuals): magnitude + sign when nonzero.
static void sval_write(BitWriter& bw, AdaptiveHuff& ah, MagModel& m,
                       int32_t v) {
  uint32_t mag = uint32_t(v < 0 ? -int64_t(v) : v);
  mag_write(bw, ah, m, mag);
  if (mag) bw.bit(v < 0);
}
static int32_t sval_read(BitReader& br, AdaptiveHuff& ah, MagModel& m) {
  uint32_t mag = mag_read(br, ah, m);
  if (!mag) return 0;
  return br.bit() ? -int32_t(mag) : int32_t(mag);
}

// ---------------------------------------------------------------------------
// Adaptive scan order over 15 AC positions (T.832 bubble adaptation:
// promote a position when its nonzero total passes its predecessor's).
// ---------------------------------------------------------------------------
struct AdaptiveScan {
  uint8_t order[15];   // scan slot -> coefficient index 1..15
  uint16_t totals[15];
  void reset(const uint8_t* init) {
    memcpy(order, init, 15);
    for (int i = 0; i < 15; i++) totals[i] = uint16_t(15 - i);
  }
  void hit(int slot) {
    totals[slot]++;
    if (slot > 0 && totals[slot] > totals[slot - 1]) {
      uint16_t tt = totals[slot]; totals[slot] = totals[slot - 1];
      totals[slot - 1] = tt;
      uint8_t to = order[slot]; order[slot] = order[slot - 1];
      order[slot - 1] = to;
    }
  }
};

// Coefficient layout after the in-place 1-D pair transform: per axis the
// positions rank (0, 2, 1, 3) from lowest to highest frequency.
static const uint8_t kAxisFreq[4] = {0, 2, 1, 3};  // freq of position i
static uint8_t g_scan_init[15];
static void init_scan() {
  // stable sort of the 15 AC indices by freq(r)+freq(c)
  int k = 0;
  for (int f = 1; f <= 6; f++)
    for (int idx = 1; idx < 16; idx++) {
      int r = idx >> 2, c = idx & 3;
      if (kAxisFreq[r] + kAxisFreq[c] == f) g_scan_init[k++] = uint8_t(idx);
    }
}

// ---------------------------------------------------------------------------
// Transforms. 2-point S lifting: exact integer, reversible.
//   fwd: h = a - b; l = b + (h >> 1)   (l = floor((a+b)/2))
//   inv: b = l - (h >> 1); a = b + h
// The 4-point PCT stage is the separable two-level pair transform; the
// 4x4 2-D PCT applies it to rows then columns (inverse mirrors).
// ---------------------------------------------------------------------------
static inline void s_fwd(int32_t& a, int32_t& b) {
  int32_t h = a - b;
  a = b + (h >> 1);
  b = h;
}
static inline void s_inv(int32_t& l, int32_t& h) {
  int32_t b = l - (h >> 1);
  l = b + h;          // = a
  h = b;
}

static inline void pct4_fwd(int32_t& x0, int32_t& x1, int32_t& x2,
                            int32_t& x3) {
  s_fwd(x0, x1); s_fwd(x2, x3);   // lows in x0,x2; highs in x1,x3
  s_fwd(x0, x2);                  // DC in x0, low-diff in x2
  s_fwd(x1, x3);                  // high-mean in x1, high-diff in x3
}
static inline void pct4_inv(int32_t& x0, int32_t& x1, int32_t& x2,
                            int32_t& x3) {
  s_inv(x1, x3); s_inv(x0, x2);
  s_inv(x2, x3); s_inv(x0, x1);
}

// POT overlap operator on the 4-tuple (a, b | c, d) straddling a block
// boundary: butterfly the outer (a,d) and inner (b,c) pairs, shear-rotate
// the two difference channels, and butterfly back (T.832 §9.7 structure,
// lifting-approximated rotations). The butterflies cancel exactly, so
// constants are fixed points — flat regions pass through bit-identical
// and contribute nothing to any band; the decoder-side inverse acts as
// the deblocking post-filter at lossy rates.
static inline void pot4_fwd(int32_t& a, int32_t& b, int32_t& c,
                            int32_t& d) {
  s_fwd(a, d);            // a = mean(a,d), d = a - d
  s_fwd(b, c);            // b = mean(b,c), c = b - c
  c += (d + 1) >> 1;      // zero-preserving shear rotation of the
  d -= (c + 1) >> 1;      // cross-boundary difference channels
  s_inv(b, c);
  s_inv(a, d);
}
static inline void pot4_inv(int32_t& a, int32_t& b, int32_t& c,
                            int32_t& d) {
  s_fwd(a, d);
  s_fwd(b, c);
  d += (c + 1) >> 1;
  c -= (d + 1) >> 1;
  s_inv(b, c);
  s_inv(a, d);
}

// Plane-wide helpers. Plane is row-major (h x w) int32, block grid of 4.
struct Plane {
  int32_t* p;
  int w, h;
  int32_t& at(int y, int x) { return p[int64_t(y) * w + x]; }
};

// Apply/undo the overlap pre-filter across all interior block boundaries
// (vertical boundaries row-wise, then horizontal column-wise).
static void pot_plane(Plane pl, bool fwd) {
  for (int x = 4; x < pl.w; x += 4) {
    if (x + 1 >= pl.w) continue;           // need a,b,c,d in range
    for (int y = 0; y < pl.h; y++) {
      int32_t& a = pl.at(y, x - 2);
      int32_t& b = pl.at(y, x - 1);
      int32_t& c = pl.at(y, x);
      int32_t& d = pl.at(y, x + 1);
      fwd ? pot4_fwd(a, b, c, d) : pot4_inv(a, b, c, d);
    }
  }
  for (int y = 4; y < pl.h; y += 4) {
    if (y + 1 >= pl.h) continue;
    for (int x = 0; x < pl.w; x++) {
      int32_t& a = pl.at(y - 2, x);
      int32_t& b = pl.at(y - 1, x);
      int32_t& c = pl.at(y, x);
      int32_t& d = pl.at(y + 1, x);
      fwd ? pot4_fwd(a, b, c, d) : pot4_inv(a, b, c, d);
    }
  }
}
static void pot_plane_inv(Plane pl) {
  // inverse order: horizontal boundaries first, then vertical
  for (int y = 4; y < pl.h; y += 4) {
    if (y + 1 >= pl.h) continue;
    for (int x = 0; x < pl.w; x++) {
      int32_t& a = pl.at(y - 2, x);
      int32_t& b = pl.at(y - 1, x);
      int32_t& c = pl.at(y, x);
      int32_t& d = pl.at(y + 1, x);
      pot4_inv(a, b, c, d);
    }
  }
  for (int x = 4; x < pl.w; x += 4) {
    if (x + 1 >= pl.w) continue;
    for (int y = 0; y < pl.h; y++) {
      int32_t& a = pl.at(y, x - 2);
      int32_t& b = pl.at(y, x - 1);
      int32_t& c = pl.at(y, x);
      int32_t& d = pl.at(y, x + 1);
      pot4_inv(a, b, c, d);
    }
  }
}

// In-place 4x4 2-D PCT on every block of the plane.
static void pct_plane(Plane pl, bool fwd) {
  for (int by = 0; by < pl.h; by += 4)
    for (int bx = 0; bx < pl.w; bx += 4) {
      if (fwd) {
        for (int r = 0; r < 4; r++)
          pct4_fwd(pl.at(by + r, bx), pl.at(by + r, bx + 1),
                   pl.at(by + r, bx + 2), pl.at(by + r, bx + 3));
        for (int c = 0; c < 4; c++)
          pct4_fwd(pl.at(by, bx + c), pl.at(by + 1, bx + c),
                   pl.at(by + 2, bx + c), pl.at(by + 3, bx + c));
      } else {
        for (int c = 0; c < 4; c++)
          pct4_inv(pl.at(by, bx + c), pl.at(by + 1, bx + c),
                   pl.at(by + 2, bx + c), pl.at(by + 3, bx + c));
        for (int r = 0; r < 4; r++)
          pct4_inv(pl.at(by + r, bx), pl.at(by + r, bx + 1),
                   pl.at(by + r, bx + 2), pl.at(by + r, bx + 3));
      }
    }
}

// ---------------------------------------------------------------------------
// Quantizer index -> step (T.832 §9.5 mantissa/exponent form).
// ---------------------------------------------------------------------------
static int32_t qp_to_step(int qi) {
  if (qi <= 1) return 1;
  if (qi < 16) return qi;
  return int32_t((qi & 15) + 16) << ((qi >> 4) - 1);
}
static inline int32_t quantize(int32_t v, int32_t step) {
  if (step == 1) return v;
  int32_t a = v < 0 ? -v : v;
  int32_t q = (a + (step >> 1)) / step;
  return v < 0 ? -q : q;
}
static inline int32_t dequantize(int32_t q, int32_t step) {
  return q * step;
}

// ---------------------------------------------------------------------------
// Codestream headers (T.832 §8.3/§8.4 field order).
// ---------------------------------------------------------------------------
struct Params {
  int width = 0, height = 0;    // true image size
  int channels = 1;             // 1 (gray) or 3 (RGB)
  int bps = 1;                  // bytes per sample: 1 or 2
  int overlap = 1;              // OVERLAP_MODE 0/1/2
  int qp_dc = 1, qp_lp = 1, qp_hp = 1;
  int tiles_x = 1, tiles_y = 1;
  // derived
  int pw = 0, ph = 0;           // padded to 16
  int mbw = 0, mbh = 0;
};

static const uint64_t kGdiSig = 0x574D50484F544F00ull;  // "WMPHOTO\0"

static void derive(Params& p) {
  p.pw = (p.width + 15) & ~15;
  p.ph = (p.height + 15) & ~15;
  p.mbw = p.pw / 16;
  p.mbh = p.ph / 16;
}

static void write_image_header(BitWriter& bw, const Params& p) {
  bw.bits64(kGdiSig, 64);
  bw.bits(1, 4);                      // RESERVED_B (codestream version)
  bw.bit(0);                          // HARD_TILING_FLAG
  bw.bits(1, 3);                      // RESERVED_C
  bool tiling = p.tiles_x * p.tiles_y > 1;
  bw.bit(tiling);                     // TILING_FLAG
  bw.bit(0);                          // FREQUENCY_MODE_CODESTREAM_FLAG
  bw.bits(0, 3);                      // SPATIAL_XFRM_SUBORDINATE
  bw.bit(tiling);                     // INDEX_TABLE_PRESENT_FLAG
  bw.bits(uint32_t(p.overlap), 2);    // OVERLAP_MODE
  bool short_hdr = p.width <= 65536 && p.height <= 65536;
  bw.bit(short_hdr);                  // SHORT_HEADER_FLAG
  bw.bit(0);                          // LONG_WORD_FLAG
  bw.bit(0);                          // WINDOWING_FLAG
  bw.bit(0);                          // TRIM_FLEXBITS_FLAG
  bw.bits(0, 1);                      // RESERVED_D
  bw.bit(p.channels == 3);            // RED_BLUE_NOT_SWAPPED_FLAG
  bw.bit(0);                          // PREMULTIPLIED_ALPHA_FLAG
  bw.bit(0);                          // ALPHA_IMAGE_PLANE_FLAG
  bw.bits(p.channels == 3 ? 7 : 0, 4);  // OUTPUT_CLR_FMT: RGB / YONLY
  bw.bits(p.bps == 2 ? 2 : 1, 4);       // OUTPUT_BITDEPTH: BD16 / BD8
  int n = short_hdr ? 16 : 32;
  bw.bits(uint32_t(p.width - 1), n);
  bw.bits(uint32_t(p.height - 1), n);
  if (tiling) {
    bw.bits(uint32_t(p.tiles_x - 1), 12);
    bw.bits(uint32_t(p.tiles_y - 1), 12);
    int tn = short_hdr ? 8 : 16;
    // uniform grid; all but the last extent (implied by the image size)
    int base_w = p.mbw / p.tiles_x, base_h = p.mbh / p.tiles_y;
    for (int i = 0; i < p.tiles_x - 1; i++) bw.bits(uint32_t(base_w), tn);
    for (int i = 0; i < p.tiles_y - 1; i++) bw.bits(uint32_t(base_h), tn);
  }
}

static int read_image_header(BitReader& br, Params& p,
                             std::vector<int>& tile_w_mb,
                             std::vector<int>& tile_h_mb) {
  if (br.bits64(64) != kGdiSig) return JXR_E_SIGNATURE;
  br.bits(4);                         // RESERVED_B
  bool hard_tiling = br.bit();
  br.bits(3);                         // RESERVED_C
  bool tiling = br.bit();
  bool freq_mode = br.bit();
  uint32_t spatial_xfrm = br.bits(3);
  bool index_table = br.bit();
  p.overlap = int(br.bits(2));
  bool short_hdr = br.bit();
  br.bit();                           // LONG_WORD_FLAG (ignored: bit IO)
  bool windowing = br.bit();
  bool trim_flexbits = br.bit();
  br.bits(1);                         // RESERVED_D
  br.bit();                           // RED_BLUE_NOT_SWAPPED
  br.bit();                           // PREMULTIPLIED_ALPHA
  bool alpha_plane = br.bit();
  uint32_t clr_fmt = br.bits(4);
  uint32_t bitdepth = br.bits(4);
  int n = short_hdr ? 16 : 32;
  p.width = int(br.bits(n)) + 1;
  p.height = int(br.bits(n)) + 1;
  if (br.overrun) return JXR_E_TRUNCATED;
  if (freq_mode) return JXR_E_UNSUPPORTED;          // frequency mode
  if (alpha_plane || windowing || trim_flexbits) return JXR_E_UNSUPPORTED;
  if (spatial_xfrm != 0) return JXR_E_UNSUPPORTED;  // rotations/flips
  if (p.overlap == 3) return JXR_E_CORRUPT;
  if (clr_fmt == 0) p.channels = 1;
  else if (clr_fmt == 7) p.channels = 3;
  else return JXR_E_UNSUPPORTED;                    // YUV42x/CMYK/N-comp
  if (bitdepth == 1) p.bps = 1;
  else if (bitdepth == 2) p.bps = 2;
  else return JXR_E_UNSUPPORTED;                    // float/signed depths
  if (p.width <= 0 || p.height <= 0 || p.width > (1 << 20) ||
      p.height > (1 << 20) || int64_t(p.width) * p.height > (1ll << 34))
    return JXR_E_CORRUPT;
  derive(p);
  p.tiles_x = p.tiles_y = 1;
  tile_w_mb.assign(1, p.mbw);
  tile_h_mb.assign(1, p.mbh);
  if (tiling) {
    p.tiles_x = int(br.bits(12)) + 1;
    p.tiles_y = int(br.bits(12)) + 1;
    if (p.tiles_x > p.mbw || p.tiles_y > p.mbh) return JXR_E_CORRUPT;
    int tn = short_hdr ? 8 : 16;
    tile_w_mb.assign(p.tiles_x, 0);
    tile_h_mb.assign(p.tiles_y, 0);
    int sum = 0;
    for (int i = 0; i < p.tiles_x - 1; i++) {
      tile_w_mb[i] = int(br.bits(tn));
      sum += tile_w_mb[i];
      if (tile_w_mb[i] <= 0 || sum >= p.mbw) return JXR_E_CORRUPT;
    }
    tile_w_mb[p.tiles_x - 1] = p.mbw - sum;
    sum = 0;
    for (int i = 0; i < p.tiles_y - 1; i++) {
      tile_h_mb[i] = int(br.bits(tn));
      sum += tile_h_mb[i];
      if (tile_h_mb[i] <= 0 || sum >= p.mbh) return JXR_E_CORRUPT;
    }
    tile_h_mb[p.tiles_y - 1] = p.mbh - sum;
    if (!index_table && !hard_tiling) return JXR_E_CORRUPT;
  }
  if (br.overrun) return JXR_E_TRUNCATED;
  return JXR_OK;
}

static void write_plane_header(BitWriter& bw, const Params& p) {
  bw.bits(p.channels == 3 ? 3 : 0, 3);  // INTERNAL_CLR_FMT: YUV444/YONLY
  bw.bit(0);                            // SCALED_FLAG (exact arithmetic)
  bw.bits(0, 4);                        // BANDS_PRESENT: ALL
  if (p.bps == 2) bw.bits(0, 8);        // SHIFT_BITS
  bw.bit(1);                            // DC uniform
  if (p.channels > 1) bw.bits(0, 2);    // COMPONENT_MODE: UNIFORM
  bw.bits(uint32_t(p.qp_dc), 8);
  bw.bit(1);                            // LP uniform
  if (p.channels > 1) bw.bits(0, 2);
  bw.bits(uint32_t(p.qp_lp), 8);
  bw.bit(1);                            // HP uniform
  if (p.channels > 1) bw.bits(0, 2);
  bw.bits(uint32_t(p.qp_hp), 8);
  bw.align();
}

static int read_plane_header(BitReader& br, Params& p) {
  uint32_t internal = br.bits(3);
  if ((p.channels == 1 && internal != 0) ||
      (p.channels == 3 && internal != 3))
    return JXR_E_UNSUPPORTED;           // chroma subsampling / YUVK
  if (br.bit()) return JXR_E_UNSUPPORTED;  // SCALED_FLAG
  uint32_t bands = br.bits(4);
  if (bands != 0) return JXR_E_UNSUPPORTED;  // DCONLY/NOHP progressive
  if (p.bps == 2 && br.bits(8) != 0) return JXR_E_UNSUPPORTED;
  if (!br.bit()) return JXR_E_UNSUPPORTED;   // per-tile DC QP
  if (p.channels > 1 && br.bits(2) != 0) return JXR_E_UNSUPPORTED;
  p.qp_dc = int(br.bits(8));
  if (!br.bit()) return JXR_E_UNSUPPORTED;
  if (p.channels > 1 && br.bits(2) != 0) return JXR_E_UNSUPPORTED;
  p.qp_lp = int(br.bits(8));
  if (!br.bit()) return JXR_E_UNSUPPORTED;
  if (p.channels > 1 && br.bits(2) != 0) return JXR_E_UNSUPPORTED;
  p.qp_hp = int(br.bits(8));
  br.align();
  return br.overrun ? JXR_E_TRUNCATED : JXR_OK;
}

// VLW_ESC (index-table offsets).
static void vlw_write(BitWriter& bw, uint64_t v) {
  bw.bits(0xFB, 8);
  bw.bits(uint32_t(v), 32);
}
static uint64_t vlw_read(BitReader& br) {
  uint32_t b = br.bits(8);
  if (b < 0xFB) return b;
  if (b == 0xFB) return br.bits(32);
  if (b == 0xFC) return br.bits64(64);
  br.overrun = true;                   // 0xFD..0xFF reserved
  return 0;
}

// ---------------------------------------------------------------------------
// Per-tile entropy contexts.
// ---------------------------------------------------------------------------
struct TileCtx {
  AdaptiveHuff dc_h[2], lp_rl[2], lp_h[2], hp_rl[2], hp_h[2], cbp_h[2];
  MagModel dc_m[2], lp_m[2], hp_m[2];
  AdaptiveScan lp_scan[2], hp_scan[2];
  void reset(int bps) {
    for (int k = 0; k < 2; k++) {
      dc_h[k].reset(g_high8, 3);
      lp_rl[k].reset(g_runlast6, 2);
      lp_h[k].reset(g_high8, 3);
      hp_rl[k].reset(g_runlast6, 2);
      hp_h[k].reset(g_high8, 3);
      cbp_h[k].reset(g_cbpq16, 2);
      // 16-bit content carries ~8 more magnitude bits into every band
      int base = bps == 2 ? 4 : 0;
      dc_m[k].reset(base + 4);
      lp_m[k].reset(base + 2);
      hp_m[k].reset(base);
      lp_scan[k].reset(g_scan_init);
      hp_scan[k].reset(g_scan_init);
    }
  }
};

// Encode/decode one 15-coefficient block (values indexed by coefficient
// position 1..15; scan maps slots to positions). Returns nonzero count.
static void encode_block(BitWriter& bw, const int32_t* coef /*[16]*/,
                         AdaptiveHuff& rl, AdaptiveHuff& hh, MagModel& mm,
                         AdaptiveScan& scan) {
  uint8_t order[15];
  memcpy(order, scan.order, 15);
  int slots[15], K = 0;
  for (int s = 0; s < 15; s++)
    if (coef[order[s]] != 0) slots[K++] = s;
  int prev = -1;
  for (int k = 0; k < K; k++) {
    int run = slots[k] - prev - 1;
    int last = (k == K - 1) ? 1 : 0;
    int rc = run < 2 ? run : 2;
    rl.write(bw, last * 3 + rc);
    if (rc == 2) eg_write(bw, uint32_t(run - 2));
    int32_t v = coef[order[slots[k]]];
    uint32_t mag = uint32_t(v < 0 ? -int64_t(v) : v);
    mag_write(bw, hh, mm, mag - 1);
    bw.bit(v < 0);
    prev = slots[k];
  }
  for (int k = 0; k < K; k++) scan.hit(slots[k]);
}
static bool decode_block(BitReader& br, int32_t* coef /*[16]*/,
                         AdaptiveHuff& rl, AdaptiveHuff& hh, MagModel& mm,
                         AdaptiveScan& scan) {
  uint8_t order[15];
  memcpy(order, scan.order, 15);
  int slots[15], K = 0;
  int s = -1;
  for (;;) {
    int sym = rl.read(br);
    int last = sym / 3, rc = sym % 3;
    int run = rc < 2 ? rc : 2 + int(eg_read(br));
    s += run + 1;
    if (s > 14 || br.overrun) return false;
    uint32_t mag = mag_read(br, hh, mm) + 1;
    int32_t v = br.bit() ? -int32_t(mag) : int32_t(mag);
    coef[order[s]] = v;
    slots[K++] = s;
    if (last) break;
    if (K == 15) return false;         // no room for another coefficient
  }
  for (int k = 0; k < K; k++) scan.hit(slots[k]);
  return !br.overrun;
}

// ---------------------------------------------------------------------------
// Macroblock layer. Quantized coefficient storage:
//   qP[c]: padded pixel plane holding HP quant indices per 4x4 block
//          (the (0,0) slot of each block is unused at this layer);
//   qD[c]: (ph/4 x pw/4) plane holding the second-level coefficients —
//          MB DC at (4my, 4mx), LP elsewhere in each MB's 4x4 group.
// Prediction runs on these quantized grids (T.832 order: DC, LP, CBP,
// HP per MB, raster within the tile, neighbors confined to the tile).
// ---------------------------------------------------------------------------
struct MbView {
  Plane* qP;   // per component
  Plane* qD;
  int nc;
  int tile_mx0, tile_my0;   // tile origin in MB coords
};

static int dc_direction(const MbView& v, int mx, int my) {
  // 0 = none (predict 0), 1 = left, 2 = top, 3 = mean(left, top)
  bool has_l = mx > v.tile_mx0, has_t = my > v.tile_my0;
  if (!has_l && !has_t) return 0;
  if (has_l && !has_t) return 1;
  if (!has_l && has_t) return 2;
  Plane& D = v.qD[0];
  int32_t dl = D.at(4 * my, 4 * (mx - 1));
  int32_t dt = D.at(4 * (my - 1), 4 * mx);
  int32_t dtl = D.at(4 * (my - 1), 4 * (mx - 1));
  int64_t sh = dl > dtl ? dl - dtl : dtl - dl;   // horizontal change
  int64_t sv = dt > dtl ? dt - dtl : dtl - dt;   // vertical change
  if (sh * 4 < sv) return 1;   // flat horizontally: take the left DC
  if (sv * 4 < sh) return 2;
  return 3;
}

static int32_t dc_pred(const MbView& v, int c, int mx, int my, int dir) {
  Plane& D = v.qD[c];
  switch (dir) {
    case 1: return D.at(4 * my, 4 * (mx - 1));
    case 2: return D.at(4 * (my - 1), 4 * mx);
    case 3: return (D.at(4 * my, 4 * (mx - 1)) +
                    D.at(4 * (my - 1), 4 * mx)) >> 1;
    default: return 0;
  }
}

// LP coefficient positions predicted across MBs: the first column
// (r=1..3, c=0) when predicting from the left, the first row when from
// the top (T.832 §9.3 structure). `sign` is -1 to subtract the
// prediction (encode: values -> residuals in `out`) and +1 to add it
// back (decode: `out` holds the decoded residuals, untouched otherwise).
static void lp_predict(const MbView& v, int c, int mx, int my, int dir,
                       int32_t out[16], int sign) {
  Plane& D = v.qD[c];
  int y0 = 4 * my, x0 = 4 * mx;
  if (dir == 1) {
    for (int r = 1; r < 4; r++)
      out[r * 4] += sign * D.at(y0 + r, x0 - 4);
  } else if (dir == 2) {
    for (int cc = 1; cc < 4; cc++)
      out[cc] += sign * D.at(y0 - 4, x0 + cc);
  }
}

// HP orientation per MB from the luma LP energies: row-frequency energy
// vs column-frequency energy decides left-vs-top block prediction.
static int hp_orientation(const MbView& v, int mx, int my) {
  Plane& D = v.qD[0];
  int y0 = 4 * my, x0 = 4 * mx;
  int64_t e_col = 0, e_row = 0;
  for (int i = 1; i < 4; i++) {
    int32_t a = D.at(y0 + i, x0);      // varies along rows
    int32_t b = D.at(y0, x0 + i);      // varies along columns
    e_col += a < 0 ? -a : a;
    e_row += b < 0 ? -b : b;
  }
  if (e_row >= e_col * 2) return 2;    // strong horizontal freq: from top
  if (e_col >= e_row * 2) return 1;    // from left
  return 0;                            // no HP prediction
}

// HP prediction for one 4x4 block (bx, by in block coords within the
// MB); same sign convention as lp_predict. Sources are the left/top
// neighbor block's true quantized values, within the MB only.
static void hp_predict(const MbView& v, int c, int mx, int my, int bx,
                       int by, int orient, int32_t out[16], int sign) {
  Plane& P = v.qP[c];
  int py = 16 * my + 4 * by, px = 16 * mx + 4 * bx;
  if (orient == 1 && bx > 0) {
    for (int r = 1; r < 4; r++)
      out[r * 4] += sign * P.at(py + r, px - 4);
  } else if (orient == 2 && by > 0) {
    for (int cc = 1; cc < 4; cc++)
      out[cc] += sign * P.at(py - 4, px + cc);
  }
}

static void encode_tile(BitWriter& bw, const Params& p, MbView& v,
                        int mx0, int my0, int mw, int mh) {
  TileCtx ctx;
  ctx.reset(p.bps);
  v.tile_mx0 = mx0;
  v.tile_my0 = my0;
  bw.align();
  bw.bits(1, 24);                      // TILE_STARTCODE
  bw.bits(0, 8);                       // ARBITRARY_BYTE
  int32_t buf[16];
  for (int my = my0; my < my0 + mh; my++)
    for (int mx = mx0; mx < mx0 + mw; mx++) {
      int dir = dc_direction(v, mx, my);
      for (int c = 0; c < v.nc; c++) {
        int k = c ? 1 : 0;
        // DC
        int32_t dc = v.qD[c].at(4 * my, 4 * mx);
        sval_write(bw, ctx.dc_h[k], ctx.dc_m[k], dc - dc_pred(v, c, mx, my, dir));
        // LP: load the MB's 15 LP quant values, subtract the prediction
        for (int i = 1; i < 16; i++)
          buf[i] = v.qD[c].at(4 * my + i / 4, 4 * mx + i % 4);
        buf[0] = 0;
        lp_predict(v, c, mx, my, dir, buf, -1);
        bool any = false;
        for (int i = 1; i < 16; i++) any |= buf[i] != 0;
        bw.bit(any);
        if (any)
          encode_block(bw, buf, ctx.lp_rl[k], ctx.lp_h[k], ctx.lp_m[k],
                       ctx.lp_scan[k]);
      }
      int orient = hp_orientation(v, mx, my);
      for (int c = 0; c < v.nc; c++) {
        int k = c ? 1 : 0;
        // CBP over the 16 blocks (raster), then HP per set block.
        int32_t res[16][16];
        uint32_t cbp = 0;
        for (int by = 0; by < 4; by++)
          for (int bx = 0; bx < 4; bx++) {
            int b = by * 4 + bx;
            int py = 16 * my + 4 * by, px = 16 * mx + 4 * bx;
            for (int i = 1; i < 16; i++)
              res[b][i] = v.qP[c].at(py + i / 4, px + i % 4);
            res[b][0] = 0;
            hp_predict(v, c, mx, my, bx, by, orient, res[b], -1);
            for (int i = 1; i < 16; i++)
              if (res[b][i]) { cbp |= 1u << b; break; }
          }
        uint32_t qmask = 0;
        for (int q = 0; q < 4; q++) {
          int b0 = (q >> 1) * 8 + (q & 1) * 2;   // quad origin block
          uint32_t quad = ((cbp >> b0) & 3) | (((cbp >> (b0 + 4)) & 3) << 2);
          if (quad) qmask |= 1u << q;
        }
        ctx.cbp_h[k].write(bw, int(qmask));
        for (int q = 0; q < 4; q++)
          if (qmask & (1u << q)) {
            int b0 = (q >> 1) * 8 + (q & 1) * 2;
            uint32_t quad = ((cbp >> b0) & 3) |
                            (((cbp >> (b0 + 4)) & 3) << 2);
            ctx.cbp_h[k].write(bw, int(quad));
          }
        for (int b = 0; b < 16; b++)
          if (cbp & (1u << b))
            encode_block(bw, res[b], ctx.hp_rl[k], ctx.hp_h[k],
                         ctx.hp_m[k], ctx.hp_scan[k]);
        ctx.hp_m[k].end_mb();
      }
      for (int k = 0; k < (v.nc > 1 ? 2 : 1); k++) {
        ctx.dc_m[k].end_mb();
        ctx.lp_m[k].end_mb();
      }
    }
  bw.align();
}

static int decode_tile(BitReader& br, const Params& p, MbView& v,
                       int mx0, int my0, int mw, int mh) {
  TileCtx ctx;
  ctx.reset(p.bps);
  v.tile_mx0 = mx0;
  v.tile_my0 = my0;
  br.align();
  if (br.bits(24) != 1) return JXR_E_CORRUPT;  // TILE_STARTCODE
  br.bits(8);
  int32_t buf[16];
  for (int my = my0; my < my0 + mh; my++)
    for (int mx = mx0; mx < mx0 + mw; mx++) {
      int dir = dc_direction(v, mx, my);
      for (int c = 0; c < v.nc; c++) {
        int k = c ? 1 : 0;
        int32_t r = sval_read(br, ctx.dc_h[k], ctx.dc_m[k]);
        v.qD[c].at(4 * my, 4 * mx) = r + dc_pred(v, c, mx, my, dir);
        memset(buf, 0, sizeof(buf));
        if (br.bit()) {
          if (!decode_block(br, buf, ctx.lp_rl[k], ctx.lp_h[k],
                            ctx.lp_m[k], ctx.lp_scan[k]))
            return JXR_E_CORRUPT;
        }
        lp_predict(v, c, mx, my, dir, buf, +1);    // undo prediction
        for (int i = 1; i < 16; i++)
          v.qD[c].at(4 * my + i / 4, 4 * mx + i % 4) = buf[i];
      }
      int orient = hp_orientation(v, mx, my);
      for (int c = 0; c < v.nc; c++) {
        int k = c ? 1 : 0;
        uint32_t qmask = uint32_t(ctx.cbp_h[k].read(br));
        uint32_t cbp = 0;
        for (int q = 0; q < 4; q++)
          if (qmask & (1u << q)) {
            uint32_t quad = uint32_t(ctx.cbp_h[k].read(br));
            int b0 = (q >> 1) * 8 + (q & 1) * 2;
            cbp |= (quad & 3) << b0;
            cbp |= ((quad >> 2) & 3) << (b0 + 4);
          }
        if (br.overrun) return JXR_E_TRUNCATED;
        for (int by = 0; by < 4; by++)
          for (int bx = 0; bx < 4; bx++) {
            int b = by * 4 + bx;
            memset(buf, 0, sizeof(buf));
            if (cbp & (1u << b)) {
              if (!decode_block(br, buf, ctx.hp_rl[k], ctx.hp_h[k],
                                ctx.hp_m[k], ctx.hp_scan[k]))
                return JXR_E_CORRUPT;
            }
            hp_predict(v, c, mx, my, bx, by, orient, buf, +1);
            int py = 16 * my + 4 * by, px = 16 * mx + 4 * bx;
            for (int i = 1; i < 16; i++)
              v.qP[c].at(py + i / 4, px + i % 4) = buf[i];
          }
        ctx.hp_m[k].end_mb();
      }
      for (int k = 0; k < (v.nc > 1 ? 2 : 1); k++) {
        ctx.dc_m[k].end_mb();
        ctx.lp_m[k].end_mb();
      }
      if (br.overrun) return JXR_E_TRUNCATED;
    }
  return JXR_OK;
}

// ---------------------------------------------------------------------------
// Full-image encode/decode (codestream level).
// ---------------------------------------------------------------------------

// Reversible color transform (RCT): Y=(R+2G+B)>>2, U=B-G, V=R-G.
static inline void rct_fwd(int32_t& r, int32_t& g, int32_t& b) {
  int32_t y = (r + 2 * g + b) >> 2, u = b - g, v = r - g;
  r = y; g = u; b = v;
}
static inline void rct_inv(int32_t& y, int32_t& u, int32_t& v) {
  int32_t g = y - ((u + v) >> 2), b = u + g, r = v + g;
  y = r; u = g; v = b;
}

static void encode_codestream(BitWriter& bw, const Params& p,
                              const uint8_t* pixels) {
  init_tables();
  init_scan();
  write_image_header(bw, p);
  write_plane_header(bw, p);

  int nc = p.channels;
  std::vector<std::vector<int32_t>> pix(nc), dcs(nc);
  std::vector<Plane> P(nc), D(nc);
  int dw = p.pw / 4, dh = p.ph / 4;
  for (int c = 0; c < nc; c++) {
    pix[c].assign(size_t(p.pw) * p.ph, 0);
    dcs[c].assign(size_t(dw) * dh, 0);
    P[c] = Plane{pix[c].data(), p.pw, p.ph};
    D[c] = Plane{dcs[c].data(), dw, dh};
  }
  int bias = p.bps == 2 ? 32768 : 128;
  // load + bias + color transform + edge-replicate pad
  for (int y = 0; y < p.ph; y++) {
    int sy = y < p.height ? y : p.height - 1;
    for (int x = 0; x < p.pw; x++) {
      int sx = x < p.width ? x : p.width - 1;
      int64_t off = (int64_t(sy) * p.width + sx) * nc;
      int32_t s[3];
      for (int c = 0; c < nc; c++) {
        const uint8_t* q = pixels + (off + c) * p.bps;
        s[c] = p.bps == 2 ? int32_t(q[0] | (q[1] << 8)) : int32_t(q[0]);
      }
      if (nc == 3) rct_fwd(s[0], s[1], s[2]);
      s[0] -= bias;           // chroma (RCT U/V) is already centered
      for (int c = 0; c < nc; c++) P[c].at(y, x) = s[c];
    }
  }
  int32_t sdc = qp_to_step(p.qp_dc), slp = qp_to_step(p.qp_lp),
          shp = qp_to_step(p.qp_hp);
  for (int c = 0; c < nc; c++) {
    if (p.overlap >= 1) pot_plane(P[c], true);
    pct_plane(P[c], true);
    for (int y = 0; y < dh; y++)
      for (int x = 0; x < dw; x++)
        D[c].at(y, x) = P[c].at(4 * y, 4 * x);
    if (p.overlap == 2) pot_plane(D[c], true);
    pct_plane(D[c], true);
    // quantize: HP in P (AC positions), LP + MB DC in D
    for (int y = 0; y < p.ph; y++)
      for (int x = 0; x < p.pw; x++)
        if ((y & 3) || (x & 3)) P[c].at(y, x) = quantize(P[c].at(y, x), shp);
    for (int y = 0; y < dh; y++)
      for (int x = 0; x < dw; x++) {
        bool is_mbdc = !(y & 3) && !(x & 3);
        D[c].at(y, x) = quantize(D[c].at(y, x), is_mbdc ? sdc : slp);
      }
  }

  MbView v{P.data(), D.data(), nc, 0, 0};
  int ntx = p.tiles_x, nty = p.tiles_y;
  if (ntx * nty == 1) {
    encode_tile(bw, p, v, 0, 0, p.mbw, p.mbh);
    return;
  }
  // tiles: encode each into its own BitWriter, then emit the index table
  std::vector<std::vector<uint8_t>> packets;
  int base_w = p.mbw / ntx, base_h = p.mbh / nty;
  for (int ty = 0; ty < nty; ty++)
    for (int tx = 0; tx < ntx; tx++) {
      BitWriter tb;
      int mx0 = tx * base_w, my0 = ty * base_h;
      int mw = tx == ntx - 1 ? p.mbw - mx0 : base_w;
      int mh = ty == nty - 1 ? p.mbh - my0 : base_h;
      encode_tile(tb, p, v, mx0, my0, mw, mh);
      tb.align();
      packets.push_back(tb.out);
    }
  bw.align();
  bw.bits(1, 16);                      // INDEX_TABLE_STARTCODE
  uint64_t off = 0;
  for (auto& pk : packets) {
    vlw_write(bw, off);
    off += pk.size();
  }
  bw.align();
  for (auto& pk : packets)
    for (uint8_t b : pk) bw.bits(b, 8);
}

static int decode_codestream(BitReader& br, Params& p,
                             std::vector<std::vector<int32_t>>& out_pix) {
  init_tables();
  init_scan();
  std::vector<int> tile_w, tile_h;
  int rc = read_image_header(br, p, tile_w, tile_h);
  if (rc != JXR_OK) return rc;
  rc = read_plane_header(br, p);
  if (rc != JXR_OK) return rc;

  int nc = p.channels;
  std::vector<std::vector<int32_t>> dcs(nc);
  out_pix.assign(nc, {});
  std::vector<Plane> P(nc), D(nc);
  int dw = p.pw / 4, dh = p.ph / 4;
  for (int c = 0; c < nc; c++) {
    out_pix[c].assign(size_t(p.pw) * p.ph, 0);
    dcs[c].assign(size_t(dw) * dh, 0);
    P[c] = Plane{out_pix[c].data(), p.pw, p.ph};
    D[c] = Plane{dcs[c].data(), dw, dh};
  }
  MbView v{P.data(), D.data(), nc, 0, 0};

  int ntx = p.tiles_x, nty = p.tiles_y;
  if (ntx * nty == 1) {
    rc = decode_tile(br, p, v, 0, 0, p.mbw, p.mbh);
    if (rc != JXR_OK) return rc;
  } else {
    br.align();
    if (br.bits(16) != 1) return JXR_E_CORRUPT;
    std::vector<uint64_t> offs(size_t(ntx) * nty);
    for (auto& o : offs) o = vlw_read(br);
    br.align();
    if (br.overrun) return JXR_E_TRUNCATED;
    int64_t region = br.byte_pos();
    int t = 0;
    for (int ty = 0; ty < nty; ty++)
      for (int tx = 0; tx < ntx; tx++, t++) {
        int mx0 = 0, my0 = 0;
        for (int i = 0; i < tx; i++) mx0 += tile_w[i];
        for (int i = 0; i < ty; i++) my0 += tile_h[i];
        if (offs[t] > uint64_t(br.size)) return JXR_E_CORRUPT;
        br.seek_byte(region + int64_t(offs[t]));
        rc = decode_tile(br, p, v, mx0, my0, tile_w[tx], tile_h[ty]);
        if (rc != JXR_OK) return rc;
      }
  }

  int32_t sdc = qp_to_step(p.qp_dc), slp = qp_to_step(p.qp_lp),
          shp = qp_to_step(p.qp_hp);
  for (int c = 0; c < nc; c++) {
    for (int y = 0; y < dh; y++)
      for (int x = 0; x < dw; x++) {
        bool is_mbdc = !(y & 3) && !(x & 3);
        D[c].at(y, x) = dequantize(D[c].at(y, x), is_mbdc ? sdc : slp);
      }
    for (int y = 0; y < p.ph; y++)
      for (int x = 0; x < p.pw; x++)
        if ((y & 3) || (x & 3))
          P[c].at(y, x) = dequantize(P[c].at(y, x), shp);
    pct_plane(D[c], false);
    if (p.overlap == 2) pot_plane_inv(D[c]);
    for (int y = 0; y < dh; y++)
      for (int x = 0; x < dw; x++)
        P[c].at(4 * y, 4 * x) = D[c].at(y, x);
    pct_plane(P[c], false);
    if (p.overlap >= 1) pot_plane_inv(P[c]);
  }
  return JXR_OK;
}

// ---------------------------------------------------------------------------
// Container (TIFF-like, little-endian: II BC 01).
// ---------------------------------------------------------------------------
static const uint8_t kGuidPrefix[15] = {0x24, 0xC3, 0xDD, 0x6F, 0x03, 0x4E,
                                        0xFE, 0x4B, 0xB1, 0x85, 0x3D, 0x77,
                                        0x76, 0x8D, 0xC9, /*idx*/};

static uint8_t pixfmt_index(int channels, int bps) {
  if (channels == 1) return bps == 2 ? 0x0B : 0x08;  // 16bppGray / 8bppGray
  return 0x0D;                                       // 24bppRGB
}

static void le32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x & 255); v.push_back((x >> 8) & 255);
  v.push_back((x >> 16) & 255); v.push_back((x >> 24) & 255);
}
static void le16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(x & 255); v.push_back((x >> 8) & 255);
}

static void write_container(std::vector<uint8_t>& out, const Params& p,
                            const std::vector<uint8_t>& stream) {
  out.clear();
  out.push_back(0x49); out.push_back(0x49);      // II
  out.push_back(0xBC); out.push_back(0x01);      // JPEG XR, version 1
  le32(out, 8);                                  // IFD offset
  const int nent = 5;
  // IFD: count + entries + next-IFD(0); GUID payload follows the IFD.
  uint32_t ifd_bytes = 2 + nent * 12 + 4;
  uint32_t guid_off = 8 + ifd_bytes;
  uint32_t stream_off = guid_off + 16;
  le16(out, nent);
  auto entry = [&](uint16_t tag, uint16_t type, uint32_t count,
                   uint32_t value) {
    le16(out, tag); le16(out, type); le32(out, count); le32(out, value);
  };
  entry(0xBC01, 1, 16, guid_off);                  // PIXEL_FORMAT (BYTE x16)
  entry(0xBC80, 4, 1, uint32_t(p.width));          // IMAGE_WIDTH (LONG)
  entry(0xBC81, 4, 1, uint32_t(p.height));         // IMAGE_HEIGHT
  entry(0xBCC0, 4, 1, stream_off);                 // IMAGE_OFFSET
  entry(0xBCC1, 4, 1, uint32_t(stream.size()));    // IMAGE_BYTE_COUNT
  le32(out, 0);                                    // next IFD
  out.insert(out.end(), kGuidPrefix, kGuidPrefix + 15);
  out.push_back(pixfmt_index(p.channels, p.bps));
  out.insert(out.end(), stream.begin(), stream.end());
}

// Locates the codestream: accepts a full container or a bare codestream.
// On success sets *cs/*cs_size; channels/bps are taken from the
// container pixel format when present (the codestream header re-checks).
static int find_codestream(const uint8_t* buf, int64_t size,
                           const uint8_t** cs, int64_t* cs_size) {
  if (size >= 8 && memcmp(buf, "\x49\x49\xBC", 3) == 0) {
    uint32_t ifd = uint32_t(buf[4]) | (uint32_t(buf[5]) << 8) |
                   (uint32_t(buf[6]) << 16) | (uint32_t(buf[7]) << 24);
    if (int64_t(ifd) + 2 > size) return JXR_E_TRUNCATED;
    uint32_t nent = uint32_t(buf[ifd]) | (uint32_t(buf[ifd + 1]) << 8);
    if (nent > 512 || int64_t(ifd) + 2 + nent * 12 + 4 > size)
      return JXR_E_CORRUPT;
    uint32_t off = 0, cnt = 0;
    for (uint32_t i = 0; i < nent; i++) {
      const uint8_t* e = buf + ifd + 2 + i * 12;
      uint16_t tag = uint16_t(e[0] | (e[1] << 8));
      uint32_t val = uint32_t(e[8]) | (uint32_t(e[9]) << 8) |
                     (uint32_t(e[10]) << 16) | (uint32_t(e[11]) << 24);
      if (tag == 0xBCC0) off = val;
      if (tag == 0xBCC1) cnt = val;
    }
    if (!off || !cnt || int64_t(off) + cnt > size) return JXR_E_CORRUPT;
    *cs = buf + off;
    *cs_size = cnt;
    return JXR_OK;
  }
  // bare codestream?
  if (size >= 8) {
    uint64_t sig = 0;
    for (int i = 0; i < 8; i++) sig = (sig << 8) | buf[i];
    if (sig == kGdiSig) { *cs = buf; *cs_size = size; return JXR_OK; }
  }
  return JXR_E_SIGNATURE;
}

}  // namespace jxr

// ---------------------------------------------------------------------------
// C API (ctypes: hiprfish_tpu/io/jxr.py)
// ---------------------------------------------------------------------------
extern "C" {

int jxr_info(const uint8_t* buf, int64_t size, int32_t* w, int32_t* h,
             int32_t* channels, int32_t* bytes_per_sample) {
  using namespace jxr;
  const uint8_t* cs;
  int64_t cn;
  int rc = find_codestream(buf, size, &cs, &cn);
  if (rc != JXR_OK) return rc;
  init_tables();
  init_scan();
  BitReader br(cs, cn);
  Params p;
  std::vector<int> tw, th;
  rc = read_image_header(br, p, tw, th);
  if (rc != JXR_OK) return rc;
  *w = p.width; *h = p.height;
  *channels = p.channels;
  *bytes_per_sample = p.bps;
  return JXR_OK;
}

int jxr_decode(const uint8_t* buf, int64_t size, uint8_t* out,
               int64_t out_cap, int32_t* w, int32_t* h, int32_t* channels,
               int32_t* bytes_per_sample) {
  using namespace jxr;
  const uint8_t* cs;
  int64_t cn;
  int rc = find_codestream(buf, size, &cs, &cn);
  if (rc != JXR_OK) return rc;
  BitReader br(cs, cn);
  Params p;
  std::vector<std::vector<int32_t>> pix;
  rc = decode_codestream(br, p, pix);
  if (rc != JXR_OK) return rc;
  int64_t need = int64_t(p.width) * p.height * p.channels * p.bps;
  if (need > out_cap) return JXR_E_BUFFER;
  int bias = p.bps == 2 ? 32768 : 128;
  int32_t lo = 0, hi = p.bps == 2 ? 65535 : 255;
  for (int y = 0; y < p.height; y++)
    for (int x = 0; x < p.width; x++) {
      int32_t s[3];
      for (int c = 0; c < p.channels; c++)
        s[c] = pix[c][size_t(y) * p.pw + x];
      s[0] += bias;
      if (p.channels == 3) rct_inv(s[0], s[1], s[2]);
      int64_t off = (int64_t(y) * p.width + x) * p.channels;
      for (int c = 0; c < p.channels; c++) {
        int32_t v = s[c] < lo ? lo : (s[c] > hi ? hi : s[c]);
        uint8_t* q = out + (off + c) * p.bps;
        q[0] = uint8_t(v & 255);
        if (p.bps == 2) q[1] = uint8_t((v >> 8) & 255);
      }
    }
  *w = p.width; *h = p.height;
  *channels = p.channels;
  *bytes_per_sample = p.bps;
  return JXR_OK;
}

int64_t jxr_encode(const uint8_t* pixels, int32_t w, int32_t h,
                   int32_t channels, int32_t bytes_per_sample, int32_t qp,
                   int32_t overlap, int32_t tiles_x, int32_t tiles_y,
                   uint8_t* out, int64_t out_cap) {
  using namespace jxr;
  if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20))
    return JXR_E_ARGS;
  if (channels != 1 && channels != 3) return JXR_E_ARGS;
  if (bytes_per_sample != 1 && bytes_per_sample != 2) return JXR_E_ARGS;
  if (qp < 0 || qp > 255 || overlap < 0 || overlap > 2) return JXR_E_ARGS;
  Params p;
  p.width = w; p.height = h;
  p.channels = channels;
  p.bps = bytes_per_sample;
  p.overlap = overlap;
  // chroma a notch coarser than luma at lossy settings, per usual practice
  p.qp_dc = p.qp_lp = p.qp_hp = qp;
  derive(p);
  p.tiles_x = tiles_x > 0 ? (tiles_x > p.mbw ? p.mbw : tiles_x) : 1;
  p.tiles_y = tiles_y > 0 ? (tiles_y > p.mbh ? p.mbh : tiles_y) : 1;
  BitWriter bw;
  encode_codestream(bw, p, pixels);
  bw.align();
  std::vector<uint8_t> container;
  write_container(container, p, bw.out);
  if (int64_t(container.size()) > out_cap) return JXR_E_BUFFER;
  memcpy(out, container.data(), container.size());
  return int64_t(container.size());
}

}  // extern "C"
