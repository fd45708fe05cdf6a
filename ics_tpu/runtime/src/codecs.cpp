// Native codec library for the ICS-TPU host runtime.
//
// Counterpart of the reference's hand-written CPython extension of TIFF
// decoders (ref lib/tifffile.c: py_decodepackbits:550, py_decodelzw:658).
// Plain C ABI (bound from Python via ctypes) instead of the CPython API so
// the library is interpreter-version independent and usable from any host
// tool.  Both decoders are single-pass, branch-light and allocation-free.

#include <cstdint>
#include <cstring>

#define ICS_API __attribute__((visibility("default")))

extern "C" {

// Apple PackBits decompression.  Returns bytes written, or -1 on overflow.
ICS_API long long ics_decode_packbits(const unsigned char* src, long long srclen,
                              unsigned char* dst, long long dstlen) {
  long long i = 0, o = 0;
  while (i < srclen && o < dstlen) {
    const unsigned char h = src[i++];
    if (h < 128) {  // literal run of h+1 bytes
      const long long n = h + 1;
      if (i + n > srclen || o + n > dstlen) {
        const long long take_in = srclen - i;
        const long long take = take_in < dstlen - o ? take_in : dstlen - o;
        std::memcpy(dst + o, src + i, static_cast<size_t>(take));
        return o + take;
      }
      std::memcpy(dst + o, src + i, static_cast<size_t>(n));
      i += n;
      o += n;
    } else if (h > 128) {  // replicate next byte 257-h times
      if (i >= srclen) break;
      long long n = 257 - h;
      if (o + n > dstlen) n = dstlen - o;
      std::memset(dst + o, src[i++], static_cast<size_t>(n));
      o += n;
    }  // h == 128: no-op
  }
  return o;
}

// TIFF-variant LZW: MSB-first bit packing, 9->12 bit codes with the
// "early change" (code width bumps one entry before the table fills).
// Returns bytes written, or -1 on malformed input.
ICS_API long long ics_decode_lzw(const unsigned char* src, long long srclen,
                         unsigned char* dst, long long dstlen) {
  constexpr int kClear = 256, kEoi = 257, kMaxCodes = 4096;
  // Table as (prefix link, final byte, depth); entry strings are
  // materialized by walking links backwards into a scratch buffer.
  static thread_local int prefix[kMaxCodes];
  static thread_local unsigned char final_byte[kMaxCodes];
  static thread_local int depth[kMaxCodes];
  unsigned char scratch[kMaxCodes];

  int next_code = 258;
  int nbits = 9;
  long long bitpos = 0;
  const long long total_bits = srclen * 8;
  long long o = 0;
  int prev = -1;

  auto reset = [&]() {
    next_code = 258;
    nbits = 9;
    prev = -1;
  };
  for (int c = 0; c < 256; ++c) {
    prefix[c] = -1;
    final_byte[c] = static_cast<unsigned char>(c);
    depth[c] = 1;
  }

  auto emit = [&](int code) -> long long {
    // Walk the prefix chain last-byte-first into scratch, keeping only the
    // leading `d` bytes when the output buffer truncates the string.
    int d = depth[code];
    if (o + d > dstlen) d = static_cast<int>(dstlen - o);
    int c = code;
    for (int k = depth[code] - 1; k >= 0; --k) {
      if (k < d) scratch[k] = final_byte[c];
      c = prefix[c];
    }
    std::memcpy(dst + o, scratch, static_cast<size_t>(d));
    o += d;
    return d;
  };

  while (bitpos + nbits <= total_bits && o < dstlen) {
    const long long byte0 = bitpos >> 3;
    uint32_t chunk = 0;
    for (int b = 0; b < 4; ++b) {
      chunk = (chunk << 8) |
              (byte0 + b < srclen ? src[byte0 + b] : 0u);
    }
    const int shift = 32 - static_cast<int>(bitpos & 7) - nbits;
    const int code = (chunk >> shift) & ((1 << nbits) - 1);
    bitpos += nbits;

    if (code == kEoi) break;
    if (code == kClear) {
      reset();
      continue;
    }
    if (prev < 0) {
      if (code >= 256) return -1;
      emit(code);
      prev = code;
      continue;
    }
    if (code < next_code) {
      if (next_code < kMaxCodes) {
        prefix[next_code] = prev;
        // first byte of `code`'s string:
        int c = code;
        while (prefix[c] >= 0) c = prefix[c];
        final_byte[next_code] = final_byte[c];
        depth[next_code] = depth[prev] + 1;
        ++next_code;
      }
      emit(code);
      prev = code;
    } else if (code == next_code && next_code < kMaxCodes) {
      // KwKwK case: new entry = prev + first(prev)
      int c = prev;
      while (prefix[c] >= 0) c = prefix[c];
      prefix[next_code] = prev;
      final_byte[next_code] = final_byte[c];
      depth[next_code] = depth[prev] + 1;
      ++next_code;
      emit(code);
      prev = code;
    } else {
      return -1;  // malformed stream
    }
    // Early change: the decoder table lags the encoder's by one entry, so
    // the width bumps when next_code reaches 2^nbits - 2.
    if (next_code + 2 >= (1 << nbits) && nbits < 12) ++nbits;
  }
  return o;
}

}  // extern "C"
