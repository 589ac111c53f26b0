// Host-side entropy-codec hot paths for control_gic_tpu.
//
// The bitstream frame format matches the reference codec byte-for-byte
// (/root/reference/CGIC/tools/indices_coding.py:91-126 and
// mask_coding.py:20-55): an 8-bit pad-count header (1..8 — note a stream
// whose payload is already byte-aligned still gets 8 pad bits), followed by
// the MSB-first concatenated code bits, zero-padded.
//
// The Huffman tree/code assignment itself is built in Python (a faithful
// heapq replica — tree build is a one-time O(n log n) over 1024 symbols);
// this file only does the per-image O(bits) work: packing symbol codes into
// the frame and walking the decode trie. The reference does both in pure
// Python via string concatenation (its measured encode bottleneck).
//
// Build: g++ -O3 -shared -fPIC -o libentropy_codec.so entropy_codec.cpp

#include <cstdint>
#include <cstring>

namespace {

struct BitWriter {
  uint8_t* buf;
  int64_t cap;
  int64_t bitpos = 0;  // next bit index to write

  bool put_bits(const uint8_t* bytes, uint32_t nbits) {
    // `bytes` holds the code MSB-first starting at bit 0 of bytes[0].
    if ((bitpos + nbits + 7) / 8 > cap) return false;
    for (uint32_t i = 0; i < nbits; ++i) {
      uint8_t bit = (bytes[i >> 3] >> (7 - (i & 7))) & 1;
      int64_t p = bitpos + i;
      if (bit)
        buf[p >> 3] |= static_cast<uint8_t>(0x80u >> (p & 7));
    }
    bitpos += nbits;
    return true;
  }
};

}  // namespace

extern "C" {

// Encode `n` symbols into the padded frame. Code table: lens[sym] in bits
// (0 < len <= 256), code_bytes[sym * 32 + k] MSB-first.
// Returns frame length in bytes, or -1 on overflow / bad symbol.
int64_t cgic_huff_encode(const int32_t* symbols, int64_t n,
                         const uint8_t* lens_u16_hack,  // actually uint16_t*
                         const uint8_t* code_bytes, int32_t n_sym,
                         uint8_t* out, int64_t out_cap) {
  const uint16_t* lens = reinterpret_cast<const uint16_t*>(lens_u16_hack);
  if (n == 0) return 0;  // reference writes an empty file for empty streams
  std::memset(out, 0, static_cast<size_t>(out_cap));

  // First count total payload bits to place the pad header.
  int64_t total_bits = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = symbols[i];
    if (s < 0 || s >= n_sym || lens[s] == 0) return -1;
    total_bits += lens[s];
  }
  int64_t pad = 8 - (total_bits % 8);  // 1..8, matches the reference quirk
  int64_t frame_bytes = 1 + (total_bits + pad) / 8;
  if (frame_bytes > out_cap) return -1;

  out[0] = static_cast<uint8_t>(pad);
  BitWriter w{out + 1, out_cap - 1, 0};
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = symbols[i];
    if (!w.put_bits(code_bytes + static_cast<int64_t>(s) * 32, lens[s]))
      return -1;
  }
  return frame_bytes;
}

// Decode a frame using a binary trie. trie[2*node + bit] is either the next
// node index (>= 0) or ~symbol (< 0) at a leaf. Node 0 is the root.
// Returns number of decoded symbols, or -1 on malformed input / overflow.
int64_t cgic_huff_decode(const uint8_t* data, int64_t nbytes,
                         const int32_t* trie, int32_t n_nodes,
                         int32_t* out, int64_t out_cap) {
  if (nbytes == 0) return 0;
  int64_t pad = data[0];
  if (pad < 1 || pad > 8) return -1;
  int64_t payload_bits = (nbytes - 1) * 8 - pad;
  if (payload_bits < 0) return -1;

  int32_t node = 0;
  int64_t count = 0;
  for (int64_t b = 0; b < payload_bits; ++b) {
    uint8_t bit = (data[1 + (b >> 3)] >> (7 - (b & 7))) & 1;
    int32_t next = trie[2 * node + bit];
    if (next < 0) {
      if (count >= out_cap) return -1;
      out[count++] = ~next;
      node = 0;
    } else {
      if (next >= n_nodes) return -1;
      node = next;
    }
  }
  // Trailing bits that do not complete a code are dropped, matching the
  // reference's decode_text loop (indices_coding.py:140-151).
  return count;
}

// Bitmap (1 bit per element) encode/decode with the same frame format.
int64_t cgic_bitmap_encode(const uint8_t* bits, int64_t n, uint8_t* out,
                           int64_t out_cap) {
  if (n == 0) return 0;
  int64_t pad = 8 - (n % 8);
  int64_t frame_bytes = 1 + (n + pad) / 8;
  if (frame_bytes > out_cap) return -1;
  std::memset(out, 0, static_cast<size_t>(frame_bytes));
  out[0] = static_cast<uint8_t>(pad);
  for (int64_t i = 0; i < n; ++i) {
    if (bits[i]) out[1 + (i >> 3)] |= static_cast<uint8_t>(0x80u >> (i & 7));
  }
  return frame_bytes;
}

int64_t cgic_bitmap_decode(const uint8_t* data, int64_t nbytes, uint8_t* out,
                           int64_t out_cap) {
  if (nbytes == 0) return 0;
  int64_t pad = data[0];
  if (pad < 1 || pad > 8) return -1;
  int64_t nbits = (nbytes - 1) * 8 - pad;
  if (nbits < 0 || nbits > out_cap) return -1;
  for (int64_t i = 0; i < nbits; ++i)
    out[i] = (data[1 + (i >> 3)] >> (7 - (i & 7))) & 1;
  return nbits;
}

}  // extern "C"
