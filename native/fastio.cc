// fastio: native FASTA/FASTQ parsing, encoding, and lane-batch packing.
//
// TPU-native replacement for the reference's vendored C seq_file library
// (L0 in SURVEY.md; used by the reference driver at
// src/alignment_cmdline.c:335-457) plus the driver's per-record encode+pack
// loops (src/alignment_cmdline.c:444-450). Exposed to Python via a plain C
// ABI consumed with ctypes (no pybind11 in this environment).
//
// Semantics match seqalign_tpu.utils.fasta / packing:
//  - FASTA ('>') and FASTQ ('@') autodetected; gzip autodetected (zlib).
//  - Sequence characters encoded a-z/A-Z -> 1..26, '*' -> 31; any other
//    character is a fatal parse error (code -2), matching letters_to_index
//    (reference src/alignment_scoring.c:70-81).
//  - pack_batch fills a '*'-padded (lb_pad, lanes) int8 buffer position-major
//    (db[pos * lanes + lane]), the reference's lane-major layout scaled up.

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int8_t kPad = 31;  // '*'

int8_t encode_lut[256];

struct LutInit {
  LutInit() {
    memset(encode_lut, -1, sizeof(encode_lut));
    for (int c = 'a'; c <= 'z'; ++c) encode_lut[c] = static_cast<int8_t>(c - 96);
    for (int c = 'A'; c <= 'Z'; ++c) encode_lut[c] = static_cast<int8_t>(c - 64);
    encode_lut[static_cast<int>('*')] = kPad;
  }
} lut_init;

struct ParseResult {
  std::vector<int8_t> seq;        // concatenated encoded residues
  std::vector<int64_t> offsets;   // N+1 offsets into seq
  std::string names;             // concatenated names, '\n'-separated
  int64_t n = 0;
};

// Reads the whole (possibly gzipped) file; zlib transparently handles both.
bool read_all(const char* path, std::string* out) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return false;
  gzbuffer(f, 1 << 20);
  char buf[1 << 20];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) out->append(buf, n);
  bool ok = n == 0;
  gzclose(f);
  return ok;
}

// Returns 0 ok, -1 io error, -2 illegal character, -3 bad format.
int parse(const char* path, ParseResult* res) {
  std::string data;
  if (!read_all(path, &data)) return -1;
  res->offsets.push_back(0);
  size_t i = 0;
  const size_t n = data.size();
  // Skip leading blank lines.
  while (i < n && (data[i] == '\n' || data[i] == '\r' || data[i] == ' ')) ++i;
  if (i >= n) return 0;  // empty file -> zero records
  const char marker = data[i];
  if (marker != '>' && marker != '@') return -3;
  const bool fastq = marker == '@';
  while (i < n) {
    if (data[i] != marker) return -3;
    ++i;
    size_t eol = data.find('\n', i);
    if (eol == std::string::npos) eol = n;
    size_t name_end = eol;
    while (name_end > i && (data[name_end - 1] == '\r')) --name_end;
    res->names.append(data, i, name_end - i);
    res->names.push_back('\n');
    i = eol + 1;
    if (fastq) {
      size_t seq_eol = data.find('\n', i);
      if (seq_eol == std::string::npos) seq_eol = n;
      for (size_t k = i; k < seq_eol; ++k) {
        const unsigned char c = data[k];
        if (c == '\r' || c == ' ' || c == '\t') continue;
        const int8_t e = encode_lut[c];
        if (e < 0) return -2;
        res->seq.push_back(e);
      }
      i = seq_eol + 1;
      // '+' line and quality line.
      size_t plus_eol = data.find('\n', i);
      i = plus_eol == std::string::npos ? n : plus_eol + 1;
      size_t qual_eol = data.find('\n', i);
      i = qual_eol == std::string::npos ? n : qual_eol + 1;
      // Skip blank lines between records.
      while (i < n && (data[i] == '\n' || data[i] == '\r')) ++i;
    } else {
      while (i < n && data[i] != marker) {
        size_t line_eol = data.find('\n', i);
        if (line_eol == std::string::npos) line_eol = n;
        for (size_t k = i; k < line_eol; ++k) {
          const unsigned char c = data[k];
          if (c == '\r' || c == ' ' || c == '\t') continue;
          const int8_t e = encode_lut[c];
          if (e < 0) return -2;
          res->seq.push_back(e);
        }
        i = line_eol + 1;
      }
    }
    res->offsets.push_back(static_cast<int64_t>(res->seq.size()));
    res->n += 1;
  }
  return 0;
}

}  // namespace

extern "C" {

// Parses path. On success returns a heap handle and fills counts; call
// fastio_fetch to copy data out and fastio_free to release. Returns nullptr
// on failure and sets *err (-1 io, -2 illegal char, -3 format).
void* fastio_parse(const char* path, int64_t* n_records, int64_t* n_residues,
                   int64_t* names_bytes, int* err) {
  auto* res = new ParseResult();
  const int rc = parse(path, res);
  if (rc != 0) {
    delete res;
    *err = rc;
    return nullptr;
  }
  *err = 0;
  *n_records = res->n;
  *n_residues = static_cast<int64_t>(res->seq.size());
  *names_bytes = static_cast<int64_t>(res->names.size());
  return res;
}

void fastio_fetch(void* handle, int8_t* seq_out, int64_t* offsets_out,
                  char* names_out) {
  auto* res = static_cast<ParseResult*>(handle);
  if (!res->seq.empty())
    memcpy(seq_out, res->seq.data(), res->seq.size());
  memcpy(offsets_out, res->offsets.data(),
         res->offsets.size() * sizeof(int64_t));
  if (!res->names.empty())
    memcpy(names_out, res->names.data(), res->names.size());
}

void fastio_free(void* handle) { delete static_cast<ParseResult*>(handle); }

// Packs the records selected by `order` (n_sel indices) into a '*'-padded
// position-major batch: out[pos * lanes + lane]. out must hold
// lb_pad * lanes bytes and is fully overwritten.
void fastio_pack(const int8_t* seq, const int64_t* offsets,
                 const int64_t* order, int64_t n_sel, int64_t lanes,
                 int64_t lb_pad, int8_t* out) {
  memset(out, kPad, static_cast<size_t>(lb_pad) * lanes);
  for (int64_t lane = 0; lane < n_sel; ++lane) {
    const int64_t rec = order[lane];
    const int64_t beg = offsets[rec];
    const int64_t len = offsets[rec + 1] - beg;
    const int8_t* src = seq + beg;
    int8_t* dst = out + lane;
    for (int64_t p = 0; p < len; ++p) dst[p * lanes] = src[p];
  }
}

}  // extern "C"
