// Native fast paths for kaldi_tpu host-side hot loops.
//
// The reference implements its decoders in C++ (decoder/
// lattice-faster-decoder.cc etc.); this module is the same split for
// the TPU build: device programs handle acoustics, and this native
// beam-Viterbi consumes the precomputed (frames × pdfs) score matrix.
// Plain C ABI, loaded from Python via ctypes (no pybind11 in the
// image).
//
// Build: g++ -O3 -march=native -shared -fPIC kt_native.cpp -o libkt_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {
constexpr float kInf = 1e30f;
}

extern "C" {

// Bulk scanner for binary matrix archives (util/kaldi-table's hot
// read path; the reference's SequentialTableReader is C++ for the
// same reason).  Walks "<key> \0B FM \x04<rows>\x04<cols><data>"
// entries, recording key strings and data offsets so Python can view
// the payloads straight out of one mmap with zero per-entry parsing.
//
// dtypes: 0 = FM (f32), 1 = DM (f64).  Returns 0 on success,
// -1 open failure, -2 malformed/unsupported entry (caller falls back
// to the Python reader), -3 capacity exceeded.
int ark_scan_matrices(const char* path,
                      char* keys_buf, int64_t keys_cap,
                      int64_t* offsets, int32_t* rows, int32_t* cols,
                      int8_t* dtypes, int64_t max_entries,
                      int64_t* num_entries, int64_t* keys_len) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t n = 0, koff = 0;
  int rc = 0;
  while (true) {
    int c = std::fgetc(f);
    while (c == ' ' || c == '\n' || c == '\t' || c == '\r')
      c = std::fgetc(f);
    if (c == EOF) break;
    if (n >= max_entries) { rc = -3; break; }
    // key token
    int64_t kstart = koff;
    while (c != EOF && c != ' ' && c != '\n' && c != '\t') {
      if (koff + 2 >= keys_cap) { rc = -3; goto done; }
      keys_buf[koff++] = static_cast<char>(c);
      c = std::fgetc(f);
    }
    keys_buf[koff++] = '\0';
    if (c == EOF) { rc = -2; break; }
    {
      // binary marker "\0B " then "FM "/"DM "
      unsigned char hdr[2];
      if (std::fread(hdr, 1, 2, f) != 2 || hdr[0] != 0 ||
          hdr[1] != 'B') { rc = -2; break; }
      char tok[4] = {0, 0, 0, 0};
      if (std::fread(tok, 1, 3, f) != 3 || tok[2] != ' ') {
        rc = -2; break;
      }
      int8_t dt;
      int64_t esize;
      if (tok[0] == 'F' && tok[1] == 'M') { dt = 0; esize = 4; }
      else if (tok[0] == 'D' && tok[1] == 'M') { dt = 1; esize = 8; }
      else { rc = -2; break; }
      unsigned char sz;
      int32_t r, cdim;
      if (std::fread(&sz, 1, 1, f) != 1 || sz != 4 ||
          std::fread(&r, 4, 1, f) != 1) { rc = -2; break; }
      if (std::fread(&sz, 1, 1, f) != 1 || sz != 4 ||
          std::fread(&cdim, 4, 1, f) != 1) { rc = -2; break; }
      if (r < 0 || cdim < 0) { rc = -2; break; }
      int64_t data_off = std::ftell(f);
      offsets[n] = data_off;
      rows[n] = r;
      cols[n] = cdim;
      dtypes[n] = dt;
      (void)kstart;
      ++n;
      if (std::fseek(f, static_cast<long>(data_off +
                     esize * int64_t(r) * cdim), SEEK_SET) != 0) {
        rc = -2; break;
      }
    }
  }
done:
  std::fclose(f);
  *num_entries = n;
  *keys_len = koff;
  return rc;
}

// Exact/beam Viterbi over a packed graph.
//   emitting arcs: e_src/e_dst/e_pdf/e_olabel/e_w  [num_e]
//   eps arcs:      ne_src/ne_dst/ne_olabel/ne_w    [num_ne]
//   loglikes: row-major [T x P]
// Outputs: out_ali (capacity ali_cap), out_words (capacity words_cap),
// lengths, cost. Returns 0 on success, -1 if no path survived, -2 on
// inconsistent backpointers, -3 if an output buffer is too small (word
// chains through word-labeled epsilon arcs are not bounded by T, so the
// caller's capacity is a guess — on -3 it must fall back to the Python
// decoder or retry with bigger buffers).
int beam_viterbi(const int32_t* e_src, const int32_t* e_dst,
                 const int32_t* e_pdf, const int32_t* e_ilabel,
                 const int32_t* e_olabel, const float* e_w, int64_t num_e,
                 const int32_t* ne_src, const int32_t* ne_dst,
                 const int32_t* ne_olabel, const float* ne_w,
                 int64_t num_ne, int32_t ne_iters,
                 int32_t num_states, int32_t start,
                 const float* final_costs,
                 const float* loglikes, int64_t T, int64_t P,
                 float acoustic_scale, float beam,
                 int32_t* out_ali, int32_t ali_cap, int32_t* out_ali_len,
                 int32_t* out_words, int32_t words_cap,
                 int32_t* out_words_len, float* out_cost) {
  const int64_t S = num_states;
  std::vector<float> cost(S, kInf), next(S, kInf);
  // backpointers per frame: arc id; emitting arcs are [0, num_e),
  // eps arcs encoded as num_e + id. bp[t][s] for t in [0, T].
  std::vector<int32_t> bp(static_cast<size_t>(T + 1) * S, -1);
  cost[start] = 0.0f;

  auto eps_close = [&](std::vector<float>& c, int64_t t) {
    for (int32_t it = 0; it < ne_iters; ++it) {
      bool changed = false;
      for (int64_t a = 0; a < num_ne; ++a) {
        float nc = c[ne_src[a]] + ne_w[a];
        if (nc < c[ne_dst[a]] - 1e-9f) {
          c[ne_dst[a]] = nc;
          bp[t * S + ne_dst[a]] = static_cast<int32_t>(num_e + a);
          changed = true;
        }
      }
      if (!changed) break;
    }
  };

  eps_close(cost, 0);

  for (int64_t t = 0; t < T; ++t) {
    const float* frame = loglikes + t * P;
    float best = kInf;
    for (int64_t s = 0; s < S; ++s) best = std::min(best, cost[s]);
    if (best >= kInf / 2) return -1;
    const float cutoff = best + beam;
    std::fill(next.begin(), next.end(), kInf);
    int32_t* bpt = bp.data() + (t + 1) * S;
    for (int64_t a = 0; a < num_e; ++a) {
      const float sc = cost[e_src[a]];
      if (sc > cutoff) continue;
      const float nc = sc + e_w[a] - acoustic_scale * frame[e_pdf[a]];
      if (nc < next[e_dst[a]]) {
        next[e_dst[a]] = nc;
        bpt[e_dst[a]] = static_cast<int32_t>(a);
      }
    }
    eps_close(next, t + 1);
    cost.swap(next);
  }

  // choose best final
  float best_cost = kInf;
  int32_t best_state = -1;
  for (int64_t s = 0; s < S; ++s) {
    const float c = cost[s] + final_costs[s];
    if (c < best_cost) {
      best_cost = c;
      best_state = static_cast<int32_t>(s);
    }
  }
  if (best_state < 0 || best_cost >= kInf / 2) return -1;

  // traceback
  std::vector<int32_t> ali, words;
  int64_t t = T;
  int32_t s = best_state;
  while (t > 0 || bp[t * S + s] >= 0) {
    const int32_t arc = bp[t * S + s];
    if (arc < 0) {
      if (t == 0) break;
      return -2;  // inconsistent backpointers (bug guard)
    }
    if (arc >= num_e) {  // eps arc, same frame
      const int64_t a = arc - num_e;
      if (ne_olabel[a] != 0) words.push_back(ne_olabel[a]);
      s = ne_src[a];
    } else {
      ali.push_back(e_ilabel[arc]);
      if (e_olabel[arc] != 0) words.push_back(e_olabel[arc]);
      s = e_src[arc];
      --t;
    }
  }
  if (ali.size() > static_cast<size_t>(ali_cap) ||
      words.size() > static_cast<size_t>(words_cap)) {
    return -3;  // caller's buffers too small; no bytes written
  }
  std::reverse(ali.begin(), ali.end());
  std::reverse(words.begin(), words.end());
  *out_ali_len = static_cast<int32_t>(ali.size());
  *out_words_len = static_cast<int32_t>(words.size());
  std::memcpy(out_ali, ali.data(), ali.size() * sizeof(int32_t));
  std::memcpy(out_words, words.data(), words.size() * sizeof(int32_t));
  *out_cost = best_cost;
  return 0;
}

}  // extern "C"
