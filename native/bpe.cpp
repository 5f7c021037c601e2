// Fast CLIP byte-pair-encoding tokenizer — native host-side runtime.
//
// Implements the OpenCLIP SimpleTokenizer contract (reference
// training/path_open_clip/tokenizer.py:64-188: byte-level BPE over the CLIP
// word regex, lowercased, <|startoftext|>/<|endoftext|> framing at
// context_length=77) for ASCII text. The Python wrapper
// (keep_tpu/text/fast_tokenizer.py) routes any text the fast path cannot
// reproduce bit-for-bit (non-ASCII bytes, HTML entities, the literal special
// tokens) to the pure-Python BPETokenizer, so outputs are identical
// everywhere — fuzz-parity-tested in tests/test_fast_tokenizer.py.
//
// C ABI only (consumed via ctypes — no pybind11 in this image). Merges file
// must be plain text (the wrapper gunzips .gz files to a temp path first).

#include <array>
#include <cstdint>
#include <mutex>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// GPT-2/CLIP reversible byte<->unicode map, insertion order preserved
// (tokenizer.py bytes_to_unicode): printable ranges map to themselves, the
// rest to code points 256+n — the ORDER defines the base vocab ids.
std::string cp_to_utf8(int cp) {
  std::string s;
  if (cp < 0x80) {
    s += static_cast<char>(cp);
  } else if (cp < 0x800) {
    s += static_cast<char>(0xC0 | (cp >> 6));
    s += static_cast<char>(0x80 | (cp & 0x3F));
  } else {
    s += static_cast<char>(0xE0 | (cp >> 12));
    s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    s += static_cast<char>(0x80 | (cp & 0x3F));
  }
  return s;
}

// byte value -> unicode string, plus the base-vocab order of byte values.
void bytes_to_unicode(std::array<std::string, 256>* table,
                      std::vector<int>* order) {
  std::array<bool, 256> in_bs{};
  auto add_range = [&](int lo, int hi) {
    for (int b = lo; b <= hi; ++b) {
      in_bs[b] = true;
      order->push_back(b);
      (*table)[b] = cp_to_utf8(b);
    }
  };
  add_range('!', '~');    // 33..126
  add_range(0xA1, 0xAC);  // 161..172
  add_range(0xAE, 0xFF);  // 174..255
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (!in_bs[b]) {
      order->push_back(b);
      (*table)[b] = cp_to_utf8(256 + n);
      ++n;
    }
  }
}

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 31 +
           std::hash<std::string>()(p.second);
  }
};

struct BPE {
  std::unordered_map<std::string, int32_t> encoder;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  std::mutex cache_mu;  // ctypes releases the GIL; one handle may be shared
  std::array<std::string, 256> byte_enc;
  int32_t sot = -1, eot = -1;
};

// The reference bpe() merge loop (tokenizer.py:101-135), including the
// .index()-based merge scan quirks, producing encoder ids directly.
// Returns by value: the cache can rehash under concurrent callers, so no
// references into it escape the lock.
std::vector<int32_t> bpe_token(BPE& t, const std::string& token) {
  {
    std::lock_guard<std::mutex> lock(t.cache_mu);
    auto hit = t.cache.find(token);
    if (hit != t.cache.end()) return hit->second;
  }

  // split into byte-encoder symbols (UTF-8 code points), last gets </w>
  std::vector<std::string> word;
  for (size_t i = 0; i < token.size();) {
    size_t len = 1;
    unsigned char c = token[i];
    if (c >= 0xF0) len = 4;
    else if (c >= 0xE0) len = 3;
    else if (c >= 0xC0) len = 2;
    word.push_back(token.substr(i, len));
    i += len;
  }
  word.back() += "</w>";

  while (word.size() > 1) {
    // lowest-rank adjacent pair
    int best_rank = INT32_MAX;
    std::pair<std::string, std::string> best;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = t.ranks.find({word[i], word[i + 1]});
      if (it != t.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best = it->first;
      }
    }
    if (best_rank == INT32_MAX) break;
    std::vector<std::string> merged;
    merged.reserve(word.size());
    size_t i = 0;
    while (i < word.size()) {
      size_t j = i;
      while (j < word.size() && word[j] != best.first) ++j;
      for (size_t k = i; k < j; ++k) merged.push_back(word[k]);
      if (j == word.size()) break;
      i = j;
      if (i + 1 < word.size() && word[i + 1] == best.second) {
        merged.push_back(best.first + best.second);
        i += 2;
      } else {
        merged.push_back(word[i]);
        i += 1;
      }
    }
    word.swap(merged);
  }

  std::vector<int32_t> ids;
  ids.reserve(word.size());
  for (const auto& sym : word) {
    auto it = t.encoder.find(sym);  // encoder is read-only after create
    ids.push_back(it == t.encoder.end() ? -1 : it->second);
  }
  std::lock_guard<std::mutex> lock(t.cache_mu);
  t.cache.emplace(token, ids);
  return ids;
}

inline bool is_lower(char c) { return c >= 'a' && c <= 'z'; }
inline bool is_digit(char c) { return c >= '0' && c <= '9'; }
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
         c == '\f';
}

// CLIP word regex over lowercased ASCII: contractions | [letters]+ |
// [digit] | [^ws/letter/digit]+ (tokenizer.py:88; the wrapper gates the
// special-token and non-ASCII alternatives away).
void split_words(const std::string& text, std::vector<std::string>* out) {
  static const char* kContractions[] = {"'s", "'t", "'re", "'ve",
                                        "'m", "'ll", "'d"};
  size_t i = 0;
  const size_t n = text.size();
  while (i < n) {
    if (is_space(text[i])) {
      ++i;
      continue;
    }
    if (text[i] == '\'') {
      bool matched = false;
      for (const char* c : kContractions) {
        size_t len = std::strlen(c);
        if (text.compare(i, len, c) == 0) {
          out->push_back(text.substr(i, len));
          i += len;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    if (is_lower(text[i])) {
      size_t j = i;
      while (j < n && is_lower(text[j])) ++j;
      out->push_back(text.substr(i, j - i));
      i = j;
    } else if (is_digit(text[i])) {
      out->push_back(text.substr(i, 1));
      ++i;
    } else {
      size_t j = i;
      while (j < n && !is_space(text[j]) && !is_lower(text[j]) &&
             !is_digit(text[j]))
        ++j;
      out->push_back(text.substr(i, j - i));
      i = j;
    }
  }
}

// whitespace_clean + lower (basic_clean's html.unescape is gated away by the
// wrapper: texts containing '&' take the Python path).
std::string clean_lower(const char* text) {
  std::string out;
  bool in_ws = false;
  for (const char* p = text; *p; ++p) {
    unsigned char c = *p;
    if (is_space(c)) {
      in_ws = true;
      continue;
    }
    if (in_ws && !out.empty()) out += ' ';
    in_ws = false;
    out += (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                  : static_cast<char>(c);
  }
  return out;
}

}  // namespace

extern "C" {

void* bpe_create(const char* merges_path) {
  std::ifstream f(merges_path);
  if (!f.good()) return nullptr;
  auto* t = new BPE();
  std::vector<int> order;
  bytes_to_unicode(&t->byte_enc, &order);

  // base vocab: byte symbols in map-insertion order, then their </w> forms
  int32_t idx = 0;
  std::vector<std::string> base;
  for (int b : order) base.push_back(t->byte_enc[b]);
  for (const auto& v : base) t->encoder.emplace(v, idx++);
  for (const auto& v : base) t->encoder.emplace(v + "</w>", idx++);

  std::string line;
  bool first = true;
  int32_t merge_no = 0;  // line index — Python ranks are dict(zip(m, range))
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (first && !line.empty() && line[0] == '#') {
      first = false;
      continue;
    }
    first = false;
    std::istringstream ss(line);
    std::string a, b, extra;
    if (!(ss >> a >> b) || (ss >> extra)) continue;
    // open_clip slices merges[1:49152-256-2+1] (tokenizer.py:76): only the
    // first 48,894 merges of the stock 262K-line file participate
    if (merge_no >= 49152 - 256 - 2) break;
    // last-wins on duplicates with non-compacted indices, matching
    // Python's dict(zip(merges, range(len(merges)))) exactly
    t->ranks[std::make_pair(a, b)] = merge_no++;
    t->encoder[a + b] = idx++;
  }
  t->sot = idx;
  t->encoder.emplace("<|startoftext|>", idx++);
  t->eot = idx;
  t->encoder.emplace("<|endoftext|>", idx++);
  return t;
}

void bpe_free(void* handle) { delete static_cast<BPE*>(handle); }

int bpe_vocab_size(void* handle) {
  return static_cast<int>(static_cast<BPE*>(handle)->encoder.size());
}

// Encode one ASCII text: SOT + bpe ids + EOT, truncated keeping EOT last,
// zero-padded to context_length. Returns the unpadded length.
int bpe_encode(void* handle, const char* text, int context_length,
               int32_t* out_ids) {
  if (context_length < 2) return -1;  // SOT + EOT minimum; negative resize = UB
  auto& t = *static_cast<BPE*>(handle);
  std::string cleaned = clean_lower(text);
  std::vector<std::string> words;
  split_words(cleaned, &words);

  std::vector<int32_t> ids;
  ids.push_back(t.sot);
  for (const auto& w : words) {
    const std::vector<int32_t> toks = bpe_token(t, w);
    ids.insert(ids.end(), toks.begin(), toks.end());
  }
  ids.push_back(t.eot);
  if (static_cast<int>(ids.size()) > context_length) {
    ids.resize(context_length);
    ids.back() = t.eot;
  }
  int n = static_cast<int>(ids.size());
  std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
  for (int i = n; i < context_length; ++i) out_ids[i] = 0;
  return n;
}

void bpe_encode_batch(void* handle, const char** texts, int n_texts,
                      int context_length, int32_t* out_ids) {
  for (int i = 0; i < n_texts; ++i) {
    bpe_encode(handle, texts[i], context_length,
               out_ids + i * static_cast<size_t>(context_length));
  }
}

}  // extern "C"
