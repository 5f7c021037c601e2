// Fast WordPiece tokenizer — native host-side runtime for keep_tpu.
//
// The tokenizer is the host hot path of the framework: training tokenizes
// every batch (256-token contract) and the zero-shot classifier build
// tokenizes thousands of prompt texts (reference WSI_evaluation drivers).
// This implements the HF-BERT WordPiece algorithm (clean → whitespace split
// → lowercase → punctuation split → greedy longest-match with ## pieces →
// [CLS]/[SEP] framing + fixed-length padding) for ASCII text; the Python
// wrapper routes non-ASCII strings to the pure-Python tokenizer so parity
// holds everywhere.
//
// C ABI only (consumed via ctypes — no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t cls_id = -1, sep_id = -1, pad_id = -1, unk_id = -1;
  bool lower_case = true;
  static constexpr int kMaxCharsPerWord = 100;
};

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

inline bool is_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_control(unsigned char c) { return c < 32 && !is_ws(c); }

// Greedy longest-match WordPiece over one word.
void wordpiece(const Tokenizer& t, const std::string& word,
               std::vector<int32_t>* out) {
  if (word.size() > Tokenizer::kMaxCharsPerWord) {
    out->push_back(t.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t piece = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = t.vocab.find(sub);
      if (it != t.vocab.end()) {
        piece = it->second;
        break;
      }
      --end;
    }
    if (piece < 0) {
      out->push_back(t.unk_id);
      return;
    }
    pieces.push_back(piece);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

void tokenize_ascii(const Tokenizer& t, const char* text,
                    std::vector<int32_t>* ids) {
  std::string word;
  auto flush_word = [&]() {
    if (!word.empty()) {
      wordpiece(t, word, ids);
      word.clear();
    }
  };
  for (const char* p = text; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (c == 0 || is_control(c)) continue;
    if (is_ws(c)) {
      flush_word();
    } else if (is_ascii_punct(c)) {
      flush_word();
      std::string punct(1, static_cast<char>(c));
      wordpiece(t, punct, ids);
    } else {
      char lc = static_cast<char>(c);
      if (t.lower_case && lc >= 'A' && lc <= 'Z') lc += 32;
      word.push_back(lc);
    }
  }
  flush_word();
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, int lower_case) {
  auto* t = new Tokenizer();
  t->lower_case = lower_case != 0;
  std::ifstream f(vocab_path);
  if (!f.good()) {
    delete t;
    return nullptr;
  }
  std::string line;
  int32_t idx = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    // last-wins on duplicate lines, matching Python's dict overwrite
    if (!line.empty()) t->vocab[line] = idx;
    ++idx;
  }
  auto get = [&](const char* tok) {
    auto it = t->vocab.find(tok);
    return it == t->vocab.end() ? -1 : it->second;
  };
  t->cls_id = get("[CLS]");
  t->sep_id = get("[SEP]");
  t->pad_id = get("[PAD]");
  t->unk_id = get("[UNK]");
  if (t->cls_id < 0 || t->sep_id < 0 || t->pad_id < 0 || t->unk_id < 0) {
    delete t;
    return nullptr;
  }
  return t;
}

void wp_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

int wp_vocab_size(void* handle) {
  return static_cast<int>(static_cast<Tokenizer*>(handle)->vocab.size());
}

// Encode one ASCII text into [CLS] ids [SEP] + padding. Writes max_length
// ids and max_length mask entries; returns the unpadded length.
int wp_encode(void* handle, const char* text, int max_length, int32_t* out_ids,
              int32_t* out_mask) {
  if (max_length < 2) return -1;  // [CLS]+[SEP] minimum; a negative
  // resize converts to SIZE_MAX and aborts across the C ABI
  const auto& t = *static_cast<Tokenizer*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(64);
  tokenize_ascii(t, text, &ids);
  if (static_cast<int>(ids.size()) > max_length - 2)
    ids.resize(max_length - 2);  // truncation reserves [CLS]/[SEP]
  int n = static_cast<int>(ids.size()) + 2;
  out_ids[0] = t.cls_id;
  std::memcpy(out_ids + 1, ids.data(), ids.size() * sizeof(int32_t));
  out_ids[ids.size() + 1] = t.sep_id;
  for (int i = n; i < max_length; ++i) out_ids[i] = t.pad_id;
  for (int i = 0; i < max_length; ++i) out_mask[i] = i < n ? 1 : 0;
  return n;
}

// Batch encode: texts as a packed array of pointers.
void wp_encode_batch(void* handle, const char** texts, int n_texts,
                     int max_length, int32_t* out_ids, int32_t* out_mask) {
  for (int i = 0; i < n_texts; ++i) {
    wp_encode(handle, texts[i], max_length, out_ids + i * max_length,
              out_mask + i * max_length);
  }
}

}  // extern "C"
