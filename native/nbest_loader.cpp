// nbest_loader — native data loader for nbest_asr_tpu.
//
// The reference tokenizes and packs batches in Python inside the training
// hot loop (`utils/bert_xlnet_inputs.py:4-104` called per batch per epoch,
// `n_best_asr_bert.py:249-250`).  Our pipeline tokenizes offline, once —
// and this C++ component makes that offline pass native: shard parsing,
// word-vocab tokenization, layout building ([CLS] sys [SEP] hyps [SEP]
// framing with segment ids) and fixed-shape packing into caller-provided
// int32/float32 buffers, exposed through a C ABI consumed via ctypes
// (`nbest_asr_tpu/data/native_loader.py`).
//
// Layouts (parity with `utils/bert_xlnet_inputs.py:55-85`):
//   0 = default:        [CLS] sys [SEP] hyps [SEP]   segs 0|1
//   1 = no_system_act:  [CLS] hyps [SEP]             no segs
//   2 = tod:            [CLS] [SYS] sys [USR] hyps [SEP]  segs 0|1
//
// Build: g++ -O3 -std=c++17 -shared -fPIC nbest_loader.cpp -o libnbest_loader.so

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Unicode helpers for the WordPiece mode (BertTokenizer parity).
// Exact for ASCII (all of DSTC2) plus Latin-1/Latin-Extended-A lowercase
// and accent stripping; other codepoints pass through untouched.
// ---------------------------------------------------------------------

// Decode the UTF-8 codepoint starting at s[i]; advances i past it.
uint32_t utf8_next(const std::string& s, size_t* i) {
  unsigned char c = s[*i];
  uint32_t cp = c;
  int extra = 0;
  if (c >= 0xF0) { cp = c & 0x07; extra = 3; }
  else if (c >= 0xE0) { cp = c & 0x0F; extra = 2; }
  else if (c >= 0xC0) { cp = c & 0x1F; extra = 1; }
  ++*i;
  while (extra-- > 0 && *i < s.size() &&
         (static_cast<unsigned char>(s[*i]) & 0xC0) == 0x80) {
    cp = (cp << 6) | (static_cast<unsigned char>(s[*i]) & 0x3F);
    ++*i;
  }
  return cp;
}

void utf8_append(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// transformers' `_is_punctuation`: ASCII non-alnum printable ranges are
// ALWAYS punctuation, plus Unicode category P (common blocks covered).
bool is_punct(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  if (cp >= 0x2000 && cp <= 0x206F) return cp >= 0x2010;  // general punct
  switch (cp) {  // Latin-1 category-P signs
    case 0x00A1: case 0x00A7: case 0x00AB: case 0x00B6: case 0x00B7:
    case 0x00BB: case 0x00BF:
      return true;
  }
  return false;
}

bool is_control(uint32_t cp) {
  return cp < 32 || (cp >= 0x7F && cp <= 0x9F) || cp == 0xFFFD;
}

// lowercase (ASCII + Latin-1), applied BEFORE accent stripping — same
// order as BasicTokenizer (`token.lower()` then `_run_strip_accents`).
uint32_t to_lower(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 32;
  if (cp >= 0xC0 && cp <= 0xDE && cp != 0xD7) return cp + 0x20;
  // Latin Extended-A: even codepoints are uppercase of cp+1 (mostly)
  if (cp >= 0x100 && cp <= 0x177 && (cp & 1) == 0) return cp + 1;
  return cp;
}

// NFD base letter for precomposed Latin-1 / Latin-Ext-A lowercase chars
// (what `_run_strip_accents` leaves after dropping the Mn combining
// mark).  Non-accented codepoints return themselves.
uint32_t strip_accent(uint32_t cp) {
  if (cp >= 0xE0 && cp <= 0xE5) return 'a';
  if (cp == 0xE7) return 'c';
  if (cp >= 0xE8 && cp <= 0xEB) return 'e';
  if (cp >= 0xEC && cp <= 0xEF) return 'i';
  if (cp == 0xF1) return 'n';
  if ((cp >= 0xF2 && cp <= 0xF6) || cp == 0xF8) return 'o';
  if (cp >= 0xF9 && cp <= 0xFC) return 'u';
  if (cp == 0xFD || cp == 0xFF) return 'y';
  if (cp >= 0x101 && cp <= 0x105) return 'a';   // ā ă ą
  if (cp >= 0x107 && cp <= 0x10D) return 'c';
  if (cp == 0x10F || cp == 0x111) return 'd';
  if (cp >= 0x113 && cp <= 0x11B) return 'e';
  if (cp >= 0x11D && cp <= 0x123) return 'g';
  if (cp == 0x125 || cp == 0x127) return 'h';
  if (cp >= 0x129 && cp <= 0x131) return 'i';
  if (cp == 0x135) return 'j';
  if (cp == 0x137) return 'k';
  if (cp >= 0x13A && cp <= 0x142) return 'l';
  if (cp >= 0x144 && cp <= 0x14B) return 'n';
  if (cp >= 0x14D && cp <= 0x151) return 'o';
  if (cp >= 0x155 && cp <= 0x159) return 'r';
  if (cp >= 0x15B && cp <= 0x161) return 's';
  if (cp >= 0x163 && cp <= 0x167) return 't';
  if (cp >= 0x169 && cp <= 0x173) return 'u';
  if (cp == 0x175) return 'w';
  if (cp == 0x177) return 'y';
  if (cp >= 0x17A && cp <= 0x17E) return 'z';
  return cp;
}

struct Vocab {
  std::unordered_map<std::string, int32_t> word2id;
  int32_t unk = 1;
  int32_t pad = 0;
  int32_t cls = 4;
  int32_t sep = -1;
  bool double_sep = false;
  // WordPiece mode (BertTokenizer semantics): BasicTokenizer clean /
  // lowercase+strip-accents / punctuation-split per whitespace word,
  // then greedy longest-match subword lookup with "##" continuations
  // (ref `utils/bert_xlnet_inputs.py:46-53` — the reference pays this
  // tokenize path per batch; here it is native and offline/in-memory).
  bool wordpiece = false;
  bool lowercase = true;

  int32_t lookup(const std::string& w) const {
    auto it = word2id.find(w);
    if (it != word2id.end()) return it->second;
    std::string lower(w);
    std::transform(lower.begin(), lower.end(), lower.begin(),
                   [](unsigned char c) { return std::tolower(c); });
    it = word2id.find(lower);
    if (it != word2id.end()) return it->second;
    return unk;
  }

  // Greedy longest-match over one punctuation-free chunk (codepoint
  // boundaries respected).  Mirrors transformers WordpieceTokenizer.
  void wordpiece_chunk(const std::string& chunk,
                       std::vector<int32_t>* out) const {
    // codepoint start offsets (+ end sentinel)
    std::vector<size_t> starts;
    size_t i = 0;
    while (i < chunk.size()) {
      starts.push_back(i);
      utf8_next(chunk, &i);
    }
    starts.push_back(chunk.size());
    const size_t n_cp = starts.size() - 1;
    if (n_cp == 0) return;
    if (n_cp > 100) {  // max_input_chars_per_word
      out->push_back(unk);
      return;
    }
    std::vector<int32_t> pieces;
    size_t start = 0;
    while (start < n_cp) {
      int32_t cur = -1;
      size_t best_end = start;
      for (size_t end = n_cp; end > start; --end) {
        std::string sub = chunk.substr(starts[start],
                                       starts[end] - starts[start]);
        if (start > 0) sub = "##" + sub;
        auto it = word2id.find(sub);
        if (it != word2id.end()) {
          cur = it->second;
          best_end = end;
          break;
        }
      }
      if (cur < 0) {  // is_bad: the WHOLE word becomes one [UNK]
        out->push_back(unk);
        return;
      }
      pieces.push_back(cur);
      start = best_end;
    }
    out->insert(out->end(), pieces.begin(), pieces.end());
  }

  // Tokenize one whitespace word into one or more ids.
  void tokenize(const std::string& w, std::vector<int32_t>* out) const {
    if (!wordpiece) {
      out->push_back(lookup(w));
      return;
    }
    // never-split specials: bracketed tokens present in the vocab
    // ([SYS]/[USR]/[MASK]-style; transformers protects registered
    // special tokens from the BasicTokenizer the same way)
    if (w.size() >= 2 && w.front() == '[' && w.back() == ']') {
      auto it = word2id.find(w);
      if (it != word2id.end()) {
        out->push_back(it->second);
        return;
      }
    }
    // BasicTokenizer: clean + lowercase + strip accents + punct split
    std::vector<std::string> chunks(1);
    size_t i = 0;
    while (i < w.size()) {
      uint32_t cp = utf8_next(w, &i);
      if (cp == 0 || is_control(cp)) continue;
      if (is_punct(cp)) {  // punctuation is its own chunk
        if (!chunks.back().empty()) chunks.emplace_back();
        utf8_append(cp, &chunks.back());
        chunks.emplace_back();
        continue;
      }
      if (lowercase) cp = strip_accent(to_lower(cp));
      utf8_append(cp, &chunks.back());
    }
    for (const auto& c : chunks)
      if (!c.empty()) wordpiece_chunk(c, out);
  }
};

struct Row {
  std::vector<int32_t> ids;
  std::vector<int32_t> segs;
  std::vector<int32_t> trans_ids;
  std::vector<int32_t> trans_segs;
  std::vector<std::string> labels;
};

struct Loader {
  Vocab vocab;
  std::unordered_map<std::string, int32_t> label2id;
  std::vector<Row> rows;
  std::string error;
};

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  std::istringstream is(s);
  std::string tok;
  while (is >> tok) out.push_back(tok);
  return out;
}

// Build one stream's token ids per the selected layout.  `words` is the
// raw serialized sequence: "[CLS] [SYS] <sys...> [USR] <user...>".
bool build_stream(const Vocab& v, const std::vector<std::string>& words,
                  int layout, std::vector<int32_t>* ids,
                  std::vector<int32_t>* segs) {
  auto usr = std::find(words.begin(), words.end(), "[USR]");
  if (usr == words.end() || words.size() < 2) return false;
  // seq_a skips the literal [CLS] [SYS] markers (ref :26)
  std::vector<std::string> seq_a(words.begin() + 2, usr);
  std::vector<std::string> seq_b(usr + 1, words.end());

  ids->clear();
  segs->clear();
  auto push = [&](int32_t id, int32_t seg) {
    ids->push_back(id);
    segs->push_back(seg);
  };
  // tokenize one word (1..k subword ids in WordPiece mode) at one seg
  auto push_word = [&](const std::string& w, int32_t seg) {
    size_t before = ids->size();
    v.tokenize(w, ids);
    segs->insert(segs->end(), ids->size() - before, seg);
  };

  if (layout == 2) {  // tod
    push(v.cls, 0);
    push_word("[SYS]", 0);
    for (auto& w : seq_a) push_word(w, 0);
    push_word("[USR]", 1);
    for (auto& w : seq_b) {
      if (w == "[SEP]") {
        push(v.sep, 1);
        if (v.double_sep) push(v.sep, 1);
      } else {
        push_word(w, 1);
      }
    }
    push(v.sep, 1);
  } else if (layout == 1) {  // no_system_act
    push(v.cls, 0);
    for (auto& w : seq_b) {
      if (w == "[SEP]") {
        push(v.sep, 0);
        if (v.double_sep) push(v.sep, 0);
      } else {
        push_word(w, 0);
      }
    }
    push(v.sep, 0);
  } else {  // default
    push(v.cls, 0);
    for (auto& w : seq_a) push_word(w, 0);
    push(v.sep, 1);
    if (v.double_sep) push(v.sep, 1);
    for (auto& w : seq_b) {
      if (w == "[SEP]") {
        push(v.sep, 1);
        if (v.double_sep) push(v.sep, 1);
      } else {
        push_word(w, 1);
      }
    }
    push(v.sep, 1);
  }
  return true;
}

const char kFieldSep[] = "\t<=>\t";

}  // namespace

extern "C" {

// vocab file: one "word\tid" per line; label file: same for labels.
void* nbl_create(const char* vocab_path, const char* label_path,
                 int32_t pad_id, int32_t unk_id, int32_t cls_id,
                 int32_t sep_id, int32_t double_sep) {
  auto* L = new Loader();
  L->vocab.pad = pad_id;
  L->vocab.unk = unk_id;
  L->vocab.cls = cls_id;
  L->vocab.sep = sep_id;
  L->vocab.double_sep = double_sep != 0;

  std::ifstream vf(vocab_path);
  if (!vf) {
    L->error = "cannot open vocab file";
    return L;
  }
  std::string line;
  while (std::getline(vf, line)) {
    auto tab = line.find('\t');
    if (tab == std::string::npos) continue;
    L->vocab.word2id[line.substr(0, tab)] =
        std::stoi(line.substr(tab + 1));
  }
  std::ifstream lf(label_path);
  if (!lf) {
    L->error = "cannot open label file";
    return L;
  }
  while (std::getline(lf, line)) {
    auto tab = line.find('\t');
    if (tab == std::string::npos) continue;
    L->label2id[line.substr(0, tab)] = std::stoi(line.substr(tab + 1));
  }
  return L;
}

// WordPiece (BertTokenizer) variant: the vocab file is a HuggingFace
// vocab.txt — one token per line, id = line index ("##" continuations
// included).  This is the native tokenize path for every pretrained
// BERT-family checkpoint (the reference's primary path,
// `utils/bert_xlnet_inputs.py:46-53`); word-vocab mode (nbl_create)
// remains for from-scratch runs.
void* nbl_create_wordpiece(const char* vocab_txt_path,
                           const char* label_path, int32_t pad_id,
                           int32_t unk_id, int32_t cls_id, int32_t sep_id,
                           int32_t lowercase, int32_t double_sep) {
  auto* L = new Loader();
  L->vocab.pad = pad_id;
  L->vocab.unk = unk_id;
  L->vocab.cls = cls_id;
  L->vocab.sep = sep_id;
  L->vocab.double_sep = double_sep != 0;
  L->vocab.wordpiece = true;
  L->vocab.lowercase = lowercase != 0;

  std::ifstream vf(vocab_txt_path);
  if (!vf) {
    L->error = "cannot open vocab.txt";
    return L;
  }
  std::string line;
  int32_t id = 0;
  while (std::getline(vf, line)) {
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    L->vocab.word2id.emplace(line, id++);
  }
  std::ifstream lf(label_path);
  if (!lf) {
    L->error = "cannot open label file";
    return L;
  }
  while (std::getline(lf, line)) {
    auto tab = line.find('\t');
    if (tab == std::string::npos) continue;
    L->label2id[line.substr(0, tab)] = std::stoi(line.substr(tab + 1));
  }
  return L;
}

const char* nbl_error(void* handle) {
  return static_cast<Loader*>(handle)->error.c_str();
}

}  // extern "C"

namespace {

// Shared parse loop over an input stream (file or in-memory buffer).
int32_t parse_stream(Loader* L, std::istream& f, int32_t layout) {
  L->rows.clear();
  std::string line;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    // split on "\t<=>\t"
    std::vector<std::string> fields;
    size_t pos = 0;
    while (true) {
      size_t next = line.find(kFieldSep, pos);
      if (next == std::string::npos) {
        fields.push_back(line.substr(pos));
        break;
      }
      fields.push_back(line.substr(pos, next - pos));
      pos = next + sizeof(kFieldSep) - 1;
    }
    if (fields.size() != 3) continue;

    Row row;
    if (!build_stream(L->vocab, split_ws(fields[0]), layout, &row.ids,
                      &row.segs))
      continue;
    if (!build_stream(L->vocab, split_ws(fields[1]), layout,
                      &row.trans_ids, &row.trans_segs))
      continue;
    std::istringstream ls(fields[2]);
    std::string lbl;
    while (std::getline(ls, lbl, ';'))
      if (!lbl.empty()) row.labels.push_back(lbl);
    L->rows.push_back(std::move(row));
  }
  return static_cast<int32_t>(L->rows.size());
}

}  // namespace

extern "C" {

// Parse + tokenize a shard file.  Returns n_rows, or -1 on error.
int32_t nbl_load(void* handle, const char* shard_path, int32_t layout) {
  auto* L = static_cast<Loader*>(handle);
  std::ifstream f(shard_path);
  if (!f) {
    L->error = "cannot open shard";
    return -1;
  }
  return parse_stream(L, f, layout);
}

// Parse + tokenize newline-separated records from an in-memory buffer —
// the zero-file serving path (Predictor feeds utterances directly).
int32_t nbl_load_buffer(void* handle, const char* text, int32_t layout) {
  auto* L = static_cast<Loader*>(handle);
  std::istringstream f(text);
  return parse_stream(L, f, layout);
}

// Longest sequence over both streams (for max_len sizing).
int32_t nbl_max_len(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  size_t m = 1;
  for (auto& r : L->rows)
    m = std::max({m, r.ids.size(), r.trans_ids.size()});
  return static_cast<int32_t>(m);
}

// Pack into caller buffers: ids/segs (n, max_len) int32, mask (n, max_len)
// float32, labels multi-hot (n, n_labels) float32.  Truncates to max_len.
int32_t nbl_pack(void* handle, int32_t max_len, int32_t n_labels,
                 int32_t with_segments, int32_t* ids, int32_t* segs,
                 float* mask, int32_t* trans_ids, int32_t* trans_segs,
                 float* trans_mask, float* labels) {
  auto* L = static_cast<Loader*>(handle);
  const int32_t n = static_cast<int32_t>(L->rows.size());
  const int32_t pad = L->vocab.pad;
  const int32_t unk_label = 1;  // Constants.UNK

  auto pack_stream = [&](const std::vector<int32_t>& src_ids,
                         const std::vector<int32_t>& src_segs,
                         int32_t* out_ids, int32_t* out_segs,
                         float* out_mask) {
    const int32_t len =
        std::min<int32_t>(static_cast<int32_t>(src_ids.size()), max_len);
    for (int32_t j = 0; j < len; ++j) {
      out_ids[j] = src_ids[j];
      out_segs[j] = with_segments ? src_segs[j] : 0;
      out_mask[j] = 1.0f;
    }
    for (int32_t j = len; j < max_len; ++j) {
      out_ids[j] = pad;
      out_segs[j] = 0;
      out_mask[j] = 0.0f;
    }
  };

  for (int32_t i = 0; i < n; ++i) {
    const Row& r = L->rows[i];
    pack_stream(r.ids, r.segs, ids + i * max_len, segs + i * max_len,
                mask + i * max_len);
    pack_stream(r.trans_ids, r.trans_segs, trans_ids + i * max_len,
                trans_segs + i * max_len, trans_mask + i * max_len);
    float* lrow = labels + i * n_labels;
    std::memset(lrow, 0, sizeof(float) * n_labels);
    for (auto& lbl : r.labels) {
      auto it = L->label2id.find(lbl);
      int32_t id = (it == L->label2id.end()) ? unk_label : it->second;
      if (id >= 0 && id < n_labels) lrow[id] = 1.0f;
    }
  }
  return n;
}

// Raw label strings for row i, ';'-joined (for host-side exact metrics).
const char* nbl_labels(void* handle, int32_t i) {
  auto* L = static_cast<Loader*>(handle);
  static thread_local std::string buf;
  buf.clear();
  if (i < 0 || i >= static_cast<int32_t>(L->rows.size())) return buf.c_str();
  for (size_t j = 0; j < L->rows[i].labels.size(); ++j) {
    if (j) buf += ';';
    buf += L->rows[i].labels[j];
  }
  return buf.c_str();
}

void nbl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
