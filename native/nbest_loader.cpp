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

struct Vocab {
  std::unordered_map<std::string, int32_t> word2id;
  int32_t unk = 1;
  int32_t pad = 0;
  int32_t cls = 4;
  int32_t sep = -1;
  bool double_sep = false;

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

  if (layout == 2) {  // tod
    push(v.cls, 0);
    push(v.lookup("[SYS]"), 0);
    for (auto& w : seq_a) push(v.lookup(w), 0);
    push(v.lookup("[USR]"), 1);
    for (auto& w : seq_b) {
      if (w == "[SEP]") {
        push(v.sep, 1);
        if (v.double_sep) push(v.sep, 1);
      } else {
        push(v.lookup(w), 1);
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
        push(v.lookup(w), 0);
      }
    }
    push(v.sep, 0);
  } else {  // default
    push(v.cls, 0);
    for (auto& w : seq_a) push(v.lookup(w), 0);
    push(v.sep, 1);
    if (v.double_sep) push(v.sep, 1);
    for (auto& w : seq_b) {
      if (w == "[SEP]") {
        push(v.sep, 1);
        if (v.double_sep) push(v.sep, 1);
      } else {
        push(v.lookup(w), 1);
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
