// fast_corpus: native parser for the embedding-corpus JSON schema
// ({"metadata": ..., "verses"/"vectors": [{"id": "...", "text": "...",
//   "embedding": [f, ...]}, ...]}) produced by the reference's data pipeline
// (scripts/export_complete_bible.py:73-128). The Python json module spends
// most of its time boxing floats; this scanner parses embeddings straight
// into a float32 buffer. Exposed through ctypes (hnsw_tpu/io/native.py)
// with a pure-Python fallback — schema deviations return an error and the
// caller falls back.
//
// Build: g++ -O3 -shared -fPIC -o libfastcorpus.so fast_corpus.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corpus {
  std::vector<float> embeddings;  // count * dim
  std::string ids;                // '\n'-joined
  std::string texts;              // '\n'-joined (escaped newlines stripped)
  long count = 0;
  long dim = 0;
  std::string error;
};

// find needle in [p, end); returns pointer after the match or nullptr
const char* find(const char* p, const char* end, const char* needle) {
  size_t n = strlen(needle);
  const char* last = end - n;
  for (; p <= last; ++p) {
    if (*p == needle[0] && memcmp(p, needle, n) == 0) return p + n;
  }
  return nullptr;
}

// like find but returns the match START (for bounding regions)
const char* find_start(const char* p, const char* end, const char* needle) {
  size_t n = strlen(needle);
  const char* last = end - n;
  for (; p <= last; ++p) {
    if (*p == needle[0] && memcmp(p, needle, n) == 0) return p;
  }
  return nullptr;
}

// parse a JSON string starting after the opening quote; appends the
// unescaped value (with '\n' -> ' ') to out, returns pointer after the
// closing quote or nullptr
const char* parse_string(const char* p, const char* end, std::string* out) {
  for (; p < end; ++p) {
    if (*p == '\\') {
      if (p + 1 >= end) return nullptr;
      char c = p[1];
      switch (c) {
        case 'n': case 'r': case 't': out->push_back(' '); break;
        case 'u':
          out->push_back('?');
          p += (p + 5 < end) ? 4 : 0;
          break;
        default: out->push_back(c);
      }
      ++p;
    } else if (*p == '"') {
      return p + 1;
    } else {
      out->push_back(*p);
    }
  }
  return nullptr;
}

// parse `"text": "..."` inside [lo, hi); appends to out, returns true if found
bool try_parse_text(const char* lo, const char* hi, std::string* out) {
  const char* t = find(lo, hi, "\"text\"");
  if (!t) return false;
  while (t < hi && *t != '"') ++t;
  if (t >= hi) return false;
  return parse_string(t + 1, hi, out) != nullptr;
}

}  // namespace

extern "C" {

void* fc_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(size);
  if (fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* c = new Corpus();
  const char* p = buf.data();
  const char* end = p + size;

  // restrict to the items array so metadata keys don't confuse the scanner
  const char* arr = find(p, end, "\"verses\"");
  if (!arr) arr = find(p, end, "\"vectors\"");
  if (arr) p = arr;

  while (true) {
    const char* idp = find(p, end, "\"id\"");
    if (!idp) break;
    // skip : and whitespace to the opening quote
    while (idp < end && *idp != '"') ++idp;
    if (idp >= end) { c->error = "bad id"; break; }
    std::string id;
    const char* after_id = parse_string(idp + 1, end, &id);
    if (!after_id) { c->error = "bad id string"; break; }

    // "text" may precede or follow "embedding" (the reference exporter
    // writes it before; other producers differ)
    const char* embp = find(after_id, end, "\"embedding\"");
    if (!embp) { c->error = "missing embedding"; break; }
    std::string text;
    bool have_text = try_parse_text(after_id, embp, &text);

    // parse the float array
    const char* q = embp;
    while (q < end && *q != '[') ++q;
    if (q >= end) { c->error = "missing ["; break; }
    ++q;
    long d = 0;
    while (q < end) {
      while (q < end && (*q == ' ' || *q == ',' || *q == '\n' || *q == '\r'))
        ++q;
      if (q < end && *q == ']') { ++q; break; }
      char* after = nullptr;
      float v = strtof(q, &after);
      if (after == q) { c->error = "bad float"; break; }
      c->embeddings.push_back(v);
      q = after;
      ++d;
    }
    if (!c->error.empty()) break;
    if (c->dim == 0) c->dim = d;
    if (d != c->dim) { c->error = "inconsistent dim"; break; }

    if (!have_text) {
      // look after the embedding, bounded by the next item's "id" key
      const char* next_id = find_start(q, end, "\"id\"");
      try_parse_text(q, next_id ? next_id : end, &text);
    }

    if (c->count) {
      c->ids.push_back('\n');
      c->texts.push_back('\n');
    }
    c->ids += id;
    c->texts += text;
    ++c->count;
    p = q;
  }

  if (!c->error.empty() || c->count == 0) {
    delete c;
    return nullptr;
  }
  return c;
}

long fc_count(void* h) { return static_cast<Corpus*>(h)->count; }
long fc_dim(void* h) { return static_cast<Corpus*>(h)->dim; }

void fc_fill(void* h, float* out) {
  auto* c = static_cast<Corpus*>(h);
  memcpy(out, c->embeddings.data(), c->embeddings.size() * sizeof(float));
}

long fc_id_bytes(void* h) { return (long)static_cast<Corpus*>(h)->ids.size(); }
void fc_ids(void* h, char* out) {
  auto* c = static_cast<Corpus*>(h);
  memcpy(out, c->ids.data(), c->ids.size());
}

long fc_text_bytes(void* h) {
  return (long)static_cast<Corpus*>(h)->texts.size();
}
void fc_texts(void* h, char* out) {
  auto* c = static_cast<Corpus*>(h);
  memcpy(out, c->texts.data(), c->texts.size());
}

void fc_free(void* h) { delete static_cast<Corpus*>(h); }

}  // extern "C"
