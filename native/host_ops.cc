// Native host-side data pipeline for dismember-tpu.
//
// The reference's ingest/windowing runs on the JVM with thread pools
// (tdm/.../tree/TreeInit.scala, scalann utils/ThreadPool.scala); the TPU
// rebuild keeps the device compute in XLA and implements the volume-heavy
// host path natively: CSV parsing with dictionary encoding, and the
// time-sort + per-user distinct grouping that precedes windowing.  Exposed
// through a C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libdismember_host.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV ingest: rows "user,item,label,timestamp,category"; header rows (non-
// numeric first field) skipped; label/category dictionary-encoded in
// first-occurrence order (TreeInit.readFile parity).
// ---------------------------------------------------------------------------

struct CsvResult {
  int64_t n_rows;
  int64_t* users;
  int64_t* items;
  int64_t* timestamps;
  float* labels;
  int32_t* categories;
  char* category_names;  // '\n'-joined, first-occurrence order
  int64_t category_names_len;
};

static bool is_number(const char* s, size_t n) {
  if (n == 0) return false;
  size_t i = 0;
  if (s[0] == '-' || s[0] == '+') i = 1;
  bool any = false;
  for (; i < n; i++) {
    if (s[i] >= '0' && s[i] <= '9') {
      any = true;
    } else if (s[i] != '.' && s[i] != 'e' && s[i] != 'E' && s[i] != '-' &&
               s[i] != '+') {
      return false;
    }
  }
  return any;
}

CsvResult* dm_parse_csv(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  std::vector<int64_t> users, items, timestamps;
  std::vector<float> labels;
  std::vector<int32_t> cats;
  std::unordered_map<std::string, float> label_dict;
  std::unordered_map<std::string, int32_t> cat_dict;
  std::string cat_names;

  const char* p = buf.data();
  const char* end = p + size;
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    // split into 5 fields
    const char* fields[6];
    int nf = 0;
    fields[nf++] = p;
    for (const char* q = p; q < line_end && nf < 6; q++) {
      if (*q == ',') fields[nf++] = q + 1;
    }
    if (nf == 5) {
      const char* f0 = fields[0];
      size_t f0n = (fields[1] - 1) - f0;
      // trim leading whitespace of the first field
      while (f0n > 0 && (*f0 == ' ' || *f0 == '\t' || *f0 == '\r')) {
        f0++;
        f0n--;
      }
      if (is_number(f0, f0n)) {
        users.push_back(strtoll(f0, nullptr, 10));
        items.push_back(strtoll(fields[1], nullptr, 10));
        std::string lab(fields[2], (fields[3] - 1) - fields[2]);
        timestamps.push_back(strtoll(fields[3], nullptr, 10));
        size_t c_len = line_end - fields[4];
        while (c_len > 0 && (fields[4][c_len - 1] == '\r' ||
                             fields[4][c_len - 1] == ' '))
          c_len--;
        std::string cat(fields[4], c_len);

        auto lit = label_dict.find(lab);
        if (lit == label_dict.end()) {
          float code = static_cast<float>(label_dict.size());
          lit = label_dict.emplace(lab, code).first;
        }
        labels.push_back(lit->second);

        auto cit = cat_dict.find(cat);
        if (cit == cat_dict.end()) {
          int32_t code = static_cast<int32_t>(cat_dict.size());
          cit = cat_dict.emplace(cat, code).first;
          if (!cat_names.empty()) cat_names += '\n';
          cat_names += cat;
        }
        cats.push_back(cit->second);
      }
    }
    p = line_end + 1;
  }

  auto* res = new CsvResult();
  res->n_rows = static_cast<int64_t>(users.size());
  res->users = new int64_t[users.size()];
  res->items = new int64_t[items.size()];
  res->timestamps = new int64_t[timestamps.size()];
  res->labels = new float[labels.size()];
  res->categories = new int32_t[cats.size()];
  memcpy(res->users, users.data(), users.size() * sizeof(int64_t));
  memcpy(res->items, items.data(), items.size() * sizeof(int64_t));
  memcpy(res->timestamps, timestamps.data(), timestamps.size() * sizeof(int64_t));
  memcpy(res->labels, labels.data(), labels.size() * sizeof(float));
  memcpy(res->categories, cats.data(), cats.size() * sizeof(int32_t));
  res->category_names_len = static_cast<int64_t>(cat_names.size());
  res->category_names = new char[cat_names.size() + 1];
  memcpy(res->category_names, cat_names.data(), cat_names.size());
  res->category_names[cat_names.size()] = '\0';
  return res;
}

void dm_free_csv(CsvResult* res) {
  if (!res) return;
  delete[] res->users;
  delete[] res->items;
  delete[] res->timestamps;
  delete[] res->labels;
  delete[] res->categories;
  delete[] res->category_names;
  delete res;
}

// ---------------------------------------------------------------------------
// Per-user time-sorted distinct interactions (TreeInit.getUserInteracted
// parity: stable sort by timestamp, group by user, distinct keeping first
// occurrence).  Output: grouped CSR — unique users, offsets, item stream.
// ---------------------------------------------------------------------------

struct InteractionsResult {
  int64_t n_users;
  int64_t n_items_total;
  int64_t* unique_users;   // [n_users]
  int64_t* offsets;        // [n_users + 1]
  int64_t* items_concat;   // [n_items_total]
};

InteractionsResult* dm_user_interactions(const int64_t* users,
                                         const int64_t* items,
                                         const int64_t* timestamps,
                                         int64_t n) {
  // stable sort indices by timestamp, then stably by user
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return timestamps[a] < timestamps[b];
  });
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return users[a] < users[b];
  });

  auto* res = new InteractionsResult();
  std::vector<int64_t> uu, off, stream;
  off.push_back(0);
  int64_t i = 0;
  std::unordered_map<int64_t, bool> seen;
  while (i < n) {
    int64_t u = users[idx[i]];
    uu.push_back(u);
    seen.clear();
    while (i < n && users[idx[i]] == u) {
      int64_t it = items[idx[i]];
      if (seen.find(it) == seen.end()) {
        seen.emplace(it, true);
        stream.push_back(it);
      }
      i++;
    }
    off.push_back(static_cast<int64_t>(stream.size()));
  }
  res->n_users = static_cast<int64_t>(uu.size());
  res->n_items_total = static_cast<int64_t>(stream.size());
  res->unique_users = new int64_t[uu.size()];
  res->offsets = new int64_t[off.size()];
  res->items_concat = new int64_t[stream.size()];
  memcpy(res->unique_users, uu.data(), uu.size() * sizeof(int64_t));
  memcpy(res->offsets, off.data(), off.size() * sizeof(int64_t));
  memcpy(res->items_concat, stream.data(), stream.size() * sizeof(int64_t));
  return res;
}

void dm_free_interactions(InteractionsResult* res) {
  if (!res) return;
  delete[] res->unique_users;
  delete[] res->offsets;
  delete[] res->items_concat;
  delete res;
}

// ---------------------------------------------------------------------------
// KV record framing scan (DistTree.loadData parity): split a tree file into
// (offset, length) record spans in one pass so Python decodes protos without
// re-walking the byte stream.
// ---------------------------------------------------------------------------

int64_t dm_scan_kv_records(const uint8_t* data, int64_t size,
                           int64_t* offsets, int64_t* lengths,
                           int64_t cap) {
  int64_t pos = 0;
  int64_t count = 0;
  while (pos + 4 <= size && count < cap) {
    int32_t len = (data[pos] << 24) | (data[pos + 1] << 16) |
                  (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (len < 0 || pos + len > size) break;
    offsets[count] = pos;
    lengths[count] = len;
    pos += len;
    count++;
  }
  return count;
}

}  // extern "C"
