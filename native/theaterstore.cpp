// theaterstore: append-only keyed float-record store for the character
// database's identity embeddings (and any other per-id vectors).
//
// The reference persists one PNG per character id and re-encodes it with
// CLIP on every DB hit (models/pipelines.py:183-213).  The TPU framework
// caches the CLIP embedding next to the image; this native store keeps all
// embeddings of a run in ONE file with O(1) lookup, so benchmark resumes
// touch a single mmap instead of thousands of small .npy files.
//
// Format: 16-byte header {magic "TSTR", u32 dim, u64 count}, then records
// of {i64 key, f32 value[dim]}.  Appends are atomic per record (write +
// flush); duplicate keys resolve to the last write.  The in-memory index is
// rebuilt on open by scanning the record table (cheap: sequential read).
//
// C ABI for ctypes; no exceptions cross the boundary.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr char kMagic[4] = {'T', 'S', 'T', 'R'};
// on-disk tombstone for deleted records (deletes must survive reopen —
// the character DB's delete-before-retry contract, theatergen.py:158-159)
constexpr int64_t kTombstone = INT64_MIN;

struct Store {
  std::FILE* f = nullptr;
  uint32_t dim = 0;
  std::unordered_map<int64_t, uint64_t> index;  // key -> record ordinal
  uint64_t count = 0;

  uint64_t record_size() const { return 8 + 4ull * dim; }
  uint64_t record_offset(uint64_t ordinal) const {
    return 16 + ordinal * record_size();
  }
};

bool write_header(Store* s) {
  if (std::fseek(s->f, 0, SEEK_SET) != 0) return false;
  if (std::fwrite(kMagic, 1, 4, s->f) != 4) return false;
  if (std::fwrite(&s->dim, 4, 1, s->f) != 1) return false;
  if (std::fwrite(&s->count, 8, 1, s->f) != 1) return false;
  return std::fflush(s->f) == 0;
}

}  // namespace

extern "C" {

// Opens (creating if needed) a store of dimension `dim`. Returns nullptr on
// error or dimension mismatch with an existing file.
void* ts_open(const char* path, uint32_t dim) {
  auto* s = new Store();
  s->f = std::fopen(path, "r+b");
  if (s->f == nullptr) {
    s->f = std::fopen(path, "w+b");
    if (s->f == nullptr) { delete s; return nullptr; }
    s->dim = dim;
    s->count = 0;
    if (!write_header(s)) { std::fclose(s->f); delete s; return nullptr; }
    return s;
  }
  char magic[4];
  uint32_t file_dim = 0;
  uint64_t count = 0;
  if (std::fread(magic, 1, 4, s->f) != 4 ||
      std::memcmp(magic, kMagic, 4) != 0 ||
      std::fread(&file_dim, 4, 1, s->f) != 1 ||
      std::fread(&count, 8, 1, s->f) != 1 ||
      (dim != 0 && file_dim != dim)) {
    std::fclose(s->f);
    delete s;
    return nullptr;
  }
  s->dim = file_dim;
  s->count = count;
  // rebuild index, skipping tombstoned records
  for (uint64_t i = 0; i < count; ++i) {
    int64_t key;
    if (std::fseek(s->f, (long)s->record_offset(i), SEEK_SET) != 0 ||
        std::fread(&key, 8, 1, s->f) != 1) {
      std::fclose(s->f);
      delete s;
      return nullptr;
    }
    if (key != kTombstone) s->index[key] = i;
  }
  return s;
}

uint32_t ts_dim(void* handle) { return static_cast<Store*>(handle)->dim; }
uint64_t ts_count(void* handle) {
  return static_cast<Store*>(handle)->index.size();
}

// Returns 1 on success.
int ts_put(void* handle, int64_t key, const float* values) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  uint64_t ordinal = (it != s->index.end()) ? it->second : s->count;
  if (std::fseek(s->f, (long)s->record_offset(ordinal), SEEK_SET) != 0)
    return 0;
  if (std::fwrite(&key, 8, 1, s->f) != 1) return 0;
  if (std::fwrite(values, 4, s->dim, s->f) != s->dim) return 0;
  if (it == s->index.end()) {
    s->index[key] = ordinal;
    s->count += 1;
    if (!write_header(s)) return 0;
  }
  return std::fflush(s->f) == 0 ? 1 : 0;
}

// Returns 1 if found (values filled), 0 otherwise.
int ts_get(void* handle, int64_t key, float* out) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  if (it == s->index.end()) return 0;
  if (std::fseek(s->f, (long)(s->record_offset(it->second) + 8), SEEK_SET)
      != 0)
    return 0;
  return std::fread(out, 4, s->dim, s->f) == s->dim ? 1 : 0;
}

int ts_has(void* handle, int64_t key) {
  auto* s = static_cast<Store*>(handle);
  return s->index.count(key) ? 1 : 0;
}

// Removes a key: tombstones the on-disk record (persists across reopen)
// and drops it from the index. Record space is not reclaimed.
int ts_delete(void* handle, int64_t key) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  if (it == s->index.end()) return 0;
  if (std::fseek(s->f, (long)s->record_offset(it->second), SEEK_SET) == 0) {
    std::fwrite(&kTombstone, 8, 1, s->f);
    std::fflush(s->f);
  }
  s->index.erase(it);
  return 1;
}

// Fills `keys_out` (size ts_count) with all live keys; returns count.
uint64_t ts_keys(void* handle, int64_t* keys_out) {
  auto* s = static_cast<Store*>(handle);
  uint64_t i = 0;
  for (const auto& kv : s->index) keys_out[i++] = kv.first;
  return i;
}

void ts_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (s->f) std::fclose(s->f);
  delete s;
}

}  // extern "C"
