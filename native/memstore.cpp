// Host-side native buffer manager for polaroid-tpu.
//
// Capability analogue of the reference's native storage/memory layers
// (src/storage/cache.rs LRU CacheBackend; crates/polars-streaming-adaptive/
// src/memory_manager.rs sysinfo-driven MemoryManager; mmap readers in
// polars-utils/src/mmap.rs): a C++ library the Python engine drives via
// ctypes for the host paths that matter — byte-accounted LRU buffer
// caching (RAM tier of HybridStorage), anonymous/file mmap with madvise,
// and live memory-pressure probes that steer the adaptive streaming
// chunk size.
//
// Build: see native/Makefile (produces libptmemstore.so).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <list>
#include <mutex>
#include <string>
#include <unordered_map>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <sys/sysinfo.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// memory pressure probing (MemoryManager analogue)
// ---------------------------------------------------------------------------

// Returns available system memory in bytes (MemAvailable), or total/2 on
// failure.
int64_t pt_available_memory() {
  FILE* f = fopen("/proc/meminfo", "r");
  if (f) {
    char line[256];
    while (fgets(line, sizeof(line), f)) {
      long long kb;
      if (sscanf(line, "MemAvailable: %lld kB", &kb) == 1) {
        fclose(f);
        return (int64_t)kb * 1024;
      }
    }
    fclose(f);
  }
  struct sysinfo si;
  if (sysinfo(&si) == 0) {
    return (int64_t)si.freeram * si.mem_unit;
  }
  return 1LL << 30;
}

int64_t pt_total_memory() {
  struct sysinfo si;
  if (sysinfo(&si) == 0) {
    return (int64_t)si.totalram * si.mem_unit;
  }
  return 1LL << 33;
}

// Current process resident set size in bytes.
int64_t pt_process_rss() {
  FILE* f = fopen("/proc/self/statm", "r");
  if (!f) return -1;
  long long pages = 0, resident = 0;
  if (fscanf(f, "%lld %lld", &pages, &resident) != 2) {
    fclose(f);
    return -1;
  }
  fclose(f);
  return (int64_t)resident * sysconf(_SC_PAGESIZE);
}

// Adaptive chunk sizing (AdaptiveChunkStrategy analogue): given the
// current target rows and bytes/row, scale toward using `frac_pct`% of
// available memory, clamped to [min_rows, max_rows].
int64_t pt_adaptive_chunk_rows(int64_t current_rows, int64_t bytes_per_row,
                               int64_t min_rows, int64_t max_rows,
                               int32_t frac_pct) {
  if (bytes_per_row <= 0) bytes_per_row = 64;
  int64_t avail = pt_available_memory();
  int64_t budget = avail * frac_pct / 100;
  int64_t target = budget / bytes_per_row;
  // move halfway toward the target (damped, like the reference's resize)
  int64_t next = current_rows + (target - current_rows) / 2;
  if (next < min_rows) next = min_rows;
  if (next > max_rows) next = max_rows;
  return next;
}

// ---------------------------------------------------------------------------
// byte-accounted LRU buffer cache (CacheBackend analogue)
// ---------------------------------------------------------------------------

struct CacheEntry {
  std::string key;
  uint8_t* data;
  int64_t len;
  std::list<std::string>::iterator lru_it;
};

struct Cache {
  std::mutex mu;
  std::unordered_map<std::string, CacheEntry> map;
  std::list<std::string> lru;  // front = most recent
  int64_t capacity_bytes;
  int64_t used_bytes = 0;
  std::atomic<int64_t> hits{0}, misses{0}, evictions{0};
};

void* pt_cache_new(int64_t capacity_bytes) {
  Cache* c = new Cache();
  c->capacity_bytes = capacity_bytes;
  return c;
}

void pt_cache_free(void* h) {
  Cache* c = (Cache*)h;
  {
    std::lock_guard<std::mutex> g(c->mu);
    for (auto& kv : c->map) free(kv.second.data);
    c->map.clear();
    c->lru.clear();
  }
  delete c;
}

static void evict_until_fits(Cache* c, int64_t need) {
  while (c->used_bytes + need > c->capacity_bytes && !c->lru.empty()) {
    std::string victim = c->lru.back();
    c->lru.pop_back();
    auto it = c->map.find(victim);
    if (it != c->map.end()) {
      c->used_bytes -= it->second.len;
      free(it->second.data);
      c->map.erase(it);
      c->evictions++;
    }
  }
}

// Returns 0 on success, -1 if the value alone exceeds capacity.
int32_t pt_cache_put(void* h, const char* key, const uint8_t* data,
                     int64_t len) {
  Cache* c = (Cache*)h;
  std::lock_guard<std::mutex> g(c->mu);
  if (len > c->capacity_bytes) return -1;
  auto it = c->map.find(key);
  if (it != c->map.end()) {
    c->used_bytes -= it->second.len;
    free(it->second.data);
    c->lru.erase(it->second.lru_it);
    c->map.erase(it);
  }
  evict_until_fits(c, len);
  uint8_t* copy = (uint8_t*)malloc(len);
  if (!copy) return -1;
  memcpy(copy, data, len);
  c->lru.push_front(key);
  CacheEntry e{key, copy, len, c->lru.begin()};
  c->map.emplace(key, e);
  c->used_bytes += len;
  return 0;
}

// Returns length (>=0) if present and copies up to buf_len bytes into buf;
// -1 if absent. Call with buf=null to query the length first.
int64_t pt_cache_get(void* h, const char* key, uint8_t* buf,
                     int64_t buf_len) {
  Cache* c = (Cache*)h;
  std::lock_guard<std::mutex> g(c->mu);
  auto it = c->map.find(key);
  if (it == c->map.end()) {
    c->misses++;
    return -1;
  }
  c->hits++;
  // touch
  c->lru.erase(it->second.lru_it);
  c->lru.push_front(it->first);
  it->second.lru_it = c->lru.begin();
  if (buf != nullptr) {
    int64_t n = it->second.len < buf_len ? it->second.len : buf_len;
    memcpy(buf, it->second.data, n);
  }
  return it->second.len;
}

int32_t pt_cache_delete(void* h, const char* key) {
  Cache* c = (Cache*)h;
  std::lock_guard<std::mutex> g(c->mu);
  auto it = c->map.find(key);
  if (it == c->map.end()) return -1;
  c->used_bytes -= it->second.len;
  free(it->second.data);
  c->lru.erase(it->second.lru_it);
  c->map.erase(it);
  return 0;
}

// stats out: [hits, misses, evictions, used_bytes, capacity, entries]
void pt_cache_stats(void* h, int64_t* out6) {
  Cache* c = (Cache*)h;
  std::lock_guard<std::mutex> g(c->mu);
  out6[0] = c->hits.load();
  out6[1] = c->misses.load();
  out6[2] = c->evictions.load();
  out6[3] = c->used_bytes;
  out6[4] = c->capacity_bytes;
  out6[5] = (int64_t)c->map.size();
}

// ---------------------------------------------------------------------------
// mmap helpers (zero-copy file windows for the adaptive reader)
// ---------------------------------------------------------------------------

// Maps a file read-only; returns pointer or null. Length written to *len.
void* pt_mmap_file(const char* path, int64_t* len) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return nullptr;
  *len = st.st_size;
  madvise(p, st.st_size, MADV_SEQUENTIAL);
  return p;
}

void pt_munmap(void* p, int64_t len) { munmap(p, len); }

void pt_madvise_willneed(void* p, int64_t off, int64_t len) {
  madvise((uint8_t*)p + off, len, MADV_WILLNEED);
}

void pt_madvise_dontneed(void* p, int64_t off, int64_t len) {
  madvise((uint8_t*)p + off, len, MADV_DONTNEED);
}

}  // extern "C"
