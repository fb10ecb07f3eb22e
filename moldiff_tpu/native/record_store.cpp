// Packed-record store: the framework's native replacement for LMDB
// (the reference reads pickled molecules from a 10GB-mapped LMDB,
// /root/reference/utils/dataset.py:58-134).
//
// Format (little-endian):
//   data file:  [MAGIC u64][record bytes ...]
//   index file: [MAGIC u64][n u64][(offset u64, length u64) * n]
//
// The reader mmaps the data file once and serves zero-copy pointers; the
// writer is append-only. Exposed through a C ABI consumed via ctypes
// (python wrapper: moldiff_tpu/data/record_store.py). Thread-safe for
// concurrent reads (no mutable state after open).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <string>
#include <vector>

static const uint64_t MAGIC = 0x4d4f4c4452454331ULL;  // "MOLDREC1"

struct Reader {
    int fd = -1;
    const uint8_t* base = nullptr;
    size_t map_len = 0;
    std::vector<std::pair<uint64_t, uint64_t>> index;  // offset, length
};

struct Writer {
    FILE* data = nullptr;
    std::string index_path;
    std::vector<std::pair<uint64_t, uint64_t>> index;
    uint64_t offset = 8;  // after magic
};

extern "C" {

// ---------------- reader ----------------

void* rs_open(const char* data_path, const char* index_path) {
    Reader* r = new Reader();
    r->fd = open(data_path, O_RDONLY);
    if (r->fd < 0) { delete r; return nullptr; }
    struct stat st;
    if (fstat(r->fd, &st) != 0 || st.st_size < 8) { close(r->fd); delete r; return nullptr; }
    r->map_len = (size_t)st.st_size;
    void* m = mmap(nullptr, r->map_len, PROT_READ, MAP_SHARED, r->fd, 0);
    if (m == MAP_FAILED) { close(r->fd); delete r; return nullptr; }
    r->base = (const uint8_t*)m;
    uint64_t magic;
    memcpy(&magic, r->base, 8);
    if (magic != MAGIC) { munmap(m, r->map_len); close(r->fd); delete r; return nullptr; }

    FILE* idx = fopen(index_path, "rb");
    if (!idx) { munmap(m, r->map_len); close(r->fd); delete r; return nullptr; }
    uint64_t imagic = 0, n = 0;
    if (fread(&imagic, 8, 1, idx) != 1 || imagic != MAGIC ||
        fread(&n, 8, 1, idx) != 1) {
        fclose(idx); munmap(m, r->map_len); close(r->fd); delete r; return nullptr;
    }
    r->index.resize(n);
    if (n && fread(r->index.data(), 16, n, idx) != n) {
        fclose(idx); munmap(m, r->map_len); close(r->fd); delete r; return nullptr;
    }
    fclose(idx);
    return r;
}

int64_t rs_count(void* handle) {
    return handle ? (int64_t)((Reader*)handle)->index.size() : -1;
}

// Returns pointer to record i's bytes (valid until rs_close) or nullptr.
const uint8_t* rs_get(void* handle, int64_t i, uint64_t* length_out) {
    Reader* r = (Reader*)handle;
    if (!r || i < 0 || (size_t)i >= r->index.size()) return nullptr;
    auto [off, len] = r->index[(size_t)i];
    if (off + len > r->map_len) return nullptr;
    *length_out = len;
    return r->base + off;
}

// Prefault pages for records [lo, hi) (sequential-scan hint).
void rs_prefetch(void* handle, int64_t lo, int64_t hi) {
    Reader* r = (Reader*)handle;
    if (!r || lo < 0 || (size_t)hi > r->index.size() || lo >= hi) return;
    uint64_t start = r->index[(size_t)lo].first;
    auto [off, len] = r->index[(size_t)(hi - 1)];
    uint64_t end = off + len;
    long page = sysconf(_SC_PAGESIZE);
    uint64_t astart = (start / page) * page;
    madvise((void*)(r->base + astart), end - astart, MADV_WILLNEED);
}

void rs_close(void* handle) {
    Reader* r = (Reader*)handle;
    if (!r) return;
    if (r->base) munmap((void*)r->base, r->map_len);
    if (r->fd >= 0) close(r->fd);
    delete r;
}

// ---------------- writer ----------------

void* rs_writer_open(const char* data_path, const char* index_path) {
    Writer* w = new Writer();
    w->data = fopen(data_path, "wb");
    if (!w->data) { delete w; return nullptr; }
    w->index_path = index_path;
    if (fwrite(&MAGIC, 8, 1, w->data) != 1) { fclose(w->data); delete w; return nullptr; }
    return w;
}

int64_t rs_writer_append(void* handle, const uint8_t* bytes, uint64_t length) {
    Writer* w = (Writer*)handle;
    if (!w) return -1;
    if (length && fwrite(bytes, 1, length, w->data) != length) return -1;
    w->index.emplace_back(w->offset, length);
    w->offset += length;
    return (int64_t)w->index.size() - 1;
}

int rs_writer_close(void* handle) {
    Writer* w = (Writer*)handle;
    if (!w) return -1;
    int rc = 0;
    if (fclose(w->data) != 0) rc = -1;
    FILE* idx = fopen(w->index_path.c_str(), "wb");
    if (!idx) { delete w; return -1; }
    uint64_t n = w->index.size();
    if (fwrite(&MAGIC, 8, 1, idx) != 1 || fwrite(&n, 8, 1, idx) != 1 ||
        (n && fwrite(w->index.data(), 16, n, idx) != n)) rc = -1;
    if (fclose(idx) != 0) rc = -1;
    delete w;
    return rc;
}

}  // extern "C"
