// tario: mmap'd indexed tar shard reader.
//
// Native replacement for the reference's vendored wids MMIndexedTar
// (vila/wids/wids_mmtar.py) — the data-loader hot path that feeds
// webdataset-style tar shards. The whole shard is mapped read-only once;
// indexing walks the 512-byte headers (ustar + GNU longname/longlink)
// and records (name, offset, size); member reads are zero-copy pointers
// into the mapping, so the Python side never copies until it decodes.
//
// C ABI for ctypes. Thread-safe for concurrent reads after open().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  std::string name;
  uint64_t offset;  // offset of file data within the shard
  uint64_t size;
};

struct Shard {
  int fd = -1;
  const uint8_t* data = nullptr;
  uint64_t length = 0;
  std::vector<Entry> entries;
  std::unordered_map<std::string, int64_t> by_name;
  std::string error;
};

uint64_t parse_octal(const char* p, size_t n) {
  // GNU base-256 extension: high bit of first byte set
  if (n > 0 && (static_cast<unsigned char>(p[0]) & 0x80)) {
    uint64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (size_t i = 1; i < n; i++) {
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    }
    return v;
  }
  uint64_t v = 0;
  for (size_t i = 0; i < n; i++) {
    char c = p[i];
    if (c == ' ' || c == '\0') continue;
    if (c < '0' || c > '7') break;
    v = v * 8 + static_cast<uint64_t>(c - '0');
  }
  return v;
}

bool is_zero_block(const uint8_t* p) {
  for (int i = 0; i < 512; i++) {
    if (p[i] != 0) return false;
  }
  return true;
}

bool build_index(Shard* s) {
  uint64_t off = 0;
  std::string pending_longname;
  while (off + 512 <= s->length) {
    const uint8_t* hdr = s->data + off;
    if (is_zero_block(hdr)) break;  // end-of-archive marker

    const char* h = reinterpret_cast<const char*>(hdr);
    uint64_t size = parse_octal(h + 124, 12);
    char typeflag = h[156];
    uint64_t data_off = off + 512;
    uint64_t padded = (size + 511) & ~uint64_t(511);

    if (typeflag == 'L') {  // GNU long name: data holds the real name
      if (data_off + size > s->length) {
        s->error = "truncated longname";
        return false;
      }
      pending_longname.assign(h + 512, h + 512 + size);
      while (!pending_longname.empty() &&
             pending_longname.back() == '\0') {
        pending_longname.pop_back();
      }
    } else if (typeflag == 'x') {  // PAX extended header: "len key=val\n"
      if (data_off + size > s->length) {
        s->error = "truncated pax header";
        return false;
      }
      std::string pax(h + 512, h + 512 + size);
      size_t p = 0;
      while (p < pax.size()) {
        size_t sp = pax.find(' ', p);
        if (sp == std::string::npos) break;
        unsigned long reclen = strtoul(pax.c_str() + p, nullptr, 10);
        if (reclen == 0 || p + reclen > pax.size() + 1) break;
        std::string rec = pax.substr(sp + 1, reclen - (sp - p) - 2);
        if (rec.rfind("path=", 0) == 0) {
          pending_longname = rec.substr(5);
        }
        p += reclen;
      }
    } else if (typeflag == '0' || typeflag == '\0') {  // regular file
      std::string name;
      if (!pending_longname.empty()) {
        name.swap(pending_longname);
      } else {
        // ustar: prefix (345, 155 bytes) + '/' + name (0, 100 bytes)
        char namebuf[101] = {0};
        char prefixbuf[156] = {0};
        memcpy(namebuf, h, 100);
        memcpy(prefixbuf, h + 345, 155);
        if (prefixbuf[0] != '\0' &&
            memcmp(h + 257, "ustar", 5) == 0) {
          name = std::string(prefixbuf) + "/" + std::string(namebuf);
        } else {
          name = std::string(namebuf);
        }
      }
      if (data_off + size > s->length) {
        s->error = "truncated member: " + name;
        return false;
      }
      int64_t idx = static_cast<int64_t>(s->entries.size());
      s->entries.push_back(Entry{name, data_off, size});
      s->by_name.emplace(std::move(name), idx);
    } else {
      pending_longname.clear();  // dirs, links etc: skip data
    }
    off = data_off + padded;
  }
  return true;
}

}  // namespace

extern "C" {

void* tario_open(const char* path) {
  Shard* s = new Shard();
  s->fd = open(path, O_RDONLY);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  struct stat st;
  if (fstat(s->fd, &st) != 0 || st.st_size == 0) {
    close(s->fd);
    delete s;
    return nullptr;
  }
  s->length = static_cast<uint64_t>(st.st_size);
  void* m = mmap(nullptr, s->length, PROT_READ, MAP_SHARED, s->fd, 0);
  if (m == MAP_FAILED) {
    close(s->fd);
    delete s;
    return nullptr;
  }
  madvise(m, s->length, MADV_RANDOM);
  s->data = static_cast<const uint8_t*>(m);
  if (!build_index(s)) {
    munmap(const_cast<uint8_t*>(s->data), s->length);
    close(s->fd);
    delete s;
    return nullptr;
  }
  return s;
}

int64_t tario_count(void* handle) {
  return static_cast<Shard*>(handle)->entries.size();
}

const char* tario_name(void* handle, int64_t i) {
  Shard* s = static_cast<Shard*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(s->entries.size())) return nullptr;
  return s->entries[i].name.c_str();
}

uint64_t tario_size(void* handle, int64_t i) {
  Shard* s = static_cast<Shard*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(s->entries.size())) return 0;
  return s->entries[i].size;
}

const uint8_t* tario_data(void* handle, int64_t i) {
  Shard* s = static_cast<Shard*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(s->entries.size())) return nullptr;
  return s->data + s->entries[i].offset;
}

int64_t tario_find(void* handle, const char* name) {
  Shard* s = static_cast<Shard*>(handle);
  auto it = s->by_name.find(name);
  return it == s->by_name.end() ? -1 : it->second;
}

void tario_close(void* handle) {
  Shard* s = static_cast<Shard*>(handle);
  if (s->data) munmap(const_cast<uint8_t*>(s->data), s->length);
  if (s->fd >= 0) close(s->fd);
  delete s;
}

}  // extern "C"
