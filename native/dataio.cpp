// Native data-loading core: zip reading, image decode, threaded prefetch.
//
// TPU-native counterpart of the reference's torch DataLoader worker
// processes (reference: train_parts/dataloaders.py:8-12 + torch workers)
// and the zip-backed ImageFolderDataset IO (reference:
// train_parts/datasets.py:159-248).  One shared library, C ABI, driven from
// Python via ctypes (data/native_loader.py):
//
//   * minimal ZIP central-directory parser (stored + deflate via zlib),
//   * PNG decode via libpng's simplified API, JPEG via libjpeg,
//   * an infinite windowed-shuffle sampler with round-robin host sharding
//     (same algorithm as the Python sampler / reference
//     torch_utils/misc.py:109-140),
//   * a worker pool decoding into a bounded ring of ready batches, so the
//     host input pipeline never stalls the TPU step loop.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links png/jpeg/z/pthread)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------- zip parse

struct ZipEntry {
  std::string name;
  uint64_t header_offset;     // local file header offset
  uint64_t comp_size;
  uint64_t uncomp_size;
  uint16_t method;            // 0 = stored, 8 = deflate
};

struct ZipFile {
  FILE* f = nullptr;
  std::vector<ZipEntry> entries;
  std::mutex io_mutex;

  ~ZipFile() {
    if (f) fclose(f);
  }
};

static bool read_at(FILE* f, uint64_t off, void* buf, size_t n) {
  if (fseeko(f, (off_t)off, SEEK_SET) != 0) return false;
  return fread(buf, 1, n, f) == n;
}

static uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
static uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint64_t rd64(const uint8_t* p) {
  uint64_t lo = rd32(p), hi = rd32(p + 4);
  return lo | (hi << 32);
}

// Parse central directory (with zip64 support).
static bool zip_open(ZipFile* z, const char* path, std::string* err) {
  z->f = fopen(path, "rb");
  if (!z->f) {
    *err = "cannot open file";
    return false;
  }
  fseeko(z->f, 0, SEEK_END);
  uint64_t fsize = (uint64_t)ftello(z->f);
  // Find EOCD: scan last 64KB + 22 for signature 0x06054b50.
  size_t scan = (size_t)std::min<uint64_t>(fsize, 65536 + 22);
  std::vector<uint8_t> tail(scan);
  if (!read_at(z->f, fsize - scan, tail.data(), scan)) {
    *err = "cannot read EOCD";
    return false;
  }
  int64_t eocd = -1;
  for (int64_t i = (int64_t)scan - 22; i >= 0; --i) {
    if (rd32(&tail[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) {
    *err = "EOCD not found (not a zip?)";
    return false;
  }
  uint64_t num_entries = rd16(&tail[eocd + 10]);
  uint64_t cd_size = rd32(&tail[eocd + 12]);
  uint64_t cd_offset = rd32(&tail[eocd + 16]);
  // zip64?
  if (num_entries == 0xFFFF || cd_offset == 0xFFFFFFFF ||
      cd_size == 0xFFFFFFFF) {
    // EOCD64 locator sits 20 bytes before EOCD.
    uint64_t loc_off = fsize - scan + eocd - 20;
    uint8_t loc[20];
    if (!read_at(z->f, loc_off, loc, 20) || rd32(loc) != 0x07064b50) {
      *err = "zip64 locator not found";
      return false;
    }
    uint64_t eocd64_off = rd64(&loc[8]);
    uint8_t e64[56];
    if (!read_at(z->f, eocd64_off, e64, 56) || rd32(e64) != 0x06064b50) {
      *err = "zip64 EOCD not found";
      return false;
    }
    num_entries = rd64(&e64[32]);
    cd_size = rd64(&e64[40]);
    cd_offset = rd64(&e64[48]);
  }
  std::vector<uint8_t> cd(cd_size);
  if (!read_at(z->f, cd_offset, cd.data(), cd_size)) {
    *err = "cannot read central directory";
    return false;
  }
  z->entries.reserve(num_entries);
  size_t p = 0;
  for (uint64_t i = 0; i < num_entries && p + 46 <= cd.size(); ++i) {
    if (rd32(&cd[p]) != 0x02014b50) break;
    ZipEntry e;
    e.method = rd16(&cd[p + 10]);
    e.comp_size = rd32(&cd[p + 20]);
    e.uncomp_size = rd32(&cd[p + 24]);
    uint16_t name_len = rd16(&cd[p + 28]);
    uint16_t extra_len = rd16(&cd[p + 30]);
    uint16_t comment_len = rd16(&cd[p + 32]);
    e.header_offset = rd32(&cd[p + 42]);
    e.name.assign((const char*)&cd[p + 46], name_len);
    // zip64 extra field.
    size_t xp = p + 46 + name_len;
    size_t xend = xp + extra_len;
    while (xp + 4 <= xend) {
      uint16_t tag = rd16(&cd[xp]);
      uint16_t sz = rd16(&cd[xp + 2]);
      if (tag == 0x0001) {
        size_t fp = xp + 4;
        if (e.uncomp_size == 0xFFFFFFFF) {
          e.uncomp_size = rd64(&cd[fp]);
          fp += 8;
        }
        if (e.comp_size == 0xFFFFFFFF) {
          e.comp_size = rd64(&cd[fp]);
          fp += 8;
        }
        if (e.header_offset == 0xFFFFFFFF) {
          e.header_offset = rd64(&cd[fp]);
        }
      }
      xp += 4 + sz;
    }
    p += 46 + name_len + extra_len + comment_len;
    z->entries.push_back(std::move(e));
  }
  return true;
}

// Read + decompress one entry (thread-safe via io_mutex for the file reads).
static bool zip_read_entry(ZipFile* z, const ZipEntry& e,
                           std::vector<uint8_t>* out, std::string* err) {
  std::vector<uint8_t> comp(e.comp_size);
  {
    std::lock_guard<std::mutex> lock(z->io_mutex);
    uint8_t lh[30];
    if (!read_at(z->f, e.header_offset, lh, 30) || rd32(lh) != 0x04034b50) {
      *err = "bad local header";
      return false;
    }
    uint16_t name_len = rd16(&lh[26]);
    uint16_t extra_len = rd16(&lh[28]);
    uint64_t data_off = e.header_offset + 30 + name_len + extra_len;
    if (!read_at(z->f, data_off, comp.data(), comp.size())) {
      *err = "cannot read entry data";
      return false;
    }
  }
  if (e.method == 0) {
    *out = std::move(comp);
    return true;
  }
  if (e.method == 8) {
    out->resize(e.uncomp_size);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) {
      *err = "inflateInit failed";
      return false;
    }
    zs.next_in = comp.data();
    zs.avail_in = (uInt)comp.size();
    zs.next_out = out->data();
    zs.avail_out = (uInt)out->size();
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END) {
      *err = "inflate failed";
      return false;
    }
    return true;
  }
  *err = "unsupported compression method";
  return false;
}

// -------------------------------------------------------------- image decode

static bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  std::transform(tail.begin(), tail.end(), tail.begin(), ::tolower);
  return tail == suf;
}

// Decode PNG to HWC uint8 with `channels` output channels (1 or 3).
static bool decode_png(const uint8_t* data, size_t size, int channels,
                       std::vector<uint8_t>* out, int* w, int* h,
                       std::string* err) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, size)) {
    *err = "png begin_read failed";
    return false;
  }
  image.format = (channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  *w = image.width;
  *h = image.height;
  out->resize((size_t)image.width * image.height * channels);
  if (!png_image_finish_read(&image, nullptr, out->data(), 0, nullptr)) {
    *err = "png finish_read failed";
    png_image_free(&image);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

static bool decode_jpeg(const uint8_t* data, size_t size, int channels,
                        std::vector<uint8_t>* out, int* w, int* h,
                        std::string* err) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    *err = "jpeg decode failed";
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (channels == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize((size_t)cinfo.output_width * cinfo.output_height * channels);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   (size_t)cinfo.output_scanline * cinfo.output_width * channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------------ sampler

// Infinite windowed-shuffle sampler (same semantics as the reference
// InfiniteSampler, torch_utils/misc.py:109-140).
struct InfiniteSampler {
  std::vector<int64_t> order;
  std::mt19937_64 rnd;
  int64_t idx = 0;
  int64_t window = 0;
  int shard = 0, num_shards = 1;
  bool shuffle = true;

  void init(int64_t n, int shard_, int num_shards_, uint64_t seed,
            bool shuffle_, double window_size = 0.5) {
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    shard = shard_;
    num_shards = num_shards_;
    shuffle = shuffle_;
    rnd.seed(seed);
    if (shuffle) {
      std::shuffle(order.begin(), order.end(), rnd);
      window = (int64_t)(n * window_size + 0.5);
    }
  }

  int64_t next() {
    for (;;) {
      int64_t i = idx % (int64_t)order.size();
      int64_t result = -1;
      if (idx % num_shards == shard) result = order[i];
      if (window >= 2) {
        int64_t j = (i - (int64_t)(rnd() % (uint64_t)window) +
                     (int64_t)order.size()) %
                    (int64_t)order.size();
        std::swap(order[i], order[j]);
      }
      ++idx;
      if (result >= 0) return result;
    }
  }

  // Fast-forward past the first `n` yields while advancing the reshuffle
  // RNG identically (exact-resume support; mirrors the Python sampler's
  // `start_item`).
  void skip(int64_t n) {
    for (int64_t k = 0; k < n; ++k) (void)next();
  }
};

// ------------------------------------------------------------------ pipeline

struct Batch {
  std::vector<uint8_t> images;   // [B, H, W, C]
  std::vector<int64_t> indices;  // [B]
};

}  // namespace

struct DataioHandle {
  ZipFile zip;
  std::vector<int> image_entries;  // indices into zip.entries
  int height = 0, width = 0, channels = 0;
  std::string last_error;

  // pipeline state
  int batch = 0;
  int prefetch = 2;
  std::atomic<bool> stop{false};
  InfiniteSampler sampler;
  std::mutex sampler_mutex;
  std::mutex q_mutex;
  std::condition_variable q_cv_push, q_cv_pop;
  std::deque<Batch> ready;
  std::vector<std::thread> workers;
  // Ticketed ordering: decode runs in parallel, but batches are DELIVERED
  // in sampler order (ticket = position in the index stream), so the batch
  // sequence is deterministic for any thread count — required for exact
  // resume (the torch DataLoader the reference uses is order-preserving
  // too).
  uint64_t next_ticket = 0;   // guarded by sampler_mutex
  uint64_t next_push = 0;     // guarded by q_mutex

  ~DataioHandle() { shutdown(); }

  void shutdown() {
    stop.store(true);
    q_cv_push.notify_all();
    q_cv_pop.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  bool decode_one(int64_t img_idx, uint8_t* dst) {
    const ZipEntry& e = zip.entries[image_entries[img_idx]];
    std::vector<uint8_t> raw, pixels;
    std::string err;
    if (!zip_read_entry(&zip, e, &raw, &err)) {
      last_error = err;
      return false;
    }
    int w = 0, h = 0;
    bool ok = false;
    if (has_suffix(e.name, ".png"))
      ok = decode_png(raw.data(), raw.size(), channels, &pixels, &w, &h, &err);
    else
      ok = decode_jpeg(raw.data(), raw.size(), channels, &pixels, &w, &h, &err);
    if (!ok || w != width || h != height) {
      last_error = ok ? "image size mismatch" : err;
      return false;
    }
    memcpy(dst, pixels.data(), pixels.size());
    return true;
  }

  void worker_loop() {
    const size_t img_bytes = (size_t)height * width * channels;
    while (!stop.load()) {
      Batch b;
      b.images.resize((size_t)batch * img_bytes);
      b.indices.resize(batch);
      uint64_t ticket;
      {
        std::lock_guard<std::mutex> lock(sampler_mutex);
        for (int i = 0; i < batch; ++i) b.indices[i] = sampler.next();
        ticket = next_ticket++;
      }
      bool ok = true;
      for (int i = 0; i < batch && ok; ++i)
        ok = decode_one(b.indices[i], b.images.data() + (size_t)i * img_bytes);
      std::unique_lock<std::mutex> lock(q_mutex);
      q_cv_push.wait(lock, [&] {
        return stop.load() ||
               (next_push == ticket && (int)ready.size() < prefetch);
      });
      if (stop.load()) return;
      ++next_push;
      if (ok)
        ready.push_back(std::move(b));
      // else: skip bad batch (error string already set) but still advance
      // the ticket so later batches can deliver.
      q_cv_push.notify_all();   // the next ticket holder may be any waiter
      if (ok) q_cv_pop.notify_one();
    }
  }
};

extern "C" {

DataioHandle* dataio_open(const char* zip_path, int channels) {
  auto* h = new DataioHandle();
  std::string err;
  if (!zip_open(&h->zip, zip_path, &err)) {
    h->last_error = err;
    return h;  // caller checks dataio_num_images() > 0
  }
  for (size_t i = 0; i < h->zip.entries.size(); ++i) {
    const std::string& n = h->zip.entries[i].name;
    if (has_suffix(n, ".png") || has_suffix(n, ".jpg") ||
        has_suffix(n, ".jpeg"))
      h->image_entries.push_back((int)i);
  }
  // Canonical order = sorted by name (matches the Python dataset).
  std::sort(h->image_entries.begin(), h->image_entries.end(),
            [&](int a, int b) {
              return h->zip.entries[a].name < h->zip.entries[b].name;
            });
  if (!h->image_entries.empty()) {
    // Probe the first image for dimensions.
    h->channels = channels;
    std::vector<uint8_t> raw, pixels;
    const ZipEntry& e = h->zip.entries[h->image_entries[0]];
    if (zip_read_entry(&h->zip, e, &raw, &err)) {
      int w = 0, hh = 0;
      bool ok = has_suffix(e.name, ".png")
                    ? decode_png(raw.data(), raw.size(), channels, &pixels,
                                 &w, &hh, &err)
                    : decode_jpeg(raw.data(), raw.size(), channels, &pixels,
                                  &w, &hh, &err);
      if (ok) {
        h->width = w;
        h->height = hh;
      } else {
        h->last_error = err;
      }
    } else {
      h->last_error = err;
    }
  }
  return h;
}

long long dataio_num_images(DataioHandle* h) {
  return (long long)h->image_entries.size();
}

void dataio_image_info(DataioHandle* h, int* height, int* width,
                       int* channels) {
  *height = h->height;
  *width = h->width;
  *channels = h->channels;
}

const char* dataio_image_name(DataioHandle* h, long long idx) {
  if (idx < 0 || idx >= (long long)h->image_entries.size()) return "";
  return h->zip.entries[h->image_entries[idx]].name.c_str();
}

// Synchronous single-image read (for dataset __getitem__ parity).
int dataio_read_image(DataioHandle* h, long long idx, unsigned char* out) {
  if (idx < 0 || idx >= (long long)h->image_entries.size()) return -1;
  return h->decode_one(idx, out) ? 0 : -1;
}

int dataio_start(DataioHandle* h, int batch, int shard, int num_shards,
                 int num_threads, int prefetch, unsigned long long seed,
                 int shuffle, long long start_item) {
  if (h->image_entries.empty() || h->width == 0) return -1;
  h->batch = batch;
  h->prefetch = prefetch > 0 ? prefetch : 2;
  h->sampler.init((int64_t)h->image_entries.size(), shard, num_shards, seed,
                  shuffle != 0);
  if (start_item > 0) h->sampler.skip((int64_t)start_item);
  h->next_ticket = 0;
  h->next_push = 0;
  h->stop.store(false);
  int nt = num_threads > 0 ? num_threads : 3;
  for (int i = 0; i < nt; ++i)
    h->workers.emplace_back([h] { h->worker_loop(); });
  return 0;
}

// Blocking: copy the next ready batch into caller-owned buffers.
int dataio_next(DataioHandle* h, unsigned char* out_images,
                long long* out_indices) {
  std::unique_lock<std::mutex> lock(h->q_mutex);
  h->q_cv_pop.wait(lock, [&] { return h->stop.load() || !h->ready.empty(); });
  if (h->ready.empty()) return -1;
  Batch b = std::move(h->ready.front());
  h->ready.pop_front();
  // notify_all, not notify_one: with ticketed ordering the waiters have
  // heterogeneous predicates (only the next-ticket holder may proceed) —
  // notify_one can wake a worker whose turn it is not and lose the wakeup.
  h->q_cv_push.notify_all();
  lock.unlock();
  memcpy(out_images, b.images.data(), b.images.size());
  memcpy(out_indices, b.indices.data(), b.indices.size() * sizeof(int64_t));
  return 0;
}

const char* dataio_last_error(DataioHandle* h) {
  return h->last_error.c_str();
}

void dataio_close(DataioHandle* h) { delete h; }

}  // extern "C"
