// Real-car IO bridge: lock-free shared-memory state/control channels and a
// UDP transport, C ABI for ctypes (pybind11 is not in this image).
//
// Reference parity: the reference lineage closes the real-car loop through
// ROS topics at ~30 Hz (SURVEY.md §2 — estimator/driver layers; vestigial
// in the public repo). The TPU-native equivalent is this bridge: the
// controller process (owning the TPU) exchanges fixed-size state/control
// frames with a car/sensor process through POSIX shared memory, lock-free,
// so the control path never blocks on a mutex held by a stalled peer — a
// seqlock per channel gives wait-free writes and torn-read detection.
// A UDP mode covers off-host cars (the BARC's on-board computer).
//
// Frame layout (both channels, little-endian, 64 bytes):
//   uint32 seq     — seqlock: odd while a write is in flight
//   uint32 count   — monotonically increasing frame number
//   double t       — sender timestamp, seconds (arl_monotonic)
//   float  data[8] — state (vx,vy,wz,epsi,s,ey,...) or control (delta,a)
//   pad to 64 bytes (one cache line; writer and reader never share a line)

#include <atomic>
#include <cstdint>
#include <cstring>

#include <arpa/inet.h>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <time.h>
#include <unistd.h>

namespace {

constexpr int kDataLanes = 8;

struct alignas(64) Channel {
  std::atomic<uint32_t> seq;
  uint32_t count;
  double t;
  float data[kDataLanes];
};
static_assert(sizeof(Channel) == 64, "Channel must be one cache line");

struct Bridge {
  Channel state;    // car -> controller
  Channel control;  // controller -> car
};

void channel_write(Channel* ch, double t, const float* src, int n) {
  const uint32_t s0 = ch->seq.load(std::memory_order_relaxed);
  ch->seq.store(s0 + 1, std::memory_order_release);  // odd: write in flight
  std::atomic_thread_fence(std::memory_order_acquire);
  ch->t = t;
  ch->count += 1;
  for (int i = 0; i < n && i < kDataLanes; ++i) ch->data[i] = src[i];
  std::atomic_thread_fence(std::memory_order_release);
  ch->seq.store(s0 + 2, std::memory_order_release);  // even: committed
}

// Returns the frame number (count), or -1 if a torn read persisted.
int channel_read(const Channel* ch, double* t, float* dst, int n) {
  for (int attempt = 0; attempt < 1000; ++attempt) {
    const uint32_t s1 = ch->seq.load(std::memory_order_acquire);
    if (s1 & 1u) continue;  // write in flight
    std::atomic_thread_fence(std::memory_order_acquire);
    const double tt = ch->t;
    const uint32_t cnt = ch->count;
    float tmp[kDataLanes];
    for (int i = 0; i < n && i < kDataLanes; ++i) tmp[i] = ch->data[i];
    std::atomic_thread_fence(std::memory_order_acquire);
    const uint32_t s2 = ch->seq.load(std::memory_order_acquire);
    if (s1 == s2) {
      *t = tt;
      for (int i = 0; i < n && i < kDataLanes; ++i) dst[i] = tmp[i];
      return static_cast<int>(cnt);
    }
  }
  return -1;
}

}  // namespace

extern "C" {

double arl_monotonic() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return static_cast<double>(ts.tv_sec) + 1e-9 * ts.tv_nsec;
}

// ---- shared-memory lifecycle ------------------------------------------

void* arl_bridge_create(const char* name) {
  shm_unlink(name);  // stale segment from a crashed run
  const int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, sizeof(Bridge)) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* p = mmap(nullptr, sizeof(Bridge), PROT_READ | PROT_WRITE,
                 MAP_SHARED, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return nullptr;
  std::memset(p, 0, sizeof(Bridge));
  return p;
}

void* arl_bridge_open(const char* name) {
  const int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  void* p = mmap(nullptr, sizeof(Bridge), PROT_READ | PROT_WRITE,
                 MAP_SHARED, fd, 0);
  close(fd);
  return p == MAP_FAILED ? nullptr : p;
}

void arl_bridge_close(void* h, const char* name, int unlink_it) {
  if (h) munmap(h, sizeof(Bridge));
  if (unlink_it) shm_unlink(name);
}

// ---- channel IO --------------------------------------------------------

void arl_write_state(void* h, double t, const float* x, int nx) {
  channel_write(&static_cast<Bridge*>(h)->state, t, x, nx);
}

int arl_read_state(void* h, double* t, float* x, int nx) {
  return channel_read(&static_cast<Bridge*>(h)->state, t, x, nx);
}

void arl_write_control(void* h, double t, const float* u, int nu) {
  channel_write(&static_cast<Bridge*>(h)->control, t, u, nu);
}

int arl_read_control(void* h, double* t, float* u, int nu) {
  return channel_read(&static_cast<Bridge*>(h)->control, t, u, nu);
}

// ---- UDP transport (off-host car) --------------------------------------

// Wire format: one channel frame without the seqlock word:
//   uint32 count; double t; float data[8]  (44 bytes, packed little-endian)
#pragma pack(push, 1)
struct WireFrame {
  uint32_t count;
  double t;
  float data[kDataLanes];
};
#pragma pack(pop)

int arl_udp_socket(int port) {
  const int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  const int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }
  const int flags = fcntl(fd, F_GETFL, 0);
  fcntl(fd, F_SETFL, flags | O_NONBLOCK);
  return fd;
}

int arl_udp_send(int fd, const char* ip, int port, uint32_t count, double t,
                 const float* data, int n) {
  WireFrame f{};
  f.count = count;
  f.t = t;
  for (int i = 0; i < n && i < kDataLanes; ++i) f.data[i] = data[i];
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, ip, &addr.sin_addr) != 1) return -1;
  const ssize_t r = sendto(fd, &f, sizeof(f), 0,
                           reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
  return r == static_cast<ssize_t>(sizeof(f)) ? 0 : -1;
}

// Drains the socket, returns the NEWEST frame (count), or -1 if empty.
int arl_udp_recv_latest(int fd, double* t, float* data, int n) {
  WireFrame f{};
  int best = -1;
  for (;;) {
    const ssize_t r = recv(fd, &f, sizeof(f), 0);
    if (r != static_cast<ssize_t>(sizeof(f))) break;
    if (best < 0 || static_cast<int>(f.count) > best) {
      best = static_cast<int>(f.count);
      *t = f.t;
      for (int i = 0; i < n && i < kDataLanes; ++i) data[i] = f.data[i];
    }
  }
  return best;
}

void arl_udp_close(int fd) { close(fd); }

}  // extern "C"
