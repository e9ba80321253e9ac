// cslam_tpu native runtime: TCP full-mesh pub/sub message bus.
//
// The DCN transport for the decentralized swarm protocol — the
// equivalent of the reference's ROS 2/DDS topic layer (every cross-robot
// boundary in /root/reference is a DDS topic; see SURVEY §2
// "Distributed communication backend"). Design:
//
//   - each robot process owns one bus bound to base_port + robot_id;
//   - a full mesh of TCP connections is established lazily and
//     re-established on failure (liveness is handled above this layer by
//     heartbeats, as in the reference);
//   - publish() frames [topic_len][topic][payload_len][payload] to every
//     connected peer and enqueues locally (topics are swarm-global; the
//     Python layer namespaces and filters, mirroring ROS namespacing);
//   - a reader thread per peer connection pushes frames into one
//     mutex-protected inbound queue drained by poll().
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::string topic;
  std::string payload;
};

struct PeerConn {
  int fd = -1;
  std::mutex send_mutex;
};

struct Bus {
  int robot_id = 0;
  int n_robots = 0;
  int base_port = 0;
  std::vector<std::string> hosts;

  int listen_fd = -1;
  std::thread acceptor;
  std::mutex readers_mutex;
  std::vector<std::thread> readers;
  std::vector<int> accepted_fds;
  std::atomic<bool> running{true};

  std::vector<PeerConn> peers;  // outbound connections, index = robot id
  std::mutex queue_mutex;
  std::condition_variable queue_cv;
  std::deque<Frame> inbound;
  std::atomic<uint64_t> sent_bytes{0};
  std::atomic<uint64_t> received_bytes{0};
  std::atomic<uint64_t> dropped_sends{0};
};

bool send_all(int fd, const char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t n = ::send(fd, data + off, len - off, MSG_NOSIGNAL);
    if (n <= 0) return false;
    off += static_cast<size_t>(n);
  }
  return true;
}

bool recv_all(int fd, char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t n = ::recv(fd, data + off, len - off, 0);
    if (n <= 0) return false;
    off += static_cast<size_t>(n);
  }
  return true;
}

void reader_loop(Bus* bus, int fd) {
  while (bus->running.load()) {
    uint32_t lens[2];
    if (!recv_all(fd, reinterpret_cast<char*>(lens), sizeof(lens))) break;
    uint32_t topic_len = lens[0];
    uint32_t payload_len = lens[1];
    if (topic_len > (1u << 16) || payload_len > (1u << 30)) break;
    Frame frame;
    frame.topic.resize(topic_len);
    frame.payload.resize(payload_len);
    if (!recv_all(fd, frame.topic.data(), topic_len)) break;
    if (!recv_all(fd, frame.payload.data(), payload_len)) break;
    bus->received_bytes += topic_len + payload_len + sizeof(lens);
    {
      std::lock_guard<std::mutex> lock(bus->queue_mutex);
      bus->inbound.push_back(std::move(frame));
    }
    bus->queue_cv.notify_one();
  }
  ::close(fd);
}

void acceptor_loop(Bus* bus) {
  while (bus->running.load()) {
    sockaddr_in addr{};
    socklen_t addr_len = sizeof(addr);
    int fd = ::accept(bus->listen_fd, reinterpret_cast<sockaddr*>(&addr),
                      &addr_len);
    if (fd < 0) {
      if (!bus->running.load()) break;
      continue;
    }
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    {
      std::lock_guard<std::mutex> lock(bus->readers_mutex);
      bus->accepted_fds.push_back(fd);
      bus->readers.emplace_back(reader_loop, bus, fd);
    }
  }
}

int connect_peer(Bus* bus, int peer_id) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(bus->base_port + peer_id));
  const std::string& host =
      bus->hosts.empty() ? std::string("127.0.0.1")
                         : bus->hosts[peer_id % bus->hosts.size()];
  if (::inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
    ::close(fd);
    return -1;
  }
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    ::close(fd);
    return -1;
  }
  int one = 1;
  ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

}  // namespace

extern "C" {

// hosts: comma-separated IPv4 list indexed by robot id ("" => loopback).
void* cslam_bus_create(int robot_id, int n_robots, int base_port,
                       const char* hosts) {
  Bus* bus = new Bus();
  bus->robot_id = robot_id;
  bus->n_robots = n_robots;
  bus->base_port = base_port;
  if (hosts != nullptr && hosts[0] != '\0') {
    std::string list(hosts);
    size_t pos = 0;
    while (pos != std::string::npos) {
      size_t comma = list.find(',', pos);
      bus->hosts.push_back(list.substr(
          pos, comma == std::string::npos ? comma : comma - pos));
      pos = comma == std::string::npos ? comma : comma + 1;
    }
  }
  bus->peers = std::vector<PeerConn>(n_robots);

  bus->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(bus->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(static_cast<uint16_t>(base_port + robot_id));
  if (::bind(bus->listen_fd, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) != 0 ||
      ::listen(bus->listen_fd, n_robots + 4) != 0) {
    ::close(bus->listen_fd);
    delete bus;
    return nullptr;
  }
  bus->acceptor = std::thread(acceptor_loop, bus);
  return bus;
}

// Publish to all peers (and loop back locally). Returns the number of
// peers the frame reached (excluding self).
int cslam_bus_publish(void* handle, const char* topic, const char* data,
                      int len) {
  Bus* bus = static_cast<Bus*>(handle);
  uint32_t lens[2] = {static_cast<uint32_t>(strlen(topic)),
                      static_cast<uint32_t>(len)};
  int reached = 0;
  for (int peer = 0; peer < bus->n_robots; ++peer) {
    if (peer == bus->robot_id) continue;
    PeerConn& conn = bus->peers[peer];
    std::lock_guard<std::mutex> lock(conn.send_mutex);
    if (conn.fd < 0) conn.fd = connect_peer(bus, peer);
    if (conn.fd < 0) {
      bus->dropped_sends++;
      continue;
    }
    bool ok = send_all(conn.fd, reinterpret_cast<char*>(lens), sizeof(lens)) &&
              send_all(conn.fd, topic, lens[0]) &&
              send_all(conn.fd, data, lens[1]);
    if (!ok) {
      ::close(conn.fd);
      conn.fd = -1;
      bus->dropped_sends++;
      continue;
    }
    bus->sent_bytes += sizeof(lens) + lens[0] + lens[1];
    reached++;
  }
  // local loopback so the publisher's own subscribers fire (DDS behavior)
  Frame frame;
  frame.topic = topic;
  frame.payload.assign(data, data + len);
  {
    std::lock_guard<std::mutex> lock(bus->queue_mutex);
    bus->inbound.push_back(std::move(frame));
  }
  bus->queue_cv.notify_one();
  return reached;
}

// Pop one inbound frame. Returns payload length (>= 0), -1 when empty
// after timeout_ms, -2 when the buffers are too small (frame is
// requeued).
int cslam_bus_poll(void* handle, char* topic_buf, int topic_cap,
                   char* data_buf, int data_cap, int timeout_ms) {
  Bus* bus = static_cast<Bus*>(handle);
  std::unique_lock<std::mutex> lock(bus->queue_mutex);
  if (bus->inbound.empty()) {
    if (timeout_ms <= 0) return -1;
    bus->queue_cv.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                           [bus] { return !bus->inbound.empty(); });
    if (bus->inbound.empty()) return -1;
  }
  Frame& frame = bus->inbound.front();
  if (static_cast<int>(frame.topic.size()) >= topic_cap ||
      static_cast<int>(frame.payload.size()) > data_cap) {
    return -2;
  }
  memcpy(topic_buf, frame.topic.c_str(), frame.topic.size() + 1);
  memcpy(data_buf, frame.payload.data(), frame.payload.size());
  int n = static_cast<int>(frame.payload.size());
  bus->inbound.pop_front();
  return n;
}

// Sizes of the frame at the queue front without consuming it, so a
// caller that got -2 from poll can grow its buffers and retry instead
// of wedging the queue. Returns 0 with sizes filled, -1 when empty.
int cslam_bus_front_sizes(void* handle, uint32_t* topic_len,
                          uint32_t* payload_len) {
  Bus* bus = static_cast<Bus*>(handle);
  std::lock_guard<std::mutex> lock(bus->queue_mutex);
  if (bus->inbound.empty()) return -1;
  const Frame& frame = bus->inbound.front();
  *topic_len = static_cast<uint32_t>(frame.topic.size());
  *payload_len = static_cast<uint32_t>(frame.payload.size());
  return 0;
}

uint64_t cslam_bus_sent_bytes(void* handle) {
  return static_cast<Bus*>(handle)->sent_bytes.load();
}

uint64_t cslam_bus_received_bytes(void* handle) {
  return static_cast<Bus*>(handle)->received_bytes.load();
}

void cslam_bus_destroy(void* handle) {
  Bus* bus = static_cast<Bus*>(handle);
  bus->running.store(false);
  ::shutdown(bus->listen_fd, SHUT_RDWR);
  ::close(bus->listen_fd);
  if (bus->acceptor.joinable()) bus->acceptor.join();
  for (auto& conn : bus->peers) {
    std::lock_guard<std::mutex> lock(conn.send_mutex);
    if (conn.fd >= 0) {
      ::shutdown(conn.fd, SHUT_RDWR);
      ::close(conn.fd);
      conn.fd = -1;
    }
  }
  // wake up reader threads blocked in recv on accepted connections
  {
    std::lock_guard<std::mutex> lock(bus->readers_mutex);
    for (int fd : bus->accepted_fds) ::shutdown(fd, SHUT_RDWR);
  }
  for (auto& reader : bus->readers) {
    if (reader.joinable()) reader.join();
  }
  delete bus;
}

}  // extern "C"
