// ThreadSanitizer stress for the TCP bus (make -C native tsan).
//
// The bus is the one genuinely concurrent native component: an acceptor
// thread, a reader thread per inbound connection, lazy reconnecting
// senders, and a shared inbound queue. This harness hammers all of it:
//
//   - 4 buses in one process (full mesh over loopback);
//   - a publisher thread per bus publishing continuously;
//   - a poller thread per bus draining frames concurrently;
//   - a churn thread repeatedly destroying and recreating one bus
//     mid-traffic, forcing peer-connection failure, the dropped-send
//     path, and lazy reconnection in every other bus.
//
// Run under -fsanitize=thread with halt_on_error=1: any data race,
// lock-order inversion, or use-after-free aborts with a nonzero exit.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* cslam_bus_create(int robot_id, int n_robots, int base_port,
                       const char* hosts_csv);
int cslam_bus_publish(void* handle, const char* topic, const char* data,
                      int len);
int cslam_bus_poll(void* handle, char* topic_buf, int topic_cap,
                   char* data_buf, int data_cap, int timeout_ms);
uint64_t cslam_bus_sent_bytes(void* handle);
uint64_t cslam_bus_received_bytes(void* handle);
void cslam_bus_destroy(void* handle);
}

namespace {

constexpr int kRobots = 4;
constexpr int kBasePort = 19940;
constexpr auto kDuration = std::chrono::seconds(6);

std::atomic<bool> running{true};
// buses[0..kRobots-2] are stable (each owned by its publisher+poller
// pair for the whole run, as in production where one process owns one
// bus for its lifetime). buses[kRobots-1] is owned by the churner
// thread ALONE: it is created, driven and destroyed only there, so the
// peers experience real connect/disconnect churn (reader-thread death,
// failed sends, lazy reconnection) without the harness itself handing
// a freed Bus to another thread — a lifetime rule the production
// wrapper (runtime/native.py NativeBus) also guarantees.
void* buses[kRobots];
std::atomic<uint64_t> published{0}, polled{0}, churns{0};

void publisher(int rid) {
  char payload[256];
  std::memset(payload, 'x', sizeof(payload));
  int k = 0;
  while (running.load()) {
    std::string topic = "stress/t" + std::to_string(k % 7);
    cslam_bus_publish(buses[rid], topic.c_str(), payload,
                      static_cast<int>(sizeof(payload)));
    published.fetch_add(1);
    if (++k % 64 == 0) std::this_thread::yield();
  }
}

void poller(int rid) {
  char topic[128];
  char data[4096];
  while (running.load()) {
    int n = cslam_bus_poll(buses[rid], topic, sizeof(topic), data,
                           sizeof(data), /*timeout_ms=*/5);
    if (n >= 0) polled.fetch_add(1);
  }
}

// Churn robot kRobots-1: repeatedly create a bus, exchange some
// traffic, destroy it mid-stream. Every other bus sees its reader die,
// its sends to this peer fail (dropped-send path) and the next publish
// reconnect lazily.
void churner() {
  const int rid = kRobots - 1;
  char topic[128];
  char data[4096];
  char payload[64];
  std::memset(payload, 'y', sizeof(payload));
  while (running.load()) {
    void* bus = cslam_bus_create(rid, kRobots, kBasePort, /*hosts=*/"");
    for (int k = 0; k < 40 && running.load(); ++k) {
      cslam_bus_publish(bus, "stress/churn", payload,
                        static_cast<int>(sizeof(payload)));
      cslam_bus_poll(bus, topic, sizeof(topic), data, sizeof(data), 2);
    }
    cslam_bus_destroy(bus);
    churns.fetch_add(1);
    std::this_thread::sleep_for(std::chrono::milliseconds(100));
  }
}

}  // namespace

int main() {
  for (int r = 0; r < kRobots - 1; ++r) {
    buses[r] = cslam_bus_create(r, kRobots, kBasePort, "");
  }
  std::vector<std::thread> threads;
  for (int r = 0; r < kRobots - 1; ++r) {
    threads.emplace_back(publisher, r);
    threads.emplace_back(poller, r);
  }
  threads.emplace_back(churner);
  std::this_thread::sleep_for(kDuration);
  running.store(false);
  for (auto& t : threads) t.join();
  uint64_t rx_total = 0;
  for (int r = 0; r < kRobots - 1; ++r) {
    rx_total += cslam_bus_received_bytes(buses[r]);
    cslam_bus_destroy(buses[r]);
  }
  std::printf("tsan_stress: published=%llu polled=%llu churns=%llu "
              "rx_bytes=%llu\n",
              (unsigned long long)published.load(),
              (unsigned long long)polled.load(),
              (unsigned long long)churns.load(),
              (unsigned long long)rx_total);
  if (published.load() == 0 || polled.load() == 0 || churns.load() == 0) {
    std::fprintf(stderr, "tsan_stress: no traffic/churn exercised\n");
    return 1;
  }
  return 0;
}
