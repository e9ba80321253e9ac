// cslam_tpu native runtime: approximate-time sensor synchronization.
//
// The C++ sensor-I/O core of the reference front-end: RGBDHandler uses
// an ApproximateTimeSynchronizer over image/depth/info streams
// (rgbd_handler.cpp:180-186; 4-way for stereo, stereo_handler.cpp:32-38)
// and aligns the chosen frame to the odometry cache within 30 ms
// (rgbd_handler.cpp:458-489). This module implements both: per-stream
// timestamped queues, best-match association under a slop window, and an
// odometry cache with nearest-timestamp lookup. Payloads stay opaque
// (the caller keeps them; we track 64-bit handles), so the same engine
// synchronizes any sensor tuple.

#include <cstdint>
#include <cmath>
#include <deque>
#include <vector>

namespace {

struct Stamped {
  double stamp;
  uint64_t handle;
};

struct Synchronizer {
  int n_streams = 2;
  double slop = 0.02;         // max inter-stream delta (s)
  size_t max_queue = 10;      // per-stream cap (frontend.max_queue_size)
  std::vector<std::deque<Stamped>> queues;
  std::deque<Stamped> odom;   // odometry cache
  double odom_slop = 0.03;    // rgbd_handler.cpp:473 (<= 30 ms)
};

}  // namespace

extern "C" {

void* cslam_sync_create(int n_streams, double slop, int max_queue,
                        double odom_slop) {
  Synchronizer* sync = new Synchronizer();
  sync->n_streams = n_streams;
  sync->slop = slop;
  sync->max_queue = static_cast<size_t>(max_queue);
  sync->odom_slop = odom_slop;
  sync->queues.resize(n_streams);
  return sync;
}

void cslam_sync_destroy(void* handle) {
  delete static_cast<Synchronizer*>(handle);
}

void cslam_sync_push(void* handle, int stream, double stamp,
                     uint64_t payload) {
  Synchronizer* sync = static_cast<Synchronizer*>(handle);
  auto& queue = sync->queues[stream];
  queue.push_back({stamp, payload});
  while (queue.size() > sync->max_queue) queue.pop_front();
}

void cslam_sync_push_odom(void* handle, double stamp, uint64_t payload) {
  Synchronizer* sync = static_cast<Synchronizer*>(handle);
  sync->odom.push_back({stamp, payload});
  while (sync->odom.size() > 100) sync->odom.pop_front();
}

// Try to emit one synchronized tuple: fills handles[n_streams] and
// returns 1 if a set of messages (one per stream) exists whose stamps
// all lie within slop of the pivot (stream 0's oldest viable message).
// Matched and older messages are dropped from the queues.
int cslam_sync_take(void* handle, uint64_t* handles, double* stamp_out) {
  Synchronizer* sync = static_cast<Synchronizer*>(handle);
  auto& pivot_queue = sync->queues[0];
  while (!pivot_queue.empty()) {
    const Stamped pivot = pivot_queue.front();
    bool all_found = true;
    std::vector<size_t> picks(sync->n_streams, 0);
    for (int s = 1; s < sync->n_streams; ++s) {
      auto& queue = sync->queues[s];
      double best = 1e18;
      size_t best_idx = 0;
      for (size_t i = 0; i < queue.size(); ++i) {
        double d = std::fabs(queue[i].stamp - pivot.stamp);
        if (d < best) {
          best = d;
          best_idx = i;
        }
      }
      if (queue.empty() || best > sync->slop) {
        // if this stream only has *newer* messages, the pivot can never
        // match: drop it and retry; otherwise wait for data
        if (!queue.empty() && queue.front().stamp > pivot.stamp + sync->slop) {
          all_found = false;
          break;  // drop pivot below
        }
        return 0;  // wait for more data
      }
      picks[s] = best_idx;
    }
    if (!all_found) {
      pivot_queue.pop_front();
      continue;
    }
    handles[0] = pivot.handle;
    *stamp_out = pivot.stamp;
    for (int s = 1; s < sync->n_streams; ++s) {
      auto& queue = sync->queues[s];
      handles[s] = queue[picks[s]].handle;
      queue.erase(queue.begin(), queue.begin() + picks[s] + 1);
    }
    pivot_queue.pop_front();
    return 1;
  }
  return 0;
}

// Nearest odometry sample within odom_slop of `stamp`
// (rgbd_handler.cpp:462-489). Returns 1 on success.
int cslam_sync_lookup_odom(void* handle, double stamp, uint64_t* payload,
                           double* stamp_out) {
  Synchronizer* sync = static_cast<Synchronizer*>(handle);
  double best = 1e18;
  const Stamped* pick = nullptr;
  for (const auto& s : sync->odom) {
    double d = std::fabs(s.stamp - stamp);
    if (d < best) {
      best = d;
      pick = &s;
    }
  }
  if (pick == nullptr || best > sync->odom_slop) return 0;
  *payload = pick->handle;
  *stamp_out = pick->stamp;
  return 1;
}

}  // extern "C"
