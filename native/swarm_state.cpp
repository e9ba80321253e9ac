// cslam_tpu native runtime: decentralized-PGO state machine + elections.
//
// The control core of the reference's C++ back-end
// (/root/reference/src/back_end/decentralized_pgo.cpp): optimizer state
// transitions IDLE -> WAITING_FOR_NEIGHBORS_INFO -> POSEGRAPH_COLLECTION
// -> WAITING_FOR_NEIGHBORS_POSEGRAPHS -> START_OPTIMIZATION ->
// OPTIMIZATION (decentralized_pgo.h:55-63), waiting timeouts back to
// IDLE (:580-589), optimizer election by lowest (origin_robot_id,
// robot_id) among current neighbors (:394-415), and broker election by
// lowest alive id (neighbors_manager.py:48-64). The Python layer feeds
// events (neighbor info, pose-graph receipt, solve completion) and reads
// back the state; all transition logic lives here in C++.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

enum OptimizerState {
  IDLE = 0,
  WAITING_FOR_NEIGHBORS_INFO = 1,
  POSEGRAPH_COLLECTION = 2,
  WAITING_FOR_NEIGHBORS_POSEGRAPHS = 3,
  START_OPTIMIZATION = 4,
  OPTIMIZATION = 5,
};

struct StateMachine {
  int robot_id = 0;
  int origin_robot_id = 0;
  int state = IDLE;
  bool is_waiting = false;
  double start_waiting_time = 0.0;
  double max_waiting_time_sec = 60.0;
  std::vector<int> neighbor_ids;
  std::vector<int> neighbor_origins;
  std::vector<int> received_pose_graphs;
  bool has_odometry = false;
};

}  // namespace

extern "C" {

void* cslam_state_create(int robot_id, double max_waiting_time_sec) {
  StateMachine* sm = new StateMachine();
  sm->robot_id = robot_id;
  sm->origin_robot_id = robot_id;
  sm->max_waiting_time_sec = max_waiting_time_sec;
  return sm;
}

void cslam_state_destroy(void* handle) {
  delete static_cast<StateMachine*>(handle);
}

int cslam_state_get(void* handle) {
  return static_cast<StateMachine*>(handle)->state;
}

// Force a state (tests / recovery paths).
void cslam_state_force(void* handle, int state) {
  static_cast<StateMachine*>(handle)->state = state;
}

void cslam_state_set_origin(void* handle, int origin) {
  static_cast<StateMachine*>(handle)->origin_robot_id = origin;
}

void cslam_state_set_max_waiting(void* handle, double seconds) {
  static_cast<StateMachine*>(handle)->max_waiting_time_sec = seconds;
}

void cslam_state_set_has_odometry(void* handle, int has) {
  static_cast<StateMachine*>(handle)->has_odometry = has != 0;
}

// Election among current neighbors: lowest (origin, id) wins, and the
// robot must have odometry (decentralized_pgo.cpp:394-415).
int cslam_state_is_optimizer(void* handle) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  if (!sm->has_odometry) return 0;
  for (size_t i = 0; i < sm->neighbor_ids.size(); ++i) {
    if (sm->origin_robot_id > sm->neighbor_origins[i]) return 0;
    if (sm->origin_robot_id == sm->neighbor_origins[i] &&
        sm->robot_id > sm->neighbor_ids[i]) {
      return 0;
    }
  }
  return 1;
}

// Broker election: lowest alive id (neighbors_manager.py:48-64).
// alive_ids: ids of alive *other* robots.
int cslam_state_is_broker(void* handle, const int* alive_ids, int n) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  for (int i = 0; i < n; ++i) {
    if (alive_ids[i] < sm->robot_id) return 0;
  }
  return 1;
}

void cslam_state_start_waiting(void* handle, double now) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  if (sm->state == IDLE) {
    sm->state = WAITING_FOR_NEIGHBORS_INFO;
  } else if (sm->state == POSEGRAPH_COLLECTION) {
    sm->state = WAITING_FOR_NEIGHBORS_POSEGRAPHS;
  }
  sm->is_waiting = true;
  sm->start_waiting_time = now;
}

void cslam_state_end_waiting(void* handle) {
  static_cast<StateMachine*>(handle)->is_waiting = false;
}

int cslam_state_is_waiting(void* handle) {
  return static_cast<StateMachine*>(handle)->is_waiting ? 1 : 0;
}

// Timeout check: waiting too long returns to IDLE (:580-589). Returns 1
// if a timeout fired.
int cslam_state_check_timeout(void* handle, double now) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  if (!sm->is_waiting) return 0;
  if (now - sm->start_waiting_time > sm->max_waiting_time_sec) {
    sm->is_waiting = false;
    sm->state = IDLE;
    return 1;
  }
  return 0;
}

// Record the neighbor set without any transition (pure queries).
void cslam_state_set_neighbors(void* handle, const int* ids,
                               const int* origins, int n) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  sm->neighbor_ids.assign(ids, ids + n);
  sm->neighbor_origins.assign(origins, origins + n);
}

// Neighbor info received: elect, transition (:379-393).
void cslam_state_on_neighbors(void* handle, const int* ids,
                              const int* origins, int n) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  cslam_state_set_neighbors(handle, ids, origins, n);
  sm->received_pose_graphs.clear();
  sm->is_waiting = false;
  sm->state = cslam_state_is_optimizer(handle) ? POSEGRAPH_COLLECTION : IDLE;
}

// Pose graph received from a neighbor; when all arrived ->
// START_OPTIMIZATION (:485-509). Returns 1 when complete.
int cslam_state_on_pose_graph(void* handle, int robot_id) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  if (sm->state != WAITING_FOR_NEIGHBORS_POSEGRAPHS) return 0;
  if (std::find(sm->received_pose_graphs.begin(),
                sm->received_pose_graphs.end(),
                robot_id) == sm->received_pose_graphs.end()) {
    sm->received_pose_graphs.push_back(robot_id);
  }
  for (int id : sm->neighbor_ids) {
    if (std::find(sm->received_pose_graphs.begin(),
                  sm->received_pose_graphs.end(),
                  id) == sm->received_pose_graphs.end()) {
      return 0;
    }
  }
  sm->is_waiting = false;
  sm->state = START_OPTIMIZATION;
  return 1;
}

// Collection tick: no neighbors -> straight to START_OPTIMIZATION;
// otherwise caller requests pose graphs and we wait (:946-959).
// Returns the new state.
int cslam_state_on_collection_tick(void* handle, double now) {
  StateMachine* sm = static_cast<StateMachine*>(handle);
  if (sm->state != POSEGRAPH_COLLECTION) return sm->state;
  if (sm->neighbor_ids.empty()) {
    sm->state = START_OPTIMIZATION;
  } else {
    cslam_state_start_waiting(handle, now);
  }
  return sm->state;
}

void cslam_state_on_optimization_started(void* handle) {
  static_cast<StateMachine*>(handle)->state = OPTIMIZATION;
}

void cslam_state_on_optimization_done(void* handle) {
  static_cast<StateMachine*>(handle)->state = IDLE;
}

}  // extern "C"
