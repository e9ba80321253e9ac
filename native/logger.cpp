// cslam_tpu native runtime: metrics logger.
//
// Equivalent of the reference's C++ Logger
// (/root/reference/src/back_end/utils/logger.cpp): collects KeyValue
// metrics (comm bytes, match counts, sparsification time), times PGO
// solves (start_timer/stop_timer, logger.cpp:59-69), and dumps per-run
// CSV files into a timestamped folder (logger.cpp:105-153). Pose
// timestamps and GPS records are CSV streams as in the reference
// (:155-172, :193-204). g2o graph dumps are handled by the Python layer
// (backend/g2o.py) which owns the graph arrays.

#include <chrono>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

struct Match {
  int robot0_id;
  int robot0_keyframe_id;
  int robot1_id;
  int robot1_keyframe_id;
  double weight;
};

struct Logger {
  std::string folder;
  std::mutex mutex;
  std::map<std::string, std::string> values;
  std::chrono::steady_clock::time_point timer_start;
  bool timer_running = false;
  double latest_elapsed_ms = 0.0;
  double total_elapsed_ms = 0.0;
  uint64_t optimization_count = 0;
  std::ofstream pose_timestamps;
  std::ofstream gps;
  // named match streams -> <name>.csv (reference spectral_matches.csv,
  // logger.cpp:174-191; the greedy-vs-MAC comparison adds a second one)
  std::map<std::string, std::vector<Match>> match_streams;
};

double now_ms(const std::chrono::steady_clock::time_point& start) {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now() - start)
      .count();
}

}  // namespace

extern "C" {

void* cslam_logger_create(const char* folder) {
  Logger* logger = new Logger();
  logger->folder = folder;
  ::mkdir(folder, 0755);
  logger->pose_timestamps.open(logger->folder + "/pose_timestamps.csv");
  logger->pose_timestamps << "robot_id,keyframe_id,sec,nanosec\n";
  logger->gps.open(logger->folder + "/gps.csv");
  logger->gps << "keyframe_id,latitude,longitude,altitude\n";
  return logger;
}

void cslam_logger_log_info(void* handle, const char* key,
                           const char* value) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->values[key] = value;
}

void cslam_logger_start_timer(void* handle) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->timer_start = std::chrono::steady_clock::now();
  logger->timer_running = true;
}

// Returns the elapsed ms of the stopped interval.
double cslam_logger_stop_timer(void* handle) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  if (!logger->timer_running) return 0.0;
  logger->timer_running = false;
  logger->latest_elapsed_ms = now_ms(logger->timer_start);
  logger->total_elapsed_ms += logger->latest_elapsed_ms;
  logger->optimization_count++;
  logger->values["latest_pgo_time_ms"] =
      std::to_string(logger->latest_elapsed_ms);
  logger->values["total_pgo_time_ms"] =
      std::to_string(logger->total_elapsed_ms);
  logger->values["optimization_count"] =
      std::to_string(logger->optimization_count);
  return logger->latest_elapsed_ms;
}

void cslam_logger_log_pose_timestamp(void* handle, int robot_id,
                                     int keyframe_id, long sec,
                                     long nanosec) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->pose_timestamps << robot_id << "," << keyframe_id << "," << sec
                          << "," << nanosec << "\n";
}

void cslam_logger_log_gps(void* handle, int keyframe_id, double lat,
                          double lon, double alt) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->gps << keyframe_id << "," << lat << "," << lon << "," << alt
              << "\n";
}

// Append one match to a named stream ("spectral_matches",
// "greedy_matches", ...). Streams are replaced per selection round via
// cslam_logger_clear_matches so the CSV reflects the latest selection,
// like the reference's per-pose-graph spectral_matches.
void cslam_logger_log_match(void* handle, const char* stream, int r0,
                            int k0, int r1, int k1, double weight) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->match_streams[stream].push_back({r0, k0, r1, k1, weight});
}

void cslam_logger_clear_matches(void* handle, const char* stream) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  logger->match_streams[stream].clear();
}

// Dump all collected metrics as key,value CSV (reference write_logs,
// logger.cpp:105-153) plus one CSV per match stream (:174-191).
int cslam_logger_write_logs(void* handle) {
  Logger* logger = static_cast<Logger*>(handle);
  std::lock_guard<std::mutex> lock(logger->mutex);
  std::ofstream out(logger->folder + "/metrics.csv");
  if (!out.is_open()) return -1;
  out << "key,value\n";
  for (const auto& [key, value] : logger->values) {
    out << key << "," << value << "\n";
  }
  for (const auto& [name, matches] : logger->match_streams) {
    std::ofstream mf(logger->folder + "/" + name + ".csv");
    mf << "robot0_id, robot0_keyframe_id, robot1_id, robot1_keyframe_id,"
       << " weight\n";
    for (const auto& m : matches) {
      mf << m.robot0_id << "," << m.robot0_keyframe_id << ","
         << m.robot1_id << "," << m.robot1_keyframe_id << ","
         << m.weight << "\n";
    }
  }
  logger->pose_timestamps.flush();
  logger->gps.flush();
  return 0;
}

void cslam_logger_destroy(void* handle) {
  Logger* logger = static_cast<Logger*>(handle);
  cslam_logger_write_logs(handle);
  delete logger;
}

}  // extern "C"
