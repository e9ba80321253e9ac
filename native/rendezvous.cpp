// cslam_tpu native runtime: simulated rendezvous fault injector.
//
// Equivalent of the reference SimulatedRendezVous
// (/root/reference/src/back_end/utils/simulated_rendezvous.cpp:5-69):
// parses a CSV schedule `robot_id,start,end,start,end,...` and reports
// liveness only inside the robot's scheduled windows; any parse failure
// leaves the robot alive (matching the reference's exception swallow).

#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <utility>
#include <vector>

namespace {

struct Rendezvous {
  bool enabled = true;
  std::vector<std::pair<double, double>> windows;
};

}  // namespace

extern "C" {

void* cslam_rendezvous_create(const char* schedule_file, int robot_id,
                              int enabled) {
  Rendezvous* rdv = new Rendezvous();
  rdv->enabled = enabled != 0;
  if (!rdv->enabled) return rdv;
  std::ifstream file(schedule_file);
  if (!file.is_open()) {
    rdv->enabled = false;  // failures leave the robot alive
    return rdv;
  }
  std::string line;
  while (std::getline(file, line)) {
    std::stringstream ss(line);
    std::string field;
    std::vector<double> fields;
    bool parse_ok = true;
    while (std::getline(ss, field, ',')) {
      try {
        fields.push_back(std::stod(field));
      } catch (...) {
        parse_ok = false;
        break;
      }
    }
    if (!parse_ok || fields.empty()) continue;
    if (static_cast<int>(fields[0]) != robot_id) continue;
    for (size_t i = 1; i + 1 < fields.size(); i += 2) {
      rdv->windows.emplace_back(fields[i], fields[i + 1]);
    }
  }
  return rdv;
}

int cslam_rendezvous_is_alive(void* handle, double now) {
  Rendezvous* rdv = static_cast<Rendezvous*>(handle);
  if (!rdv->enabled) return 1;
  for (const auto& [start, end] : rdv->windows) {
    if (now >= start && now <= end) return 1;
  }
  return 0;
}

void cslam_rendezvous_destroy(void* handle) {
  delete static_cast<Rendezvous*>(handle);
}

}  // extern "C"
