// Minimal ros/ros.h stub for compiling the reference's header-only math
// (/root/reference/include/*) outside ROS. Provides only what those headers
// touch: ros::Time / ros::Duration arithmetic (faithful to roslib's
// normalizeSecNSecSigned so Duration.sec truncation matches ROS), and
// ros::param::param<T> backed by a process-global map the oracle harness
// fills before constructing reference objects.
#ifndef ORACLE_ROS_ROS_H
#define ORACLE_ROS_ROS_H

#include <cstdint>
#include <map>
#include <string>

namespace ros {

namespace oracle_params {
// global parameter store; harness sets these before constructing objects
inline std::map<std::string, double> &doubles() {
  static std::map<std::string, double> m;
  return m;
}
inline std::map<std::string, bool> &bools() {
  static std::map<std::string, bool> m;
  return m;
}
inline void clear() {
  doubles().clear();
  bools().clear();
}
} // namespace oracle_params

struct Duration {
  int32_t sec = 0;
  int32_t nsec = 0;
  Duration() {}
  Duration(int64_t s, int64_t ns) {
    // ros::normalizeSecNSecSigned: nsec into [0, 1e9), sec adjusted
    int64_t nsec_part = ns % 1000000000L;
    int64_t sec_part = s + ns / 1000000000L;
    if (nsec_part < 0) {
      nsec_part += 1000000000L;
      --sec_part;
    }
    sec = static_cast<int32_t>(sec_part);
    nsec = static_cast<int32_t>(nsec_part);
  }
  double toSec() const { return sec + 1e-9 * nsec; }
};

struct Time {
  uint32_t sec = 0;
  uint32_t nsec = 0;
  Time() {}
  Time(uint32_t s, uint32_t ns) : sec(s), nsec(ns) {}
  Duration operator-(const Time &rhs) const {
    return Duration(static_cast<int64_t>(sec) - static_cast<int64_t>(rhs.sec),
                    static_cast<int64_t>(nsec) - static_cast<int64_t>(rhs.nsec));
  }
  bool operator==(const Time &rhs) const {
    return sec == rhs.sec && nsec == rhs.nsec;
  }
  double toSec() const { return sec + 1e-9 * nsec; }
};

namespace param {
template <typename T>
void param(const std::string &name, T &out, const T &def);

template <>
inline void param<double>(const std::string &name, double &out,
                          const double &def) {
  auto it = oracle_params::doubles().find(name);
  out = (it != oracle_params::doubles().end()) ? it->second : def;
}

template <>
inline void param<bool>(const std::string &name, bool &out, const bool &def) {
  auto it = oracle_params::bools().find(name);
  out = (it != oracle_params::bools().end()) ? it->second : def;
}
} // namespace param

} // namespace ros

#endif
