// geometry_msgs stub: plain structs with the wire-schema field layout.
#ifndef ORACLE_GEOMETRY_MSGS_H
#define ORACLE_GEOMETRY_MSGS_H

#include <cstddef>
#include <memory>
#include <string>

#include "ros/ros.h"

namespace std_msgs {
struct Header {
  uint32_t seq = 0;
  ros::Time stamp;
  std::string frame_id;
};
} // namespace std_msgs

namespace geometry_msgs {

// boost::array<double,36>-alike: operator[] takes size_t, so a float index
// (ros_utils.hpp:296 uses `float id`) converts implicitly like in real ROS.
struct Covariance36 {
  double d[36] = {0};
  double &operator[](std::size_t i) { return d[i]; }
  const double &operator[](std::size_t i) const { return d[i]; }
};

struct Point {
  double x = 0, y = 0, z = 0;
};

struct Vector3 {
  double x = 0, y = 0, z = 0;
};

struct Quaternion {
  double x = 0, y = 0, z = 0, w = 0;
};

struct Pose {
  Point position;
  Quaternion orientation;
};

struct PoseWithCovariance {
  Pose pose;
  Covariance36 covariance;
};

struct Twist {
  Vector3 linear;
  Vector3 angular;
};

struct TwistWithCovariance {
  Twist twist;
  Covariance36 covariance;
};

struct PoseStamped {
  std_msgs::Header header;
  Pose pose;
};

struct Transform {
  Vector3 translation;
  Quaternion rotation;
};

struct TransformStamped {
  std_msgs::Header header;
  std::string child_frame_id;
  Transform transform;
};

} // namespace geometry_msgs

#endif
