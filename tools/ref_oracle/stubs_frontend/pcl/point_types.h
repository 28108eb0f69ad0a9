// PCL point types for the frontend oracle: exactly the members the
// reference frontend touches.
#ifndef ORACLE_FE_PCL_POINT_TYPES_H
#define ORACLE_FE_PCL_POINT_TYPES_H

#include "Eigen/Dense"

namespace pcl {

struct PointXYZRGB {
  float x = 0, y = 0, z = 0;
  float rgb = 0;
  Eigen::Vector3f getVector3fMap() const { return Eigen::Vector3f(x, y, z); }
};

struct Normal {
  float normal_x = 0, normal_y = 0, normal_z = 0, curvature = 0;
};

struct Label {
  unsigned label = 0;
};

} // namespace pcl

#endif
