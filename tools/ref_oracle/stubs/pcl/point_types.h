// pcl point type stub.
#ifndef ORACLE_PCL_POINT_TYPES_H
#define ORACLE_PCL_POINT_TYPES_H
#include <cstdint>
namespace pcl {
struct PointXYZRGB {
  float x = 0, y = 0, z = 0;
  uint32_t rgba = 0;
};
} // namespace pcl
#endif
