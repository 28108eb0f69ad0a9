// sensor_msgs/PointCloud2 stub (fields only; never decoded by the oracle).
#ifndef ORACLE_SENSOR_MSGS_POINTCLOUD2_H
#define ORACLE_SENSOR_MSGS_POINTCLOUD2_H

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "geometry_msgs/TransformStamped.h"

namespace sensor_msgs {

struct PointField {
  std::string name;
  uint32_t offset = 0;
  uint8_t datatype = 0;
  uint32_t count = 0;
};

struct PointCloud2 {
  std_msgs::Header header;
  uint32_t height = 0, width = 0;
  std::vector<PointField> fields;
  bool is_bigendian = false;
  uint32_t point_step = 0, row_step = 0;
  std::vector<uint8_t> data;
  bool is_dense = false;

  typedef std::shared_ptr<PointCloud2> Ptr;
  typedef std::shared_ptr<const PointCloud2> ConstPtr;
};

} // namespace sensor_msgs

#endif
