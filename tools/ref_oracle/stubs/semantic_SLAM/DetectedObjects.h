// semantic_SLAM message stubs matching msg/ObjectInfo.msg + DetectedObjects.msg.
#ifndef ORACLE_SEMANTIC_SLAM_DETECTEDOBJECTS_H
#define ORACLE_SEMANTIC_SLAM_DETECTEDOBJECTS_H

#include <cstdint>
#include <string>
#include <vector>

#include "geometry_msgs/TransformStamped.h"

namespace semantic_SLAM {

struct ObjectInfo {
  std::string type;
  float prob = 0;
  int32_t tl_x = 0, tl_y = 0, width = 0, height = 0;
};

struct DetectedObjects {
  std_msgs::Header header;
  std::vector<ObjectInfo> objects;
};

} // namespace semantic_SLAM

#endif
