#ifndef ORACLE_FE_PCL_CONVERSIONS_H
#define ORACLE_FE_PCL_CONVERSIONS_H
#include "pcl/point_cloud.h"
#include "sensor_msgs/PointCloud2.h"
namespace pcl {
// the reference only uses toROSMsg to publish the cropped cloud, which the
// oracle never consumes — size bookkeeping is enough
template <typename PointT>
inline void toROSMsg(const PointCloud<PointT> &c, sensor_msgs::PointCloud2 &m) {
  m.width = c.width;
  m.height = c.height;
}
} // namespace pcl
#endif
