// pcl::PointCloud stub.
#ifndef ORACLE_PCL_POINT_CLOUD_H
#define ORACLE_PCL_POINT_CLOUD_H
#include <memory>
#include <vector>
namespace pcl {
template <typename PointT> struct PointCloud {
  typedef std::shared_ptr<PointCloud<PointT>> Ptr;
  typedef std::shared_ptr<const PointCloud<PointT>> ConstPtr;
  std::vector<PointT> points;
  uint32_t width = 0, height = 0;
  bool is_dense = false;
};
} // namespace pcl
#endif
