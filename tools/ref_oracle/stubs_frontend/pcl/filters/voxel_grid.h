// compile-only stub (legacy path; never executed)
#ifndef ORACLE_FE_PCL_VOXEL_GRID_H
#define ORACLE_FE_PCL_VOXEL_GRID_H
#include <cstdlib>
#include <memory>
#include <vector>
#include "pcl/point_cloud.h"
namespace pcl {
template <typename PointT> class VoxelGrid {
public:
  void setInputCloud(const typename PointCloud<PointT>::Ptr &) {}
  void setLeafSize(float, float, float) {}
  void filter(PointCloud<PointT> &) { std::abort(); }
  std::shared_ptr<std::vector<int>> getIndices() { std::abort(); }
};
} // namespace pcl
#endif
