// compile-only stub (legacy path; never executed)
#ifndef ORACLE_FE_PCL_CONVEX_HULL_H
#define ORACLE_FE_PCL_CONVEX_HULL_H
#include <cstdlib>
#include "pcl/point_cloud.h"
namespace pcl {
template <typename PointT> class ConvexHull {
public:
  void setInputCloud(const typename PointCloud<PointT>::Ptr &) {}
  void reconstruct(PointCloud<PointT> &) { std::abort(); }
};
} // namespace pcl
#endif
