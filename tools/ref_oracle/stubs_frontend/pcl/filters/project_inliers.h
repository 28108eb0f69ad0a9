// compile-only stub (legacy path; never executed)
#ifndef ORACLE_FE_PCL_PROJECT_INLIERS_H
#define ORACLE_FE_PCL_PROJECT_INLIERS_H
#include <cstdlib>
#include "pcl/ModelCoefficients.h"
#include "pcl/point_cloud.h"
namespace pcl {
template <typename PointT> class ProjectInliers {
public:
  void setModelType(int) {}
  void setInputCloud(const typename PointCloud<PointT>::Ptr &) {}
  void setIndices(const PointIndices::Ptr &) {}
  void setModelCoefficients(const ModelCoefficients::Ptr &) {}
  void filter(PointCloud<PointT> &) { std::abort(); }
};
} // namespace pcl
#endif
