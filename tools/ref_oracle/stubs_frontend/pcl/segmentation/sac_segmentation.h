// compile-only stub (legacy compute2DConvexHull path; never executed)
#ifndef ORACLE_FE_PCL_SAC_SEG_H
#define ORACLE_FE_PCL_SAC_SEG_H
#include <cstdlib>
#include "pcl/ModelCoefficients.h"
#include "pcl/point_cloud.h"
namespace pcl {
enum { SACMODEL_PLANE = 0 };
enum { SAC_RANSAC = 0 };
template <typename PointT> class SACSegmentation {
public:
  void setOptimizeCoefficients(bool) {}
  void setModelType(int) {}
  void setMethodType(int) {}
  void setDistanceThreshold(double) {}
  void setInputCloud(const typename PointCloud<PointT>::Ptr &) {}
  void segment(PointIndices &, ModelCoefficients &) { std::abort(); }
};
} // namespace pcl
#endif
