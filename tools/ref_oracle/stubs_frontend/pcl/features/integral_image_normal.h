// IntegralImageNormalEstimation stub: compute() copies the oracle's canned
// normal cloud, so the reference's size gate + downstream code run over
// oracle-controlled normals (the estimator itself is PCL's algorithm, not
// reference code — its OUTPUT is an input to what we pin).
#ifndef ORACLE_FE_PCL_INTEGRAL_IMAGE_NORMAL_H
#define ORACLE_FE_PCL_INTEGRAL_IMAGE_NORMAL_H

#include "pcl/point_cloud.h"

namespace pcl {
namespace oracle_hooks {
inline PointCloud<Normal> &canned_normals() {
  static PointCloud<Normal> c;
  return c;
}
} // namespace oracle_hooks

template <typename PointInT, typename NormalOutT>
class IntegralImageNormalEstimation {
public:
  enum NormalEstimationMethod { COVARIANCE_MATRIX, AVERAGE_3D_GRADIENT };
  void setNormalEstimationMethod(NormalEstimationMethod) {}
  void setMaxDepthChangeFactor(float) {}
  void setNormalSmoothingSize(float) {}
  void setInputCloud(const typename PointCloud<PointInT>::Ptr &) {}
  void compute(PointCloud<NormalOutT> &out) {
    out = oracle_hooks::canned_normals();
  }
};
} // namespace pcl

#endif
