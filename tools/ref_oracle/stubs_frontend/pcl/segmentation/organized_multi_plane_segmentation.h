// OrganizedMultiPlaneSegmentation stub: segmentAndRefine() emits the
// oracle's canned regions (centroid/coefficients/contour), so the
// reference's region post-processing — boundary>100 gate, polygon-area
// gate, h/v classification, sign canonicalization, 1x8 packing
// (plane_segmentation.cpp:159-259) — runs as REAL reference code over
// oracle-controlled inputs. calculatePolygonArea is likewise canned per
// region (PCL's area algorithm is not reference code).
#ifndef ORACLE_FE_PCL_OMPS_H
#define ORACLE_FE_PCL_OMPS_H

#include <vector>

#include "Eigen/Dense"
#include "Eigen/StdVector"
#include "pcl/point_cloud.h"

namespace pcl {

template <typename PointT> class PlanarRegion {
public:
  Eigen::Vector3f centroid_ = Eigen::Vector3f::Zero();
  Eigen::Vector4f coefficients_ = Eigen::Vector4f::Zero();
  std::vector<PointT> contour_;
  Eigen::Vector3f getCentroid() const { return centroid_; }
  Eigen::Vector4f getCoefficients() const { return coefficients_; }
  std::vector<PointT> getContour() const { return contour_; }
  EIGEN_MAKE_ALIGNED_OPERATOR_NEW
};

namespace oracle_hooks {
struct CannedRegion {
  float centroid[3];
  float coeffs[4];
  int contour_count;
  float area;
};
inline std::vector<CannedRegion> &canned_regions() {
  static std::vector<CannedRegion> v;
  return v;
}
inline std::vector<float> &area_queue() {
  static std::vector<float> v;
  return v;
}
} // namespace oracle_hooks

template <typename PointT>
inline float calculatePolygonArea(const PointCloud<PointT> &) {
  auto &q = oracle_hooks::area_queue();
  if (q.empty())
    return 0.0f;
  float a = q.front();
  q.erase(q.begin());
  return a;
}

template <typename PointT, typename NormalT, typename LabelT>
class OrganizedMultiPlaneSegmentation {
public:
  void setMinInliers(double) {}
  void setAngularThreshold(double) {}
  void setDistanceThreshold(double) {}
  void setInputNormals(const typename PointCloud<NormalT>::Ptr &) {}
  void setInputCloud(const typename PointCloud<PointT>::Ptr &) {}

  void segmentAndRefine(
      std::vector<PlanarRegion<PointT>,
                  Eigen::aligned_allocator<PlanarRegion<PointT>>> &regions,
      std::vector<ModelCoefficients> &model_coefficients,
      std::vector<PointIndices> &inlier_indices,
      typename PointCloud<LabelT>::Ptr &labels,
      std::vector<PointIndices> &label_indices,
      std::vector<PointIndices> &boundary_indices) {
    (void)model_coefficients;
    (void)inlier_indices;
    (void)labels;
    (void)label_indices;
    (void)boundary_indices;
    regions.clear();
    oracle_hooks::area_queue().clear();
    for (const auto &cr : oracle_hooks::canned_regions()) {
      PlanarRegion<PointT> r;
      r.centroid_ = Eigen::Vector3f(cr.centroid[0], cr.centroid[1], cr.centroid[2]);
      r.coefficients_ =
          Eigen::Vector4f(cr.coeffs[0], cr.coeffs[1], cr.coeffs[2], cr.coeffs[3]);
      r.contour_.resize(cr.contour_count);
      regions.push_back(r);
      // areas are consumed in region order, but ONLY for regions whose
      // boundary passes the >100 gate — queue them all; the gate skips
      // without consuming exactly like the real call pattern (the area
      // call happens inside the boundary>100 branch)
    }
    for (const auto &cr : oracle_hooks::canned_regions())
      if (cr.contour_count > 100)
        oracle_hooks::area_queue().push_back(cr.area);
  }
};

} // namespace pcl

#include "pcl/ModelCoefficients.h"

#endif
