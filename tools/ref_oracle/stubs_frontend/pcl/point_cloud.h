// pcl::PointCloud for the frontend oracle. at(col,row) follows real PCL's
// organized indexing (points[row*width+col]) — load-bearing for the
// reference's bbox crop (plane_segmentation.cpp:45-73, at(p_u,p_v)).
#ifndef ORACLE_FE_PCL_POINT_CLOUD_H
#define ORACLE_FE_PCL_POINT_CLOUD_H

#include <memory>
#include <vector>

#include "pcl/point_types.h"

namespace pcl {

struct PCLHeader {
  unsigned seq = 0;
  unsigned long long stamp = 0;
};

template <typename PointT> struct PointCloud {
  typedef std::shared_ptr<PointCloud<PointT>> Ptr;
  typedef std::shared_ptr<const PointCloud<PointT>> ConstPtr;
  std::vector<PointT> points;
  unsigned width = 0, height = 0;
  bool is_dense = false;
  PCLHeader header;

  size_t size() const { return points.size(); }
  bool empty() const { return points.empty(); }
  void clear() { points.clear(); width = height = 0; }
  void resize(size_t n) { points.resize(n); }
  void reserve(size_t n) { points.reserve(n); }
  void push_back(const PointT &p) { points.push_back(p); }
  PointT &at(int col, int row) { return points[(size_t)row * width + col]; }
  const PointT &at(int col, int row) const {
    return points[(size_t)row * width + col];
  }
  typename std::vector<PointT>::iterator begin() { return points.begin(); }
  typename std::vector<PointT>::iterator end() { return points.end(); }
};

struct PointIndices {
  typedef std::shared_ptr<PointIndices> Ptr;
  std::vector<int> indices;
};

} // namespace pcl

#endif
