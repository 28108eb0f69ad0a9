// g2o::VertexPointXYZ stub: the reference's data_association only calls
// estimate(); the oracle harness plays the engine's role of assigning nodes
// (semantic_graph_slam.cpp:159-167) and moving estimates (optimizer).
#ifndef ORACLE_G2O_VERTEX_POINTXYZ_H
#define ORACLE_G2O_VERTEX_POINTXYZ_H
#include <Eigen/Dense>
namespace g2o {
class VertexPointXYZ {
public:
  VertexPointXYZ() : est_(Eigen::Vector3d::Zero()) {}
  const Eigen::Vector3d &estimate() const { return est_; }
  void setEstimate(const Eigen::Vector3d &e) { est_ = e; }
private:
  Eigen::Vector3d est_;
};
} // namespace g2o
#endif
