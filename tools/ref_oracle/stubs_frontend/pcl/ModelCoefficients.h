#ifndef ORACLE_FE_PCL_MODEL_COEFFICIENTS_H
#define ORACLE_FE_PCL_MODEL_COEFFICIENTS_H
#include <memory>
#include <vector>
namespace pcl {
struct ModelCoefficients {
  typedef std::shared_ptr<ModelCoefficients> Ptr;
  std::vector<float> values;
};
} // namespace pcl
#endif
