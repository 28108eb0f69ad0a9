// g2o::VertexSE3 stub (pointer-only usage in the compiled reference headers).
#ifndef ORACLE_G2O_VERTEX_SE3_H
#define ORACLE_G2O_VERTEX_SE3_H
namespace g2o {
class VertexSE3 {};
} // namespace g2o
#endif
