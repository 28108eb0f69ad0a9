// Minimal tf stub for compiling the reference's ros_utils.hpp outside ROS.
//
// The ONLY pieces of actual math a stub has to supply are the standard
// quaternion<->Euler primitives from ROS tf's LinearMath (which is Bullet's
// btQuaternion/btMatrix3x3). They are ported here faithfully from the public
// tf2/LinearMath sources (Quaternion.h setRPY; Matrix3x3.h setRotation +
// getEulerYPR solution 1). Everything reference-specific (the Euler-vector
// rotation tricks, the 3.14/1.57 constants, the chain order) executes from
// the unmodified reference headers.
#ifndef ORACLE_TF_EIGEN_H
#define ORACLE_TF_EIGEN_H

#include <cmath>

namespace tf {

class Quaternion {
public:
  double m_x = 0, m_y = 0, m_z = 0, m_w = 1;
  Quaternion() {}
  Quaternion(double x, double y, double z, double w)
      : m_x(x), m_y(y), m_z(z), m_w(w) {}

  double x() const { return m_x; }
  double y() const { return m_y; }
  double z() const { return m_z; }
  double w() const { return m_w; }

  double length2() const {
    return m_x * m_x + m_y * m_y + m_z * m_z + m_w * m_w;
  }

  // tf2::Quaternion::setRPY (LinearMath/Quaternion.h)
  void setRPY(double roll, double pitch, double yaw) {
    double halfYaw = yaw * 0.5;
    double halfPitch = pitch * 0.5;
    double halfRoll = roll * 0.5;
    double cosYaw = std::cos(halfYaw);
    double sinYaw = std::sin(halfYaw);
    double cosPitch = std::cos(halfPitch);
    double sinPitch = std::sin(halfPitch);
    double cosRoll = std::cos(halfRoll);
    double sinRoll = std::sin(halfRoll);
    m_x = sinRoll * cosPitch * cosYaw - cosRoll * sinPitch * sinYaw;
    m_y = cosRoll * sinPitch * cosYaw + sinRoll * cosPitch * sinYaw;
    m_z = cosRoll * cosPitch * sinYaw - sinRoll * sinPitch * cosYaw;
    m_w = cosRoll * cosPitch * cosYaw + sinRoll * sinPitch * sinYaw;
  }
};

class Matrix3x3 {
public:
  // row-major rows m[r][c]
  double m[3][3];

  explicit Matrix3x3(const Quaternion &q) { setRotation(q); }

  // tf2::Matrix3x3::setRotation (LinearMath/Matrix3x3.h)
  void setRotation(const Quaternion &q) {
    double d = q.length2();
    double s = 2.0 / d;
    double xs = q.x() * s, ys = q.y() * s, zs = q.z() * s;
    double wx = q.w() * xs, wy = q.w() * ys, wz = q.w() * zs;
    double xx = q.x() * xs, xy = q.x() * ys, xz = q.x() * zs;
    double yy = q.y() * ys, yz = q.y() * zs, zz = q.z() * zs;
    m[0][0] = 1.0 - (yy + zz);
    m[0][1] = xy - wz;
    m[0][2] = xz + wy;
    m[1][0] = xy + wz;
    m[1][1] = 1.0 - (xx + zz);
    m[1][2] = yz - wx;
    m[2][0] = xz - wy;
    m[2][1] = yz + wx;
    m[2][2] = 1.0 - (xx + yy);
  }

  // tf2::Matrix3x3::getEulerYPR, solution_number = 1
  void getEulerYPR(double &yaw, double &pitch, double &roll) const {
    // gimbal-lock branches exactly as in LinearMath/Matrix3x3.h
    if (std::fabs(m[2][0]) >= 1.0) {
      yaw = 0.0;
      if (m[2][0] < 0) {
        double delta = std::atan2(m[0][1], m[0][2]);
        pitch = M_PI / 2.0;
        roll = delta;
      } else {
        double delta = std::atan2(-m[0][1], -m[0][2]);
        pitch = -M_PI / 2.0;
        roll = delta;
      }
      return;
    }
    pitch = -std::asin(m[2][0]);
    roll = std::atan2(m[2][1] / std::cos(pitch), m[2][2] / std::cos(pitch));
    yaw = std::atan2(m[1][0] / std::cos(pitch), m[0][0] / std::cos(pitch));
  }
};

inline Quaternion createQuaternionFromRPY(double roll, double pitch,
                                          double yaw) {
  Quaternion q;
  q.setRPY(roll, pitch, yaw);
  return q;
}

} // namespace tf

#endif
