// nav_msgs/Odometry stub matching the wire-schema field layout.
#ifndef ORACLE_NAV_MSGS_ODOMETRY_H
#define ORACLE_NAV_MSGS_ODOMETRY_H

#include <memory>
#include <string>

#include "geometry_msgs/TransformStamped.h"

namespace nav_msgs {

struct Odometry {
  std_msgs::Header header;
  std::string child_frame_id;
  geometry_msgs::PoseWithCovariance pose;
  geometry_msgs::TwistWithCovariance twist;

  typedef std::shared_ptr<Odometry> Ptr;
  typedef std::shared_ptr<const Odometry> ConstPtr;
};

typedef Odometry::Ptr OdometryPtr;
typedef Odometry::ConstPtr OdometryConstPtr;

} // namespace nav_msgs

#endif
