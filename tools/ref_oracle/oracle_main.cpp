// Reference-code parity oracle.
//
// Compiles the UNMODIFIED reference headers from /root/reference/include
// (tools.h, ps_graph_slam/ros_utils.hpp, ps_graph_slam/keyframe_updater.hpp,
// ps_graph_slam/data_association.h) against stubbed ROS/g2o/PCL headers and
// executes them over fixed-seed randomized inputs, dumping inputs + outputs
// as JSON. The committed golden file (tests/golden/ref_oracle.json) pins the
// JAX/numpy reimplementations in semantic_slam_tpu to values produced by the
// *actual reference source code*, breaking the self-transcription circularity
// (VERDICT round 1, task 1).
//
// Deliberately NOT exercised (documented in docs/PARITY.md):
//   * same-(type,plane_type) duplicate detections within one non-first frame
//     whose earlier duplicate creates a new landmark: the reference would
//     dereference an unassigned g2o node pointer (data_association.h:378 via
//     :122) — undefined behavior, no goldens can exist.
//
// Build/run: tools/ref_oracle/build.sh  (uses the Eigen headers vendored by
// the tensorflow wheel; compiled -O2 -DNDEBUG to match the reference's
// Release build, where its Eigen size-mismatch quirks are live).

#include <cstdint>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "ros/ros.h"

#include "ps_graph_slam/data_association.h"
#include "ps_graph_slam/keyframe_updater.hpp"
#include "ps_graph_slam/ros_utils.hpp"
#include "tools.h"

namespace {

FILE *out = nullptr;
bool first_item = true; // tracks comma state per aggregate via RAII-ish helpers

void raw(const char *s) { std::fputs(s, out); }

void comma() {
  if (!first_item)
    raw(",");
  first_item = false;
}

void key(const char *k) {
  comma();
  std::fprintf(out, "\"%s\":", k);
  first_item = true; // next value is the first of its aggregate if composite
}

void num(double v) { std::fprintf(out, "%.17g", v); }

void knum(const char *k, double v) {
  comma();
  std::fprintf(out, "\"%s\":%.17g", k, v);
}

void kstr(const char *k, const std::string &v) {
  comma();
  std::fprintf(out, "\"%s\":\"%s\"", k, v.c_str());
}

void kbool(const char *k, bool v) {
  comma();
  std::fprintf(out, "\"%s\":%s", k, v ? "true" : "false");
}

void kint(const char *k, long long v) {
  comma();
  std::fprintf(out, "\"%s\":%lld", k, v);
}

struct Arr {
  Arr(const char *k = nullptr) {
    if (k)
      key(k);
    else
      comma();
    raw("[");
    first_item = true;
  }
  ~Arr() {
    raw("]");
    first_item = false;
  }
};

struct Obj {
  Obj(const char *k = nullptr) {
    if (k)
      key(k);
    else
      comma();
    raw("{");
    first_item = true;
  }
  ~Obj() {
    raw("}");
    first_item = false;
  }
};

template <typename Mat> void kmat(const char *k, const Mat &m) {
  Arr a(k);
  for (int i = 0; i < m.rows(); ++i)
    for (int j = 0; j < m.cols(); ++j) {
      comma();
      num(static_cast<double>(m(i, j)));
    }
}

template <typename Vec> void kvec(const char *k, const Vec &v, int n = -1) {
  Arr a(k);
  int count = n < 0 ? static_cast<int>(v.size()) : n;
  for (int i = 0; i < count; ++i) {
    comma();
    num(static_cast<double>(v(i)));
  }
}

std::mt19937 rng(20260820u);

double urand(double lo, double hi) {
  return std::uniform_real_distribution<double>(lo, hi)(rng);
}

int irand(int lo, int hi) { // inclusive
  return std::uniform_int_distribution<int>(lo, hi)(rng);
}

Eigen::Vector4d rand_unit_quat() { // (x,y,z,w)
  std::normal_distribution<double> n(0.0, 1.0);
  Eigen::Vector4d q(n(rng), n(rng), n(rng), n(rng));
  q.normalize();
  return q;
}

Eigen::VectorXf rand_pose6(double tmax = 4.0, double amax = M_PI) {
  Eigen::VectorXf p(6);
  for (int i = 0; i < 3; ++i)
    p(i) = static_cast<float>(urand(-tmax, tmax));
  for (int i = 3; i < 6; ++i)
    p(i) = static_cast<float>(urand(-amax, amax));
  return p;
}

// ---------------------------------------------------------------------------
// tools.h sections
// ---------------------------------------------------------------------------

void section_tools() {
  semantic_tools st;

  {
    Arr a("transform_normals_to_world");
    for (int c = 0; c < 32; ++c) {
      Eigen::VectorXf pose = rand_pose6();
      float cam_angle = static_cast<float>(urand(-1.2, 1.2));
      Eigen::Matrix4f T;
      st.transformNormalsToWorld(pose, T, cam_angle);
      Obj o;
      kvec("pose", pose, 6);
      knum("cam_angle", cam_angle);
      kmat("T", T);
    }
  }

  {
    Arr a("transform_pose_cam_to_robot");
    for (int c = 0; c < 8; ++c) {
      float cam_angle = static_cast<float>(urand(-1.2, 1.2));
      Eigen::Matrix4f T;
      st.transformPoseFromCameraToRobot(T, cam_angle);
      Obj o;
      knum("cam_angle", cam_angle);
      kmat("T", T);
    }
  }

  {
    // transformRobotToWorld leaves column 3 / row 3 (except (3,3))
    // uninitialized in the reference — only the rotation block is defined.
    Arr a("transform_robot_to_world_rot3x3");
    for (int c = 0; c < 16; ++c) {
      Eigen::VectorXf pose = rand_pose6();
      Eigen::Matrix4f T;
      st.transformRobotToWorld(pose, T);
      Obj o;
      kvec("pose", pose, 6);
      kmat("R", T.block<3, 3>(0, 0));
    }
  }

  {
    Arr a("transform_map_points_to_world");
    for (int c = 0; c < 16; ++c) {
      Eigen::VectorXf pose = rand_pose6();
      float cam_angle = static_cast<float>(urand(-1.2, 1.2));
      Eigen::Matrix4f T;
      st.transformMapPointsToWorld(pose, T, cam_angle);
      Obj o;
      kvec("pose", pose, 6);
      knum("cam_angle", cam_angle);
      kmat("T", T);
    }
  }

  {
    // ignores its inputs beyond the constant chain (roll=pitch=yaw=0, -3.14)
    Eigen::Matrix4f T;
    st.transformIMUtoWorld(0.1f, -0.2f, 9.8f, T);
    kmat("transform_imu_to_world", T);
  }

  {
    Arr a("r2ypr");
    for (int c = 0; c < 16; ++c) {
      Eigen::Vector4d q = rand_unit_quat();
      Eigen::Matrix3d R =
          Eigen::Quaterniond(q(3), q(0), q(1), q(2)).toRotationMatrix();
      Eigen::Vector3d ypr = semantic_tools::R2ypr(R);
      Obj o;
      kmat("R", R);
      kvec("ypr_deg", ypr, 3);
    }
  }

  {
    Arr a("ypr2r");
    for (int c = 0; c < 16; ++c) {
      Eigen::Vector3d ypr(urand(-180, 180), urand(-90, 90), urand(-180, 180));
      Eigen::Matrix3d R = semantic_tools::ypr2R(ypr);
      Obj o;
      kvec("ypr_deg", ypr, 3);
      kmat("R", R);
    }
  }

  {
    Arr a("dist");
    for (int c = 0; c < 8; ++c) {
      float x1 = static_cast<float>(urand(-5, 5)), x2 = static_cast<float>(urand(-5, 5));
      float y1 = static_cast<float>(urand(-5, 5)), y2 = static_cast<float>(urand(-5, 5));
      float z1 = static_cast<float>(urand(-5, 5)), z2 = static_cast<float>(urand(-5, 5));
      float d = st.dist(x1, x2, y1, y2, z1, z2);
      Obj o;
      {
        Arr in("in");
        for (float v : {x1, x2, y1, y2, z1, z2}) {
          comma();
          num(v);
        }
      }
      knum("d", d);
    }
  }
}

// ---------------------------------------------------------------------------
// ros_utils.hpp sections
// ---------------------------------------------------------------------------

Eigen::Matrix4f rand_se3_mat() {
  Eigen::Vector4d q = rand_unit_quat();
  Eigen::Matrix3d R =
      Eigen::Quaterniond(q(3), q(0), q(1), q(2)).toRotationMatrix();
  Eigen::Matrix4f M = Eigen::Matrix4f::Identity();
  M.block<3, 3>(0, 0) = R.cast<float>();
  for (int i = 0; i < 3; ++i)
    M(i, 3) = static_cast<float>(urand(-4, 4));
  return M;
}

nav_msgs::OdometryPtr make_odom(const Eigen::Vector3d &t,
                                const Eigen::Vector4d &q_xyzw) {
  nav_msgs::OdometryPtr m(new nav_msgs::Odometry());
  m->pose.pose.position.x = t(0);
  m->pose.pose.position.y = t(1);
  m->pose.pose.position.z = t(2);
  m->pose.pose.orientation.x = q_xyzw(0);
  m->pose.pose.orientation.y = q_xyzw(1);
  m->pose.pose.orientation.z = q_xyzw(2);
  m->pose.pose.orientation.w = q_xyzw(3);
  return m;
}

void emit_pose_io(const Eigen::Vector3d &t, const Eigen::Vector4d &q,
                  double ox, double oy, double oz, double oqx, double oqy,
                  double oqz, double oqw) {
  kvec("pos", t, 3);
  kvec("quat_xyzw", q, 4);
  {
    Arr op("out_pos");
    comma();
    num(ox);
    comma();
    num(oy);
    comma();
    num(oz);
  }
  {
    Arr oq("out_quat_xyzw");
    comma();
    num(oqx);
    comma();
    num(oqy);
    comma();
    num(oqz);
    comma();
    num(oqw);
  }
}

void section_ros_utils() {
  {
    Arr a("matrix2vector");
    for (int c = 0; c < 16; ++c) {
      Eigen::Matrix4f M = rand_se3_mat();
      Eigen::VectorXf v = ps_graph_slam::matrix2vector(M);
      Obj o;
      kmat("M", M);
      kint("out_size", static_cast<long long>(v.size()));
      kvec("v", v, 6);
    }
  }

  {
    Arr a("pose_ned2enu");
    for (int c = 0; c < 16; ++c) {
      Eigen::Vector3d t(urand(-4, 4), urand(-4, 4), urand(-4, 4));
      Eigen::Vector4d q = rand_unit_quat();
      geometry_msgs::PoseStamped in;
      in.pose.position.x = t(0);
      in.pose.position.y = t(1);
      in.pose.position.z = t(2);
      in.pose.orientation.x = q(0);
      in.pose.orientation.y = q(1);
      in.pose.orientation.z = q(2);
      in.pose.orientation.w = q(3);
      geometry_msgs::PoseStamped outp = ps_graph_slam::poseNED2ENU(in);
      Obj o;
      emit_pose_io(t, q, outp.pose.position.x, outp.pose.position.y,
                   outp.pose.position.z, outp.pose.orientation.x,
                   outp.pose.orientation.y, outp.pose.orientation.z,
                   outp.pose.orientation.w);
    }
  }

  {
    Arr a("rot_pose_z");
    for (int c = 0; c < 16; ++c) {
      Eigen::Vector3d t(urand(-4, 4), urand(-4, 4), urand(-4, 4));
      Eigen::Vector4d q = rand_unit_quat();
      float first_yaw = static_cast<float>(urand(-M_PI, M_PI));
      auto outp = ps_graph_slam::RotPoseZ(make_odom(t, q), first_yaw);
      Obj o;
      knum("first_yaw", first_yaw);
      emit_pose_io(t, q, outp->pose.pose.position.x,
                   outp->pose.pose.position.y, outp->pose.pose.position.z,
                   outp->pose.pose.orientation.x,
                   outp->pose.pose.orientation.y,
                   outp->pose.pose.orientation.z,
                   outp->pose.pose.orientation.w);
    }
  }

  {
    Arr a("pose_cam2robot");
    for (int c = 0; c < 16; ++c) {
      Eigen::Vector3d t(urand(-4, 4), urand(-4, 4), urand(-4, 4));
      Eigen::Vector4d q = rand_unit_quat();
      auto outp = ps_graph_slam::PoseCam2Robot(make_odom(t, q));
      Obj o;
      emit_pose_io(t, q, outp->pose.pose.position.x,
                   outp->pose.pose.position.y, outp->pose.pose.position.z,
                   outp->pose.pose.orientation.x,
                   outp->pose.pose.orientation.y,
                   outp->pose.pose.orientation.z,
                   outp->pose.pose.orientation.w);
    }
  }

  {
    Arr a("odom2isometry");
    for (int c = 0; c < 8; ++c) {
      Eigen::Vector3d t(urand(-4, 4), urand(-4, 4), urand(-4, 4));
      Eigen::Vector4d q = rand_unit_quat();
      nav_msgs::OdometryConstPtr m = make_odom(t, q);
      Eigen::Isometry3d iso = ps_graph_slam::odom2isometry(m);
      Obj o;
      kvec("pos", t, 3);
      kvec("quat_xyzw", q, 4);
      kmat("T", iso.matrix());
    }
  }
}

// ---------------------------------------------------------------------------
// keyframe_updater.hpp section
// ---------------------------------------------------------------------------

void section_keyframe_updater() {
  struct Params {
    double dt, da, dtime;
  };
  const Params param_sets[4] = {
      {0.5, 0.5, 1.0}, // reference defaults
      {0.2, 0.3, 2.0},
      {1.0, 0.2, 1.0},
      {0.5, 0.5, 3.0},
  };

  Arr scen("keyframe_updater");
  for (const Params &ps : param_sets) {
    ros::oracle_params::clear();
    ros::oracle_params::doubles()["~keyframe_delta_trans"] = ps.dt;
    ros::oracle_params::doubles()["~keyframe_delta_angle"] = ps.da;
    ros::oracle_params::doubles()["~keyframe_delta_time"] = ps.dtime;

    ps_graph_slam::KeyframeUpdater upd;

    Obj so;
    knum("delta_trans", ps.dt);
    knum("delta_angle", ps.da);
    knum("delta_time", ps.dtime);

    // random-walk pose; time steps mixing sub-second / >1 s / exact-second
    Eigen::Vector3d t(0, 0, 0);
    Eigen::Vector4d q(0, 0, 0, 1);
    uint32_t sec = 1000, nsec = 0;

    Arr steps("steps");
    for (int i = 0; i < 40; ++i) {
      if (i > 0) {
        // translation step: mostly small, sometimes big
        double scale = (irand(0, 3) == 0) ? 0.6 : 0.12;
        for (int k = 0; k < 3; ++k)
          t(k) += urand(-scale, scale);
        // rotation step: perturb quaternion
        std::normal_distribution<double> n(0.0, (irand(0, 3) == 0) ? 0.25 : 0.05);
        Eigen::Vector4d dq(n(rng), n(rng), n(rng), 1.0);
        dq.normalize();
        Eigen::Quaterniond qq(q(3), q(0), q(1), q(2));
        Eigen::Quaterniond qd(dq(3), dq(0), dq(1), dq(2));
        Eigen::Quaterniond qn = qq * qd;
        q << qn.x(), qn.y(), qn.z(), qn.w();
        // time step: 0.2-0.4 s usually, occasionally >= 1 s, sometimes exact
        int choice = irand(0, 5);
        uint64_t step_ns;
        if (choice == 0)
          step_ns = 1000000000ull; // exactly 1 s
        else if (choice == 1)
          step_ns = 1300000000ull + static_cast<uint64_t>(irand(0, 500)) * 1000000ull;
        else
          step_ns = 200000000ull + static_cast<uint64_t>(irand(0, 300)) * 1000000ull;
        uint64_t total = static_cast<uint64_t>(nsec) + step_ns;
        sec += static_cast<uint32_t>(total / 1000000000ull);
        nsec = static_cast<uint32_t>(total % 1000000000ull);
      }

      Eigen::Isometry3d pose = Eigen::Isometry3d::Identity();
      pose.linear() =
          Eigen::Quaterniond(q(3), q(0), q(1), q(2)).toRotationMatrix();
      pose.translation() = t;

      bool accepted = upd.update(pose, ros::Time(sec, nsec));

      Obj st;
      kvec("pos", t, 3);
      kvec("quat_xyzw", q, 4);
      kint("t_sec", sec);
      kint("t_nsec", nsec);
      kbool("accepted", accepted);
      knum("accum_distance", upd.get_accum_distance());
    }
  }
}

// ---------------------------------------------------------------------------
// data_association.h section
// ---------------------------------------------------------------------------

const char *kTypes[4] = {"chair", "tvmonitor", "bucket", "car"};
const char *kPlaneTypes[2] = {"horizontal", "vertical"};

struct DetSpec {
  std::string type, plane_type;
  Eigen::Vector3f pose; // cam frame
  Eigen::Vector4f normal;
};

// cam-frame point whose reference-chain world pose lands near `target_world`
Eigen::Vector3f cam_point_for_world(semantic_tools &st,
                                    const Eigen::VectorXf &robot_pose,
                                    float cam_angle,
                                    const Eigen::Vector3f &target_world) {
  Eigen::Matrix4f T;
  st.transformNormalsToWorld(robot_pose, T, cam_angle);
  Eigen::Vector4f rel;
  rel << target_world(0) - robot_pose(0), target_world(1) - robot_pose(1),
      target_world(2) - robot_pose(2), 1.0f;
  Eigen::Matrix4f Tinv = T.inverse();
  Eigen::Vector4f cam = Tinv * rel;
  return cam.head<3>();
}

void run_association_scenario(const char *name, bool use_maha, bool use_eq,
                              double maha_thres, double eq_thres,
                              double noise_low, double noise_high,
                              bool use_rtab, int n_frames, int max_dets,
                              bool perturb_nodes) {
  ros::oracle_params::clear();
  ros::oracle_params::doubles()["~maha_dist_thres"] = maha_thres;
  ros::oracle_params::doubles()["~eq_dist_thres"] = eq_thres;
  ros::oracle_params::doubles()["~land_noise_low"] = noise_low;
  ros::oracle_params::doubles()["~land_noise_high"] = noise_high;
  ros::oracle_params::bools()["~use_maha_dist"] = use_maha;
  ros::oracle_params::bools()["~use_eq_dist"] = use_eq;
  ros::oracle_params::bools()["~use_rtab_map_odom"] = use_rtab;

  data_association da(false);
  semantic_tools st;
  float cam_angle = static_cast<float>(urand(0.0, 0.7));

  std::vector<g2o::VertexPointXYZ *> nodes; // by landmark id
  // (type,plane) pairs that exist in the table BEFORE the current frame
  std::vector<std::pair<int, int>> known_pairs;

  Obj so;
  kstr("name", name);
  kbool("use_maha", use_maha);
  kbool("use_eq", use_eq);
  knum("maha_thres", maha_thres);
  knum("eq_thres", eq_thres);
  knum("noise_low", noise_low);
  knum("noise_high", noise_high);
  kbool("use_rtab", use_rtab);
  knum("cam_angle", cam_angle);

  Eigen::VectorXf robot_pose(6);
  robot_pose.setZero();

  {
  Arr frames("frames");
  for (int f = 0; f < n_frames; ++f) {
    // random-walk robot pose (full 6-dof, small angles)
    for (int k = 0; k < 3; ++k)
      robot_pose(k) += static_cast<float>(urand(-0.4, 0.4));
    for (int k = 3; k < 6; ++k)
      robot_pose(k) += static_cast<float>(urand(-0.12, 0.12));

    int n_dets = irand(1, max_dets);

    std::vector<detected_object> dets;
    std::vector<landmark> table;
    da.getMappedLandmarks(table);

    // (type,plane) pairs used so far in this frame; duplicates are only safe
    // in the first frame (first_object_ path has no association loop)
    std::vector<std::pair<int, int>> frame_pairs;

    for (int d = 0; d < n_dets; ++d) {
      bool placed = false;
      for (int attempt = 0; attempt < 40 && !placed; ++attempt) {
        std::pair<int, int> pair(irand(0, 3), irand(0, 1));
        if (f > 0) {
          bool dup = false;
          for (auto &p : frame_pairs)
            if (p == pair)
              dup = true;
          if (dup)
            continue; // same-frame duplicate pair after frame 0 risks the
                      // unassigned-node UB (see file header) — regenerate
        }

        detected_object det;
        det.id = d;
        det.prob = static_cast<float>(urand(0.5, 1.0));
        det.num_points = static_cast<float>(irand(100, 2000));
        det.type = kTypes[pair.first];
        det.plane_type = kPlaneTypes[pair.second];

        // ~60%: aim near an existing landmark of the same pair (match-ish);
        // else: random point (likely new)
        Eigen::Vector3f target;
        bool aimed = false;
        if (urand(0, 1) < 0.6) {
          std::vector<int> cands;
          for (size_t i = 0; i < table.size(); ++i)
            if (table[i].type == det.type &&
                table[i].plane_type == det.plane_type)
              cands.push_back(static_cast<int>(i));
          if (!cands.empty()) {
            const landmark &l =
                table[cands[irand(0, static_cast<int>(cands.size()) - 1)]];
            target =
                l.pose + Eigen::Vector3f(static_cast<float>(urand(-0.3, 0.3)),
                                         static_cast<float>(urand(-0.3, 0.3)),
                                         static_cast<float>(urand(-0.3, 0.3)));
            aimed = true;
          }
        }
        if (!aimed)
          target = Eigen::Vector3f(static_cast<float>(urand(-5, 5)),
                                   static_cast<float>(urand(-5, 5)),
                                   static_cast<float>(urand(0, 3)));

        det.pose = cam_point_for_world(st, robot_pose, cam_angle, target);

        std::normal_distribution<double> n(0.0, 1.0);
        Eigen::Vector3f nv(static_cast<float>(n(rng)),
                           static_cast<float>(n(rng)),
                           static_cast<float>(n(rng)));
        nv.normalize();
        det.normal_orientation << nv(0), nv(1), nv(2),
            static_cast<float>(urand(-2, 2));

        // --- carryover-UB guard (frames after the first) -----------------
        // The reference does not reset distance_min across detections of a
        // frame, and on a carryover "match" uses an UNINITIALIZED landmark
        // index (data_association.h:102,107,195-198) — undefined behavior.
        // Such outcomes are not parity targets. Probe with COPIES of the
        // reference associator itself: outcome of this det processed in one
        // call with the frame prefix (carryover path) vs in a fresh call
        // after the prefix (fresh-min path). Accept only when both agree,
        // so every golden outcome is UB-free. This uses no reimplemented
        // math — only the reference code, so no circularity.
        if (f > 0 && !dets.empty()) {
          std::vector<detected_object> with_det = dets;
          with_det.push_back(det);
          data_association probe1 = da;
          std::vector<landmark> r1 =
              probe1.find_matches(with_det, robot_pose, cam_angle);
          data_association probe2 = da;
          probe2.find_matches(dets, robot_pose, cam_angle);
          std::vector<detected_object> just_det{det};
          std::vector<landmark> r2 =
              probe2.find_matches(just_det, robot_pose, cam_angle);
          const landmark &a = r1.back();
          const landmark &b = r2.back();
          bool agree = (a.is_new_landmark == b.is_new_landmark) &&
                       (a.is_new_landmark || a.id == b.id);
          if (!agree)
            continue; // carryover-affected — regenerate this detection
        }

        frame_pairs.push_back(pair);
        dets.push_back(det);
        placed = true;
      }
    }
    n_dets = static_cast<int>(dets.size());

    std::vector<landmark> result = da.find_matches(dets, robot_pose, cam_angle);

    // engine emulation (semantic_graph_slam.cpp:159-167): assign fresh g2o
    // nodes to new landmarks, estimate seeded from the landmark world pose
    for (auto &lm : result) {
      if (lm.is_new_landmark) {
        auto *node = new g2o::VertexPointXYZ();
        node->setEstimate(lm.pose.cast<double>());
        if (static_cast<size_t>(lm.id) >= nodes.size())
          nodes.resize(lm.id + 1, nullptr);
        nodes[lm.id] = node;
        da.assignLandmarkNode(lm.id, node);
      }
    }

    Obj fo;
    kvec("robot_pose", robot_pose, 6);
    {
      Arr adets("detections");
      for (auto &det : dets) {
        Obj dobj;
        kstr("type", det.type);
        kstr("plane_type", det.plane_type);
        kvec("pose_cam", det.pose, 3);
        kvec("normal_cam", det.normal_orientation, 4);
      }
    }
    {
      Arr ares("results");
      for (auto &lm : result) {
        Obj robj;
        kbool("is_new", lm.is_new_landmark);
        kint("id", lm.id);
        kvec("pose_world", lm.pose, 3);
        kvec("local_pose", lm.local_pose, 3);
        kvec("normal_world", lm.normal_orientation, 4);
      }
    }

    // optimizer emulation between frames: move node estimates, set covs
    if (perturb_nodes) {
      std::vector<landmark> cur;
      da.getMappedLandmarks(cur);
      Arr upd("updates");
      for (size_t i = 0; i < cur.size(); ++i) {
        std::normal_distribution<double> n(0.0, 0.08);
        Eigen::Vector3d est = nodes[i]->estimate() +
                              Eigen::Vector3d(n(rng), n(rng), n(rng));
        nodes[i]->setEstimate(est);

        Eigen::Matrix3f A;
        for (int r = 0; r < 3; ++r)
          for (int c2 = 0; c2 < 3; ++c2)
            A(r, c2) = static_cast<float>(urand(-0.3, 0.3));
        Eigen::Matrix3f cov =
            A * A.transpose() + 0.05f * Eigen::Matrix3f::Identity();
        da.setLandmarkCovs(static_cast<int>(i), cov);

        Obj uo;
        kint("id", static_cast<long long>(i));
        kvec("node_estimate", est, 3);
        kmat("cov", cov);
      }
    }

    // refresh known pairs for the next frame
    std::vector<landmark> cur2;
    da.getMappedLandmarks(cur2);
    known_pairs.clear();
    for (auto &l : cur2)
      for (int ti = 0; ti < 4; ++ti)
        for (int pi = 0; pi < 2; ++pi)
          if (l.type == kTypes[ti] && l.plane_type == kPlaneTypes[pi])
            known_pairs.push_back({ti, pi});
    (void)known_pairs;
  }
  } // close frames array

  // final landmark table
  std::vector<landmark> final_table;
  da.getMappedLandmarks(final_table);
  Arr tbl("final_table");
  for (auto &l : final_table) {
    Obj lo;
    kint("id", l.id);
    kstr("type", l.type);
    kstr("plane_type", l.plane_type);
    kvec("pose_world", l.pose, 3);
    kvec("normal_world", l.normal_orientation, 4);
  }
}

void section_association() {
  Arr a("association");
  run_association_scenario("eq_single", false, true, 0.5, 1.5, 0.5, 0.9, false,
                           14, 1, false);
  run_association_scenario("eq_multi", false, true, 0.5, 1.5, 0.5, 0.9, false,
                           10, 3, false);
  run_association_scenario("maha_single", true, false, 0.5, 1.5, 0.5, 0.9,
                           false, 14, 1, true);
  run_association_scenario("maha_multi", true, false, 0.5, 1.5, 0.5, 0.9,
                           false, 10, 3, true);
  run_association_scenario("eq_rtab", false, true, 0.5, 1.5, 0.5, 0.9, true, 8,
                           1, false);
  run_association_scenario("maha_loose", true, false, 2.0, 1.5, 0.9, 0.9,
                           false, 10, 2, true);
}

} // namespace

// ---------------------------------------------------------------------------
// whole-session composition section
// ---------------------------------------------------------------------------
//
// The unit sections above pin each reference piece separately; this section
// pins their COMPOSITION over a whole synthetic VIO session — the de-facto
// program of semantic_graph_slam.cpp executed by the real reference code:
//
//   VIOCallback (:234-287): KeyframeUpdater gating with the
//   detection-availability override (update_keyframes_using_detections_),
//   dead-reckoned robot_pose_ accumulation on NON-keyframe frames only (the
//   keyframe snapshot therefore LAGS odometry by the keyframe frame's own
//   increment), prev_odom_ bookkeeping;
//   run() (:58-102): immediate queue processing, association at the
//   robot_pose_ SNAPSHOT (semantic_data_ass :206-223), landmark node
//   assignment (empty_landmark_queue :152-179), and the optimize() refresh
//   robot_pose_ = last keyframe estimate — gated by GraphSLAM::optimize's
//   <10-edge skip (graph_slam.cpp:182-186), so early keyframes do NOT
//   refresh and the dead-reckoning gap compounds. With the oracle's stub
//   g2o, estimates equal odometry — exactly the engine with optimization
//   disabled, which is how the Python twin replays this golden.
//
// Detections are generated with the same carryover-UB probe guard as
// run_association_scenario (reference-code probes, no reimplemented math).

std::vector<detected_object>
gen_session_dets(data_association &da, semantic_tools &st,
                 const Eigen::VectorXf &robot_pose6, float cam_angle,
                 int max_dets, bool da_has_history) {
  std::vector<detected_object> dets;
  std::vector<landmark> table;
  da.getMappedLandmarks(table);
  std::vector<std::pair<int, int>> frame_pairs;
  int n_dets = irand(1, max_dets);
  for (int d = 0; d < n_dets; ++d) {
    bool placed = false;
    for (int attempt = 0; attempt < 40 && !placed; ++attempt) {
      std::pair<int, int> pair(irand(0, 3), irand(0, 1));
      if (da_has_history) {
        bool dup = false;
        for (auto &p : frame_pairs)
          if (p == pair)
            dup = true;
        if (dup)
          continue; // same-frame duplicate pair risks the unassigned-node UB
      }
      detected_object det;
      det.id = d;
      det.prob = static_cast<float>(urand(0.5, 1.0));
      det.num_points = static_cast<float>(irand(100, 2000));
      det.type = kTypes[pair.first];
      det.plane_type = kPlaneTypes[pair.second];

      Eigen::Vector3f target;
      bool aimed = false;
      if (urand(0, 1) < 0.6) {
        std::vector<int> cands;
        for (size_t i = 0; i < table.size(); ++i)
          if (table[i].type == det.type && table[i].plane_type == det.plane_type)
            cands.push_back(static_cast<int>(i));
        if (!cands.empty()) {
          const landmark &l =
              table[cands[irand(0, static_cast<int>(cands.size()) - 1)]];
          target =
              l.pose + Eigen::Vector3f(static_cast<float>(urand(-0.3, 0.3)),
                                       static_cast<float>(urand(-0.3, 0.3)),
                                       static_cast<float>(urand(-0.3, 0.3)));
          aimed = true;
        }
      }
      if (!aimed)
        target = Eigen::Vector3f(static_cast<float>(urand(-5, 5)),
                                 static_cast<float>(urand(-5, 5)),
                                 static_cast<float>(urand(0, 3)));
      det.pose = cam_point_for_world(st, robot_pose6, cam_angle, target);

      std::normal_distribution<double> n(0.0, 1.0);
      Eigen::Vector3f nv(static_cast<float>(n(rng)), static_cast<float>(n(rng)),
                         static_cast<float>(n(rng)));
      nv.normalize();
      det.normal_orientation << nv(0), nv(1), nv(2),
          static_cast<float>(urand(-2, 2));

      // carryover-UB probe guard (see run_association_scenario)
      if (da_has_history && !dets.empty()) {
        std::vector<detected_object> with_det = dets;
        with_det.push_back(det);
        data_association probe1 = da;
        std::vector<landmark> r1 =
            probe1.find_matches(with_det, robot_pose6, cam_angle);
        data_association probe2 = da;
        probe2.find_matches(dets, robot_pose6, cam_angle);
        std::vector<detected_object> just_det{det};
        std::vector<landmark> r2 =
            probe2.find_matches(just_det, robot_pose6, cam_angle);
        const landmark &a = r1.back();
        const landmark &b = r2.back();
        bool agree = (a.is_new_landmark == b.is_new_landmark) &&
                     (a.is_new_landmark || a.id == b.id);
        if (!agree)
          continue;
      }
      frame_pairs.push_back(pair);
      dets.push_back(det);
      placed = true;
    }
  }
  return dets;
}

void run_session_scenario(const char *name, bool use_maha, bool use_eq,
                          double maha_thres, double eq_thres, int n_frames,
                          int max_dets) {
  ros::oracle_params::clear();
  ros::oracle_params::doubles()["~maha_dist_thres"] = maha_thres;
  ros::oracle_params::doubles()["~eq_dist_thres"] = eq_thres;
  ros::oracle_params::doubles()["~land_noise_low"] = 0.5;
  ros::oracle_params::doubles()["~land_noise_high"] = 0.9;
  ros::oracle_params::bools()["~use_maha_dist"] = use_maha;
  ros::oracle_params::bools()["~use_eq_dist"] = use_eq;
  ros::oracle_params::bools()["~use_rtab_map_odom"] = false;
  // keyframe_updater defaults (launch/*.launch values)
  ros::oracle_params::doubles()["~keyframe_delta_trans"] = 0.5;
  ros::oracle_params::doubles()["~keyframe_delta_angle"] = 0.5;
  ros::oracle_params::doubles()["~keyframe_delta_time"] = 1.0;

  ps_graph_slam::KeyframeUpdater upd;
  data_association da(false);
  semantic_tools st;
  float cam_angle = static_cast<float>(urand(0.0, 0.7));

  Obj so;
  kstr("name", name);
  kbool("use_maha", use_maha);
  kbool("use_eq", use_eq);
  knum("maha_thres", maha_thres);
  knum("eq_thres", eq_thres);
  knum("cam_angle", cam_angle);

  // VIOCallback state (semantic_graph_slam.cpp:44, 234-287)
  Eigen::Isometry3d robot_pose_ = Eigen::Isometry3d::Identity();
  Eigen::Isometry3d prev_odom_ = Eigen::Isometry3d::Identity();
  bool first_key_added_ = false;
  bool da_has_history = false;
  long long n_keyframes = 0;
  long long n_edges = 0; // odometry + landmark-observation edges

  // odometry random walk
  Eigen::Vector3d t(0, 0, 0);
  Eigen::Quaterniond q = Eigen::Quaterniond::Identity();
  uint32_t sec = 2000, nsec = 0;

  {
    Arr frames("frames");
    for (int f = 0; f < n_frames; ++f) {
      if (f > 0) {
        double scale = (irand(0, 2) == 0) ? 0.35 : 0.08;
        for (int k = 0; k < 3; ++k)
          t(k) += urand(-scale, scale);
        std::normal_distribution<double> n(0.0,
                                           (irand(0, 3) == 0) ? 0.12 : 0.03);
        Eigen::Quaterniond qd(1.0, n(rng), n(rng), n(rng));
        qd.normalize();
        q = (q * qd).normalized();
        uint64_t step_ns =
            (irand(0, 4) == 0)
                ? 1000000000ull
                : 150000000ull + static_cast<uint64_t>(irand(0, 250)) * 1000000ull;
        uint64_t total = static_cast<uint64_t>(nsec) + step_ns;
        sec += static_cast<uint32_t>(total / 1000000000ull);
        nsec = static_cast<uint32_t>(total % 1000000000ull);
      }
      Eigen::Isometry3d odom = Eigen::Isometry3d::Identity();
      odom.linear() = q.toRotationMatrix();
      odom.translation() = t;

      bool det_available = irand(0, 2) != 0; // ~2/3 of frames see detections

      Obj fo;
      kvec("odom_pos", t, 3);
      Eigen::Vector4d qx(q.x(), q.y(), q.z(), q.w());
      kvec("odom_quat_xyzw", qx, 4);
      kint("t_sec", sec);
      kint("t_nsec", nsec);
      kbool("det_available", det_available);

      // ---- VIOCallback (update_keyframes_using_detections_ = true)
      bool gate = upd.update(odom, ros::Time(sec, nsec));
      if (!gate && !det_available) {
        if (first_key_added_) {
          Eigen::Isometry3d pose_inc = prev_odom_.inverse() * odom;
          robot_pose_ = robot_pose_ * pose_inc;
        }
        prev_odom_ = odom;
        kbool("is_keyframe", false);
        continue;
      }
      double accum_d = upd.get_accum_distance();
      Eigen::Isometry3d kf_robot_pose = robot_pose_; // snapshot: NO pose_inc
      prev_odom_ = odom;
      first_key_added_ = true;

      kbool("is_keyframe", true);
      knum("accum_distance", accum_d);
      Eigen::VectorXf rp6 = ps_graph_slam::matrix2vector(
          kf_robot_pose.matrix().cast<float>());
      kvec("robot_pose6", rp6, 6);

      // ---- run(): immediate processing of the queued keyframe
      n_keyframes += 1;
      if (n_keyframes >= 2)
        n_edges += 1; // odometry chain edge (empty_keyframe_queue :133-141)

      if (det_available) {
        std::vector<detected_object> dets =
            gen_session_dets(da, st, rp6, cam_angle, max_dets, da_has_history);
        std::vector<landmark> result = da.find_matches(dets, rp6, cam_angle);
        da_has_history = true;
        for (auto &lm : result) {
          if (lm.is_new_landmark) {
            auto *node = new g2o::VertexPointXYZ();
            node->setEstimate(lm.pose.cast<double>());
            da.assignLandmarkNode(lm.id, node);
          }
          n_edges += 1; // one pose-landmark edge per result entry
        }
        {
          Arr adets("detections");
          for (auto &det : dets) {
            Obj dobj;
            kstr("type", det.type);
            kstr("plane_type", det.plane_type);
            knum("prob", det.prob);
            knum("num_points", det.num_points);
            kvec("pose_cam", det.pose, 3);
            kvec("normal_cam", det.normal_orientation, 4);
          }
        }
        {
          Arr ares("results");
          for (auto &lm : result) {
            Obj robj;
            kbool("is_new", lm.is_new_landmark);
            kint("id", lm.id);
            kvec("pose_world", lm.pose, 3);
            kvec("local_pose", lm.local_pose, 3);
          }
        }
      }
      kint("n_edges", n_edges);

      // ---- optimize() refresh (graph_slam.cpp:182-186 <10-edge skip; with
      // the stub g2o the last keyframe's estimate equals its odometry)
      bool optimized = n_edges >= 10;
      kbool("optimized", optimized);
      if (optimized)
        robot_pose_ = odom;
    }
  }

  // final landmark table
  std::vector<landmark> final_table;
  da.getMappedLandmarks(final_table);
  Arr tbl("final_table");
  for (auto &l : final_table) {
    Obj lo;
    kint("id", l.id);
    kstr("type", l.type);
    kstr("plane_type", l.plane_type);
    kvec("pose_world", l.pose, 3);
    kvec("normal_world", l.normal_orientation, 4);
  }
}

void section_session() {
  Arr a("session");
  run_session_scenario("session_eq", false, true, 0.5, 1.5, 60, 2);
  run_session_scenario("session_maha", true, false, 0.5, 1.5, 60, 2);
}

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "ref_oracle.json";
  out = std::fopen(path, "w");
  if (!out) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 1;
  }

  raw("{");
  first_item = true;
  {
    Obj meta("meta");
    kstr("generator", "tools/ref_oracle/oracle_main.cpp");
    kstr("reference", "/root/reference/include (unmodified headers)");
    kint("seed", 20260820);
    kint("eigen_world", EIGEN_WORLD_VERSION);
    kint("eigen_major", EIGEN_MAJOR_VERSION);
    kint("eigen_minor", EIGEN_MINOR_VERSION);
  }
  section_tools();
  section_ros_utils();
  section_keyframe_updater();
  section_association();
  section_session();
  raw("}\n");
  std::fclose(out);
  std::fprintf(stderr, "wrote %s\n", path);
  return 0;
}
