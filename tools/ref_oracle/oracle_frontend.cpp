// Reference-code parity oracle — PERCEPTION FRONTEND.
//
// Compiles the UNMODIFIED reference frontend
// (/root/reference/include/planar_segmentation/point_cloud_segmentation.h +
// /root/reference/src/planar_segmentation/plane_segmentation.cpp) against
// stubbed PCL/OpenCV (tools/ref_oracle/stubs_frontend) and executes it over
// oracle-controlled inputs. The PCL algorithms themselves
// (IntegralImageNormalEstimation, OrganizedMultiPlaneSegmentation,
// calculatePolygonArea) are injection points returning canned values — they
// are PCL's code, not the reference's; what the goldens pin is every line of
// REFERENCE logic around them:
//
//   * bbox crop + the one-sided "spurious" test + at(p_u,p_v) layout
//     (plane_segmentation.cpp:24-82),
//   * the normals size gate (cpp:95-97),
//   * boundary>100 + area gates, h/v classification (one-sided fabs
//     differences; vertical dot<0.5) and normal-sign canonicalization
//     (cpp:159-259),
//   * class whitelist, empty-cloud/normals skips, world-pose recipe
//     (rotate-then-add-translation, plus the height double-add) and
//     detected_object packing (point_cloud_segmentation.h:26-181).
//
// Output: tests/golden/ref_oracle_frontend.json, consumed by
// tests/test_ref_oracle_frontend.py.
//
// Build/run: tools/ref_oracle/build.sh (second stanza).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "ros/ros.h"

#include "planar_segmentation/point_cloud_segmentation.h"

namespace {

FILE *out = nullptr;
bool first_item = true;

void raw(const char *s) { std::fputs(s, out); }

void comma() {
  if (!first_item)
    raw(",");
  first_item = false;
}

void key(const char *k) {
  comma();
  std::fprintf(out, "\"%s\":", k);
  first_item = true;
}

void knum(const char *k, double v) {
  comma();
  std::fprintf(out, "\"%s\":%.17g", k, v);
}

void kint(const char *k, long long v) {
  comma();
  std::fprintf(out, "\"%s\":%lld", k, v);
}

void kstr(const char *k, const std::string &v) {
  comma();
  std::fprintf(out, "\"%s\":\"%s\"", k, v.c_str());
}

struct Obj {
  Obj() { comma(); raw("{"); first_item = true; }
  explicit Obj(const char *k) { key(k); raw("{"); first_item = true; }
  ~Obj() { raw("}"); first_item = false; }
};

struct Arr {
  explicit Arr(const char *k) { key(k); raw("["); first_item = true; }
  Arr() { comma(); raw("["); first_item = true; }
  ~Arr() { raw("]"); first_item = false; }
};

void kvec(const char *k, const float *v, int n) {
  Arr a(k);
  for (int i = 0; i < n; ++i) {
    comma();
    std::fprintf(out, "%.9g", (double)v[i]);
  }
}

// ---------------------------------------------------------------------------
// synthetic organized cloud (the crop scenarios decode this byte layout)
// ---------------------------------------------------------------------------

float cloud_x(int u, int v) { return 0.01f * u - 3.2f + 0.001f * v; }
float cloud_y(int u, int v) { return 0.002f * v - 0.48f; }
float cloud_z(int u, int v) { return 2.0f + 0.0005f * (u + v); }

sensor_msgs::PointCloud2 make_cloud2() {
  sensor_msgs::PointCloud2 pc;
  pc.width = 640;
  pc.height = 480;
  pc.point_step = 16;
  pc.row_step = pc.width * pc.point_step;
  pc.fields.resize(4);
  pc.fields[0].offset = 0;
  pc.fields[1].offset = 4;
  pc.fields[2].offset = 8;
  pc.fields[3].offset = 12;
  pc.data.resize((size_t)pc.row_step * pc.height);
  for (int v = 0; v < 480; ++v)
    for (int u = 0; u < 640; ++u) {
      size_t base = (size_t)v * pc.row_step + (size_t)u * pc.point_step;
      float x = cloud_x(u, v), y = cloud_y(u, v), z = cloud_z(u, v), rgb = 0.f;
      std::memcpy(&pc.data[base + 0], &x, 4);
      std::memcpy(&pc.data[base + 4], &y, 4);
      std::memcpy(&pc.data[base + 8], &z, 4);
      std::memcpy(&pc.data[base + 12], &rgb, 4);
    }
  return pc;
}

void set_params(double num_point_seg, double norm_point_thres,
                double planar_area) {
  ros::oracle_params::clear();
  ros::oracle_params::doubles()["~num_point_seg"] = num_point_seg;
  ros::oracle_params::doubles()["~norm_point_thres"] = norm_point_thres;
  ros::oracle_params::doubles()["~planar_area"] = planar_area;
}

void set_canned_normals(int n) {
  auto &c = pcl::oracle_hooks::canned_normals();
  c.points.clear();
  c.points.resize(n);
  for (int i = 0; i < n; ++i) {
    c.points[i].normal_x = 0.1f;
    c.points[i].normal_y = 0.2f;
    c.points[i].normal_z = -0.97f;
  }
  c.width = n;
  c.height = 1;
}

// ---------------------------------------------------------------------------
// scenario 1: bbox crop + spurious quirks
// ---------------------------------------------------------------------------

void section_crop() {
  Arr sec("crop");
  plane_segmentation seg(false);
  sensor_msgs::PointCloud2 pc = make_cloud2();

  struct Box {
    const char *name;
    int tlx, tly, w, h;
  } boxes[] = {
      {"normal", 100, 150, 60, 40},
      {"edge_exact", 580, 440, 60, 40},  // u+w == 640: NOT spurious (quirk)
      {"over_right", 600, 10, 50, 40},   // 650 > 640: spurious
      {"neg_height", 100, 100, 40, -5},  // spurious
      {"neg_origin", -20, -20, 30, 30},  // NOT spurious (one-sided test);
                                         // size_t loop wraps -> body never
                                         // runs -> crop stays default zeros
  };
  for (const auto &b : boxes) {
    semantic_SLAM::ObjectInfo oi;
    oi.type = "chair";
    oi.prob = 0.9f;
    oi.tl_x = b.tlx;
    oi.tl_y = b.tly;
    oi.width = b.w;
    oi.height = b.h;
    sensor_msgs::PointCloud2 seg_pc;
    auto so = seg.segmentPointCloudData(oi, pc, seg_pc);
    Obj o;
    kstr("name", b.name);
    kint("tl_x", b.tlx);
    kint("tl_y", b.tly);
    kint("w", b.w);
    kint("h", b.h);
    kstr("type_out", so.type);
    if (so.type != "spurious" && so.segmented_point_cloud) {
      auto &c = *so.segmented_point_cloud;
      kint("points", (long long)c.points.size());
      kint("width", c.width);
      kint("height", c.height);
      double sx = 0, sy = 0, sz = 0;
      for (auto &p : c.points) {
        sx += p.x;
        sy += p.y;
        sz += p.z;
      }
      knum("sum_x", sx);
      knum("sum_y", sy);
      knum("sum_z", sz);
      // probes pin the at(p_u,p_v) storage layout
      if (!c.points.empty() && c.width > 0 && c.height > 0) {
        float p0[3] = {c.points[0].x, c.points[0].y, c.points[0].z};
        kvec("first_point", p0, 3);
        auto &pl = c.points.back();
        float pN[3] = {pl.x, pl.y, pl.z};
        kvec("last_point", pN, 3);
        if (c.width >= 2 && c.height >= 2) {
          auto &pm = c.at(1, 2); // col 1, row 2
          float pv[3] = {pm.x, pm.y, pm.z};
          kvec("at_1_2", pv, 3);
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// scenario 2: normals size gate
// ---------------------------------------------------------------------------

void section_normals_gate() {
  Arr sec("normals_gate");
  set_params(100, 1000, 0.0);
  plane_segmentation seg(false);
  for (int n : {999, 1000, 1001}) {
    pcl::PointCloud<pcl::PointXYZRGB>::Ptr cloud(
        new pcl::PointCloud<pcl::PointXYZRGB>);
    cloud->points.resize(n);
    pcl::PointIndices::Ptr inliers(new pcl::PointIndices);
    set_canned_normals(n);
    auto normals = seg.computeNormalsFromPointCloud(cloud, inliers);
    Obj o;
    kint("in_points", n);
    kint("out_normals", (long long)normals->points.size());
  }
}

// ---------------------------------------------------------------------------
// scenario 3: h/v classification + canonicalization (multiPlaneSegmentation)
// ---------------------------------------------------------------------------

void dump_region(const pcl::oracle_hooks::CannedRegion &r) {
  Obj o;
  kvec("centroid", r.centroid, 3);
  kvec("coeffs", r.coeffs, 4);
  kint("contour", r.contour_count);
  knum("area", r.area);
}

void run_hv_case(const char *name, Eigen::VectorXf robot_pose, float cam_angle,
                 double planar_area,
                 const std::vector<pcl::oracle_hooks::CannedRegion> &regions) {
  set_params(100, 10, planar_area);
  plane_segmentation seg(false);

  semantic_tools st;
  Eigen::Matrix4f T;
  st.transformNormalsToWorld(robot_pose, T, cam_angle);
  Eigen::Vector4f h_world(0, 0, 1, 0);
  Eigen::Vector4f h_cam = T.transpose().eval() * h_world;

  pcl::oracle_hooks::canned_regions() = regions;
  pcl::PointCloud<pcl::PointXYZRGB>::Ptr cloud(
      new pcl::PointCloud<pcl::PointXYZRGB>);
  cloud->points.resize(200);
  pcl::PointCloud<pcl::Normal>::Ptr normals(new pcl::PointCloud<pcl::Normal>);
  pcl::PointIndices::Ptr inliers(new pcl::PointIndices);
  auto planes = seg.multiPlaneSegmentation(cloud, normals, inliers, T);

  Obj o;
  kstr("name", name);
  {
    Arr rp("robot_pose");
    for (int i = 0; i < 6; ++i) {
      comma();
      std::fprintf(out, "%.9g", (double)robot_pose(i));
    }
  }
  knum("cam_angle", cam_angle);
  knum("planar_area", planar_area);
  {
    float hc[4] = {h_cam(0), h_cam(1), h_cam(2), h_cam(3)};
    kvec("h_cam", hc, 4);
  }
  {
    Arr ri("regions");
    for (const auto &r : regions)
      dump_region(r);
  }
  {
    Arr po("rows");
    for (auto &p : planes) {
      Obj r;
      float row8[8];
      for (int c = 0; c < 8; ++c)
        row8[c] = p.final_pose_mat.at<float>(0, c);
      kvec("row8", row8, 8);
      kint("planar_points", (long long)p.planar_points.points.size());
    }
  }
}

void section_hv() {
  Arr sec("hv");
  Eigen::VectorXf pose(6);
  pose << 0.4f, -0.2f, 0.1f, 0.05f, -0.1f, 0.3f;
  float cam_angle = 0.3926f;

  // derive h_cam to aim region normals at specific branches
  semantic_tools st;
  Eigen::Matrix4f T;
  st.transformNormalsToWorld(pose, T, cam_angle);
  Eigen::Vector4f h = T.transpose().eval() * Eigen::Vector4f(0, 0, 1, 0);
  Eigen::Vector3f h3(h(0), h(1), h(2));
  Eigen::Vector3f v3 = h3.cross(Eigen::Vector3f(1, 0, 0)).normalized();

  auto mk = [](Eigen::Vector3f n, float d, int contour, float area,
               Eigen::Vector3f c) {
    pcl::oracle_hooks::CannedRegion r;
    r.centroid[0] = c(0);
    r.centroid[1] = c(1);
    r.centroid[2] = c(2);
    r.coeffs[0] = n(0);
    r.coeffs[1] = n(1);
    r.coeffs[2] = n(2);
    r.coeffs[3] = d;
    r.contour_count = contour;
    r.area = area;
    return r;
  };

  std::vector<pcl::oracle_hooks::CannedRegion> regions;
  // horizontal, m[1] <= 0 (no flip)
  regions.push_back(mk(h3 * (h(1) > 0 ? -1.f : 1.f), -1.2f, 150, 0.5f,
                       Eigen::Vector3f(0.3f, -0.2f, 2.1f)));
  // horizontal with m[1] > 0 (upward-normal flip branch)
  regions.push_back(mk(h3 * (h(1) > 0 ? 1.f : -1.f), 0.7f, 150, 0.5f,
                       Eigen::Vector3f(-0.1f, 0.4f, 1.8f)));
  // vertical (fails one-sided horizontal test, dot < 0.5), m[0] > 0 flip
  regions.push_back(mk(v3 * (v3(0) > 0 ? 1.f : -1.f) +
                           Eigen::Vector3f(0.6f, 0, 0),
                       -0.4f, 150, 0.5f, Eigen::Vector3f(1.0f, 0.1f, 2.5f)));
  // vertical, m[0] <= 0 (no flip)
  regions.push_back(mk((v3 * (v3(0) > 0 ? 1.f : -1.f) +
                        Eigen::Vector3f(0.6f, 0, 0)) *
                           -1.f,
                       0.4f, 150, 0.5f, Eigen::Vector3f(-1.0f, 0.2f, 2.2f)));
  // neither: dot >= 0.5 but fails horizontal one-sided test
  {
    Eigen::Vector3f n = (0.8f * h3.normalized() +
                         Eigen::Vector3f(std::fabs(h(0)) + 0.5f, 0, 0))
                            .normalized();
    if (h3.normalized().dot(n) < 0.5f)
      n = (h3.normalized() + Eigen::Vector3f(std::fabs(h(0)) + 0.8f, 0, 0))
              .normalized();
    regions.push_back(mk(n, -2.0f, 150, 0.5f, Eigen::Vector3f(0, 0, 3.0f)));
  }
  // boundary gate: contour == 100 (NOT > 100) dropped
  regions.push_back(mk(h3, -1.0f, 100, 0.5f, Eigen::Vector3f(0, 0, 1.0f)));
  // area gate: area below planar_area dropped
  regions.push_back(mk(h3, -1.0f, 150, 0.05f, Eigen::Vector3f(0, 0, 1.0f)));

  run_hv_case("mixed", pose, cam_angle, 0.1, regions);

  // flat pose (strict/clean chains agree there; used by the python pin)
  Eigen::VectorXf flat(6);
  flat << 1.0f, 2.0f, 0.5f, 0.0f, 0.0f, 0.7f;
  run_hv_case("flat", flat, 0.2f, 0.0, regions);
}

// ---------------------------------------------------------------------------
// scenario 4: full segmentallPointCloudData (whitelist, skips, packing,
// world-pose recipe)
// ---------------------------------------------------------------------------

void section_segment_all() {
  Arr sec("segment_all");
  set_params(100, 500, 0.0);

  Eigen::VectorXf pose(6);
  pose << 0.8f, -0.5f, 0.3f, 0.0f, 0.0f, -0.4f;
  float cam_angle = 0.3926f;

  point_cloud_segmentation pcs(false);
  sensor_msgs::PointCloud2 pc = make_cloud2();

  // canned inner outputs: enough normals to pass the gate; two regions
  semantic_tools st;
  Eigen::Matrix4f T;
  st.transformNormalsToWorld(pose, T, cam_angle);
  Eigen::Vector4f h = T.transpose().eval() * Eigen::Vector4f(0, 0, 1, 0);
  Eigen::Vector3f h3(h(0), h(1), h(2));
  Eigen::Vector3f v3 = h3.cross(Eigen::Vector3f(0, 1, 0)).normalized();
  set_canned_normals(2400);
  std::vector<pcl::oracle_hooks::CannedRegion> regions;
  {
    pcl::oracle_hooks::CannedRegion r;
    Eigen::Vector3f n = h3 * (h(1) > 0 ? -1.f : 1.f);
    r.centroid[0] = 0.25f;
    r.centroid[1] = -0.35f;
    r.centroid[2] = 2.4f;
    r.coeffs[0] = n(0);
    r.coeffs[1] = n(1);
    r.coeffs[2] = n(2);
    r.coeffs[3] = -1.1f;
    r.contour_count = 140;
    r.area = 0.8f;
    regions.push_back(r);
    Eigen::Vector3f nv =
        (v3 * (v3(0) > 0 ? 1.f : -1.f) + Eigen::Vector3f(0.6f, 0, 0));
    r.centroid[0] = -0.6f;
    r.centroid[1] = 0.15f;
    r.centroid[2] = 1.7f;
    r.coeffs[0] = nv(0);
    r.coeffs[1] = nv(1);
    r.coeffs[2] = nv(2);
    r.coeffs[3] = 0.3f;
    r.contour_count = 260;
    r.area = 1.4f;
    regions.push_back(r);
  }
  pcl::oracle_hooks::canned_regions() = regions;

  std::vector<semantic_SLAM::ObjectInfo> objects(4);
  objects[0].type = "chair";
  objects[0].prob = 0.9f;
  objects[0].tl_x = 100;
  objects[0].tl_y = 150;
  objects[0].width = 60;
  objects[0].height = 40;
  objects[1].type = "person"; // not whitelisted -> skipped
  objects[1].prob = 0.8f;
  objects[1].tl_x = 10;
  objects[1].tl_y = 10;
  objects[1].width = 50;
  objects[1].height = 50;
  objects[2].type = "bucket"; // spurious box -> skipped
  objects[2].prob = 0.7f;
  objects[2].tl_x = 600;
  objects[2].tl_y = 10;
  objects[2].width = 50;
  objects[2].height = 40;
  objects[3].type = "tvmonitor";
  objects[3].prob = 0.95f;
  objects[3].tl_x = 200;
  objects[3].tl_y = 200;
  objects[3].width = 80;
  objects[3].height = 50;

  auto dets = pcs.segmentallPointCloudData(pose, cam_angle, objects, pc);

  Obj o;
  {
    Arr rp("robot_pose");
    for (int i = 0; i < 6; ++i) {
      comma();
      std::fprintf(out, "%.9g", (double)pose(i));
    }
  }
  knum("cam_angle", cam_angle);
  {
    Arr ri("regions");
    for (const auto &r : regions)
      dump_region(r);
  }
  {
    Arr ob("objects");
    for (auto &oi : objects) {
      Obj x;
      kstr("type", oi.type);
      knum("prob", oi.prob);
      kint("tl_x", oi.tl_x);
      kint("tl_y", oi.tl_y);
      kint("w", oi.width);
      kint("h", oi.height);
    }
  }
  {
    Arr dd("detections");
    for (auto &d : dets) {
      Obj x;
      kstr("type", d.type);
      kstr("plane_type", d.plane_type);
      knum("prob", d.prob);
      knum("num_points", d.num_points);
      float p3[3] = {d.pose(0), d.pose(1), d.pose(2)};
      kvec("pose_cam", p3, 3);
      float w3[3] = {d.world_pose(0), d.world_pose(1), d.world_pose(2)};
      kvec("world_pose", w3, 3);
      float n4[4] = {d.normal_orientation(0), d.normal_orientation(1),
                     d.normal_orientation(2), d.normal_orientation(3)};
      kvec("normal_orientation", n4, 4);
    }
  }
}

} // namespace

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "ref_oracle_frontend.json";
  out = std::fopen(path, "w");
  if (!out) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 1;
  }
  raw("{");
  first_item = true;
  {
    Obj meta("meta");
    kstr("generator", "tools/ref_oracle/oracle_frontend.cpp");
    kstr("reference",
         "/root/reference include/planar_segmentation + "
         "src/planar_segmentation/plane_segmentation.cpp (unmodified)");
    kint("eigen_world", EIGEN_WORLD_VERSION);
  }
  set_params(100, 1000, 0.0);
  section_crop();
  section_normals_gate();
  section_hv();
  section_segment_all();
  raw("}\n");
  std::fclose(out);
  std::fprintf(stderr, "wrote %s\n", path);
  return 0;
}
