// Minimal cv::Mat for compiling the reference frontend outside OpenCV.
// Only the API surface plane_segmentation.cpp touches: zeros/ctor, rows/
// cols, empty, at<float|int>, row(i), push_back(row|scalar), plus the
// kmeans/TermCriteria symbols its dead legacy path references (kmeans is
// never executed by the oracle; it aborts if reached).
#ifndef ORACLE_CV_CORE_HPP
#define ORACLE_CV_CORE_HPP

#include <cassert>
#include <cstdlib>
#include <cstring>
#include <vector>

#define CV_32F 5
#define CV_32S 4
#define CV_TERMCRIT_ITER 1
#define CV_TERMCRIT_EPS 2

namespace cv {

class Mat {
public:
  int rows = 0, cols = 0, type_ = CV_32F;
  std::vector<float> f;
  std::vector<int> i;

  Mat() {}
  Mat(int r, int c, int t) : rows(r), cols(c), type_(t) {
    if (t == CV_32F)
      f.assign((size_t)r * c, 0.0f);
    else
      i.assign((size_t)r * c, 0);
  }
  static Mat zeros(int r, int c, int t) { return Mat(r, c, t); }
  bool empty() const { return rows == 0 || cols == 0; }

  template <typename T> T &at(int r, int c);
  template <typename T> const T &at(int r, int c) const;

  Mat row(int r) const {
    Mat out(1, cols, type_);
    for (int c = 0; c < cols; ++c) {
      if (type_ == CV_32F)
        out.f[c] = f[(size_t)r * cols + c];
      else
        out.i[c] = i[(size_t)r * cols + c];
    }
    return out;
  }
  void push_back(const Mat &m) {
    assert(m.type_ == type_ && (cols == 0 || m.cols == cols));
    cols = m.cols;
    if (type_ == CV_32F)
      f.insert(f.end(), m.f.begin(), m.f.end());
    else
      i.insert(i.end(), m.i.begin(), m.i.end());
    rows += m.rows;
  }
  void push_back(float v) {
    assert(type_ == CV_32F && (cols == 0 || cols == 1));
    cols = 1;
    f.push_back(v);
    rows += 1;
  }
};

template <> inline float &Mat::at<float>(int r, int c) {
  return f[(size_t)r * cols + c];
}
template <> inline const float &Mat::at<float>(int r, int c) const {
  return f[(size_t)r * cols + c];
}
template <> inline int &Mat::at<int>(int r, int c) {
  return i[(size_t)r * cols + c];
}
template <> inline const int &Mat::at<int>(int r, int c) const {
  return i[(size_t)r * cols + c];
}

struct TermCriteria {
  int type = 0, maxCount = 0;
  double epsilon = 0;
  TermCriteria() {}
  TermCriteria(int t, int m, double e) : type(t), maxCount(m), epsilon(e) {}
};

enum { KMEANS_RANDOM_CENTERS = 0 };

// dead legacy path only (clusterAndSegmentAllPlanes) — never reached by the
// oracle scenarios; abort loudly if it ever is
inline double kmeans(Mat, int, Mat &, TermCriteria, int, int, Mat &) {
  std::abort();
}

} // namespace cv

#endif
