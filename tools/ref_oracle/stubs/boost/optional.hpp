// boost::optional stub (declared in keyframe.hpp includes; never instantiated
// by the oracle translation unit).
#ifndef ORACLE_BOOST_OPTIONAL_HPP
#define ORACLE_BOOST_OPTIONAL_HPP
namespace boost {
template <typename T> class optional {
public:
  optional() : has_(false) {}
  optional(const T &v) : has_(true), v_(v) {}
  explicit operator bool() const { return has_; }
  const T &operator*() const { return v_; }
  T &operator*() { return v_; }
private:
  bool has_;
  T v_{};
};
} // namespace boost
#endif
