#include "pcl/point_cloud.h"
#include <memory>
namespace boost { using std::shared_ptr; }
