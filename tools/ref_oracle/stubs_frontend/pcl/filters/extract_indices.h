#ifndef ORACLE_FE_PCL_EXTRACT_INDICES_H
#define ORACLE_FE_PCL_EXTRACT_INDICES_H
#include "pcl/point_cloud.h"
#endif
