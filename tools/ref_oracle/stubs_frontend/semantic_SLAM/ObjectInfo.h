#include "semantic_SLAM/DetectedObjects.h"
