// <binders.h> stub: tools.h includes this removed legacy libstdc++ header but
// uses nothing from it.
#ifndef ORACLE_BINDERS_H
#define ORACLE_BINDERS_H
#endif
