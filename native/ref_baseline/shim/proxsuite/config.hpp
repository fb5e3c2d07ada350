// Shim for the CMake-generated proxsuite/config.hpp (version macros only),
// so the read-only reference checkout compiles without running its CMake.
#ifndef PROXSUITE_CONFIG_HPP
#define PROXSUITE_CONFIG_HPP

#define PROXSUITE_VERSION "0.7.2"
#define PROXSUITE_MAJOR_VERSION 0
#define PROXSUITE_MINOR_VERSION 7
#define PROXSUITE_PATCH_VERSION 2

#define PROXSUITE_VERSION_AT_LEAST(major, minor, patch)                        \
  (PROXSUITE_MAJOR_VERSION > major ||                                          \
   (PROXSUITE_MAJOR_VERSION >= major &&                                        \
    (PROXSUITE_MINOR_VERSION > minor ||                                        \
     (PROXSUITE_MINOR_VERSION >= minor &&                                      \
      PROXSUITE_PATCH_VERSION >= patch))))

#endif
