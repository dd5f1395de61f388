#!/bin/bash
# Build the reference-library timing harnesses against the unmodified
# reference sources (read-only at /root/reference). Artifacts go to
# /root/repo/.build (gitignored).
set -euo pipefail
REF=/root/reference
OUT=/root/repo/.build
mkdir -p "$OUT"
CXXFLAGS="-O3 -march=native -std=c++17 -w"
INC="-I$REF/slam -I$REF/slam/thirdparty $(pkg-config --cflags opencv4)"
LIBS="$(pkg-config --libs opencv4) -lpthread"
SRCS="$REF/slam/mcl.cpp $REF/slam/motion.cpp $REF/slam/raycast.cpp \
      $REF/slam/util.cpp $REF/slam/fake_lidar.cpp $REF/slam/thirdparty/log.cpp"

g++ $CXXFLAGS $INC /root/repo/tools/refbench/ref_mcl_bench.cpp $SRCS $LIBS \
    -o "$OUT/ref_mcl_bench"
echo "built $OUT/ref_mcl_bench"

g++ $CXXFLAGS $INC /root/repo/tools/refbench/ref_mcl_traj.cpp $SRCS $LIBS \
    -o "$OUT/ref_mcl_traj"
echo "built $OUT/ref_mcl_traj"

PSRCS="$REF/slam/hastar.cpp $REF/slam/rrtstar.cpp $REF/slam/kdtree.cpp \
       $REF/slam/quadtree.cpp $REF/slam/raycast.cpp $REF/slam/util.cpp \
       $REF/slam/thirdparty/log.cpp"
g++ $CXXFLAGS $INC /root/repo/tools/refbench/ref_planners_bench.cpp $PSRCS $LIBS \
    -o "$OUT/ref_planners_bench"
echo "built $OUT/ref_planners_bench"
