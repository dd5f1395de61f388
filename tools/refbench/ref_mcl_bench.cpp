// Timing harness for the REFERENCE C++ implementation (/root/reference),
// used to record measured baseline numbers into BASELINE_MEASURED.json.
//
// The reference ships Google-Benchmark mains (`benchmark/mcl.cpp`) but that
// library is not installed here, so this standalone main reproduces the same
// benchmark *configuration* (25 particles, 90 beams, 1600x900 canvas,
// floor_plan.png, odometry {2.5, 0.02, 0.02}, alphas {5e-4,5e-4,1e-2,1e-2} —
// `benchmark/mcl.cpp:11-64`) with plain chrono timing. Links against the
// unmodified reference sources; nothing here is part of the slam_tpu library.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <opencv2/opencv.hpp>
#include <tuple>
#include <vector>

#include "fake_lidar.h"
#include "mcl.h"
#include "motion.h"
#include "pose.h"
#include "util.h"

int main(int argc, char** argv)
{
    const char* img = argc > 1 ? argv[1] : "/root/reference/assets/floor_plan.png";
    const int n_particles = argc > 2 ? atoi(argv[2]) : 25;
    const int iters = argc > 3 ? atoi(argv[3]) : 100;

    cv::Mat map = cv::imread(img, cv::IMREAD_GRAYSCALE);
    if (map.empty())
    {
        fprintf(stderr, "failed to load %s\n", img);
        return 1;
    }
    cv::threshold(map, map, 128, 1.0, cv::THRESH_BINARY);
    map.convertTo(map, CV_32S);

    slam::FakeLidar lidar(0, M_PI, 500, 5, 90);
    const slam::Pose scanner_offset = {0, 30, 0};
    slam::MCL mcl(n_particles, {1600, 900});
    slam::Pose real_position{400, 400, M_PI};

    const slam::Pose sensor_position =
        slam::MCL::sensor_position(real_position, scanner_offset);
    const std::vector<slam::Pose> hits = lidar.scan(map, sensor_position);
    std::vector<std::tuple<double, double>> scans;
    const double range = lidar.stop - lidar.start;
    const double astep = range / lidar.n_rays;
    int i = 0;
    for (const slam::Pose& hit : hits)
    {
        double dist = lidar.max_dist;
        if (hit.x != -1)
            dist = std::hypot(hit.y - sensor_position.y, hit.x - sensor_position.x);
        scans.push_back({i++ * astep - range / 2, dist});
    }

    // Warmup (compile caches, first-touch page faults).
    for (int k = 0; k < 3; ++k)
    {
        mcl.predict({2.5, 0.02, 0.02}, {0.0005, 0.0005, 0.01, 0.01});
        mcl.update(scans, 5.0, lidar.max_dist, scanner_offset);
    }

    const auto t0 = std::chrono::steady_clock::now();
    for (int k = 0; k < iters; ++k)
    {
        mcl.predict({2.5, 0.02, 0.02}, {0.0005, 0.0005, 0.01, 0.01});
        mcl.update(scans, 5.0, lidar.max_dist, scanner_offset);
    }
    const auto t1 = std::chrono::steady_clock::now();
    const double secs = std::chrono::duration<double>(t1 - t0).count();

    printf("{\"bench\": \"ref_mcl\", \"n_particles\": %d, \"iters\": %d, "
           "\"step_ms\": %.3f, \"particle_updates_per_s\": %.1f}\n",
           n_particles, iters, 1e3 * secs / iters,
           n_particles * iters / secs);
    return 0;
}
