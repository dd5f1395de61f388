// Trajectory-quality harness for the REFERENCE MCL: drives the filter along
// a deterministic ground-truth trajectory (odometry applied exactly; scans
// from FakeLidar at the ground-truth sensor pose — the benchmark/mcl.cpp
// fixture without its fixed-scan shortcut) and prints per-step ground truth
// and estimates as JSON lines. The slam_tpu side replays the identical
// trajectory/scans (same exact-DDA scan semantics) so absolute trajectory
// error is directly comparable. Config mirrors apps/grid_slam.cpp:88-99.

#include <cmath>
#include <cstdio>
#include <opencv2/opencv.hpp>
#include <tuple>
#include <vector>

#include "fake_lidar.h"
#include "mcl.h"
#include "pose.h"
#include "util.h"

int main(int argc, char** argv)
{
    const char* img = argc > 1 ? argv[1] : "/root/reference/assets/floor_plan.png";
    const int n_particles = argc > 2 ? atoi(argv[2]) : 200;
    const int steps = argc > 3 ? atoi(argv[3]) : 120;
    const double trans = argc > 4 ? atof(argv[4]) : 2.5;
    const double rot = argc > 5 ? atof(argv[5]) : 0.02;

    cv::Mat map = cv::imread(img, cv::IMREAD_GRAYSCALE);
    if (map.empty()) return 1;
    cv::threshold(map, map, 128, 1.0, cv::THRESH_BINARY);
    map.convertTo(map, CV_32S);

    slam::FakeLidar lidar(0, 2 * M_PI, 500, 5, 90);
    const slam::Pose scanner_offset = {0, 30, 0};
    slam::MCL mcl(n_particles, {map.cols, map.rows});

    // Start at the canvas-center default the filter initializes to
    // (slam/mcl.cpp:22-25), so the filter begins converged.
    slam::Pose gt = mcl.starting_pose();

    const double range = lidar.stop - lidar.start;
    const double astep = range / lidar.n_rays;

    for (int t = 0; t < steps; ++t)
    {
        const slam::Odometry odom = {rot / 2, trans, rot / 2};
        // Deterministic ground truth: integrate the command exactly.
        gt.theta += odom.rotation_1;
        gt.x += odom.translation * std::cos(gt.theta);
        gt.y += odom.translation * std::sin(gt.theta);
        gt.theta += odom.rotation_2;

        mcl.predict(odom, {0.0005, 0.0005, 0.01, 0.01});

        const slam::Pose sensor = slam::MCL::sensor_position(gt, scanner_offset);
        const std::vector<slam::Pose> hits = lidar.scan(map, sensor);
        std::vector<std::tuple<double, double>> scans;
        int i = 0;
        for (const slam::Pose& hit : hits)
        {
            double dist = lidar.max_dist;
            if (hit.x != -1)
                dist = std::hypot(hit.y - sensor.y, hit.x - sensor.x);
            scans.push_back({i++ * astep - range / 2, dist});
        }
        mcl.update(scans, 5.0, lidar.max_dist, scanner_offset);

        // Best particle (sorted to front after resample, slam/mcl.cpp:236).
        const slam::Particle& best = mcl.get_particles().front();
        double mx = 0, my = 0;
        for (const auto& p : mcl.get_particles())
        {
            mx += p.pose.x;
            my += p.pose.y;
        }
        mx /= mcl.get_particles().size();
        my /= mcl.get_particles().size();
        printf("{\"t\": %d, \"gt\": [%.3f, %.3f, %.4f], \"best\": [%.3f, %.3f], "
               "\"mean\": [%.3f, %.3f]}\n",
               t, gt.x, gt.y, gt.theta, best.pose.x, best.pose.y, mx, my);
    }
    return 0;
}
