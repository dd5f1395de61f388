// Timing harness for the reference planners + quadtree (configs from
// `benchmark/hastar.cpp`, `benchmark/rrtstar.cpp`, `benchmark/quadtree.cpp`)
// with plain chrono timing (Google Benchmark is not installed here).
// Links against the unmodified reference sources.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>
#include <opencv2/opencv.hpp>

#include "hastar.h"
#include "quadtree.h"
#include "rrtstar.h"
#include "util.h"

using clk = std::chrono::steady_clock;

static double secs_since(clk::time_point t0)
{
    return std::chrono::duration<double>(clk::now() - t0).count();
}

static void bench_hastar(const char* img, int iters)
{
    // `benchmark/hastar.cpp:10-33`
    cv::Mat map = cv::imread(img, cv::IMREAD_GRAYSCALE);
    const cv::Mat kernel = cv::getStructuringElement(cv::MORPH_ELLIPSE, {15, 15});
    cv::erode(map, map, kernel);
    cv::threshold(map, map, 128, 255, cv::THRESH_BINARY);

    const double vel = 10;
    const double steer = 40 * M_PI / 180;
    const double length = vel * std::tan(steer) / (10 * M_PI / 180);
    // `benchmark/hastar.cpp:26-27` uses {250,450}->{650,250}, but i=650 is
    // out of bounds on the 599-row floor plan (degenerate run); use the
    // RRT* benchmark's in-bounds endpoints for a meaningful baseline.
    const slam::Pose A = slam::image_coordinates_to_pose(map, {150, 450});
    const slam::Pose B = slam::image_coordinates_to_pose(map, {450, 750});

    auto finder = slam::HybridAStar(map, A, B, vel, steer, length, 5, 3, 5, true);
    const auto t0 = clk::now();
    for (int k = 0; k < iters; ++k)
    {
        while (!finder.pathfind(nullptr)) {}
        finder.reset(map, A, B, vel, steer, length, 5, 3, 5, true);
    }
    printf("{\"bench\": \"ref_hastar\", \"iters\": %d, \"pathfind_ms\": %.2f}\n",
           iters, 1e3 * secs_since(t0) / iters);
}

static void bench_rrtstar(const char* img, int iters)
{
    // `benchmark/rrtstar.cpp:10-31`
    cv::Mat map = cv::imread(img, cv::IMREAD_GRAYSCALE);
    cv::threshold(map, map, 128, 1.0, cv::THRESH_BINARY);
    map.convertTo(map, CV_64F);
    const cv::Mat kernel = cv::getStructuringElement(cv::MORPH_ELLIPSE, {15, 15});
    cv::erode(map, map, kernel);

    const auto t0 = clk::now();
    for (int k = 0; k < iters; ++k)
    {
        auto finder = slam::RRTStar(map, {150, 450}, {450, 750}, 20, 50, 1234);
        while (!finder.pathfind(nullptr)) {}
    }
    printf("{\"bench\": \"ref_rrtstar\", \"iters\": %d, \"pathfind_ms\": %.2f}\n",
           iters, 1e3 * secs_since(t0) / iters);
}

static void bench_quadtree(int iters)
{
    // `benchmark/quadtree.cpp:7-64`
    constexpr unsigned n_points = 1000000;
    constexpr int max_val = 10000;
    std::default_random_engine device(0);
    std::uniform_int_distribution<int> dist(0, max_val);
    std::vector<std::tuple<int, int>> points;
    points.reserve(n_points);
    for (unsigned i = 0; i < n_points; ++i)
    {
        const int x = dist(device);
        const int y = dist(device);
        points.emplace_back(x, y);
    }

    auto t0 = clk::now();
    for (int k = 0; k < iters; ++k)
    {
        slam::QuadTree tree;
        for (const auto& [x, y] : points) tree.add({x, max_val - y}, nullptr);
    }
    const double insert_s = secs_since(t0) / iters;

    slam::QuadTree tree;
    for (const auto& [x, y] : points) tree.add({x, max_val - y}, nullptr);
    std::uniform_int_distribution<int> dist2(1, max_val / 10);
    constexpr unsigned n_boxes = 1000;
    std::vector<std::tuple<slam::Coordinate, slam::Coordinate>> bboxes;
    for (unsigned i = 0; i < n_boxes; ++i)
    {
        const int tx = dist(device);
        const int by = dist(device);
        const int bx = tx + dist2(device);
        const int ty = by + dist2(device);
        bboxes.push_back({{tx, max_val - ty}, {bx, max_val - by}});
    }
    t0 = clk::now();
    size_t total = 0;
    for (int k = 0; k < iters; ++k)
        for (const auto& [ul, br] : bboxes) total += tree.range_query(ul, br).size();
    const double query_s = secs_since(t0) / iters;

    printf("{\"bench\": \"ref_quadtree\", \"iters\": %d, "
           "\"insert_pts_per_s\": %.0f, \"range_queries_per_s\": %.0f, "
           "\"total_hits\": %zu}\n",
           iters, n_points / insert_s, n_boxes / query_s, total);
}

int main(int argc, char** argv)
{
    const char* which = argc > 1 ? argv[1] : "all";
    const char* img = argc > 2 ? argv[2] : "/root/reference/assets/floor_plan.png";
    const int iters = argc > 3 ? atoi(argv[3]) : 0;

    if (!strcmp(which, "hastar") || !strcmp(which, "all"))
        bench_hastar(img, iters ? iters : 20);
    if (!strcmp(which, "rrtstar") || !strcmp(which, "all"))
        bench_rrtstar(img, iters ? iters : 5);
    if (!strcmp(which, "quadtree") || !strcmp(which, "all"))
        bench_quadtree(iters ? iters : 3);
    return 0;
}
