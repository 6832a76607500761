// Native CPU comparison renderer (the benchmark baseline producer).
//
// BASELINE.md's wall-clock target compares the TPU renderer against "a
// native Rust runner on a 32-core CPU" — which the reference does not
// ship (it is GPU-only), so the benchmark harness must produce the
// comparison point itself (BASELINE.md note). This is that runner: a
// C++ path tracer with the *reference's architecture* — brute-force
// linear closest-hit scan (no BVH, matching shader.wgsl:314-329),
// Lambertian/metal/dielectric scatter, RTiOW final scene — multithreaded
// with std::thread. It reports Mrays/s (traced segments / wall-clock).
//
// This is an independent implementation (fresh code, RTiOW semantics),
// not a port of the reference's Rust/WGSL.
//
// Build: make -C native cpu  → native/mrt_cpu_bench
// Run:   ./native/mrt_cpu_bench [width height spp depth threads]

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Vec {
  float x = 0, y = 0, z = 0;
  Vec operator+(const Vec& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec operator-(const Vec& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec operator*(float s) const { return {x * s, y * s, z * s}; }
  Vec operator*(const Vec& o) const { return {x * o.x, y * o.y, z * o.z}; }
};
float dot(const Vec& a, const Vec& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
Vec cross(const Vec& a, const Vec& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
Vec norm(const Vec& a) { return a * (1.0f / std::sqrt(dot(a, a))); }

enum MatTy { LAMB = 1, METAL = 2, DIEL = 3 };

struct Sphere {
  Vec c;
  float r;
  int ty;
  Vec albedo;
  float fuzz = 0, ior = 1.5f;
};

struct Rng {
  std::mt19937 gen;
  std::uniform_real_distribution<float> uni{0.0f, 1.0f};
  explicit Rng(uint64_t seed) : gen(seed) {}
  float f() { return uni(gen); }
  Vec unit_sphere() {
    float z = 1 - 2 * f();
    float r = std::sqrt(std::max(0.0f, 1 - z * z));
    float p = 6.2831853f * f();
    return {r * std::cos(p), r * std::sin(p), z};
  }
  Vec unit_ball() { return unit_sphere() * std::cbrt(f()); }
  void unit_disk(float& dx, float& dy) {
    float r = std::sqrt(f());
    float p = 6.2831853f * f();
    dx = r * std::cos(p);
    dy = r * std::sin(p);
  }
};

std::vector<Sphere> final_scene() {
  // RTiOW final scene, deterministic.
  std::mt19937 gen(0);
  std::uniform_real_distribution<float> uni(0.0f, 1.0f);
  std::vector<Sphere> s;
  s.push_back({{0, -1000, 0}, 1000, LAMB, {0.5, 0.5, 0.5}});
  for (int a = -11; a < 11; ++a)
    for (int b = -11; b < 11; ++b) {
      float choose = uni(gen);
      Vec c{a + 0.9f * uni(gen), 0.2f, b + 0.9f * uni(gen)};
      Vec d = c - Vec{4, 0.2f, 0};
      if (std::sqrt(dot(d, d)) <= 0.9f) continue;
      if (choose < 0.8f)
        s.push_back({c, 0.2f, LAMB,
                     {uni(gen) * uni(gen), uni(gen) * uni(gen), uni(gen) * uni(gen)}});
      else if (choose < 0.95f)
        s.push_back({c, 0.2f, METAL,
                     {0.5f + 0.5f * uni(gen), 0.5f + 0.5f * uni(gen),
                      0.5f + 0.5f * uni(gen)},
                     0.5f * uni(gen)});
      else
        s.push_back({c, 0.2f, DIEL, {1, 1, 1}});
    }
  s.push_back({{0, 1, 0}, 1, DIEL, {1, 1, 1}});
  s.push_back({{-4, 1, 0}, 1, LAMB, {0.4f, 0.2f, 0.1f}});
  s.push_back({{4, 1, 0}, 1, METAL, {0.7f, 0.6f, 0.5f}, 0});
  return s;
}

struct Hit {
  float t;
  int idx;
};

// Brute-force linear scan, as in the reference (shader.wgsl:314-329).
bool world_hit(const std::vector<Sphere>& w, const Vec& o, const Vec& d,
               float tmin, float tmax, Hit* out) {
  float best = tmax;
  int bi = -1;
  for (size_t i = 0; i < w.size(); ++i) {
    Vec oc = o - w[i].c;
    float b = dot(oc, d);
    float c = dot(oc, oc) - w[i].r * w[i].r;
    float disc = b * b - c;
    if (disc < 0) continue;
    float sq = std::sqrt(disc);
    float t = -b - sq;
    if (t < tmin || t >= best) t = -b + sq;
    if (t < tmin || t >= best) continue;
    best = t;
    bi = static_cast<int>(i);
  }
  if (bi < 0) return false;
  out->t = best;
  out->idx = bi;
  return true;
}

Vec sky(float y) {
  float t = 0.5f * y + 0.5f;
  return Vec{1, 1, 1} * (1 - t) + Vec{0.5f, 0.7f, 1.0f} * t;
}

Vec reflect(const Vec& v, const Vec& n) { return v - n * (2 * dot(v, n)); }

Vec trace(const std::vector<Sphere>& w, Vec o, Vec d, int depth, Rng& rng,
          uint64_t* segs) {
  Vec atten{1, 1, 1};
  for (int i = 0; i < depth; ++i) {
    ++*segs;
    Hit h;
    if (!world_hit(w, o, d, 1e-3f, 1e4f, &h)) return atten * sky(d.y);
    const Sphere& s = w[h.idx];
    Vec p = o + d * h.t;
    Vec n = (p - s.c) * (1.0f / s.r);
    bool front = dot(n, d) <= 0;
    if (!front) n = n * -1.0f;
    Vec nd;
    if (s.ty == LAMB) {
      nd = n + rng.unit_sphere();
      if (dot(nd, nd) == 0) nd = n;
      atten = atten * s.albedo;
    } else if (s.ty == METAL) {
      nd = reflect(d, n) + rng.unit_ball() * s.fuzz;
      if (dot(nd, n) <= 0) return {0, 0, 0};
      atten = atten * s.albedo;
    } else {
      float ratio = front ? 1.0f / s.ior : s.ior;
      float cost = std::min(-dot(d, n), 1.0f);
      float sint = std::sqrt(std::max(0.0f, 1 - cost * cost));
      float r0 = (1 - ratio) / (1 + ratio);
      r0 *= r0;
      float refl = r0 + (1 - r0) * std::pow(1 - cost, 5.0f);
      if (ratio * sint > 1.0f || refl > rng.f()) {
        nd = reflect(d, n);
      } else {
        Vec perp = (d + n * cost) * ratio;
        Vec par = n * -std::sqrt(std::fabs(1 - dot(perp, perp)));
        nd = perp + par;
      }
    }
    o = p;
    d = norm(nd);
  }
  return {0, 0, 0};
}

}  // namespace

int main(int argc, char** argv) {
  int W = argc > 1 ? std::atoi(argv[1]) : 400;
  int H = argc > 2 ? std::atoi(argv[2]) : 267;
  int spp = argc > 3 ? std::atoi(argv[3]) : 4;
  int depth = argc > 4 ? std::atoi(argv[4]) : 50;
  int threads = argc > 5 ? std::atoi(argv[5])
                         : static_cast<int>(std::thread::hardware_concurrency());

  auto world = final_scene();
  // Camera: lookfrom (13,2,3) → (0,0,0), vfov 20, focus 10, aperture 0.1.
  Vec lookfrom{13, 2, 3}, lookat{0, 0, 0}, vup{0, 1, 0};
  float aspect = float(W) / H;
  float h = std::tan(20.0f * 3.14159265f / 180 / 2);
  float vph = 2 * h, vpw = aspect * vph, focus = 10.0f, lens_r = 0.05f;
  Vec cw = norm(lookfrom - lookat);
  Vec cu = norm(cross(vup, cw));
  Vec cv = cross(cw, cu);
  Vec horiz = cu * (focus * vpw), vert = cv * (focus * vph);
  Vec llc = lookfrom - horiz * 0.5f - vert * 0.5f - cw * focus;

  std::atomic<uint64_t> total_segs{0};
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> pool;
  std::atomic<int> next_row{0};
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      Rng rng(0x9E3779B97F4A7C15ull * (t + 1));
      uint64_t segs = 0;
      double sum = 0;
      int row;
      while ((row = next_row.fetch_add(1)) < H) {
        for (int x = 0; x < W; ++x)
          for (int sIdx = 0; sIdx < spp; ++sIdx) {
            float sxy = (x + rng.f()) / W;
            float sy = 1.0f - (row + rng.f()) / H;
            float dx, dy;
            rng.unit_disk(dx, dy);
            Vec off = cu * (lens_r * dx) + cv * (lens_r * dy);
            Vec o = lookfrom + off;
            Vec d = norm(llc + horiz * sxy + vert * sy - o);
            Vec c = trace(world, o, d, depth, rng, &segs);
            sum += c.x + c.y + c.z;
          }
      }
      total_segs += segs;
      if (sum < -1) std::printf("%f", sum);  // keep the work observable
    });
  }
  for (auto& th : pool) th.join();
  double dt =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  uint64_t segs = total_segs.load();
  std::printf(
      "{\"renderer\": \"cpu-bruteforce\", \"width\": %d, \"height\": %d, "
      "\"spp\": %d, \"depth\": %d, \"threads\": %d, \"seconds\": %.3f, "
      "\"segments\": %llu, \"mrays_per_s\": %.3f}\n",
      W, H, spp, depth, threads, dt, (unsigned long long)segs, segs / dt / 1e6);
  return 0;
}
