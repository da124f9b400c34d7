// Native CPU reference renderer + fast PPM writer.
//
// Role in this framework (SURVEY.md §2.1 N1/N2/N6 equivalents): an
// INDEPENDENT C++ implementation of the blessed renderer semantics
// (futhark/ray.fut, cross-checked against rust/src/lib.rs) used for
//   1. golden-image generation for the JAX/Pallas pipeline's tests,
//   2. a native CPU baseline for the benchmark harness,
//   3. a fast PPM serializer for the Python CLI (1M-pixel images).
// It is written from the published equations, not translated from any
// reference source file.
//
// Exposed via a C ABI (ctypes-friendly); also builds as a standalone CLI
// with -DRT_MAIN (flag contract: -m height -n width -f out.ppm -s scene
// -r runs, matching the reference driver's getopt loop).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <chrono>
#include <string>
#include <vector>

namespace {

constexpr float kSceneEps = 0.1f;   // traversal-internal sphere t_min
constexpr float kTMax = 1e9f;
constexpr int kMaxDepth = 50;

struct V3 {
  float x, y, z;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline V3 scale(float s, V3 v) { return {s * v.x, s * v.y, s * v.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline V3 normalise(V3 v) { return scale(1.0f / std::sqrt(dot(v, v)), v); }

struct Aabb {
  V3 lo, hi;
};
static inline Aabb enclose(Aabb a, Aabb b) {
  return {{std::min(a.lo.x, b.lo.x), std::min(a.lo.y, b.lo.y), std::min(a.lo.z, b.lo.z)},
          {std::max(a.hi.x, b.hi.x), std::max(a.hi.y, b.hi.y), std::max(a.hi.z, b.hi.z)}};
}
static inline V3 centre(Aabb b) {
  return {b.lo.x + 0.5f * (b.hi.x - b.lo.x), b.lo.y + 0.5f * (b.hi.y - b.lo.y),
          b.lo.z + 0.5f * (b.hi.z - b.lo.z)};
}

struct Scene {
  std::vector<V3> center;
  std::vector<float> radius;
  std::vector<V3> color;
};

// Quadratic ray-sphere test; returns t in the open interval (t_min, t_max)
// preferring the near root, or +inf on miss.
static inline float sphere_hit_t(V3 o, V3 d, V3 c, float r, float t_min,
                                 float t_max) {
  V3 oc = o - c;
  float a = dot(d, d);
  float b = dot(oc, d);
  float cc = dot(oc, oc) - r * r;
  float disc = b * b - a * cc;
  if (disc <= 0.0f) return INFINITY;
  float sq = std::sqrt(disc);
  float t0 = (-b - sq) / a;
  if (t0 < t_max && t0 > t_min) return t0;
  float t1 = (-b + sq) / a;
  if (t1 < t_max && t1 > t_min) return t1;
  return INFINITY;
}

// Staged slab test with running interval.
static inline bool aabb_hit(const Aabb &bb, V3 o, V3 d, float tmin, float tmax) {
  const float lo[3] = {bb.lo.x, bb.lo.y, bb.lo.z};
  const float hi[3] = {bb.hi.x, bb.hi.y, bb.hi.z};
  const float oo[3] = {o.x, o.y, o.z};
  const float dd[3] = {d.x, d.y, d.z};
  for (int ax = 0; ax < 3; ax++) {
    float inv = 1.0f / dd[ax];
    float t0 = (lo[ax] - oo[ax]) * inv;
    float t1 = (hi[ax] - oo[ax]) * inv;
    if (inv < 0.0f) std::swap(t0, t1);
    tmin = std::max(t0, tmin);
    tmax = std::min(t1, tmax);
    if (tmax <= tmin) return false;
  }
  return true;
}

// Median-split BVH (flat array form). Sequential build — scenes are small
// and build time is reported separately by the bench harness.
struct BvhNode {
  Aabb bb;
  int left, right;  // >=0: inner child index; <0: ~leaf_sphere_index
};

struct Bvh {
  std::vector<BvhNode> nodes;
  int root = -1;

  int build(const Scene &sc, std::vector<int> &idx, int d, int lo, int hi) {
    if (hi - lo == 1) return ~idx[lo];
    int ax = d % 3;
    std::sort(idx.begin() + lo, idx.begin() + hi, [&](int a, int b) {
      float ca = (&sc.center[a].x)[ax];
      float cb = (&sc.center[b].x)[ax];
      return ca < cb;
    });
    int mid = lo + (hi - lo) / 2;
    int l = build(sc, idx, d + 1, lo, mid);
    int r = build(sc, idx, d + 1, mid, hi);
    Aabb bb;
    auto child_bb = [&](int c) -> Aabb {
      if (c >= 0) return nodes[c].bb;
      int s = ~c;
      V3 rr = {sc.radius[s], sc.radius[s], sc.radius[s]};
      return {sc.center[s] - rr, sc.center[s] + rr};
    };
    bb = enclose(child_bb(l), child_bb(r));
    nodes.push_back({bb, l, r});
    return (int)nodes.size() - 1;
  }

  void make(const Scene &sc) {
    nodes.clear();
    int n = (int)sc.center.size();
    std::vector<int> idx(n);
    for (int i = 0; i < n; i++) idx[i] = i;
    nodes.reserve(std::max(1, n - 1));
    root = build(sc, idx, 0, 0, n);
  }
};

struct HitResult {
  int idx = -1;
  float t = kTMax;
};

// Closest hit: prune with a fixed (0, 1e9) AABB window, test spheres with
// the (scene_eps, best) window — i.e. the reference's fold semantics.
static void traverse(const Bvh &bvh, const Scene &sc, int node, V3 o, V3 d,
                     HitResult &best) {
  if (node < 0) {
    int s = ~node;
    float t = sphere_hit_t(o, d, sc.center[s], sc.radius[s], kSceneEps, best.t);
    if (t < best.t) {
      best.t = t;
      best.idx = s;
    }
    return;
  }
  const BvhNode &nd = bvh.nodes[node];
  if (!aabb_hit(nd.bb, o, d, 0.0f, kTMax)) return;
  traverse(bvh, sc, nd.left, o, d, best);
  traverse(bvh, sc, nd.right, o, d, best);
}

struct Camera {
  V3 origin, llc, horizontal, vertical;
};

static Camera make_camera(V3 look_from, V3 look_at, V3 vup, float vfov,
                          float aspect) {
  float theta = vfov * (float)M_PI / 180.0f;
  float half_h = std::tan(theta / 2.0f);
  float half_w = aspect * half_h;
  V3 w = normalise(look_from - look_at);
  V3 u = normalise(cross(vup, w));
  V3 v = cross(w, u);
  Camera cam;
  cam.origin = look_from;
  cam.llc = look_from - scale(half_w, u) - scale(half_h, v) - w;
  cam.horizontal = scale(2.0f * half_w, u);
  cam.vertical = scale(2.0f * half_h, v);
  return cam;
}

static V3 ray_colour(const Bvh &bvh, const Scene &sc, V3 o, V3 d, int max_depth) {
  V3 light = {1, 1, 1};
  for (int depth = 0; depth < max_depth; depth++) {
    HitResult h;
    traverse(bvh, sc, bvh.root, o, d, h);
    if (h.idx >= 0) {
      // two-phase: re-intersect the winner with the widened window
      float t = sphere_hit_t(o, d, sc.center[h.idx], sc.radius[h.idx], 0.0f,
                             h.t + 1.0f);
      V3 p = o + scale(t, d);
      V3 n = scale(1.0f / sc.radius[h.idx], p - sc.center[h.idx]);
      V3 unit = normalise(d);
      V3 refl = unit - scale(2.0f * dot(unit, n), n);
      if (dot(refl, n) > 0.0f) {
        o = p;
        d = refl;
        light = light * sc.color[h.idx];
        continue;
      }
      return {0, 0, 0};  // absorbed
    }
    V3 unit = normalise(d);
    float tt = 0.5f * (unit.y + 1.0f);
    V3 sky = {(1.0f - tt) + 0.5f * tt, (1.0f - tt) + 0.7f * tt,
              (1.0f - tt) + 1.0f * tt};
    return light * sky;
  }
  return {0, 0, 0};  // depth exhausted
}

static inline int32_t pack(V3 c) {
  int ir = (int)(255.99f * c.x);
  int ig = (int)(255.99f * c.y);
  int ib = (int)(255.99f * c.z);
  return (ir << 16) | (ig << 8) | ib;
}

static void render_image(const Bvh &bvh, const Scene &sc, const Camera &cam,
                         int width, int height, int max_depth, int32_t *out) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int j = 0; j < height; j++) {
    for (int i = 0; i < width; i++) {
      float u = (float)i / (float)width;
      float v = (float)(height - j) / (float)height;
      V3 o = cam.origin;
      V3 d = cam.llc + scale(u, cam.horizontal) + scale(v, cam.vertical) -
             cam.origin;
      out[j * width + i] = pack(ray_colour(bvh, sc, o, d, max_depth));
    }
  }
}

static Scene make_scene(const float *centers, const float *radii,
                        const float *colors, int n) {
  Scene sc;
  sc.center.resize(n);
  sc.radius.assign(radii, radii + n);
  sc.color.resize(n);
  for (int i = 0; i < n; i++) {
    sc.center[i] = {centers[3 * i], centers[3 * i + 1], centers[3 * i + 2]};
    sc.color[i] = {colors[3 * i], colors[3 * i + 1], colors[3 * i + 2]};
  }
  return sc;
}

}  // namespace

extern "C" {

// Render a sphere scene to packed int32 pixels. Returns 0 on success.
int rt_render(const float *centers, const float *radii, const float *colors,
              int n, const float *look_from, const float *look_at, float fov,
              int width, int height, int max_depth, int32_t *out) {
  if (n <= 0) return -1;
  Scene sc = make_scene(centers, radii, colors, n);
  Bvh bvh;
  bvh.make(sc);
  Camera cam = make_camera({look_from[0], look_from[1], look_from[2]},
                           {look_at[0], look_at[1], look_at[2]}, {0, 1, 0},
                           fov, (float)width / (float)height);
  render_image(bvh, sc, cam, width, height, max_depth, out);
  return 0;
}

// Separate-phase timing API used by the benchmark harness: returns
// milliseconds for BVH build and render respectively.
int rt_bench(const float *centers, const float *radii, const float *colors,
             int n, const float *look_from, const float *look_at, float fov,
             int width, int height, int max_depth, int runs, double *bvh_ms,
             double *render_ms, int32_t *out) {
  if (n <= 0 || runs <= 0) return -1;
  Scene sc = make_scene(centers, radii, colors, n);
  Camera cam = make_camera({look_from[0], look_from[1], look_from[2]},
                           {look_at[0], look_at[1], look_at[2]}, {0, 1, 0},
                           fov, (float)width / (float)height);
  Bvh bvh;
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < runs; r++) bvh.make(sc);
  auto t1 = std::chrono::steady_clock::now();
  *bvh_ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / runs;
  t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < runs; r++)
    render_image(bvh, sc, cam, width, height, max_depth, out);
  t1 = std::chrono::steady_clock::now();
  *render_ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / runs;
  return 0;
}

// Serialize packed pixels to P3 PPM. Returns number of bytes written, or the
// required size if buf is null (call twice).
long rt_ppm(const int32_t *pixels, int height, int width, char *buf,
            long bufsize) {
  std::string s;
  s.reserve((size_t)height * width * 12 + 32);
  char tmp[64];
  snprintf(tmp, sizeof tmp, "P3\n%d %d\n255\n", width, height);
  s += tmp;
  for (long i = 0; i < (long)height * width; i++) {
    int32_t p = pixels[i];
    snprintf(tmp, sizeof tmp, "%d %d %d\n", (p >> 16) & 0xFF, (p >> 8) & 0xFF,
             p & 0xFF);
    s += tmp;
  }
  if (buf && bufsize >= (long)s.size()) memcpy(buf, s.data(), s.size());
  return (long)s.size();
}

}  // extern "C"

#ifdef RT_MAIN
// Standalone CLI with the reference driver's flag contract.
static void gen_grid(Scene &sc, int n, float k, float y_or_nan, int fixed_axis,
                     float fixed_val, V3 color) {
  for (int a = 0; a < n; a++) {
    for (int b = 0; b < n; b++) {
      float ca = -k / 2.0f + (k / n) * a;
      float cb = -k / 2.0f + (k / n) * b;
      V3 c;
      if (fixed_axis == 0) c = {fixed_val, ca, cb};        // left/right walls
      else if (fixed_axis == 2) c = {ca, cb, fixed_val};   // midwall
      else c = {ca, fixed_val, cb};                        // bottom
      sc.center.push_back(c);
      sc.radius.push_back(k / (n * 2.0f));
      sc.color.push_back(color);
    }
  }
  (void)y_or_nan;
}

int main(int argc, char **argv) {
  int height = 200, width = 200, runs = 10;
  const char *outfile = nullptr;
  std::string scene_name = "rgbbox";
  for (int i = 1; i < argc - 1; i++) {
    if (!strcmp(argv[i], "-m")) height = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-n")) width = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-f")) outfile = argv[++i];
    else if (!strcmp(argv[i], "-s")) scene_name = argv[++i];
    else if (!strcmp(argv[i], "-r")) runs = atoi(argv[++i]);
  }
  Scene sc;
  V3 look_from, look_at;
  float fov = 75.0f;
  if (scene_name == "rgbbox") {
    gen_grid(sc, 10, 60.0f, 0, 0, -30.0f, {1, 0, 0});
    gen_grid(sc, 10, 60.0f, 0, 2, -30.0f, {1, 1, 0});
    gen_grid(sc, 10, 60.0f, 0, 0, 30.0f, {0, 0, 1});
    gen_grid(sc, 10, 60.0f, 0, 1, -30.0f, {1, 1, 1});
    look_from = {0, 30, 30};
    look_at = {0, -1, -1};
  } else if (scene_name == "irreg") {
    gen_grid(sc, 100, 600.0f, 0, 1, 0.0f, {1, 1, 1});
    look_from = {0, 12, 30};
    look_at = {0, 10, -1};
  } else {
    fprintf(stderr, "Unknown scene: %s\nKnown scenes: rgbbox, irreg\n",
            scene_name.c_str());
    return 1;
  }
  printf("Using scene %s (-s to switch).\n", scene_name.c_str());
  printf("Timing over average of %d runs (-r to change).\n", runs);
  int n = (int)sc.center.size();
  std::vector<float> centers(3 * n), colors(3 * n);
  for (int i = 0; i < n; i++) {
    memcpy(&centers[3 * i], &sc.center[i], 12);
    memcpy(&colors[3 * i], &sc.color[i], 12);
  }
  std::vector<int32_t> img((size_t)width * height);
  double bvh_ms, render_ms;
  rt_bench(centers.data(), sc.radius.data(), colors.data(), n, &look_from.x,
           &look_at.x, fov, width, height, kMaxDepth, runs, &bvh_ms,
           &render_ms, img.data());
  printf("Scene BVH construction in %fs.\n", bvh_ms / 1e3);
  printf("Rendering in %fs.\n", render_ms / 1e3);
  if (outfile) {
    long sz = rt_ppm(img.data(), height, width, nullptr, 0);
    std::vector<char> buf(sz);
    rt_ppm(img.data(), height, width, buf.data(), sz);
    FILE *f = fopen(outfile, "wb");
    fwrite(buf.data(), 1, sz, f);
    fclose(f);
    printf("Writing image to %s.\n", outfile);
  }
  return 0;
}
#endif
