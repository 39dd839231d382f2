// Reference CPU anchor: a scalar, single-thread, f64, recursive
// re-implementation of the reference raytracer's per-sample work on its
// golden scene, used ONLY to measure rays/sec (scene-intersections/sec)
// on this machine's CPU — the ground truth for bench.py's vs_baseline.
//
// Rust is unavailable in this image, so the reference binary cannot be
// timed directly; this is the faithful stand-in: same algorithmic shape
// (per-ray recursion through boxed-shape-style dispatch, raytrace.rs:
// 261-276), same golden-scene workload (test_scene.txt: 5 planes + 2
// spheres, all IndirectPhongMaterial samples=1, zero lights), same math
// per bounce (quadratic sphere roots shapes.rs:60-87, plane t
// shapes.rs:102-110, MC hemisphere spawn raytrace.rs:99-117 incl. the
// un-normalized (1-r1^2) pseudo-sin distribution, depth 0..4 shading +
// depth-5 ambient epilogue raytrace.rs:18,33), same rand-0.3
// xorshift128 RNG (types.rs:27).  Written fresh from the semantics
// documented in SURVEY.md — no reference code copied.
//
// Build+run:  g++ -O2 -o ref_anchor ref_anchor.cpp && ./ref_anchor
// Prints one line: rays_per_sec=<N> (rays = scene-intersection calls).

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>

struct V3 {
    double x, y, z;
    V3 operator+(V3 o) const { return {x + o.x, y + o.y, z + o.z}; }
    V3 operator-(V3 o) const { return {x - o.x, y - o.y, z - o.z}; }
    V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
static double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static V3 normalize(V3 a) {
    double inv = 1.0 / std::sqrt(dot(a, a));
    return a * inv;
}

// rand 0.3 XorShiftRng (marsaglia xorshift128), the reference's RngT
struct XorShift {
    uint32_t x = 0x193a6754, y = 0xa8a7d469, z = 0x97830e05,
             w = 0x113ba7bb;
    uint32_t next_u32() {
        uint32_t t = x ^ (x << 11);
        x = y; y = z; z = w;
        return w = w ^ (w >> 19) ^ (t ^ (t >> 8));
    }
    // rand 0.3 f64: 53 random mantissa bits scaled to [0,1)
    double next_f64() {
        uint32_t a = next_u32() >> 5, b = next_u32() >> 6;
        return (a * 67108864.0 + b) * (1.0 / 9007199254740992.0);
    }
};

// golden scene (test_scene.txt): 5 planes then 2 spheres, scene order
struct Plane { V3 p, n; };
struct Sphere { V3 c; double r; };
static const Plane PLANES[5] = {
    {{0, 0, -3}, {0, 0, 1}}, {{0, 0, 0}, {0, 1, 0}},
    {{0, 6, 0}, {0, -1, 0}}, {{-3, 0, 0}, {1, 0, 0}},
    {{3, 0, 0}, {-1, 0, 0}},
};
static const Sphere SPHERES[2] = {{{0, 1.5, 0}, 1.5}, {{0, 10.65, 0}, 5.0}};
// per-object diffuse r,g,b and ambient (obj 6 = emissive sphere)
static const double DIFF[7][3] = {{1, 1, 1}, {1, 1, 1}, {1, 1, 1},
                                  {1, 0, 0}, {0, 1, 0}, {1, 1, 1},
                                  {1, 1, 1}};
static const double AMB[7] = {0, 0, 0, 0, 0, 0, 5.0};

static long long g_intersections = 0;

// closest hit: linear scan + min_by_key(t) (scene.rs:244-250)
static bool intersect(V3 ro, V3 rd, double* t_out, V3* n_out, int* obj) {
    ++g_intersections;
    double best = 1e300; int bi = -1; V3 bn{0, 0, 0};
    double a = dot(rd, rd);
    for (int i = 0; i < 5; ++i) {                 // planes (shapes.rs:101-110)
        double denom = dot(rd, PLANES[i].n);
        if (denom == 0.0) continue;
        double t = dot(PLANES[i].p - ro, PLANES[i].n) / denom;
        if (t > 0.0 && t < best) { best = t; bi = i; bn = PLANES[i].n; }
    }
    for (int i = 0; i < 2; ++i) {                 // spheres (shapes.rs:51-88)
        V3 oc = ro - SPHERES[i].c;
        double b = 2.0 * dot(rd, oc);
        double cc = dot(oc, oc) - SPHERES[i].r * SPHERES[i].r;
        double disc = b * b - 4.0 * a * cc;
        if (disc <= 0.0) continue;
        double sq = std::sqrt(disc);
        double t = (-b - sq) / (2.0 * a);
        if (t <= 0.0) t = (-b + sq) / (2.0 * a);
        if (t > 0.0 && t < best) {
            best = t; bi = 5 + i;
            bn = normalize((ro + rd * t) - SPHERES[i].c);
        }
    }
    if (bi < 0) return false;
    *t_out = best; *n_out = bn; *obj = bi;
    return true;
}

// IndirectPhongMaterial::color on the golden scene: ambient + 1 MC
// hemisphere sample, significance unattenuated (raytrace.rs:69-121);
// zero lights -> no shadow rays; specular 0 -> no reflection child
static void ray_color(V3 ro, V3 rd, int depth, XorShift& rng, double* rgb) {
    double t; V3 n; int obj;
    if (!intersect(ro, rd, &t, &n, &obj)) {
        rgb[0] = rgb[1] = rgb[2] = 0.051;          // solid background
        return;
    }
    rgb[0] = AMB[obj]; rgb[1] = AMB[obj]; rgb[2] = AMB[obj];
    if (depth > 4) return;                         // raytrace.rs:18,33
    V3 pt = ro + rd * t;
    if (dot(n, rd) > 0) n = n * -1.0;              // flip toward viewer
    // MC hemisphere sample (raytrace.rs:99-117): un-normalized direction
    double r1 = rng.next_f64() * 2.0 - 1.0;
    double phi = rng.next_f64() * 6.283185307179586;
    double s = 1.0 - r1 * r1;
    V3 d{s * std::cos(phi), r1, s * std::sin(phi)};
    if (dot(d, n) < 0) d = d * -1.0;
    double w = dot(n, d) / 0.5;                    // samples*0.5, samples=1
    double child[3];
    ray_color(pt + d * 1e-5, d, depth + 1, rng, child);
    rgb[0] += DIFF[obj][0] * child[0] * w;
    rgb[1] += DIFF[obj][1] * child[1] * w;
    rgb[2] += DIFF[obj][2] * child[2] * w;
}

int main() {
    // camera: SimplePerspectiveCamera::new((0,3,17),(0,0,-1),(0,1,0),3.6)
    // look x up = (1,0,0) -> u; u x look = (0,1,0) -> v; w = look*3.6
    const V3 cam_pos{0, 3, 17};
    const V3 cu{1, 0, 0}, cv{0, 1, 0}, cw{0, 0, -3.6};

    XorShift rng;
    const int W = 800, H = 800;
    const long long SAMPLES = 2000000;             // enough to time
    double sink = 0.0;
    auto t0 = std::chrono::steady_clock::now();
    for (long long i = 0; i < SAMPLES; ++i) {
        int px = (int)(i % W), py = (int)((i / W) % H);
        double scale = 2.0 / W;                    // main.rs:39-53
        double x = ((px + rng.next_f64()) - W / 2.0) * scale;
        double y = ((py + rng.next_f64()) - H / 2.0) * scale;
        V3 dir = normalize(cu * x + cv * y + cw);
        double rgb[3];
        ray_color(cam_pos, dir, 0, rng, rgb);
        sink += rgb[0] + rgb[1] + rgb[2];
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    std::printf("samples=%lld intersections=%lld seconds=%.3f "
                "rays_per_sec=%.0f mean=%.4f\n",
                SAMPLES, g_intersections, dt, g_intersections / dt,
                sink / (3.0 * SAMPLES));
    return 0;
}
