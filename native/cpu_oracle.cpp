// cpu_oracle — an INDEPENDENT scalar CPU renderer (own code, not a port of
// either the reference or the JAX tracer) serving two purposes:
//
//  1. External numerical cross-check: the Mitsuba-0.6 reference cannot be
//     built in this image (no boost/xerces headers, OpenEXR-3-only), so this
//     separately-written C++ path tracer + PSSMLT/DRMLT implementation is
//     the oracle that a shared bug in the JAX trace_paths/MCMC stack would
//     disagree with.  tests/test_oracle_parity.py compares images.
//  2. Measured CPU anchor: BASELINE.md's mutations/s denominator.  Runs the
//     same per-mutation work as the reference DRMLT loop (stage-1 trace
//     always, stage-2 trace on rejection, green adds a reverse trace;
//     /root/reference/src/integrators/drmlt/drmlt_proc.cpp:518-770) with
//     branchy scalar control flow, multithreaded over chains.
//
// Scene input: flat binary dump written by drmlt_mitsuba_tpu/utils/
// scene_dump.py.  PSS layout matches integrators/layout.py (the replay
// contract): 4 sensor dims + 9 dims/bounce.
//
// Usage:
//   cpu_oracle pt   scene.bin out.raw <spp> <max_depth>
//   cpu_oracle mlt  scene.bin out.raw <pssmlt|green|mira|orbital>
//                   <seconds> <max_depth> [threads]
// Prints one JSON line with timing + throughput.
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------- vectors
struct V3 {
  float x = 0, y = 0, z = 0;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float len(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 norm(V3 a) {
  float l = len(a);
  return l > 0 ? a * (1.0f / l) : V3{0, 0, 1};
}
static inline float maxc(V3 a) { return std::fmax(a.x, std::fmax(a.y, a.z)); }
static inline float lum(V3 c) {
  return 0.212671f * c.x + 0.715160f * c.y + 0.072169f * c.z;
}

// ---------------------------------------------------------------- RNG
struct Rng {  // xoshiro256++, seeded via splitmix64
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t z = seed;
    for (int i = 0; i < 4; i++) {
      z += 0x9e3779b97f4a7c15ULL;
      uint64_t t = z;
      t = (t ^ (t >> 30)) * 0xbf58476d1ce4e5b9ULL;
      t = (t ^ (t >> 27)) * 0x94d049bb133111ebULL;
      s[i] = t ^ (t >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  uint64_t next() {
    uint64_t r = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return r;
  }
  float uf() { return float((next() >> 40) * (1.0 / 16777216.0)); }
};

// ---------------------------------------------------------------- scene
enum { B_DIFFUSE = 0, B_CONDUCTOR = 1, B_DIELECTRIC = 2, B_ROUGH_CONDUCTOR = 3,
       B_MIRROR = 8, B_NULL = 9, B_ROUGH_DIFFUSE = 12 };

struct Mat {
  int kind;
  V3 albedo, eta, k;
  float rough;
  int two_sided;
};
struct Tri {
  V3 v0, e1, e2, n0, n1, n2;
  int mat, erow;
  V3 ng;  // derived
};
struct ERow {
  int tri;
  V3 rad;
  float area, pmf, cdf;
};
struct Sph {
  V3 c;
  float r;
  int mat;
};
struct Scene {
  std::vector<Tri> tris;
  std::vector<Mat> mats;
  std::vector<ERow> ems;
  std::vector<Sph> sphs;
  float cam[16];
  float thx, thy;
  int W, H;
};

static bool load_scene(const char* path, Scene& sc) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint32_t hdr[7];
  if (fread(hdr, 4, 7, f) != 7 || hdr[0] != 0x4452544F) { fclose(f); return false; }
  uint32_t T = hdr[2], M = hdr[3], E = hdr[4];
  sc.W = int(hdr[5]); sc.H = int(hdr[6]);
  uint32_t S = 0;
  if (hdr[1] >= 2) fread(&S, 4, 1, f);
  fread(sc.cam, 4, 16, f);
  fread(&sc.thx, 4, 1, f); fread(&sc.thy, 4, 1, f);
  sc.mats.resize(M);
  for (auto& m : sc.mats) {
    fread(&m.kind, 4, 1, f);
    fread(&m.albedo, 4, 3, f); fread(&m.eta, 4, 3, f); fread(&m.k, 4, 3, f);
    fread(&m.rough, 4, 1, f); fread(&m.two_sided, 4, 1, f);
  }
  sc.tris.resize(T);
  for (auto& t : sc.tris) {
    fread(&t.v0, 4, 3, f); fread(&t.e1, 4, 3, f); fread(&t.e2, 4, 3, f);
    fread(&t.n0, 4, 3, f); fread(&t.n1, 4, 3, f); fread(&t.n2, 4, 3, f);
    fread(&t.mat, 4, 1, f); fread(&t.erow, 4, 1, f);
    t.ng = norm(cross(t.e1, t.e2));
  }
  sc.ems.resize(E);
  float acc = 0;
  for (auto& e : sc.ems) {
    fread(&e.tri, 4, 1, f);
    fread(&e.rad, 4, 3, f);
    fread(&e.area, 4, 1, f); fread(&e.pmf, 4, 1, f);
    acc += e.pmf;
    e.cdf = acc;
  }
  sc.sphs.resize(S);
  for (auto& s : sc.sphs) {
    fread(&s.c, 4, 3, f);
    fread(&s.r, 4, 1, f);
    fread(&s.mat, 4, 1, f);
  }
  fclose(f);
  return true;
}

// ---------------------------------------------------------------- intersect
struct Hit {
  bool valid = false;
  float t = 1e30f;
  int tri = -1;
  int sph = -1;
  float b1 = 0, b2 = 0;
};
static inline bool sphere_hit(const Sph& s, V3 o, V3 d, float tmin, float tmax,
                              float& t_out) {
  V3 oc = o - s.c;
  float b = dot(oc, d);
  float c = dot(oc, oc) - s.r * s.r;
  float disc = b * b - c;
  if (disc < 0) return false;
  float sq = std::sqrt(disc);
  float t0 = -b - sq, t1 = -b + sq;
  float t = t0 > tmin ? t0 : t1;
  if (t <= tmin || t >= tmax) return false;
  t_out = t;
  return true;
}
static Hit intersect(const Scene& sc, V3 o, V3 d, float tmax = 1e30f) {
  Hit h;
  h.t = tmax;
  for (size_t i = 0; i < sc.sphs.size(); i++) {
    float t;
    if (sphere_hit(sc.sphs[i], o, d, 1e-4f, h.t, t)) {
      h.valid = true; h.t = t; h.sph = int(i); h.tri = -1;
    }
  }
  for (size_t i = 0; i < sc.tris.size(); i++) {
    const Tri& tr = sc.tris[i];
    V3 p = cross(d, tr.e2);
    float det = dot(tr.e1, p);
    if (std::fabs(det) < 1e-12f) continue;
    float inv = 1.0f / det;
    V3 s = o - tr.v0;
    float b1 = dot(s, p) * inv;
    if (b1 < 0 || b1 > 1) continue;
    V3 q = cross(s, tr.e1);
    float b2 = dot(d, q) * inv;
    if (b2 < 0 || b1 + b2 > 1) continue;
    float t = dot(tr.e2, q) * inv;
    if (t > 1e-4f && t < h.t) {
      h.valid = true; h.t = t; h.tri = int(i); h.sph = -1;
      h.b1 = b1; h.b2 = b2;
    }
  }
  return h;
}
static bool occluded(const Scene& sc, V3 o, V3 d, float tmax) {
  if (tmax <= 0) return false;
  for (const Sph& s : sc.sphs) {
    float t;
    if (sphere_hit(s, o, d, 1e-4f, tmax, t)) return true;
  }
  for (const Tri& tr : sc.tris) {
    V3 p = cross(d, tr.e2);
    float det = dot(tr.e1, p);
    if (std::fabs(det) < 1e-12f) continue;
    float inv = 1.0f / det;
    V3 s = o - tr.v0;
    float b1 = dot(s, p) * inv;
    if (b1 < 0 || b1 > 1) continue;
    V3 q = cross(s, tr.e1);
    float b2 = dot(d, q) * inv;
    if (b2 < 0 || b1 + b2 > 1) continue;
    float t = dot(tr.e2, q) * inv;
    if (t > 1e-4f && t < tmax) return true;
  }
  return false;
}

// ---------------------------------------------------------------- frames
static void basis(V3 n, V3& t, V3& b) {
  // Duff et al. branchless ONB
  float sg = n.z >= 0 ? 1.0f : -1.0f;
  float a = -1.0f / (sg + n.z);
  float c = n.x * n.y * a;
  t = {1.0f + sg * n.x * n.x * a, sg * c, -sg * n.x};
  b = {c, sg + n.y * n.y * a, -n.y};
}
static V3 to_world(V3 n, V3 local) {
  V3 t, b;
  basis(n, t, b);
  return t * local.x + b * local.y + n * local.z;
}

// ---------------------------------------------------------------- BSDFs
static V3 fresnel_cond(float ci, V3 eta, V3 k) {
  auto fr1 = [&](float e, float kk) {
    float c2 = ci * ci, s2 = 1 - c2;
    float e2 = e * e, k2 = kk * kk;
    float t0 = e2 - k2 - s2;
    float a2b2 = std::sqrt(std::fmax(t0 * t0 + 4 * e2 * k2, 0.0f));
    float t1 = a2b2 + c2;
    float a = std::sqrt(std::fmax(0.5f * (a2b2 + t0), 0.0f));
    float t2 = 2 * a * ci;
    float rs = (t1 - t2) / (t1 + t2);
    float t3 = c2 * a2b2 + s2 * s2;
    float t4 = t2 * s2;
    float rp = rs * (t3 - t4) / (t3 + t4);
    return 0.5f * (rs + rp);
  };
  return {fr1(eta.x, k.x), fr1(eta.y, k.y), fr1(eta.z, k.z)};
}
static float fresnel_diel(float ci, float eta) {  // eta = int/ext
  float s2 = (1 - ci * ci) / (eta * eta);
  if (s2 >= 1) return 1.0f;
  float ct = std::sqrt(1 - s2);
  float rs = (ci - eta * ct) / (ci + eta * ct);
  float rp = (eta * ci - ct) / (eta * ci + ct);
  return 0.5f * (rs * rs + rp * rp);
}
static float ggx_d(float cm, float alpha) {
  if (cm <= 0) return 0;
  float a2 = alpha * alpha, c2 = cm * cm;
  float d = c2 * (a2 - 1) + 1;
  return a2 / (float(M_PI) * d * d);
}
static float ggx_lambda(float cv, float alpha) {
  if (cv <= 0) return 1e9f;
  float c2 = cv * cv;
  float t2 = (1 - c2) / c2;  // tan^2
  return 0.5f * (std::sqrt(1 + alpha * alpha * t2) - 1.0f);
}
static float ggx_g2(float ci, float co, float alpha) {
  // height-correlated Smith (matches render/microfacet.py ggx_g2)
  return 1.0f / (1.0f + ggx_lambda(ci, alpha) + ggx_lambda(co, alpha));
}

struct BsdfSample {
  V3 wo;       // local
  V3 weight;   // f*cos/pdf
  float pdf = 0;
  bool delta = false;
  float eta = 1.0f;
};

// local-frame convention: z = shading normal (oriented toward incident ray
// for two-sided kinds); wi points back along the incoming ray.
static void bsdf_eval(const Mat& m, V3 wi, V3 wo, V3& f, float& pdf) {
  f = {0, 0, 0}; pdf = 0;
  if (m.kind == B_DIFFUSE || m.kind == B_ROUGH_DIFFUSE) {
    if (wi.z <= 0 || wo.z <= 0) return;
    f = m.albedo * (wo.z / float(M_PI));
    pdf = wo.z / float(M_PI);
  } else if (m.kind == B_ROUGH_CONDUCTOR) {
    if (wi.z <= 0 || wo.z <= 0) return;
    V3 hm = norm(wi + wo);
    float D = ggx_d(hm.z, m.rough);
    float G = ggx_g2(wi.z, wo.z, m.rough);
    V3 F = fresnel_cond(std::fabs(dot(wi, hm)), m.eta, m.k);
    // f_r * cos(wo) = F D G / (4 cos_i)   (height-correlated Smith G2)
    f = F * (D * G / (4.0f * wi.z));
    pdf = D * hm.z / (4.0f * std::fabs(dot(wo, hm)) + 1e-12f);
  }
}
static BsdfSample bsdf_sample(const Mat& m, V3 wi, float u0, float u1, float u2) {
  BsdfSample s;
  (void)u0;
  if (m.kind == B_DIFFUSE || m.kind == B_ROUGH_DIFFUSE) {
    if (wi.z <= 0) return s;
    float r = std::sqrt(u1);
    float ph = 2 * float(M_PI) * u2;
    s.wo = {r * std::cos(ph), r * std::sin(ph), std::sqrt(std::fmax(1 - u1, 0.0f))};
    s.pdf = s.wo.z / float(M_PI);
    s.weight = m.albedo;
    return s;
  }
  if (m.kind == B_MIRROR || m.kind == B_CONDUCTOR) {
    if (wi.z <= 0) return s;
    s.wo = {-wi.x, -wi.y, wi.z};
    s.pdf = 1;
    s.delta = true;
    s.weight = m.kind == B_MIRROR ? m.albedo : fresnel_cond(wi.z, m.eta, m.k);
    return s;
  }
  if (m.kind == B_DIELECTRIC) {
    float eta = m.eta.x > 0 ? m.eta.x : 1.5f;
    bool outside = wi.z > 0;
    float e = outside ? eta : 1.0f / eta;
    float F = fresnel_diel(std::fabs(wi.z), e);
    s.delta = true;
    s.pdf = 1;
    if (u1 < F) {
      s.wo = {-wi.x, -wi.y, wi.z};
      s.weight = {1, 1, 1};
    } else {
      float inv = 1.0f / e;
      float s2 = (1 - wi.z * wi.z) * inv * inv;
      float cz = std::sqrt(std::fmax(1 - s2, 0.0f));
      s.wo = {-wi.x * inv, -wi.y * inv, outside ? -cz : cz};
      s.weight = {inv * inv, inv * inv, inv * inv};  // radiance scaling
      s.eta = e;
    }
    return s;
  }
  if (m.kind == B_ROUGH_CONDUCTOR) {
    if (wi.z <= 0) return s;
    // classic Walter NDF sampling of the half vector
    float a2 = m.rough * m.rough;
    float cm = std::sqrt(std::fmax((1 - u1) / (1 + (a2 - 1) * u1), 0.0f));
    float sm = std::sqrt(std::fmax(1 - cm * cm, 0.0f));
    float ph = 2 * float(M_PI) * u2;
    V3 hm = {sm * std::cos(ph), sm * std::sin(ph), cm};
    float wih = dot(wi, hm);
    s.wo = hm * (2.0f * wih) - wi;
    if (s.wo.z <= 0 || wih <= 0) return BsdfSample{};
    float D = ggx_d(cm, m.rough);
    s.pdf = D * cm / (4.0f * wih);
    V3 f;
    float pdf;
    bsdf_eval(m, wi, s.wo, f, pdf);
    if (s.pdf <= 0) return BsdfSample{};
    s.weight = f * (1.0f / s.pdf);
    return s;
  }
  if (m.kind == B_NULL) {
    s.wo = wi * -1.0f;
    s.pdf = 1; s.delta = true; s.weight = {1, 1, 1};
    return s;
  }
  return s;
}
static bool is_delta(const Mat& m) {
  return m.kind == B_MIRROR || m.kind == B_CONDUCTOR || m.kind == B_DIELECTRIC ||
         m.kind == B_NULL;
}

// ---------------------------------------------------------------- tracer
// PSS layout = integrators/layout.py: u[0:2] pixel, u[2:4] aperture,
// bounce b: base=4+9b: +0 light pick, +1:3 light uv, +3 bsdf cmp,
// +4:6 bsdf uv, +6 RR, +7:9 media (unused here).
struct TraceCfg {
  int max_depth = 6;
  int min_depth = 1;
  int rr_depth = 5;
  // strategy decomposition for cross-checks: both (MIS), nee-only, bsdf-only
  bool use_nee = true;
  bool use_bsdf_hit = true;
};
static const int SENSOR_DIMS = 4, BOUNCE_DIMS = 9;
static int n_dims(const TraceCfg& c) { return SENSOR_DIMS + c.max_depth * BOUNCE_DIMS; }

struct Splat {
  float u, v;
  V3 rgb;
};

static float mis2(float a, float b) {
  float a2 = a * a, b2 = b * b;
  return a2 + b2 > 0 ? a2 / (a2 + b2) : 0.0f;
}

static Splat trace(const Scene& sc, const TraceCfg& cfg, const float* u) {
  Splat out{u[0], u[1], {0, 0, 0}};
  // camera ray
  float x = (2 * u[0] - 1) * sc.thx, y = (1 - 2 * u[1]) * sc.thy;
  V3 dl = norm({x, y, 1});
  const float* c = sc.cam;
  V3 o = {c[3], c[7], c[11]};
  V3 d = norm({c[0] * dl.x + c[1] * dl.y + c[2] * dl.z,
               c[4] * dl.x + c[5] * dl.y + c[6] * dl.z,
               c[8] * dl.x + c[9] * dl.y + c[10] * dl.z});
  V3 tp = {1, 1, 1};
  float prev_pdf = 0;
  bool prev_delta = true;
  float eta_scale = 1;
  for (int depth = 1; depth <= cfg.max_depth; depth++) {
    const float* ub = u + SENSOR_DIMS + (depth - 1) * BOUNCE_DIMS;
    Hit h = intersect(sc, o, d);
    if (!h.valid) break;
    V3 p = o + d * h.t;
    V3 ns, ng;
    int mat_id, erow;
    if (h.sph >= 0) {
      const Sph& sp = sc.sphs[h.sph];
      ng = ns = norm(p - sp.c);
      mat_id = sp.mat;
      erow = -1;
    } else {
      const Tri& tr = sc.tris[h.tri];
      ns = norm(tr.n0 * (1 - h.b1 - h.b2) + tr.n1 * h.b1 + tr.n2 * h.b2);
      ng = tr.ng;
      mat_id = tr.mat;
      erow = tr.erow;
    }
    const Mat& m = sc.mats[mat_id];
    // emitted radiance (one-sided, front = geometric normal side)
    if (erow >= 0 && depth >= cfg.min_depth && dot(d, ng) < 0 &&
        (cfg.use_bsdf_hit || prev_delta)) {
      const ERow& e = sc.ems[erow];
      float w = 1.0f;
      if (!prev_delta && cfg.use_nee) {
        float cl = -dot(d, ng);
        float nee_pdf = e.pmf * (h.t * h.t) / std::fmax(cl * e.area, 1e-12f);
        w = mis2(prev_pdf, nee_pdf);
      }
      out.rgb = out.rgb + tp * e.rad * w;
    }
    // two-sided shading: orient shading frame toward the incident ray
    V3 nsh = ns;
    if (m.two_sided && dot(nsh, d) > 0) nsh = nsh * -1.0f;
    V3 wi = {0, 0, 0};
    {
      V3 t, b;
      basis(nsh, t, b);
      V3 w = d * -1.0f;
      wi = {dot(w, t), dot(w, b), dot(w, nsh)};
    }
    // NEE
    if (cfg.use_nee && !is_delta(m) && !sc.ems.empty() &&
        depth + 1 <= cfg.max_depth && depth + 1 >= cfg.min_depth) {
      float pick = ub[0] * sc.ems.back().cdf;
      size_t ei = 0;
      while (ei + 1 < sc.ems.size() && sc.ems[ei].cdf < pick) ei++;
      const ERow& e = sc.ems[ei];
      const Tri& lt = sc.tris[e.tri];
      float su = ub[1], sv = ub[2];
      float b1 = su, b2 = sv;  // uniform triangle via sqrt warp
      float r = std::sqrt(su);
      b1 = 1 - r;
      b2 = sv * r;
      V3 pl = lt.v0 + lt.e1 * b1 + lt.e2 * b2;
      V3 tol = pl - p;
      float d2 = dot(tol, tol);
      float dist = std::sqrt(std::fmax(d2, 1e-20f));
      V3 dl2 = tol * (1.0f / dist);
      float cl = -dot(dl2, lt.ng);
      if (cl > 1e-7f) {
        float pdf = e.pmf * d2 / std::fmax(cl * e.area, 1e-12f);
        V3 wol;
        {
          V3 t, b;
          basis(nsh, t, b);
          wol = {dot(dl2, t), dot(dl2, b), dot(dl2, nsh)};
        }
        V3 f;
        float fpdf;
        bsdf_eval(m, wi, wol, f, fpdf);
        if (lum(f) > 0 && pdf > 0) {
          V3 so = p + dl2 * (1e-4f * std::fmax(1.0f, h.t));
          if (!occluded(sc, so, dl2, dist * (1 - 1e-3f) - 1e-4f)) {
            float w = cfg.use_bsdf_hit ? mis2(pdf, fpdf) : 1.0f;
            out.rgb = out.rgb + tp * f * e.rad * (w / pdf);
          }
        }
      }
    }
    // BSDF sampling
    BsdfSample bs = bsdf_sample(m, wi, ub[3], ub[4], ub[5]);
    if (bs.pdf <= 0 || lum(bs.weight) <= 0) break;
    tp = tp * bs.weight;
    eta_scale *= bs.eta;
    prev_pdf = bs.pdf;
    prev_delta = bs.delta;
    V3 wow = to_world(nsh, bs.wo);
    o = p + wow * (1e-4f * std::fmax(1.0f, h.t));
    d = wow;
    // RR
    if (depth >= cfg.rr_depth) {
      float q = std::fmin(maxc(tp) * eta_scale * eta_scale, 0.95f);
      if (ub[6] >= q) break;
      tp = tp * (1.0f / std::fmax(q, 1e-8f));
    }
    if (lum(tp) <= 0) break;
  }
  return out;
}

// ---------------------------------------------------------------- film
struct Film {
  int W, H;
  std::vector<double> px;  // RGB accum
  explicit Film(int w, int h) : W(w), H(h), px(size_t(w) * h * 3, 0.0) {}
  void splat(float u, float v, V3 c, float w) {
    int xi = int(u * W);
    int yi = int(v * H);
    if (xi < 0 || xi >= W || yi < 0 || yi >= H) return;
    size_t i = (size_t(yi) * W + xi) * 3;
    px[i] += double(c.x) * w;
    px[i + 1] += double(c.y) * w;
    px[i + 2] += double(c.z) * w;
  }
  void add(const Film& o) {
    for (size_t i = 0; i < px.size(); i++) px[i] += o.px[i];
  }
  void write_raw(const char* path, double scale) {
    FILE* f = fopen(path, "wb");
    for (double v : px) {
      float x = float(v * scale);
      fwrite(&x, 4, 1, f);
    }
    fclose(f);
  }
};

// ---------------------------------------------------------------- kernels
// constants = drmlt_sampler.h:201-206 via integrators/kernels.py
static const float S1 = 1.0f / 1024.0f, S2 = 1.0f / 64.0f;
static const float SIGMA = 1.0f / 64.0f, SCALE2 = 0.1f;
static const float RHO = std::exp(-0.25f), KSCALE = 1.9f;

static float kelemen_sample(Rng& rng, float s1, float s2) {
  float u = rng.uf();
  float sign = u < 0.5f ? 1.0f : -1.0f;
  float x = u < 0.5f ? 2 * u : 2 * (u - 0.5f);
  float log_ratio = -std::log(s2 / s1);
  return sign * s2 * std::exp((1 - x) * log_ratio);
}
static float gauss_sample(Rng& rng, float sigma) {
  float u1 = rng.uf(), u2 = rng.uf();
  float r = std::sqrt(-2.0f * std::log(std::fmax(1 - u1, 1e-38f)));
  return r * std::cos(2 * float(M_PI) * u2) * sigma;
}
static float wc_sample(Rng& rng, float rho) {
  float u = rng.uf();
  float sign = u < 0.5f ? 1.0f : -1.0f;
  float x = u < 0.5f ? 2 * u : 2 * (u - 0.5f);
  float disp = 2 * rho / (1 + rho * rho);
  float v = std::cos(2 * float(M_PI) * x);
  float ang = (v + disp) / (1 + disp * v);
  return sign * std::acos(std::fmin(std::fmax(ang, -1.0f), 1.0f));
}
static float kelemen_logpdf(float du, float s1, float s2) {
  float d = std::fabs(du);
  if (d < s1 || d > s2) return -87.0f;
  return -std::log(2 * d * std::log(s2 / s1));
}
static float wrap01(float y) {
  float t = std::fmod(y, 2.0f);
  if (t < 0) t += 2.0f;
  return t > 1.0f ? 2.0f - t : t;
}

// ---------------------------------------------------------------- MCMC
struct MltResult {
  uint64_t mutations = 0;
  double b = 0;
  uint64_t boot = 0;
};

static void run_chain(const Scene& sc, const TraceCfg& cfg, const std::string& type,
                      double seconds, uint64_t seed, Film& film, MltResult& res) {
  const int D = n_dims(cfg);
  Rng rng(seed);
  std::vector<float> x(D), yv(D), zv(D), rv(D);
  // bootstrap: sample candidates, track mean lum (b), keep max-lum start
  const int NBOOT = 2000;
  double bsum = 0;
  double best = -1;
  std::vector<float> cand(D);
  for (int i = 0; i < NBOOT; i++) {
    for (int j = 0; j < D; j++) cand[j] = rng.uf();
    Splat s = trace(sc, cfg, cand.data());
    float L = lum(s.rgb);
    bsum += L;
    if (rng.uf() * std::fmax(bsum, 1e-30) < L || best < 0) {
      // streaming luminance-proportional reservoir pick
      x = cand;
      best = L;
    }
  }
  res.b = bsum / NBOOT;
  res.boot = NBOOT;
  Splat sx = trace(sc, cfg, x.data());
  float Lx = lum(sx.rgb);
  if (Lx <= 0) {  // fall back: keep sampling until non-zero
    for (int tries = 0; tries < 10000 && Lx <= 0; tries++) {
      for (int j = 0; j < D; j++) x[j] = rng.uf();
      sx = trace(sc, cfg, x.data());
      Lx = lum(sx.rgb);
    }
  }
  const float P_LARGE = 0.3f;
  const bool is_pssmlt = type == "pssmlt";
  const bool is_green = type == "green", is_mira = type == "mira",
             is_orbital = type == "orbital";
  auto t0 = std::chrono::steady_clock::now();
  uint64_t muts = 0;
  while (true) {
    if ((muts & 1023) == 0) {
      double el = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
      if (el >= seconds) break;
    }
    muts++;
    bool large = rng.uf() < P_LARGE;
    // ---- stage 1 (bold) --------------------------------------------------
    if (large) {
      for (int j = 0; j < D; j++) yv[j] = rng.uf();
    } else if (is_orbital) {
      for (int j = 0; j + 1 < D; j += 2) {
        float dv = kelemen_sample(rng, S1 * KSCALE, S2 * KSCALE);
        float ang = rng.uf() * 2 * float(M_PI);
        yv[j] = wrap01(x[j] + dv * std::cos(ang));
        yv[j + 1] = wrap01(x[j + 1] + dv * std::sin(ang));
      }
      if (D & 1) yv[D - 1] = x[D - 1];
    } else if (is_pssmlt || is_green || is_mira) {
      for (int j = 0; j < D; j++) yv[j] = wrap01(x[j] + kelemen_sample(rng, S1, S2));
    }
    Splat sy = trace(sc, cfg, yv.data());
    float Ly = lum(sy.rgb);
    float a1 = Lx > 0 ? std::fmin(1.0f, Ly / Lx) : 1.0f;
    if (is_pssmlt) {
      // Veach-style two-state splat
      film.splat(sx.u, sx.v, sx.rgb * (Lx > 0 ? (1 - a1) / Lx : 0.0f), 1.0f);
      film.splat(sy.u, sy.v, sy.rgb * (Ly > 0 ? a1 / Ly : 0.0f), 1.0f);
      if (rng.uf() < a1) { x = yv; sx = sy; Lx = Ly; }
      continue;
    }
    // ---- DRMLT stage 2 on rejection (branchy like the reference) --------
    bool acc1 = rng.uf() < a1;
    float a2 = 0;
    float Lz = 0;
    Splat sz{0, 0, {0, 0, 0}};
    bool did2 = false;
    if (!acc1 && !large) {
      did2 = true;
      if (is_orbital) {
        for (int j = 0; j + 1 < D; j += 2) {
          float dx = yv[j] - x[j], dy = yv[j + 1] - x[j + 1];
          float nrm = std::sqrt(std::fmax(dx * dx + dy * dy, 1e-30f));
          float mu = std::atan2(-dy, -dx);
          float th = wc_sample(rng, RHO);
          zv[j] = wrap01(yv[j] + nrm * std::cos(th + mu));
          zv[j + 1] = wrap01(yv[j + 1] + nrm * std::sin(th + mu));
        }
        if (D & 1) zv[D - 1] = x[D - 1];
      } else {
        for (int j = 0; j < D; j++)
          zv[j] = wrap01(x[j] + gauss_sample(rng, SCALE2 * SIGMA));
      }
      sz = trace(sc, cfg, zv.data());
      Lz = lum(sz.rgb);
      float lr = Lx > 0 ? Lz / Lx : 0.0f;
      if (is_green) {
        for (int j = 0; j < D; j++) rv[j] = wrap01(zv[j] - (yv[j] - x[j]));
        Splat sr = trace(sc, cfg, rv.data());
        float Lr = lum(sr.rgb);
        float arev = Lz > 0 ? std::fmin(1.0f, Lr / Lz) : 1.0f;
        a2 = arev >= 1.0f ? 0.0f
                          : std::fmin(1.0f, lr * (1 - arev) / std::fmax(1 - a1, 1e-12f));
      } else if (is_mira) {
        float arev = Lz > 0 ? std::fmin(1.0f, Ly / Lz) : 1.0f;
        float lq = 0;
        for (int j = 0; j < D; j++)
          lq += kelemen_logpdf(zv[j] - yv[j], S1, S2) -
                kelemen_logpdf(x[j] - yv[j], S1, S2);
        a2 = arev >= 1.0f ? 0.0f
                          : std::fmin(1.0f, lr * std::exp(lq) * (1 - arev) /
                                                std::fmax(1 - a1, 1e-12f));
      } else {  // orbital, Eq. 11
        if (Lz < Ly) a2 = 0;
        else if (Lz >= Lx) a2 = 1;
        else {
          float den = Lx - Ly;
          a2 = den != 0 ? std::fmin(1.0f, std::fmax((Lz - Ly) / den, 0.0f)) : 0.0f;
        }
      }
      if (Lz <= 0) a2 = 0;
    }
    // three-state splat (Fig. 10)
    float wy = a1, wz = (1 - a1) * a2, wx = 1 - wy - wz;
    if (Lx > 0) film.splat(sx.u, sx.v, sx.rgb * (wx / Lx), 1.0f);
    if (Ly > 0) film.splat(sy.u, sy.v, sy.rgb * (wy / Ly), 1.0f);
    if (did2 && Lz > 0) film.splat(sz.u, sz.v, sz.rgb * (wz / Lz), 1.0f);
    if (acc1) { x = yv; sx = sy; Lx = Ly; }
    else if (did2 && rng.uf() < a2) { x = zv; sx = sz; Lx = Lz; }
  }
  res.mutations = muts;
}

// ---------------------------------------------------------------- main
int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: cpu_oracle pt|mlt scene.bin out.raw ...\n");
    return 2;
  }
  Scene sc;
  if (!load_scene(argv[2], sc)) {
    fprintf(stderr, "bad scene %s\n", argv[2]);
    return 1;
  }
  std::string mode = argv[1];
  if (mode == "pt") {
    const char* out = argv[3];
    long spp = argc > 4 ? atol(argv[4]) : 64;
    TraceCfg cfg;
    cfg.max_depth = argc > 5 ? atoi(argv[5]) : 6;
    if (argc > 6) {
      std::string strat = argv[6];
      cfg.use_nee = strat != "bsdf";
      cfg.use_bsdf_hit = strat != "nee";
    }
    int T = int(std::thread::hardware_concurrency());
    uint64_t total = uint64_t(spp) * sc.W * sc.H;
    std::vector<Film> films;
    films.reserve(T);
    for (int i = 0; i < T; i++) films.emplace_back(sc.W, sc.H);
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> ths;
    for (int ti = 0; ti < T; ti++)
      ths.emplace_back([&, ti] {
        Rng rng(0x1234 + ti * 7919);
        std::vector<float> u(n_dims(cfg));
        uint64_t n = total / T;
        for (uint64_t i = 0; i < n; i++) {
          for (auto& uu : u) uu = rng.uf();
          Splat s = trace(sc, cfg, u.data());
          films[ti].splat(s.u, s.v, s.rgb, 1.0f);
        }
      });
    for (auto& t : ths) t.join();
    for (int i = 1; i < T; i++) films[0].add(films[i]);
    double el = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
    uint64_t done = (total / T) * T;
    films[0].write_raw(out, double(sc.W) * sc.H / double(done));
    printf("{\"mode\": \"pt\", \"paths\": %llu, \"seconds\": %.3f, "
           "\"paths_per_sec\": %.0f, \"threads\": %d}\n",
           (unsigned long long)done, el, done / el, T);
  } else if (mode == "mlt") {
    const char* out = argv[3];
    std::string type = argc > 4 ? argv[4] : "orbital";
    double seconds = argc > 5 ? atof(argv[5]) : 5.0;
    TraceCfg cfg;
    cfg.max_depth = argc > 6 ? atoi(argv[6]) : 6;
    int T = argc > 7 ? atoi(argv[7]) : int(std::thread::hardware_concurrency());
    std::vector<Film> films;
    films.reserve(T);
    for (int i = 0; i < T; i++) films.emplace_back(sc.W, sc.H);
    std::vector<MltResult> res(T);
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> ths;
    for (int ti = 0; ti < T; ti++)
      ths.emplace_back([&, ti] {
        run_chain(sc, cfg, type, seconds, 0xBEEF + ti * 104729, films[ti], res[ti]);
      });
    for (auto& t : ths) t.join();
    double el = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
    uint64_t muts = 0;
    double b = 0;
    for (int i = 0; i < T; i++) { muts += res[i].mutations; b += res[i].b; }
    b /= T;
    for (int i = 1; i < T; i++) films[0].add(films[i]);
    // splat film is normalized: each mutation contributes unit luminance
    films[0].write_raw(out, b * double(sc.W) * sc.H / double(muts));
    printf("{\"mode\": \"mlt\", \"type\": \"%s\", \"mutations\": %llu, "
           "\"seconds\": %.3f, \"mutations_per_sec\": %.0f, "
           "\"mutations_per_sec_per_core\": %.0f, \"threads\": %d, "
           "\"b\": %.6g}\n",
           type.c_str(), (unsigned long long)muts, el, muts / el,
           muts / el / T, T, b);
  } else {
    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
  }
  return 0;
}
