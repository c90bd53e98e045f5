// Multi-Scale Deformable Attention — native CPU kernel.
//
// The reference ships this op as CUDA im2col
// (downstream/OVIS/mask2former/modeling/pixel_decoder/ops/src/, ~1.6k LoC);
// there is no CUDA on TPU hosts, so the native runtime component here is an
// OpenMP-parallel C++ forward + backward with the same semantics as torch
// grid_sample(mode=bilinear, padding_mode=zeros, align_corners=false).
// Exposed extern "C" for ctypes; validated against the JAX core (which is
// the TPU compute path) in tests.
//
// Layouts (all float32, C-contiguous):
//   value:   (B, S, M, D)      S = sum_l H_l*W_l
//   shapes:  (L, 2) int32      (H_l, W_l)
//   loc:     (B, Q, M, L, P, 2)  normalized [0,1] (x, y)
//   weight:  (B, Q, M, L, P)
//   out:     (B, Q, M*D)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

static inline float sample_bilinear(const float* v,  // (H, W, M, D) slice base
                                    int h, int w, int m_stride, int d,
                                    int m, float x, float y, int D) {
  // grid_sample align_corners=false: x in pixel coords already
  int x0 = (int)std::floor(x);
  int y0 = (int)std::floor(y);
  float wx = x - x0, wy = y - y0;
  float acc = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    float fy = dy ? wy : 1.f - wy;
    for (int dx = 0; dx < 2; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      float fx = dx ? wx : 1.f - wx;
      acc += fy * fx * v[((int64_t)yy * w + xx) * m_stride + (int64_t)m * D + d];
    }
  }
  return acc;
}

void ms_deform_attn_forward(const float* value, const int32_t* shapes,
                            const float* loc, const float* weight, float* out,
                            int B, int S, int M, int D, int Q, int L, int P) {
  std::vector<int64_t> starts(L);
  int64_t off = 0;
  for (int l = 0; l < L; ++l) {
    starts[l] = off;
    off += (int64_t)shapes[2 * l] * shapes[2 * l + 1];
  }
  const int m_stride = M * D;

#if defined(_OPENMP)
#pragma omp parallel for collapse(2) schedule(static)
#endif
  for (int b = 0; b < B; ++b) {
    for (int q = 0; q < Q; ++q) {
      float* o = out + ((int64_t)b * Q + q) * M * D;
      for (int m = 0; m < M; ++m) {
        for (int d = 0; d < D; ++d) {
          float acc = 0.f;
          for (int l = 0; l < L; ++l) {
            int H = shapes[2 * l], W = shapes[2 * l + 1];
            const float* vbase =
                value + ((int64_t)b * S + starts[l]) * m_stride;
            for (int p = 0; p < P; ++p) {
              int64_t li =
                  ((((int64_t)b * Q + q) * M + m) * L + l) * P + p;
              float x = loc[li * 2 + 0] * W - 0.5f;
              float y = loc[li * 2 + 1] * H - 0.5f;
              float wgt = weight[li];
              acc += wgt * sample_bilinear(vbase, H, W, m_stride, d, m, x, y, D);
            }
          }
          o[(int64_t)m * D + d] = acc;
        }
      }
    }
  }
}

// backward: grads wrt value, sampling locations and attention weights
void ms_deform_attn_backward(const float* value, const int32_t* shapes,
                             const float* loc, const float* weight,
                             const float* grad_out, float* grad_value,
                             float* grad_loc, float* grad_weight, int B, int S,
                             int M, int D, int Q, int L, int P) {
  std::vector<int64_t> starts(L);
  int64_t off = 0;
  for (int l = 0; l < L; ++l) {
    starts[l] = off;
    off += (int64_t)shapes[2 * l] * shapes[2 * l + 1];
  }
  const int m_stride = M * D;
  std::memset(grad_value, 0, sizeof(float) * (int64_t)B * S * M * D);

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int b = 0; b < B; ++b) {  // parallel over batch only: grad_value races
    for (int q = 0; q < Q; ++q) {
      const float* go = grad_out + ((int64_t)b * Q + q) * M * D;
      for (int m = 0; m < M; ++m) {
        for (int l = 0; l < L; ++l) {
          int H = shapes[2 * l], W = shapes[2 * l + 1];
          const float* vbase = value + ((int64_t)b * S + starts[l]) * m_stride;
          float* gvbase = grad_value + ((int64_t)b * S + starts[l]) * m_stride;
          for (int p = 0; p < P; ++p) {
            int64_t li = ((((int64_t)b * Q + q) * M + m) * L + l) * P + p;
            float x = loc[li * 2 + 0] * W - 0.5f;
            float y = loc[li * 2 + 1] * H - 0.5f;
            float wgt = weight[li];
            int x0 = (int)std::floor(x), y0 = (int)std::floor(y);
            float wx = x - x0, wy = y - y0;
            float gw = 0.f, gx = 0.f, gy = 0.f;
            for (int d = 0; d < D; ++d) {
              float g = go[(int64_t)m * D + d];
              float v00 = 0, v01 = 0, v10 = 0, v11 = 0;
              for (int dy = 0; dy < 2; ++dy) {
                int yy = y0 + dy;
                if (yy < 0 || yy >= H) continue;
                for (int dx = 0; dx < 2; ++dx) {
                  int xx = x0 + dx;
                  if (xx < 0 || xx >= W) continue;
                  float vv =
                      vbase[((int64_t)yy * W + xx) * m_stride + (int64_t)m * D + d];
                  float fy = dy ? wy : 1.f - wy;
                  float fx = dx ? wx : 1.f - wx;
                  // value grad
                  gvbase[((int64_t)yy * W + xx) * m_stride + (int64_t)m * D + d] +=
                      g * wgt * fy * fx;
                  if (dy == 0 && dx == 0) v00 = vv;
                  if (dy == 0 && dx == 1) v01 = vv;
                  if (dy == 1 && dx == 0) v10 = vv;
                  if (dy == 1 && dx == 1) v11 = vv;
                }
              }
              float sampled = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                              wy * ((1 - wx) * v10 + wx * v11);
              gw += g * sampled;
              gx += g * wgt *
                    ((1 - wy) * (v01 - v00) + wy * (v11 - v10));
              gy += g * wgt *
                    ((1 - wx) * (v10 - v00) + wx * (v11 - v01));
            }
            grad_weight[li] += gw;
            grad_loc[li * 2 + 0] += gx * W;  // d pixel / d normalized = W
            grad_loc[li * 2 + 1] += gy * H;
          }
        }
      }
    }
  }
}

}  // extern "C"
