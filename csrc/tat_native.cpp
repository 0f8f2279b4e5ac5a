// tat_native: host-side native runtime for thingino-accel-tpu.
//
// The reference implements its host runtime in C (loader, packers,
// image pipeline via stb_image, NMS in the examples). This library is
// the TPU framework's native tier: the operations that stay on the host
// CPU — model-file codecs, the image data loader (JPEG decode +
// letterbox + quantize feeding the device), batch assembly, and a
// reference NMS — implemented in C++ with OpenMP, exposed through a C
// ABI consumed via ctypes (thingino_accel_tpu/native.py).
//
// Device compute is NOT here: convs/NMS-on-device run as XLA/Pallas
// programs. This is the feeding/unpacking machinery around them.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <cstdio>  // jpeglib.h needs FILE declared first
#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// Packed-layout codecs (NMHWSOIB2 / NDHWC32)
// ---------------------------------------------------------------------------

static inline int ceil_div(int a, int b) { return (a + b - 1) / b; }

// NMHWSOIB2 blob -> OIHW int8. Returns 0 on success.
int tat_unpack_nmhwsoib2(const int8_t* src, int64_t src_len, int8_t* dst,
                         int out_ch, int in_ch, int kh, int kw) {
  const int n_ofp = ceil_div(out_ch, 32);
  const int m_ifp = ceil_div(in_ch, 32);
  const int64_t need = (int64_t)n_ofp * m_ifp * kh * kw * 1024;
  if (src_len < need) return -1;
#pragma omp parallel for collapse(2) schedule(static)
  for (int o = 0; o < out_ch; ++o) {
    for (int i = 0; i < in_ch; ++i) {
      const int n = o >> 5, ofp = o & 31;
      const int m = i >> 5, ifp = i & 31;
      for (int h = 0; h < kh; ++h) {
        for (int w = 0; w < kw; ++w) {
          const int64_t s =
              (((((int64_t)n * m_ifp + m) * kh + h) * kw + w) * 32 + ofp) * 32 +
              ifp;
          const int64_t d = (((int64_t)o * in_ch + i) * kh + h) * kw + w;
          dst[d] = src[s];
        }
      }
    }
  }
  return 0;
}

// OIHW int8 -> NMHWSOIB2 blob (zero-padded channel groups).
int tat_pack_nmhwsoib2(const int8_t* src, int8_t* dst, int out_ch, int in_ch,
                       int kh, int kw) {
  const int n_ofp = ceil_div(out_ch, 32);
  const int m_ifp = ceil_div(in_ch, 32);
  const int64_t total = (int64_t)n_ofp * m_ifp * kh * kw * 1024;
  std::memset(dst, 0, total);
#pragma omp parallel for collapse(2) schedule(static)
  for (int o = 0; o < out_ch; ++o) {
    for (int i = 0; i < in_ch; ++i) {
      const int n = o >> 5, ofp = o & 31;
      const int m = i >> 5, ifp = i & 31;
      for (int h = 0; h < kh; ++h) {
        for (int w = 0; w < kw; ++w) {
          const int64_t s = (((int64_t)o * in_ch + i) * kh + h) * kw + w;
          const int64_t d =
              (((((int64_t)n * m_ifp + m) * kh + h) * kw + w) * 32 + ofp) * 32 +
              ifp;
          dst[d] = src[s];
        }
      }
    }
  }
  return 0;
}

// NDHWC32 -> NCHW int8.
int tat_unpack_ndhwc32(const int8_t* src, int64_t src_len, int8_t* dst,
                       int batch, int channels, int height, int width) {
  const int d_c32 = ceil_div(channels, 32);
  const int64_t need = (int64_t)batch * d_c32 * height * width * 32;
  if (src_len < need) return -1;
#pragma omp parallel for collapse(2) schedule(static)
  for (int n = 0; n < batch; ++n) {
    for (int c = 0; c < channels; ++c) {
      const int d = c >> 5, c32 = c & 31;
      for (int h = 0; h < height; ++h) {
        const int64_t srow =
            ((((int64_t)n * d_c32 + d) * height + h) * width) * 32 + c32;
        const int64_t drow = (((int64_t)n * channels + c) * height + h) * width;
        for (int w = 0; w < width; ++w) dst[drow + w] = src[srow + w * 32];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) — the stb_image role
// ---------------------------------------------------------------------------

struct TatJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void tat_jpeg_error_exit(j_common_ptr cinfo) {
  TatJpegErr* e = reinterpret_cast<TatJpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode JPEG bytes to RGB888. Caller passes a dst buffer of
// max_w*max_h*3; actual dims returned via out_w/out_h. Returns 0 ok.
int tat_decode_jpeg(const uint8_t* data, int64_t len, uint8_t* dst,
                    int max_w, int max_h, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  TatJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = tat_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (w > max_w || h > max_h) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = dst + (int64_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return 0;
}

// ---------------------------------------------------------------------------
// Letterbox resize + quantize (host preprocessing fallback / data loader)
// ---------------------------------------------------------------------------

// Bilinear resize RGB888 src(HxW) into a letterboxed dst(THxTW), gray
// fill, preserving aspect — the semantics of the reference's host
// letterbox path, vectorizable by the compiler, OpenMP over rows.
int tat_letterbox_rgb(const uint8_t* src, int sh, int sw, uint8_t* dst,
                      int th, int tw, uint8_t pad_value) {
  const float scale = std::min((float)tw / sw, (float)th / sh);
  const int nw = (int)std::round(sw * scale);
  const int nh = (int)std::round(sh * scale);
  const int px = (tw - nw) / 2, py = (th - nh) / 2;
  std::memset(dst, pad_value, (int64_t)th * tw * 3);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < nh; ++y) {
    const float fy = (y + 0.5f) / nh * sh - 0.5f;
    // clamp BOTH sample indices from the unclamped floor: at the low
    // edge (floor(fy) == -1) y0 and y1 must both clamp to row 0 so the
    // weight cancels — clamping only y0 blended 75% of row 1 into the
    // first output row (diverging from jax.image.resize's clamp)
    const int yf = (int)std::floor(fy);
    const int y0 = std::max(0, std::min(sh - 1, yf));
    const int y1 = std::max(0, std::min(sh - 1, yf + 1));
    const float wy = fy - yf;
    uint8_t* drow = dst + ((int64_t)(y + py) * tw + px) * 3;
    for (int x = 0; x < nw; ++x) {
      const float fx = (x + 0.5f) / nw * sw - 0.5f;
      const int xf = (int)std::floor(fx);
      const int x0 = std::max(0, std::min(sw - 1, xf));
      const int x1 = std::max(0, std::min(sw - 1, xf + 1));
      const float wx = fx - xf;
      for (int c = 0; c < 3; ++c) {
        const float v00 = src[((int64_t)y0 * sw + x0) * 3 + c];
        const float v01 = src[((int64_t)y0 * sw + x1) * 3 + c];
        const float v10 = src[((int64_t)y1 * sw + x0) * 3 + c];
        const float v11 = src[((int64_t)y1 * sw + x1) * 3 + c];
        const float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                        v10 * wy * (1 - wx) + v11 * wy * wx;
        drow[(int64_t)x * 3 + c] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
      }
    }
  }
  return 0;
}

// 2x2 space-to-depth for the s2d stem ingest (ir/passes
// .stem_space_to_depth): [H,W,C] u8 -> [H/2,W/2,4C], block pixels
// flattened phase-major (channel (p*2+q)*C + c) — the byte order the
// H2D DMA writes for a fixed camera feed, so the device stem consumes
// a dense 3x3 cin=4C conv with no on-device relayout.
int tat_s2d_u8(const uint8_t* src, int h, int w, int c, uint8_t* dst) {
  if (h % 2 || w % 2) return -1;
  const int hw2 = w / 2;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h / 2; ++y) {
    uint8_t* drow = dst + (int64_t)y * hw2 * 4 * c;
    for (int x = 0; x < hw2; ++x) {
      uint8_t* d = drow + (int64_t)x * 4 * c;
      for (int p = 0; p < 2; ++p) {
        const uint8_t* s = src + (((int64_t)(2 * y + p) * w) + 2 * x) * c;
        // phases (p,0) and (p,1) are contiguous in both src and dst
        std::memcpy(d + (p * 2) * c, s, 2 * c);
      }
    }
  }
  return 0;
}

// uint8 -> centered int8 (pixel - 128), the reference input quantization.
void tat_quantize_i8(const uint8_t* src, int8_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = (int8_t)((int)src[i] - 128);
}

// Assemble B decoded+letterboxed frames into one contiguous batch buffer.
void tat_batch_assemble(const uint8_t** frames, int batch, int64_t frame_bytes,
                        uint8_t* dst) {
#pragma omp parallel for schedule(static)
  for (int b = 0; b < batch; ++b)
    std::memcpy(dst + (int64_t)b * frame_bytes, frames[b], frame_bytes);
}

// ---------------------------------------------------------------------------
// Host NMS (reference semantics; device NMS lives in models/yolo.py)
// ---------------------------------------------------------------------------

// boxes: [n,4] cx,cy,w,h; returns number kept; keep_out holds indices.
int tat_nms(const float* boxes, const float* scores, const int32_t* classes,
            int n, float conf_thresh, float iou_thresh, int32_t* keep_out,
            int max_out) {
  std::vector<int> idx;
  idx.reserve(n);
  for (int i = 0; i < n; ++i)
    if (scores[i] >= conf_thresh) idx.push_back(i);
  std::sort(idx.begin(), idx.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> sup(idx.size(), 0);
  int kept = 0;
  for (size_t ii = 0; ii < idx.size() && kept < max_out; ++ii) {
    if (sup[ii]) continue;
    const int i = idx[ii];
    keep_out[kept++] = i;
    const float xi = boxes[i * 4], yi = boxes[i * 4 + 1];
    const float wi = boxes[i * 4 + 2], hi = boxes[i * 4 + 3];
    for (size_t jj = ii + 1; jj < idx.size(); ++jj) {
      if (sup[jj]) continue;
      const int j = idx[jj];
      if (classes[i] != classes[j]) continue;
      const float xj = boxes[j * 4], yj = boxes[j * 4 + 1];
      const float wj = boxes[j * 4 + 2], hj = boxes[j * 4 + 3];
      const float x1 = std::max(xi - wi / 2, xj - wj / 2);
      const float y1 = std::max(yi - hi / 2, yj - hj / 2);
      const float x2 = std::min(xi + wi / 2, xj + wj / 2);
      const float y2 = std::min(yi + hi / 2, yj + hj / 2);
      const float inter =
          std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      const float iou = inter / (wi * hi + wj * hj - inter + 1e-6f);
      if (iou > iou_thresh) sup[jj] = 1;
    }
  }
  return kept;
}

// Version probe for the ctypes wrapper.
int tat_native_version() { return 1; }

}  // extern "C"
