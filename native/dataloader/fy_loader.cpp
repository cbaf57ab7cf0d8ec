// Native data-loading engine: threaded JPEG decode + YOLO train augmentation
// (mosaic4 / random affine / HSV / flips) + static-shape batch collation.
//
// This is the framework's native runtime component for the input pipeline —
// the TPU-side analog of the reference's C++ deployment examples
// (examples/YOLOv8-CPP-Inference/inference.cpp) applied where it matters on
// TPU: keeping the host preprocessing off the Python interpreter so the
// accelerator never starves. Geometry matches fce_yolo_tpu/data/augment.py
// (which matches reference ultralytics/data/augment.py): letterbox ratio/pad
// rounding, mosaic quadrant placement, affine M = T@S@R@C, box candidate
// filtering, HSV LUTs.
//
// Exposed as a C API consumed via ctypes (fce_yolo_tpu/data/native_loader.py).

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Hyp {
  float mosaic = 1.0f, hsv_h = 0.015f, hsv_s = 0.7f, hsv_v = 0.4f;
  float degrees = 0.f, translate = 0.1f, scale = 0.5f, shear = 0.f, perspective = 0.f;
  float flipud = 0.f, fliplr = 0.5f;
};

struct Sample {
  cv::Mat img;                       // imgsz x imgsz x 3 u8
  std::vector<float> cls;            // n
  std::vector<cv::Vec4f> boxes;      // n, pixel xyxy
  float ratio = 1.f, pad_x = 0.f, pad_y = 0.f;
  int orig_h = 0, orig_w = 0;
};

struct Batch {
  std::vector<uint8_t> img;          // B*S*S*3
  std::vector<float> cls;            // B*M
  std::vector<float> boxes;          // B*M*4 normalized xywh
  std::vector<uint8_t> mask;         // B*M
  std::vector<float> meta;           // B*5: ratio, pad_x, pad_y, orig_h, orig_w
  int n_valid = 0;
};

// letterbox matching augment.py::letterbox (center pad, round(d +/- 0.1))
cv::Mat letterbox(const cv::Mat& im, int new_size, float& r, float& padw, float& padh,
                  bool scaleup) {
  int h0 = im.rows, w0 = im.cols;
  r = std::min((float)new_size / h0, (float)new_size / w0);
  if (!scaleup) r = std::min(r, 1.0f);
  int nw = (int)std::lround(w0 * r), nh = (int)std::lround(h0 * r);
  float dw = (new_size - nw) / 2.0f, dh = (new_size - nh) / 2.0f;
  cv::Mat resized;
  if (nw != w0 || nh != h0)
    cv::resize(im, resized, cv::Size(nw, nh), 0, 0, cv::INTER_LINEAR);
  else
    resized = im;
  int top = (int)std::lround(dh - 0.1), bottom = (int)std::lround(dh + 0.1);
  int left = (int)std::lround(dw - 0.1), right = (int)std::lround(dw + 0.1);
  cv::Mat out;
  cv::copyMakeBorder(resized, out, top, bottom, left, right, cv::BORDER_CONSTANT,
                     cv::Scalar(114, 114, 114));
  padw = (float)left;
  padh = (float)top;
  return out;
}

void random_hsv(cv::Mat& img, std::mt19937& rng, const Hyp& hyp) {
  if (hyp.hsv_h <= 0 && hyp.hsv_s <= 0 && hyp.hsv_v <= 0) return;
  std::uniform_real_distribution<float> u(-1.f, 1.f);
  float rh = u(rng) * hyp.hsv_h + 1.f, rs = u(rng) * hyp.hsv_s + 1.f,
        rv = u(rng) * hyp.hsv_v + 1.f;
  cv::Mat hsv;
  cv::cvtColor(img, hsv, cv::COLOR_BGR2HSV);
  std::vector<cv::Mat> ch;
  cv::split(hsv, ch);
  cv::Mat lut_h(1, 256, CV_8U), lut_s(1, 256, CV_8U), lut_v(1, 256, CV_8U);
  for (int i = 0; i < 256; ++i) {
    lut_h.at<uint8_t>(i) = (uint8_t)((int)(i * rh) % 180);
    lut_s.at<uint8_t>(i) = cv::saturate_cast<uint8_t>(i * rs);
    lut_v.at<uint8_t>(i) = cv::saturate_cast<uint8_t>(i * rv);
  }
  cv::LUT(ch[0], lut_h, ch[0]);
  cv::LUT(ch[1], lut_s, ch[1]);
  cv::LUT(ch[2], lut_v, ch[2]);
  cv::merge(ch, hsv);
  cv::cvtColor(hsv, img, cv::COLOR_HSV2BGR);
}

// affine matching augment.py::random_perspective (perspective omitted: the
// defaults keep it 0; the Python path handles non-zero perspective)
void random_affine(Sample& s, std::mt19937& rng, const Hyp& hyp, int border) {
  int h = s.img.rows, w = s.img.cols;
  int out_w = w + border * 2, out_h = h + border * 2;
  std::uniform_real_distribution<float> u(0.f, 1.f);
  auto uni = [&](float lo, float hi) { return lo + (hi - lo) * u(rng); };

  float a = uni(-hyp.degrees, hyp.degrees);
  float sc = uni(1.f - hyp.scale, 1.f + hyp.scale);
  cv::Mat R = cv::getRotationMatrix2D(cv::Point2f(0, 0), a, sc);  // 2x3 f64
  double shx = std::tan(uni(-hyp.shear, hyp.shear) * CV_PI / 180.0);
  double shy = std::tan(uni(-hyp.shear, hyp.shear) * CV_PI / 180.0);
  double tx = uni(0.5f - hyp.translate, 0.5f + hyp.translate) * out_w;
  double ty = uni(0.5f - hyp.translate, 0.5f + hyp.translate) * out_h;

  // M = T @ S @ R @ C (C recenters)
  cv::Matx33d C(1, 0, -w / 2.0, 0, 1, -h / 2.0, 0, 0, 1);
  cv::Matx33d Rm(R.at<double>(0, 0), R.at<double>(0, 1), R.at<double>(0, 2),
                 R.at<double>(1, 0), R.at<double>(1, 1), R.at<double>(1, 2), 0, 0, 1);
  cv::Matx33d S(1, shx, 0, shy, 1, 0, 0, 0, 1);
  cv::Matx33d T(1, 0, tx, 0, 1, ty, 0, 0, 1);
  cv::Matx33d M = T * S * Rm * C;

  cv::Mat M23 = (cv::Mat_<double>(2, 3) << M(0, 0), M(0, 1), M(0, 2), M(1, 0), M(1, 1),
                 M(1, 2));
  cv::Mat warped;
  cv::warpAffine(s.img, warped, M23, cv::Size(out_w, out_h), cv::INTER_LINEAR,
                 cv::BORDER_CONSTANT, cv::Scalar(114, 114, 114));
  s.img = warped;

  std::vector<float> new_cls;
  std::vector<cv::Vec4f> new_boxes;
  for (size_t i = 0; i < s.boxes.size(); ++i) {
    const auto& b = s.boxes[i];
    double xs[4] = {b[0], b[2], b[0], b[2]};
    double ys[4] = {b[1], b[3], b[3], b[1]};
    double x1 = 1e30, y1 = 1e30, x2 = -1e30, y2 = -1e30;
    for (int k = 0; k < 4; ++k) {
      double x = M(0, 0) * xs[k] + M(0, 1) * ys[k] + M(0, 2);
      double y = M(1, 0) * xs[k] + M(1, 1) * ys[k] + M(1, 2);
      x1 = std::min(x1, x); y1 = std::min(y1, y);
      x2 = std::max(x2, x); y2 = std::max(y2, y);
    }
    x1 = std::clamp(x1, 0.0, (double)out_w);
    x2 = std::clamp(x2, 0.0, (double)out_w);
    y1 = std::clamp(y1, 0.0, (double)out_h);
    y2 = std::clamp(y2, 0.0, (double)out_h);
    // candidate filter (wh>2, area ratio>0.1, ar<100)
    double w1 = (b[2] - b[0]) * sc, h1 = (b[3] - b[1]) * sc;
    double w2 = x2 - x1, h2 = y2 - y1;
    double ar = std::max(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16));
    if (w2 > 2 && h2 > 2 && w2 * h2 / (w1 * h1 + 1e-16) > 0.1 && ar < 100) {
      new_boxes.push_back(cv::Vec4f((float)x1, (float)y1, (float)x2, (float)y2));
      new_cls.push_back(s.cls[i]);
    }
  }
  s.boxes = std::move(new_boxes);
  s.cls = std::move(new_cls);
}

struct Dataset {
  std::vector<std::string> paths;
  std::vector<std::vector<float>> labels;  // per image: n*5 (cls, cx, cy, w, h norm)
};

Sample load_raw(const Dataset& ds, int idx) {
  Sample s;
  cv::Mat im = cv::imread(ds.paths[idx], cv::IMREAD_COLOR);
  if (im.empty()) im = cv::Mat(64, 64, CV_8UC3, cv::Scalar(114, 114, 114));
  s.img = im;
  s.orig_h = im.rows;
  s.orig_w = im.cols;
  const auto& lab = ds.labels[idx];
  int n = (int)lab.size() / 5;
  for (int i = 0; i < n; ++i) {
    float c = lab[i * 5], cx = lab[i * 5 + 1] * im.cols, cy = lab[i * 5 + 2] * im.rows;
    float bw = lab[i * 5 + 3] * im.cols, bh = lab[i * 5 + 4] * im.rows;
    s.cls.push_back(c);
    s.boxes.push_back(cv::Vec4f(cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2));
  }
  return s;
}

Sample mosaic4(const Dataset& ds, int idx, int imgsz, std::mt19937& rng) {
  std::uniform_int_distribution<int> pick(0, (int)ds.paths.size() - 1);
  std::uniform_real_distribution<float> uc(imgsz / 2.0f, 1.5f * imgsz);
  int yc = (int)uc(rng), xc = (int)uc(rng);
  Sample out;
  out.img = cv::Mat(imgsz * 2, imgsz * 2, CV_8UC3, cv::Scalar(114, 114, 114));
  int idxs[4] = {idx, pick(rng), pick(rng), pick(rng)};
  for (int i = 0; i < 4; ++i) {
    Sample s = load_raw(ds, idxs[i]);
    float r = (float)imgsz / std::max(s.img.rows, s.img.cols);
    if (r != 1.f) {
      cv::resize(s.img, s.img,
                 cv::Size(std::min((int)std::lround(s.img.cols * r), imgsz),
                          std::min((int)std::lround(s.img.rows * r), imgsz)),
                 0, 0, cv::INTER_LINEAR);
    }
    int h = s.img.rows, w = s.img.cols;
    int x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b;
    if (i == 0) {
      x1a = std::max(xc - w, 0); y1a = std::max(yc - h, 0); x2a = xc; y2a = yc;
      x1b = w - (x2a - x1a); y1b = h - (y2a - y1a); x2b = w; y2b = h;
    } else if (i == 1) {
      x1a = xc; y1a = std::max(yc - h, 0); x2a = std::min(xc + w, imgsz * 2); y2a = yc;
      x1b = 0; y1b = h - (y2a - y1a); x2b = std::min(w, x2a - x1a); y2b = h;
    } else if (i == 2) {
      x1a = std::max(xc - w, 0); y1a = yc; x2a = xc; y2a = std::min(imgsz * 2, yc + h);
      x1b = w - (x2a - x1a); y1b = 0; x2b = w; y2b = std::min(y2a - y1a, h);
    } else {
      x1a = xc; y1a = yc; x2a = std::min(xc + w, imgsz * 2); y2a = std::min(imgsz * 2, yc + h);
      x1b = 0; y1b = 0; x2b = std::min(w, x2a - x1a); y2b = std::min(y2a - y1a, h);
    }
    s.img(cv::Rect(x1b, y1b, x2b - x1b, y2b - y1b))
        .copyTo(out.img(cv::Rect(x1a, y1a, x2a - x1a, y2a - y1a)));
    float padw = (float)(x1a - x1b), padh = (float)(y1a - y1b);
    for (size_t k = 0; k < s.boxes.size(); ++k) {
      cv::Vec4f b = s.boxes[k] * r;
      b[0] += padw; b[2] += padw; b[1] += padh; b[3] += padh;
      for (int d = 0; d < 4; ++d) b[d] = std::clamp(b[d], 0.f, (float)(imgsz * 2));
      if (b[2] > b[0] && b[3] > b[1]) {
        out.boxes.push_back(b);
        out.cls.push_back(s.cls[k]);
      }
    }
  }
  return out;
}

struct Loader {
  Dataset ds;
  Hyp hyp;
  int imgsz, batch, max_labels, workers, prefetch;
  bool train;
  uint64_t seed;
  std::atomic<int> epoch{0};
  std::atomic<bool> mosaic_enabled{true};

  // one in-flight epoch's worth of work
  std::vector<int> order;
  std::atomic<size_t> next_batch_idx{0};
  size_t n_batches = 0;

  // reorder buffer: batches complete out of order across workers but are
  // emitted strictly by batch index (deterministic iteration contract)
  std::map<size_t, Batch> queue;
  size_t next_emit = 0;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};
  std::atomic<size_t> produced{0};

  Sample make_sample(int idx, std::mt19937& rng) {
    if (train) {
      bool use_mosaic = mosaic_enabled.load() && hyp.mosaic > 0 &&
                        std::uniform_real_distribution<float>(0, 1)(rng) < hyp.mosaic;
      Sample s;
      if (use_mosaic) {
        s = mosaic4(ds, idx, imgsz, rng);
        random_affine(s, rng, hyp, -imgsz / 2);
      } else {
        s = load_raw(ds, idx);
        float r, pw, ph;
        s.img = letterbox(s.img, imgsz, r, pw, ph, true);
        for (auto& b : s.boxes) {
          b[0] = b[0] * r + pw; b[2] = b[2] * r + pw;
          b[1] = b[1] * r + ph; b[3] = b[3] * r + ph;
        }
        random_affine(s, rng, hyp, 0);
      }
      random_hsv(s.img, rng, hyp);
      std::uniform_real_distribution<float> u(0, 1);
      if (hyp.flipud > 0 && u(rng) < hyp.flipud) {
        cv::flip(s.img, s.img, 0);
        for (auto& b : s.boxes) {
          float y1 = s.img.rows - b[3], y2 = s.img.rows - b[1];
          b[1] = y1; b[3] = y2;
        }
      }
      if (hyp.fliplr > 0 && u(rng) < hyp.fliplr) {
        cv::flip(s.img, s.img, 1);
        for (auto& b : s.boxes) {
          float x1 = s.img.cols - b[2], x2 = s.img.cols - b[0];
          b[0] = x1; b[2] = x2;
        }
      }
      return s;
    }
    Sample s = load_raw(ds, idx);
    float r, pw, ph;
    s.img = letterbox(s.img, imgsz, r, pw, ph, false);
    for (auto& b : s.boxes) {
      b[0] = b[0] * r + pw; b[2] = b[2] * r + pw;
      b[1] = b[1] * r + ph; b[3] = b[3] * r + ph;
    }
    s.ratio = r; s.pad_x = pw; s.pad_y = ph;
    return s;
  }

  Batch make_batch(size_t bi) {
    std::mt19937 rng((uint32_t)(seed + epoch.load() * 9973 + bi * 131));
    int S = imgsz, B = batch, M = max_labels;
    Batch out;
    out.img.assign((size_t)B * S * S * 3, 114);
    out.cls.assign((size_t)B * M, 0.f);
    out.boxes.assign((size_t)B * M * 4, 0.f);
    out.mask.assign((size_t)B * M, 0);
    out.meta.assign((size_t)B * 5, 0.f);
    size_t start = bi * B;
    int nv = 0;
    for (int k = 0; k < B; ++k) {
      size_t pos = start + k;
      int idx;
      if (pos < order.size()) {
        idx = order[pos];
        ++nv;
      } else {
        idx = order.empty() ? 0 : order[order.size() - 1];  // tail padding
      }
      Sample s = make_sample(idx, rng);
      CV_Assert(s.img.rows == S && s.img.cols == S);
      // emit RGB: cv decodes BGR, the model consumes RGB (same contract as
      // the python pipeline's Format-equivalent flip)
      cv::Mat rgb((int)S, (int)S, CV_8UC3, out.img.data() + (size_t)k * S * S * 3);
      cv::cvtColor(s.img, rgb, cv::COLOR_BGR2RGB);
      int n = std::min((int)s.cls.size(), M);
      for (int j = 0; j < n; ++j) {
        const auto& b = s.boxes[j];
        out.cls[(size_t)k * M + j] = s.cls[j];
        float* bx = &out.boxes[((size_t)k * M + j) * 4];
        bx[0] = (b[0] + b[2]) / 2 / S;
        bx[1] = (b[1] + b[3]) / 2 / S;
        bx[2] = (b[2] - b[0]) / S;
        bx[3] = (b[3] - b[1]) / S;
        out.mask[(size_t)k * M + j] = 1;
      }
      float* mt = &out.meta[(size_t)k * 5];
      mt[0] = s.ratio; mt[1] = s.pad_x; mt[2] = s.pad_y;
      mt[3] = (float)s.orig_h; mt[4] = (float)s.orig_w;
    }
    out.n_valid = nv;
    return out;
  }

  void worker() {
    while (!stop.load()) {
      size_t bi = next_batch_idx.fetch_add(1);
      if (bi >= n_batches) return;
      Batch b = make_batch(bi);
      std::unique_lock<std::mutex> lk(mu);
      // bound the buffer relative to the emit cursor so a straggler batch
      // can't deadlock the pipeline (always admit the next-to-emit index)
      cv_full.wait(lk, [&] {
        return bi < next_emit + prefetch + workers || stop.load();
      });
      if (stop.load()) return;
      queue.emplace(bi, std::move(b));
      ++produced;
      cv_empty.notify_all();
    }
  }

  void start_epoch(bool drop_last) {
    join_all();
    size_t n = ds.paths.size();
    order.resize(n);
    for (size_t i = 0; i < n; ++i) order[i] = (int)i;
    if (train) {
      std::mt19937 rng((uint32_t)(seed + epoch.load()));
      std::shuffle(order.begin(), order.end(), rng);
    }
    n_batches = drop_last ? n / batch : (n + batch - 1) / batch;
    next_batch_idx = 0;
    produced = 0;
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.clear();
      next_emit = 0;
    }
    stop = false;
    int nw = std::max(1, std::min(workers, (int)n_batches));
    for (int i = 0; i < nw; ++i) threads.emplace_back([this] { worker(); });
  }

  bool next(Batch& out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_empty.wait(lk, [&] {
      return queue.count(next_emit) || (produced >= n_batches && !queue.count(next_emit)) ||
             stop.load();
    });
    auto it = queue.find(next_emit);
    if (it == queue.end()) return false;
    out = std::move(it->second);
    queue.erase(it);
    ++next_emit;
    cv_full.notify_all();
    return true;
  }

  void join_all() {
    stop = true;
    cv_full.notify_all();
    cv_empty.notify_all();
    for (auto& t : threads)
      if (t.joinable()) t.join();
    threads.clear();
    stop = false;
  }
};

}  // namespace

extern "C" {

void* fy_loader_create(const char** paths, int n_images, const float* labels,
                       const int64_t* label_offsets, int imgsz, int batch, int max_labels,
                       int workers, int prefetch, uint64_t seed, int train,
                       const float* hyp11) {
  auto* L = new Loader();
  L->ds.paths.assign(paths, paths + n_images);
  L->ds.labels.resize(n_images);
  for (int i = 0; i < n_images; ++i) {
    int64_t a = label_offsets[i], b = label_offsets[i + 1];
    L->ds.labels[i].assign(labels + a * 5, labels + b * 5);
  }
  L->imgsz = imgsz;
  L->batch = batch;
  L->max_labels = max_labels;
  L->workers = workers;
  L->prefetch = std::max(prefetch, 1);
  L->seed = seed;
  L->train = train != 0;
  if (hyp11) {
    const float* h = hyp11;
    L->hyp = Hyp{h[0], h[1], h[2], h[3], h[4], h[5], h[6], h[7], h[8], h[9], h[10]};
  }
  return L;
}

int64_t fy_loader_len(void* handle, int drop_last) {
  auto* L = (Loader*)handle;
  size_t n = L->ds.paths.size();
  return drop_last ? n / L->batch : (n + L->batch - 1) / L->batch;
}

void fy_loader_start_epoch(void* handle, int epoch, int mosaic_enabled, int drop_last) {
  auto* L = (Loader*)handle;
  L->epoch = epoch;
  L->mosaic_enabled = mosaic_enabled != 0;
  L->start_epoch(drop_last != 0);
}

// returns n_valid (>0) or -1 when the epoch is exhausted
int fy_loader_next(void* handle, uint8_t* img, float* cls, float* boxes, uint8_t* mask,
                   float* meta) {
  auto* L = (Loader*)handle;
  Batch b;
  if (!L->next(b)) return -1;
  std::memcpy(img, b.img.data(), b.img.size());
  std::memcpy(cls, b.cls.data(), b.cls.size() * sizeof(float));
  std::memcpy(boxes, b.boxes.data(), b.boxes.size() * sizeof(float));
  std::memcpy(mask, b.mask.data(), b.mask.size());
  std::memcpy(meta, b.meta.data(), b.meta.size() * sizeof(float));
  return b.n_valid;
}

void fy_loader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  L->join_all();
  delete L;
}

// standalone letterbox for the predict path
void fy_letterbox(const uint8_t* img, int h, int w, int new_size, int scaleup,
                  uint8_t* out, float* ratio, float* padw, float* padh) {
  cv::Mat im(h, w, CV_8UC3, (void*)img);
  float r, pw, ph;
  cv::Mat lb = letterbox(im, new_size, r, pw, ph, scaleup != 0);
  std::memcpy(out, lb.data, (size_t)new_size * new_size * 3);
  *ratio = r;
  *padw = pw;
  *padh = ph;
}

// predict-path batch: threaded JPEG-file decode + letterbox + RGB emit into
// a contiguous (n, imgsz, imgsz, 3) uint8 batch (the system-throughput
// front end: image bytes on disk -> model-ready batch; reference
// engine/predictor.py:277 preprocess contract). meta rows: [ratio, padw,
// padh, orig_h, orig_w]. Returns the number of successfully decoded images.
int fy_decode_letterbox_batch(const char** paths, int n, int imgsz, int scaleup,
                              int workers, uint8_t* out, float* meta) {
  std::atomic<int> next{0}, ok{0};
  const size_t stride = (size_t)imgsz * imgsz * 3;
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      cv::Mat im = cv::imread(paths[i], cv::IMREAD_COLOR);
      if (im.empty()) {
        std::memset(out + stride * i, 0, stride);
        if (meta) std::memset(meta + 5 * i, 0, 5 * sizeof(float));
        continue;
      }
      float r, pw, ph;
      cv::Mat lb = letterbox(im, imgsz, r, pw, ph, scaleup != 0);
      cv::cvtColor(lb, lb, cv::COLOR_BGR2RGB);
      std::memcpy(out + stride * i, lb.data, stride);
      if (meta) {
        float* m = meta + 5 * i;
        m[0] = r; m[1] = pw; m[2] = ph;
        m[3] = (float)im.rows; m[4] = (float)im.cols;
      }
      ok.fetch_add(1);
    }
  };
  int nw = workers < 1 ? 1 : workers;
  std::vector<std::thread> ts;
  for (int t = 1; t < nw; ++t) ts.emplace_back(work);
  work();
  for (auto& t : ts) t.join();
  return ok.load();
}

}  // extern "C"
