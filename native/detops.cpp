// detops: native host-side detection primitives for the data/eval pipeline.
//
// TPU-native counterpart of the reference's compiled host layer:
//   - bbox_overlaps        <- lib/bbox/bbox.pyx:15-55 (Cython)
//   - greedy NMS           <- lib/nms/cpu_nms.pyx
//   - gaussian soft-NMS    <- lib/nms/nms.py:96-141 (hot host loop)
//   - RLE encode/decode/IoU <- lib/dataset/pycocotools/maskApi.c (COCO mask API)
//
// The TPU owns the in-graph compute path; these cover the host-side pipeline
// (roidb preparation, evaluation, proposal-recall tooling) where NumPy fallbacks
// exist but a compiled kernel keeps the single host core off the critical path.
//
// Build: g++ -O3 -march=native -shared -fPIC detops.cpp -o libdetops.so
// ABI: plain C functions over contiguous float64/float32 buffers (ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// IoU matrix with the legacy +1 convention. boxes: [n,4], query: [k,4] -> out [n,k]
void bbox_overlaps(const float* boxes, int64_t n, const float* query, int64_t k,
                   float* out) {
    std::vector<float> qarea(k);
    for (int64_t j = 0; j < k; ++j) {
        qarea[j] = (query[j * 4 + 2] - query[j * 4 + 0] + 1.0f) *
                   (query[j * 4 + 3] - query[j * 4 + 1] + 1.0f);
    }
    for (int64_t i = 0; i < n; ++i) {
        const float bx1 = boxes[i * 4], by1 = boxes[i * 4 + 1];
        const float bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
        const float barea = (bx2 - bx1 + 1.0f) * (by2 - by1 + 1.0f);
        float* row = out + i * k;
        for (int64_t j = 0; j < k; ++j) {
            const float iw = std::min(bx2, query[j * 4 + 2]) -
                             std::max(bx1, query[j * 4 + 0]) + 1.0f;
            if (iw <= 0.0f) { row[j] = 0.0f; continue; }
            const float ih = std::min(by2, query[j * 4 + 3]) -
                             std::max(by1, query[j * 4 + 1]) + 1.0f;
            if (ih <= 0.0f) { row[j] = 0.0f; continue; }
            const float inter = iw * ih;
            row[j] = inter / (barea + qarea[j] - inter);
        }
    }
}

// Greedy NMS. dets: [n,5] (x1,y1,x2,y2,score). keep_out: caller-allocated [n].
// Returns the number of kept indices (written in pick order).
int64_t greedy_nms(const float* dets, int64_t n, float thresh, int64_t* keep_out) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return dets[a * 5 + 4] > dets[b * 5 + 4];
    });
    std::vector<float> area(n);
    for (int64_t i = 0; i < n; ++i) {
        area[i] = (dets[i * 5 + 2] - dets[i * 5 + 0] + 1.0f) *
                  (dets[i * 5 + 3] - dets[i * 5 + 1] + 1.0f);
    }
    std::vector<uint8_t> sup(n, 0);
    int64_t cnt = 0;
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t i = order[oi];
        if (sup[i]) continue;
        keep_out[cnt++] = i;
        const float x1 = dets[i * 5], y1 = dets[i * 5 + 1];
        const float x2 = dets[i * 5 + 2], y2 = dets[i * 5 + 3];
        for (int64_t oj = oi + 1; oj < n; ++oj) {
            const int64_t j = order[oj];
            if (sup[j]) continue;
            const float iw = std::min(x2, dets[j * 5 + 2]) -
                             std::max(x1, dets[j * 5 + 0]) + 1.0f;
            if (iw <= 0.0f) continue;
            const float ih = std::min(y2, dets[j * 5 + 3]) -
                             std::max(y1, dets[j * 5 + 1]) + 1.0f;
            if (ih <= 0.0f) continue;
            const float inter = iw * ih;
            if (inter / (area[i] + area[j] - inter) > thresh) sup[j] = 1;
        }
    }
    return cnt;
}

// Gaussian soft-NMS (lib/nms/nms.py:96-141 semantics): pick max, freeze its
// (already decayed) score, decay the rest by exp(-iou^2/sigma). Writes kept
// indices and scores; returns count (= min(n, max_dets)).
int64_t soft_nms(const float* dets, int64_t n, float sigma, int64_t max_dets,
                 int64_t* keep_out, float* score_out) {
    std::vector<float> score(n), area(n);
    std::vector<uint8_t> dead(n, 0);
    for (int64_t i = 0; i < n; ++i) {
        score[i] = dets[i * 5 + 4];
        area[i] = (dets[i * 5 + 2] - dets[i * 5 + 0] + 1.0f) *
                  (dets[i * 5 + 3] - dets[i * 5 + 1] + 1.0f);
    }
    if (max_dets < 0 || max_dets > n) max_dets = n;
    int64_t cnt = 0;
    while (cnt < max_dets) {
        int64_t best = -1;
        float bs = -1e30f;
        for (int64_t i = 0; i < n; ++i)
            if (!dead[i] && score[i] > bs) { bs = score[i]; best = i; }
        if (best < 0) break;
        keep_out[cnt] = best;
        score_out[cnt] = score[best];
        ++cnt;
        dead[best] = 1;
        const float x1 = dets[best * 5], y1 = dets[best * 5 + 1];
        const float x2 = dets[best * 5 + 2], y2 = dets[best * 5 + 3];
        for (int64_t j = 0; j < n; ++j) {
            if (dead[j]) continue;
            const float iw = std::min(x2, dets[j * 5 + 2]) -
                             std::max(x1, dets[j * 5 + 0]) + 1.0f;
            if (iw <= 0.0f) continue;
            const float ih = std::min(y2, dets[j * 5 + 3]) -
                             std::max(y1, dets[j * 5 + 1]) + 1.0f;
            if (ih <= 0.0f) continue;
            const float inter = iw * ih;
            const float ov = inter / (area[best] + area[j] - inter);
            score[j] *= std::exp(-(ov * ov) / sigma);
        }
    }
    return cnt;
}

// COCO greedy detection<->gt matching for ONE (image, class), over all A area
// ranges x T IoU thresholds in a single call. Mirrors the reference's
// cocoeval.evaluateImg greedy loop (lib/dataset/pycocotools/cocoeval.py:271-332)
// exactly — including the tie rule (equal IoU prefers the LATER gt), the
// ignored-gt fallback (scan breaks once a real match exists and the remaining
// gts are ignored), and crowd-gt reuse. This is the hot loop of dataset-scale
// evaluation (minival: ~400k (image, class) pairs; pure-Python costs ~µs-per-
// op on the T x D x G triple loop, this costs ns).
//
// Inputs:
//   ious     [D, G] float64 — IoU in (score-sorted det) x (ORIGINAL gt) order
//   gt_area  [G] float64;  gt_crowd [G] uint8
//   det_area [D] float64 (score-sorted order)
//   thrs     [T] float64 (ascending COCO 0.50:0.05:0.95)
//   area_rng [A, 2] float64 (lo, hi per range)
// Outputs (caller-allocated):
//   matched  [A, T, D] uint8;  ignored [A, T, D] uint8
//   num_gt   [A] int64 — non-ignored gt count per range
void coco_match_image(const double* ious, int64_t D, int64_t G,
                      const double* gt_area, const uint8_t* gt_crowd,
                      const double* det_area,
                      const double* thrs, int64_t T,
                      const double* area_rng, int64_t A,
                      uint8_t* matched, uint8_t* ignored, int64_t* num_gt) {
    std::vector<uint8_t> gt_ign(G);
    std::vector<int64_t> order(G);
    std::vector<uint8_t> used(G);
    for (int64_t a = 0; a < A; ++a) {
        const double lo = area_rng[a * 2], hi = area_rng[a * 2 + 1];
        int64_t ngt = 0;
        for (int64_t g = 0; g < G; ++g) {
            gt_ign[g] = gt_crowd[g] || gt_area[g] < lo || gt_area[g] > hi;
            if (!gt_ign[g]) ++ngt;
        }
        num_gt[a] = ngt;
        // non-ignored gts first, stable (cocoeval sorts by _ignore)
        int64_t w = 0;
        for (int64_t g = 0; g < G; ++g) if (!gt_ign[g]) order[w++] = g;
        for (int64_t g = 0; g < G; ++g) if (gt_ign[g]) order[w++] = g;
        uint8_t* m_a = matched + a * T * D;
        uint8_t* i_a = ignored + a * T * D;
        for (int64_t t = 0; t < T; ++t) {
            std::fill(used.begin(), used.end(), 0);
            uint8_t* m_row = m_a + t * D;
            uint8_t* i_row = i_a + t * D;
            for (int64_t d = 0; d < D; ++d) {
                double best_iou = std::min(thrs[t], 1.0 - 1e-10);
                int64_t best_g = -1;
                for (int64_t oi = 0; oi < G; ++oi) {
                    const int64_t g = order[oi];
                    if (used[g] && !gt_crowd[g]) continue;
                    if (best_g > -1 && !gt_ign[best_g] && gt_ign[g]) break;
                    const double v = ious[d * G + g];
                    if (v < best_iou) continue;
                    best_iou = v;
                    best_g = g;
                }
                if (best_g >= 0) {
                    used[best_g] = 1;
                    m_row[d] = 1;
                    i_row[d] = gt_ign[best_g];
                } else {
                    m_row[d] = 0;
                    i_row[d] = det_area[d] < lo || det_area[d] > hi;
                }
            }
        }
    }
}

// ---- COCO RLE mask API (maskApi.c equivalents) ----
// RLE layout: counts of alternating 0/1 runs over the column-major mask.

// encode: mask [h*w] uint8 (column-major, as COCO) -> counts; returns m (#runs)
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, uint32_t* counts,
                   int64_t max_runs) {
    int64_t n = h * w, m = 0;
    uint8_t prev = 0;
    uint32_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (mask[i] != prev) {
            if (m >= max_runs) return -1;
            counts[m++] = run;
            run = 0;
            prev = mask[i];
        }
        ++run;
    }
    if (m >= max_runs) return -1;
    counts[m++] = run;
    return m;
}

// decode: counts [m] -> mask [h*w] uint8 column-major
void rle_decode(const uint32_t* counts, int64_t m, int64_t h, int64_t w,
                uint8_t* mask) {
    int64_t pos = 0, n = h * w;
    uint8_t v = 0;
    for (int64_t i = 0; i < m && pos < n; ++i) {
        for (uint32_t k = 0; k < counts[i] && pos < n; ++k) mask[pos++] = v;
        v = !v;
    }
    while (pos < n) mask[pos++] = 0;
}

// rle area
uint64_t rle_area(const uint32_t* counts, int64_t m) {
    uint64_t a = 0;
    for (int64_t i = 1; i < m; i += 2) a += counts[i];
    return a;
}

// IoU of two RLEs (run-merge, no decode). iscrowd: intersection / area(a)
double rle_iou(const uint32_t* ca, int64_t ma, const uint32_t* cb, int64_t mb,
               int iscrowd) {
    uint64_t inter = 0;
    int64_t ia = 0, ib = 0;
    uint64_t pa = ca[0], pb = cb[0];   // positions of next run boundaries
    uint8_t va = 0, vb = 0;
    uint64_t pos = 0;
    while (ia < ma && ib < mb) {
        uint64_t nxt = std::min(pa, pb);
        if (va && vb) inter += nxt - pos;
        pos = nxt;
        if (pa == nxt) { va = !va; ++ia; if (ia < ma) pa += ca[ia]; }
        if (pb == nxt) { vb = !vb; ++ib; if (ib < mb) pb += cb[ib]; }
    }
    const uint64_t aa = rle_area(ca, ma), ab = rle_area(cb, mb);
    const double denom = iscrowd ? (double)aa
                                 : (double)aa + (double)ab - (double)inter;
    return denom > 0 ? (double)inter / denom : 0.0;
}

}  // extern "C"
