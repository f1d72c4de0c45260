/* Native host-side input-stack kernels.
 *
 * The TPU compute path is JAX/XLA/Pallas; this C extension accelerates the
 * host runtime around it (the reference has no native layer at all —
 * SURVEY.md §2). Two hot collate loops:
 *
 *   pad_sequences_i64: variable-length int64 sequences → fixed [N, max_len]
 *     with pre/post pad+truncate (LongCTR per-batch side-table join,
 *     longctr_dataloader.py padding_seqs).
 *   take_rows_*: row gather from a host-resident side table (item feature
 *     join) without pandas .iloc overhead.
 *
 * Exposed through ctypes (no pybind11 in this image); buffers are passed
 * as raw pointers from numpy with explicit shapes/strides-free contiguous
 * layout.
 */

#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* seq_data: concatenated sequences; offsets[i]..offsets[i+1] delimit row i.
 * lens[i]: requested length (seq_len column); effective = min(len, row_len).
 * out: [n, max_len] zero-initialized by caller.
 * pre_pad: 1 = keep LAST max_len elements, pad at front (reference default
 * for LongCTR); 0 = keep first, pad at back. */
EXPORT void pad_sequences_i64(const int64_t *seq_data,
                              const int64_t *offsets,
                              const int64_t *lens,
                              int64_t n,
                              int64_t max_len,
                              int pre_pad,
                              int64_t *out) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t row_len = offsets[i + 1] - offsets[i];
        int64_t eff = lens[i] < row_len ? lens[i] : row_len;
        const int64_t *src = seq_data + offsets[i];
        /* truncate: keep the last max_len of the first eff elements */
        int64_t keep = eff < max_len ? eff : max_len;
        const int64_t *start;
        if (pre_pad) {
            start = src + (eff - keep);
            memcpy(out + i * max_len + (max_len - keep), start,
                   (size_t)keep * sizeof(int64_t));
        } else {
            start = src;
            memcpy(out + i * max_len, start, (size_t)keep * sizeof(int64_t));
        }
    }
}

EXPORT void take_rows_i64(const int64_t *table, const int64_t *ids,
                          int64_t n, int64_t width, int64_t *out) {
    for (int64_t i = 0; i < n; ++i) {
        memcpy(out + i * width, table + ids[i] * width,
               (size_t)width * sizeof(int64_t));
    }
}

EXPORT void take_rows_f32(const float *table, const int64_t *ids,
                          int64_t n, int64_t width, float *out) {
    for (int64_t i = 0; i < n; ++i) {
        memcpy(out + i * width, table + ids[i] * width,
               (size_t)width * sizeof(float));
    }
}

/* Hash-based unique+inverse (first-occurrence order) — replaces the
 * sort-based np.unique in the LongCTR dedup collate (40-190 ms/1M ids on
 * this host; this is a single linear pass). ht_keys must be pre-filled
 * with -1 and ht_size a power of two >= 2n. Returns the unique count. */
EXPORT int64_t unique_inverse_i64(const int64_t *ids, int64_t n,
                                  int64_t *uniq, int32_t *inv,
                                  int64_t *ht_keys, int32_t *ht_vals,
                                  int64_t ht_size) {
    const uint64_t mult = 0x9E3779B97F4A7C15ull;
    const uint64_t mask = (uint64_t)ht_size - 1;
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t key = ids[i];
        uint64_t slot = ((uint64_t)key * mult) & mask;
        for (;;) {
            int64_t k = ht_keys[slot];
            if (k == key) {
                inv[i] = ht_vals[slot];
                break;
            }
            if (k == -1) {
                ht_keys[slot] = key;
                ht_vals[slot] = (int32_t)count;
                uniq[count] = key;
                inv[i] = (int32_t)count;
                ++count;
                break;
            }
            slot = (slot + 1) & mask;
        }
    }
    return count;
}
