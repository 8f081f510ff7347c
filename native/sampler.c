/* Native AMASS batch sampler.
 *
 * The training data path (random window crop + occlusion-mask synthesis,
 * reference motion_infiller/data/amass_dataset.py:35-110) is pure
 * per-sample host work; at batch 1024 the Python loop becomes the input
 * bottleneck for a TPU train step. This C implementation fills a whole
 * batch in one call over contiguous buffers:
 *
 *   theta:   all sequences concatenated, (total_frames, 85) float32
 *            [trans(3) | pose(72) | shape(10)]
 *   offsets: (n_seqs+1,) int64 frame offsets into theta
 *   cumprob: (n_seqs,) float64 cumulative sampling probability
 *
 * Outputs per batch row (seq_len = S):
 *   out_theta          (B, S, 85)   window (short seqs edge-padded)
 *   out_in_body_pose   (B, S, 69)   body pose with dropped frames zeroed
 *   out_frame_mask     (B, S)       1 = visible
 *   out_loss_mask      (B, S)       1 = real frame (0 = pad)
 *
 * RNG: splitmix64 / xorshift, seeded per call — deterministic given
 * (seed), matching the framework's explicit-PRNG policy.
 */
#include <stdint.h>
#include <string.h>

typedef struct { uint64_t s; } rng_t;

static inline uint64_t splitmix64(rng_t *r) {
    uint64_t z = (r->s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static inline double rng_uniform(rng_t *r) {
    return (splitmix64(r) >> 11) * (1.0 / 9007199254740992.0);
}

/* uniform integer in [0, n) */
static inline int64_t rng_below(rng_t *r, int64_t n) {
    return (int64_t)(rng_uniform(r) * (double)n) % (n > 0 ? n : 1);
}

void sample_batch(
    const float *theta, const int64_t *offsets, const double *cumprob,
    int64_t n_seqs, int64_t batch, int64_t seq_len,
    /* drop_frames mask spec; min_drop_len<0 disables masking */
    int64_t preserve_first_n, int64_t preserve_last_n,
    int64_t min_drop_len, int64_t max_drop_len,
    uint64_t seed,
    float *out_theta, float *out_in_body_pose,
    float *out_frame_mask, float *out_loss_mask)
{
    const int64_t D = 85, BP = 69;
    rng_t rng = { seed * 0x9E3779B97F4A7C15ULL + 1 };

    for (int64_t b = 0; b < batch; b++) {
        /* pick a sequence by cumulative probability */
        double u = rng_uniform(&rng);
        int64_t lo = 0, hi = n_seqs - 1;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (cumprob[mid] < u) lo = mid + 1; else hi = mid;
        }
        int64_t s0 = offsets[lo], s1 = offsets[lo + 1];
        int64_t L = s1 - s0;

        float *th = out_theta + b * seq_len * D;
        float *ibp = out_in_body_pose + b * seq_len * BP;
        float *fm = out_frame_mask + b * seq_len;
        float *lm = out_loss_mask + b * seq_len;

        int64_t eff = seq_len < L ? seq_len : L;
        int64_t start = (seq_len <= L) ? rng_below(&rng, L - seq_len + 1) : 0;

        for (int64_t t = 0; t < seq_len; t++) {
            int64_t src = (t < eff) ? (s0 + start + t) : (s1 - 1); /* edge pad */
            memcpy(th + t * D, theta + src * D, D * sizeof(float));
            lm[t] = (t < eff) ? 1.0f : 0.0f;
            fm[t] = 1.0f;
        }

        /* occlusion mask: one contiguous drop span (reference :93-110) */
        if (min_drop_len >= 0) {
            int64_t drop = min_drop_len +
                rng_below(&rng, max_drop_len - min_drop_len + 1);
            int64_t smin = preserve_first_n;
            int64_t smax = seq_len - drop + 1 - preserve_last_n;
            if (smax > eff) smax = eff;
            if (smax <= smin) smax = smin + 1;
            int64_t ds = smin + rng_below(&rng, smax - smin);
            int64_t de = ds + drop;
            if (de > seq_len) de = seq_len;
            for (int64_t t = ds; t < de; t++) fm[t] = 0.0f;
        }

        /* masked input body pose: theta[:, 6:75] * frame_mask */
        for (int64_t t = 0; t < seq_len; t++) {
            const float *src = th + t * D + 6;
            float m = fm[t];
            for (int64_t c = 0; c < BP; c++) ibp[t * BP + c] = src[c] * m;
        }
    }
}
