/* Native batch kernels for fuzzspark: blocked bit-parallel LCS,
 * Levenshtein (Myers), and OSA (Hyyrö) over batches of code-point
 * sequences.  Public algorithms (Myers 1999; Hyyrö 2002/2003);
 * implementation written for this project — behavior-parity target is
 * rapidfuzz-rs (see fuzzspark/kernels/_bitpar.py for the pure-Python
 * reference implementations these are tested against).
 *
 * Batch layout: flattened uint32 code points + int64 offsets
 * (offsets[i]..offsets[i+1] is sequence i), one call scores n pairs.
 * Compiled on demand by _native.py:  gcc -O3 -shared -fPIC.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define EMPTY_KEY 0xFFFFFFFFu

typedef struct {
    uint32_t *keys;      /* open addressing, linear probe */
    int32_t  *rowidx;    /* slot -> row in masks */
    uint64_t *masks;     /* nrows x words */
    uint32_t  cap;       /* power of two */
    int32_t   nrows;
    int64_t   words;
} PM;

static inline uint32_t hash32(uint32_t x) {
    x ^= x >> 16; x *= 0x7feb352du;
    x ^= x >> 15; x *= 0x846ca68bu;
    x ^= x >> 16; return x;
}

static int pm_build(PM *pm, const uint32_t *pat, int64_t m, int64_t words) {
    uint32_t cap = 16;
    while (cap < (uint32_t)(2 * m)) cap <<= 1;
    pm->cap = cap; pm->words = words; pm->nrows = 0;
    pm->keys = (uint32_t *)malloc((size_t)cap * sizeof(uint32_t));
    pm->rowidx = (int32_t *)malloc((size_t)cap * sizeof(int32_t));
    if (!pm->keys || !pm->rowidx) return -1;
    memset(pm->keys, 0xFF, (size_t)cap * sizeof(uint32_t));
    /* distinct chars <= m */
    pm->masks = (uint64_t *)calloc((size_t)m * (size_t)words,
                                   sizeof(uint64_t));
    if (!pm->masks) return -1;
    for (int64_t i = 0; i < m; i++) {
        uint32_t c = pat[i];
        uint32_t slot = hash32(c) & (cap - 1);
        while (pm->keys[slot] != EMPTY_KEY && pm->keys[slot] != c)
            slot = (slot + 1) & (cap - 1);
        int32_t row;
        if (pm->keys[slot] == EMPTY_KEY) {
            pm->keys[slot] = c;
            row = pm->nrows++;
            pm->rowidx[slot] = row;
        } else {
            row = pm->rowidx[slot];
        }
        pm->masks[(size_t)row * words + (i >> 6)] |= 1ull << (i & 63);
    }
    return 0;
}

static inline const uint64_t *pm_get(const PM *pm, uint32_t c) {
    uint32_t slot = hash32(c) & (pm->cap - 1);
    while (1) {
        uint32_t k = pm->keys[slot];
        if (k == c) return pm->masks + (size_t)pm->rowidx[slot] * pm->words;
        if (k == EMPTY_KEY) return NULL;
        slot = (slot + 1) & (pm->cap - 1);
    }
}

static void pm_free(PM *pm) {
    free(pm->keys); free(pm->rowidx); free(pm->masks);
}

/* ---------------- LCS (Hyyrö bit-parallel, blocked) ---------------- */

static int64_t lcs_one(const uint32_t *pat, int64_t m,
                       const uint32_t *txt, int64_t n,
                       uint64_t *S /* scratch words */, const PM *pm) {
    int64_t words = (m + 63) >> 6;
    for (int64_t k = 0; k < words; k++) S[k] = ~0ull;
    uint64_t top = (m & 63) ? ((1ull << (m & 63)) - 1ull) : ~0ull;
    S[words - 1] = top;
    for (int64_t j = 0; j < n; j++) {
        const uint64_t *M = pm_get(pm, txt[j]);
        if (!M) continue;          /* u = 0 everywhere -> S unchanged */
        uint64_t carry = 0;
        for (int64_t k = 0; k < words; k++) {
            uint64_t Sk = S[k];
            uint64_t u = Sk & M[k];
            uint64_t t = Sk + u;
            uint64_t c1 = t < Sk;
            uint64_t t2 = t + carry;
            uint64_t c2 = t2 < t;
            S[k] = t2 | (Sk - u);
            carry = c1 | c2;
        }
        S[words - 1] &= top;
    }
    int64_t zeros = 0;
    for (int64_t k = 0; k < words; k++)
        zeros += 64 - __builtin_popcountll(S[k]);
    zeros -= (64 * words - m);     /* bits beyond m in the (masked) top word */
    return zeros;
}

/* ------------- Levenshtein (Myers 1999, blocked words) -------------- */

static int64_t lev_one(const uint32_t *pat, int64_t m,
                       const uint32_t *txt, int64_t n,
                       uint64_t *VP, uint64_t *VN, const PM *pm) {
    int64_t words = (m + 63) >> 6;
    for (int64_t k = 0; k < words; k++) { VP[k] = ~0ull; VN[k] = 0; }
    uint64_t top = (m & 63) ? ((1ull << (m & 63)) - 1ull) : ~0ull;
    VP[words - 1] = top;
    uint64_t msb = 1ull << ((m - 1) & 63);
    int64_t dist = m;
    static const uint64_t ZROW_MAX = 0; (void)ZROW_MAX;
    for (int64_t j = 0; j < n; j++) {
        const uint64_t *M = pm_get(pm, txt[j]);
        uint64_t carry_d0 = 0;     /* carry of (X & VP) + VP */
        uint64_t hp_carry = 1;     /* HP << 1 | 1 at word 0 */
        uint64_t hn_carry = 0;
        for (int64_t k = 0; k < words; k++) {
            uint64_t PMk = M ? M[k] : 0;
            uint64_t X = PMk | VN[k];
            uint64_t a = X & VP[k];
            uint64_t t = a + VP[k];
            uint64_t c1 = t < a;
            uint64_t t2 = t + carry_d0;
            uint64_t c2 = t2 < t;
            carry_d0 = c1 | c2;
            uint64_t D0 = (t2 ^ VP[k]) | X;
            uint64_t HP = VN[k] | ~(D0 | VP[k]);
            uint64_t HN = D0 & VP[k];
            if (k == words - 1) {
                if (HP & msb) dist++;
                else if (HN & msb) dist--;
            }
            uint64_t HPs = (HP << 1) | hp_carry;
            uint64_t HNs = (HN << 1) | hn_carry;
            hp_carry = HP >> 63;
            hn_carry = HN >> 63;
            VP[k] = HNs | ~(D0 | HPs);
            VN[k] = HPs & D0;
        }
        VP[words - 1] &= top;
        VN[words - 1] &= top;
    }
    return dist;
}

/* -------- OSA (Hyyrö 2003 Damerau variant, blocked words) ----------- */

static int64_t osa_one(const uint32_t *pat, int64_t m,
                       const uint32_t *txt, int64_t n,
                       uint64_t *VP, uint64_t *VN, uint64_t *D0v,
                       uint64_t *PMprev, const PM *pm) {
    int64_t words = (m + 63) >> 6;
    for (int64_t k = 0; k < words; k++) {
        VP[k] = ~0ull; VN[k] = 0; D0v[k] = 0; PMprev[k] = 0;
    }
    uint64_t top = (m & 63) ? ((1ull << (m & 63)) - 1ull) : ~0ull;
    VP[words - 1] = top;
    uint64_t msb = 1ull << ((m - 1) & 63);
    int64_t dist = m;
    for (int64_t j = 0; j < n; j++) {
        const uint64_t *M = pm_get(pm, txt[j]);
        uint64_t carry_d0 = 0, hp_carry = 1, hn_carry = 0, tr_carry = 0;
        for (int64_t k = 0; k < words; k++) {
            uint64_t PMk = M ? M[k] : 0;
            uint64_t nd = (~D0v[k]) & PMk;
            uint64_t TR = ((nd << 1) | tr_carry) & PMprev[k];
            tr_carry = nd >> 63;
            uint64_t a = PMk & VP[k];
            uint64_t t = a + VP[k];
            uint64_t c1 = t < a;
            uint64_t t2 = t + carry_d0;
            uint64_t c2 = t2 < t;
            carry_d0 = c1 | c2;
            uint64_t D0 = ((t2 ^ VP[k]) | PMk | VN[k]) | TR;
            uint64_t HP = VN[k] | ~(D0 | VP[k]);
            uint64_t HN = D0 & VP[k];
            if (k == words - 1) {
                if (HP & msb) dist++;
                else if (HN & msb) dist--;
            }
            uint64_t HPs = (HP << 1) | hp_carry;
            uint64_t HNs = (HN << 1) | hn_carry;
            hp_carry = HP >> 63;
            hn_carry = HN >> 63;
            VP[k] = HNs | ~(D0 | HPs);
            VN[k] = HPs & D0;
            D0v[k] = D0;
            PMprev[k] = PMk;
        }
        VP[words - 1] &= top;
        VN[words - 1] &= top;
        D0v[words - 1] &= top;
    }
    return dist;
}

/* ------------------------- batch drivers ---------------------------- */

typedef int64_t (*scratch2_fn)(void);

static int64_t max_words(const int64_t *off, int64_t n_pairs) {
    int64_t mw = 1;
    for (int64_t i = 0; i < n_pairs; i++) {
        int64_t m = off[i + 1] - off[i];
        int64_t w = (m + 63) >> 6;
        if (w > mw) mw = w;
    }
    return mw;
}

/* kind: 0 = lcs similarity, 1 = levenshtein distance, 2 = osa distance */
int batch_metric(int kind,
                 const uint32_t *pat, const int64_t *pat_off,
                 const uint32_t *txt, const int64_t *txt_off,
                 int64_t n_pairs, int64_t *out) {
    int64_t mw = max_words(pat_off, n_pairs);
    uint64_t *s1 = (uint64_t *)malloc((size_t)mw * sizeof(uint64_t));
    uint64_t *s2 = (uint64_t *)malloc((size_t)mw * sizeof(uint64_t));
    uint64_t *s3 = (uint64_t *)malloc((size_t)mw * sizeof(uint64_t));
    uint64_t *s4 = (uint64_t *)malloc((size_t)mw * sizeof(uint64_t));
    if (!s1 || !s2 || !s3 || !s4) {
        free(s1); free(s2); free(s3); free(s4);
        return -1;
    }
    int rc = 0;
    PM pm;
    const uint32_t *last_pat = NULL;
    int64_t last_m = -1;
    int have_pm = 0;
    for (int64_t i = 0; i < n_pairs; i++) {
        const uint32_t *p = pat + pat_off[i];
        int64_t m = pat_off[i + 1] - pat_off[i];
        const uint32_t *t = txt + txt_off[i];
        int64_t n = txt_off[i + 1] - txt_off[i];
        if (m == 0) { out[i] = (kind == 0) ? 0 : n; continue; }
        if (n == 0) { out[i] = (kind == 0) ? 0 : m; continue; }
        /* BatchComparator analog: reuse masks when consecutive pairs
         * share the same pattern pointer+length (caller sorts). */
        if (!(have_pm && p == last_pat && m == last_m)) {
            if (have_pm) pm_free(&pm);
            if (pm_build(&pm, p, m, (m + 63) >> 6) != 0) { rc = -1; break; }
            have_pm = 1; last_pat = p; last_m = m;
        }
        if (kind == 0)      out[i] = lcs_one(p, m, t, n, s1, &pm);
        else if (kind == 1) out[i] = lev_one(p, m, t, n, s1, s2, &pm);
        else                out[i] = osa_one(p, m, t, n, s1, s2, s3, s4, &pm);
    }
    if (have_pm) pm_free(&pm);
    free(s1); free(s2); free(s3); free(s4);
    return rc;
}
