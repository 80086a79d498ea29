/* Reference-compatible MT19937 random stream (C implementation).
 *
 * Bit-exact re-implementation of the RNG the reference Fortran code uses
 * (random_mod.f90:5-115): the classic 1994-vintage Mersenne-Twister port
 * with the Knuth 69069 linear-congruential seeding (sgrnd,
 * random_mod.f90:25-28) and the (y + 2^32)/(2^32 - 1) double conversion
 * (random_mod.f90:108-112), plus the polar Box-Muller rejection sampler
 * (rangauss, random_mod.f90:195-219).
 *
 * Purpose: golden parity streams — replaying the reference's exact random
 * sequence lets the test-suite reproduce reference trajectories on small
 * configurations without a Fortran toolchain.  Also usable as a fast host-
 * side RNG for ensemble initialization.
 *
 * Build: cc -O2 -shared -fPIC -o libmtref.so mtref.c  (see utils/refrng.py)
 */

#include <math.h>
#include <stdint.h>
#include <string.h>

#define MT_N 624
#define MT_M 397
#define MATA 0x9908b0dfU   /* = -1727483681 as i32 (random_mod.f90:44) */
#define UMASK 0x80000000U
#define LMASK 0x7fffffffU
#define TMASKB 0x9d2c5680U /* = -1658038656 (random_mod.f90:47) */
#define TMASKC 0xefc60000U /* = -272236544 (random_mod.f90:48) */

typedef struct {
    uint32_t mt[MT_N];
    int mti;
} mtref_state;

void mtref_seed(mtref_state *s, uint32_t seed)
{
    s->mt[0] = seed;
    for (int i = 1; i < MT_N; i++)
        s->mt[i] = (uint32_t)(69069u * s->mt[i - 1]);
    s->mti = MT_N;
}

static void mtref_generate(mtref_state *s)
{
    uint32_t y;
    int kk;
    for (kk = 0; kk < MT_N - MT_M; kk++) {
        y = (s->mt[kk] & UMASK) | (s->mt[kk + 1] & LMASK);
        s->mt[kk] = s->mt[kk + MT_M] ^ (y >> 1) ^ ((y & 1u) ? MATA : 0u);
    }
    for (; kk < MT_N - 1; kk++) {
        y = (s->mt[kk] & UMASK) | (s->mt[kk + 1] & LMASK);
        s->mt[kk] = s->mt[kk + (MT_M - MT_N)] ^ (y >> 1) ^ ((y & 1u) ? MATA : 0u);
    }
    y = (s->mt[MT_N - 1] & UMASK) | (s->mt[0] & LMASK);
    s->mt[MT_N - 1] = s->mt[MT_M - 1] ^ (y >> 1) ^ ((y & 1u) ? MATA : 0u);
    s->mti = 0;
}

double mtref_grnd(mtref_state *s)
{
    if (s->mti >= MT_N)
        mtref_generate(s);
    uint32_t y = s->mt[s->mti++];
    y ^= y >> 11;
    y ^= (y << 7) & TMASKB;
    y ^= (y << 15) & TMASKC;
    y ^= y >> 18;
    /* random_mod.f90:108-112: signed y < 0 -> +2^32; divide by 2^32 - 1 */
    return (double)y / 4294967295.0;
}

void mtref_grnd_array(mtref_state *s, double *out, long n)
{
    for (long i = 0; i < n; i++)
        out[i] = mtref_grnd(s);
}

/* rangauss (random_mod.f90:195-219): polar Box-Muller; returns x1, x2 */
void mtref_rangauss(mtref_state *s, double sigma, double mu,
                    double *x1, double *x2)
{
    double u1, u2, w;
    do {
        u1 = 2.0 * mtref_grnd(s) - 1.0;
        u2 = 2.0 * mtref_grnd(s) - 1.0;
        w = u1 * u1 + u2 * u2;
    } while (w > 1.0);
    w = sqrt((-2.0 * log(w)) / w);
    *x1 = mu + sigma * u1 * w;
    *x2 = mu + sigma * u2 * w;
}

void mtref_rangauss_array(mtref_state *s, double sigma, double mu,
                          double *out, long n)
{
    double x1, x2;
    for (long i = 0; i < n; i++) {
        mtref_rangauss(s, sigma, mu, &x1, &x2);
        out[i] = x1; /* the reference's callers use only x1 (vpi_mod.f90:515) */
    }
}

int mtref_state_size(void) { return (int)sizeof(mtref_state); }
int mtref_get_mti(const mtref_state *s) { return s->mti; }
void mtref_get_mt(const mtref_state *s, uint32_t *out)
{
    memcpy(out, s->mt, sizeof(s->mt));
}
void mtref_set(mtref_state *s, const uint32_t *mt, int mti)
{
    memcpy(s->mt, mt, sizeof(s->mt));
    s->mti = mti;
}
