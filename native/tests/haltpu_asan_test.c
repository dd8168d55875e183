/* ASan/UBSan driver for native/libhaltpu.so (built as libhaltpu_asan.so).
 *
 * The reference CI runs its whole C++ suite under ASan
 * (reference .travis.yml:24-30); this driver covers hal_tpu's native
 * runtime equivalents, feeding each parser valid AND malformed input.
 * Buffers are heap-allocated at EXACT length with no terminator so any
 * out-of-bounds read trips ASan.
 *
 * Usage: haltpu_asan_test <libhaltpu_asan.so>
 * Exit 0 = all checks passed and no sanitizer report.
 */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
            return 1;                                                   \
        }                                                               \
    } while (0)

typedef int64_t (*parse_bed3_fn)(const char *, int64_t, const char *,
                                 const int64_t *, int64_t, int64_t *,
                                 int64_t *, int64_t *, int64_t);
typedef int64_t (*format_bed_fn)(const int64_t *, const int64_t *,
                                 const int64_t *, const uint8_t *, int64_t,
                                 const char *, const int64_t *, char *,
                                 int64_t);
typedef int64_t (*parse_fixed_fn)(const char *, int64_t, double *, int64_t);
typedef int64_t (*parse_var_fn)(const char *, int64_t, int64_t *, double *,
                                int64_t);
typedef int64_t (*extract_runs_fn)(const int64_t *, const int64_t *,
                                   const int64_t *, const int64_t *,
                                   const uint8_t *, const int64_t *,
                                   const int64_t *, int64_t, int64_t *,
                                   int64_t *, int64_t *, int64_t *,
                                   uint8_t *);
typedef int64_t (*unpack_fn)(const uint8_t *, int64_t, int64_t, uint8_t *);
typedef int64_t (*subst_fn)(const uint8_t *, const uint8_t *, const int64_t *,
                            const int64_t *, const int64_t *, const uint8_t *,
                            int64_t, int64_t *);

/* heap copy with EXACT length — not NUL-terminated */
static char *exact(const char *s, int64_t *len) {
    *len = (int64_t)strlen(s);
    char *p = (char *)malloc(*len);
    memcpy(p, s, *len);
    return p;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <libhaltpu_asan.so>\n", argv[0]);
        return 2;
    }
    void *lib = dlopen(argv[1], RTLD_NOW);
    CHECK(lib != NULL);
    parse_bed3_fn parse_bed3 = (parse_bed3_fn)dlsym(lib, "ht_parse_bed3");
    format_bed_fn format_bed = (format_bed_fn)dlsym(lib, "ht_format_bed");
    parse_fixed_fn parse_fixed =
        (parse_fixed_fn)dlsym(lib, "ht_parse_fixed_values");
    parse_var_fn parse_var =
        (parse_var_fn)dlsym(lib, "ht_parse_varstep_values");
    extract_runs_fn extract_runs =
        (extract_runs_fn)dlsym(lib, "ht_extract_runs_simple");
    unpack_fn unpack = (unpack_fn)dlsym(lib, "ht_unpack_dna");
    subst_fn subst = (subst_fn)dlsym(lib, "ht_substitution_stats");
    CHECK(parse_bed3 && format_bed && parse_fixed && parse_var &&
          extract_runs && unpack && subst);

    /* chrom name table: "chr1\0chr22\0" */
    const char names[] = "chr1\0chr22";
    const int64_t name_off[2] = {0, 5};
    int64_t cid[8], st[8], en[8], n, blen;
    char *b;

    /* valid input with comments, blanks, track/browser lines, and NO
     * trailing newline on the last record */
    b = exact("# c\ntrack name=x\nbrowser pos\n\nchr1\t0\t10\nchr22\t5\t7",
              &blen);
    n = parse_bed3(b, blen, names, name_off, 2, cid, st, en, 8);
    free(b);
    CHECK(n == 2);
    CHECK(cid[0] == 0 && st[0] == 0 && en[0] == 10);
    CHECK(cid[1] == 1 && st[1] == 5 && en[1] == 7);

    /* malformed: record with a single column (no tab) -> -1 */
    b = exact("chr1\n", &blen);
    n = parse_bed3(b, blen, names, name_off, 2, cid, st, en, 8);
    free(b);
    CHECK(n == -1);

    /* malformed: only two columns -> -1 */
    b = exact("chr1\t12\n", &blen);
    n = parse_bed3(b, blen, names, name_off, 2, cid, st, en, 8);
    free(b);
    CHECK(n == -1);

    /* capacity too small -> -2 */
    b = exact("chr1\t0\t1\nchr1\t1\t2\n", &blen);
    n = parse_bed3(b, blen, names, name_off, 2, cid, st, en, 1);
    free(b);
    CHECK(n == -2);

    /* unknown chromosome -> id -1; numeric garbage parses bounded to 0 */
    b = exact("chrX\tabc\txyz\n", &blen);
    n = parse_bed3(b, blen, names, name_off, 2, cid, st, en, 8);
    free(b);
    CHECK(n == 1 && cid[0] == -1 && st[0] == 0 && en[0] == 0);

    /* empty buffer */
    char *eb = (char *)malloc(1);
    n = parse_bed3(eb, 0, names, name_off, 2, cid, st, en, 8);
    free(eb);
    CHECK(n == 0);

    /* format: happy path into an exact-size buffer */
    {
        int64_t fcid[2] = {0, 1}, fst[2] = {0, 5}, fen[2] = {10, 7};
        char out[64];
        int64_t w = format_bed(fcid, fst, fen, NULL, 2, names, name_off, out,
                               sizeof(out));
        CHECK(w > 0 && w < (int64_t)sizeof(out));
        CHECK(memcmp(out, "chr1\t0\t10\nchr22\t5\t7\n", (size_t)w) == 0);
        /* unknown chrom id must error, not index names[-1] */
        int64_t bad[1] = {-1};
        CHECK(format_bed(bad, fst, fen, NULL, 1, names, name_off, out,
                         sizeof(out)) == -1);
        /* undersized buffer reports needed size */
        CHECK(format_bed(fcid, fst, fen, NULL, 2, names, name_off, out, 4) < 0);
    }

    /* wiggle fixed-step values: valid, then malformed (letters) */
    {
        double vals[8];
        b = exact("1.5 2 3\n-4e2\n", &blen);
        n = parse_fixed(b, blen, vals, 8);
        free(b);
        CHECK(n == 4 && vals[0] == 1.5 && vals[3] == -400.0);
        b = exact("1.5 zz\n", &blen);
        /* contract: chunk must end at whitespace; 'zz' is a parse error */
        char *nb = (char *)malloc(blen + 1);
        memcpy(nb, b, blen);
        nb[blen] = '\0';
        n = parse_fixed(nb, blen, vals, 8);
        free(nb);
        free(b);
        CHECK(n == -1);
    }

    /* variableStep values incl. capacity error */
    {
        int64_t pos[2];
        double val[2];
        b = exact("10 1.5\n20 2.5\n30 3.5\n", &blen);
        n = parse_var(b, blen, pos, val, 2);
        CHECK(n == -2);
        int64_t pos3[3];
        double val3[3];
        n = parse_var(b, blen, pos3, val3, 3);
        free(b);
        CHECK(n == 3 && pos3[0] == 9 && val3[2] == 3.5);
    }

    /* run extraction: two chains */
    {
        int64_t s_lo[3] = {0, 5, 20}, s_hi[3] = {5, 10, 25};
        int64_t t_lo[3] = {100, 105, 300}, t_hi[3] = {105, 110, 305};
        uint8_t rev[3] = {0, 0, 0};
        int64_t owner[3] = {0, 0, 0}, seq[3] = {0, 0, 0};
        int64_t ro[3], rl[3], rh[3], rs[3];
        uint8_t rr[3];
        n = extract_runs(s_lo, s_hi, t_lo, t_hi, rev, owner, seq, 3, ro, rl,
                         rh, rs, rr);
        CHECK(n == 2 && rl[0] == 100 && rh[0] == 110 && rl[1] == 300);
        CHECK(extract_runs(s_lo, s_hi, t_lo, t_hi, rev, owner, seq, 0, ro,
                           rl, rh, rs, rr) == 0);
    }

    /* nibble unpack + substitution stats over exact-size buffers */
    {
        /* codes: a=0 c=1 g=2 t=3, upper = +8; pack two per byte */
        uint8_t packed[2] = {(uint8_t)((8 << 4) | 9), (uint8_t)((2 << 4) | 3)};
        uint8_t outb[4];
        CHECK(unpack(packed, 0, 4, outb) == 4);
        CHECK(memcmp(outb, "ACgt", 4) == 0);
        int64_t stats[4] = {0, 0, 0, 0};
        int64_t c_off[1] = {0}, p_off[1] = {0}, lens[1] = {4};
        uint8_t frev[1] = {0};
        CHECK(subst(packed, packed, c_off, p_off, lens, frev, 1, stats) == 0);
        CHECK(stats[0] == 4 && stats[1] == 0);
    }

    dlclose(lib);
    printf("OK\n");
    return 0;
}
