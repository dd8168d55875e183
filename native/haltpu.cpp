// hal_tpu native runtime pieces (C++17, exposed via C ABI for ctypes).
//
// The reference implements its whole engine in C++ (api/, ~28k LoC); in
// hal_tpu the device kernels are JAX/XLA and these natives cover the
// host-side hot paths around them:
//   * BED text parsing (liftover input: millions of lines)
//   * BED text formatting (liftover output)
//   * run extraction (the per-fragment chain merge feeding BED emission)
//   * nibble-packed DNA unpack/compare (substitution statistics)
//
// Build: make -C native   ->  native/libhaltpu.so
// Python binding: hal_tpu/native.py (ctypes, optional — numpy fallback).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <string>
#include <vector>

// bounded non-negative integer parse: never reads past `end` (the buffer
// may be an mmap'd file with no terminator)
static inline int64_t parse_int_bounded(const char *p, const char *end) {
    int64_t v = 0;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = *p == '-';
        ++p;
    }
    while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p++ - '0');
    }
    return neg ? -v : v;
}

extern "C" {

// ---------------------------------------------------------------------------
// BED3 parsing: buffer -> (chrom_id, start, end) arrays.
// Chromosome names resolved against a caller-provided table of
// NUL-separated names; returns number of records, or -1 on parse error,
// -2 if out capacity too small. Unknown chromosomes get id -1.
// Reads are bounded by len — no terminator byte is required.
// ---------------------------------------------------------------------------
int64_t ht_parse_bed3(const char *buf, int64_t len,
                      const char *names, const int64_t *name_offsets, int64_t n_names,
                      int64_t *chrom_id, int64_t *starts, int64_t *ends,
                      int64_t cap) {
    int64_t n = 0;
    const char *p = buf;
    const char *end = buf + len;
    while (p < end) {
        // skip blank/comment/track lines
        if (*p == '\n') { ++p; continue; }
        const char *line_end = (const char *)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        if (*p == '#' || (line_end - p >= 5 && !strncmp(p, "track", 5)) ||
            (line_end - p >= 7 && !strncmp(p, "browser", 7))) {
            p = line_end + 1;
            continue;
        }
        const char *tab1 = (const char *)memchr(p, '\t', line_end - p);
        if (!tab1) return -1;
        const char *tab2 = (const char *)memchr(tab1 + 1, '\t', line_end - tab1 - 1);
        if (!tab2) return -1;
        if (n >= cap) return -2;
        // resolve chrom by linear scan with memo of last hit (inputs are
        // usually sorted by chromosome, so this is effectively O(1))
        static thread_local int64_t last = 0;
        int64_t id = -1;
        size_t cl = tab1 - p;
        for (int64_t k = 0; k < n_names; ++k) {
            int64_t i = (last + k) % n_names;
            const char *nm = names + name_offsets[i];
            if (!strncmp(nm, p, cl) && nm[cl] == '\0') { id = i; last = i; break; }
        }
        chrom_id[n] = id;
        starts[n] = parse_int_bounded(tab1 + 1, line_end);
        ends[n] = parse_int_bounded(tab2 + 1, line_end);
        ++n;
        p = line_end + 1;
    }
    return n;
}

// ---------------------------------------------------------------------------
// BED formatting: (chrom_id, start, end[, strand]) arrays -> text buffer.
// Returns bytes written, or -(needed) if cap too small.
// ---------------------------------------------------------------------------
int64_t ht_format_bed(const int64_t *chrom_id, const int64_t *starts,
                      const int64_t *ends, const uint8_t *strands /*0:+ 1:- 2:. or NULL*/,
                      int64_t n,
                      const char *names, const int64_t *name_offsets,
                      char *out, int64_t cap) {
    char *w = out;
    char *lim = out + cap;
    for (int64_t i = 0; i < n; ++i) {
        if (chrom_id[i] < 0) return -1;  // unknown chrom from ht_parse_bed3
        const char *nm = names + name_offsets[chrom_id[i]];
        int need = snprintf(nullptr, 0, "%s\t%lld\t%lld", nm,
                            (long long)starts[i], (long long)ends[i]) + 16;
        if (w + need >= lim) return -(int64_t)((w - out) + need + 1);
        w += sprintf(w, "%s\t%lld\t%lld", nm, (long long)starts[i], (long long)ends[i]);
        if (strands) {
            *w++ = '\t'; *w++ = '\t'; *w++ = '0'; *w++ = '\t';
            *w++ = strands[i] == 0 ? '+' : (strands[i] == 1 ? '-' : '.');
        }
        *w++ = '\n';
    }
    return w - out;
}

// ---------------------------------------------------------------------------
// Run extraction (simple path): fragments pre-sorted by
// (owner, tgt_lo, tgt_hi, src_lo); chains per owner where target runs
// contiguous and source contiguous in the orientation's direction and the
// target sequence (given by seq_of) is unchanged.  Writes run arrays,
// returns run count.
// ---------------------------------------------------------------------------
int64_t ht_extract_runs_simple(const int64_t *s_lo, const int64_t *s_hi,
                               const int64_t *t_lo, const int64_t *t_hi,
                               const uint8_t *rev, const int64_t *owner,
                               const int64_t *seq_of, int64_t n,
                               int64_t *run_owner, int64_t *run_lo, int64_t *run_hi,
                               int64_t *run_src, uint8_t *run_rev) {
    if (n == 0) return 0;
    int64_t r = 0;
    int64_t cur_first = 0;
    for (int64_t i = 1; i <= n; ++i) {
        bool chain = false;
        if (i < n) {
            bool same_owner = owner[i] == owner[i - 1];
            bool same_rev = rev[i] == rev[i - 1];
            bool tgt_adj = t_lo[i] == t_hi[i - 1];
            bool src_adj = rev[i - 1] ? (s_lo[i - 1] == s_hi[i]) : (s_lo[i] == s_hi[i - 1]);
            bool same_seq = seq_of[i] == seq_of[i - 1];
            chain = same_owner && same_rev && tgt_adj && src_adj && same_seq;
        }
        if (!chain) {
            run_owner[r] = owner[cur_first];
            run_lo[r] = t_lo[cur_first];
            run_hi[r] = t_hi[i - 1];
            run_src[r] = std::min(s_lo[cur_first], s_lo[i - 1]);
            run_rev[r] = rev[cur_first];
            ++r;
            cur_first = i;
        }
    }
    return r;
}

// ---------------------------------------------------------------------------
// Nibble-packed DNA substitution statistics over fragment pairs.
// Codes: 0..4 = acgtn, 8..12 = ACGTN (api/inc/halCommon.h:183-196).
// For each fragment k: child bases [c_off, c_off+len) vs parent bases
// oriented per rev[k] from [p_off, p_off+len) (p_off is the FORWARD start).
// Accumulates matches/subs/transitions/transversions (case-insensitive,
// N excluded).  Returns 0.
// ---------------------------------------------------------------------------
static inline uint8_t unpack_base(const uint8_t *packed, int64_t pos) {
    uint8_t b = packed[pos >> 1];
    return (pos & 1) ? (b & 0x0F) : (b >> 4);
}

int64_t ht_substitution_stats(const uint8_t *child_packed, const uint8_t *parent_packed,
                              const int64_t *c_off, const int64_t *p_off,
                              const int64_t *lens, const uint8_t *rev, int64_t n_frags,
                              int64_t *out4 /*matches, subs, transitions, transversions*/) {
    int64_t matches = 0, subs = 0, ts = 0, tv = 0;
    for (int64_t k = 0; k < n_frags; ++k) {
        int64_t len = lens[k];
        for (int64_t i = 0; i < len; ++i) {
            uint8_t c = unpack_base(child_packed, c_off[k] + i) & 7;
            uint8_t p;
            if (rev[k]) {
                p = unpack_base(parent_packed, p_off[k] + len - 1 - i) & 7;
                if (p < 4) p = 3 - p;  // complement acgt
            } else {
                p = unpack_base(parent_packed, p_off[k] + i) & 7;
            }
            if (c >= 4 || p >= 4) continue;  // N or invalid
            if (c == p) { ++matches; continue; }
            ++subs;
            bool c_pur = (c == 0) || (c == 2);  // a or g
            bool p_pur = (p == 0) || (p == 2);
            if (c_pur == p_pur) ++ts; else ++tv;
        }
    }
    out4[0] += matches; out4[1] += subs; out4[2] += ts; out4[3] += tv;
    return 0;
}

// ---------------------------------------------------------------------------
// Bulk DNA unpack: packed -> ASCII (for fast FASTA/MAF emission).
// ---------------------------------------------------------------------------
int64_t ht_unpack_dna(const uint8_t *packed, int64_t start, int64_t len,
                      uint8_t *out) {
    static const char MAP[16] = {'a','c','g','t','n',0,0,0,'A','C','G','T','N',0,0,0};
    for (int64_t i = 0; i < len; ++i) {
        out[i] = MAP[unpack_base(packed, start + i)];
    }
    return len;
}

// ---------------------------------------------------------------------------
// Wiggle value parsing (reference liftover/impl/halWiggleScanner.cpp).
// The Python reader locates the (rare) fixedStep/variableStep header lines
// and hands the dense numeric chunks between them to these parsers.
// ---------------------------------------------------------------------------
int64_t ht_parse_fixed_values(const char *buf, int64_t len,
                              double *out, int64_t cap) {
    int64_t n = 0;
    const char *p = buf;
    const char *end = buf + len;
    while (p < end) {
        while (p < end && (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t')) ++p;
        if (p >= end) break;
        if (n >= cap) return -2;
        char *q;
        out[n++] = strtod(p, &q);
        if (q == p) return -1;
        p = q;
    }
    return n;
}

// variableStep chunks: "<pos> <value>" per line (1-based positions).
int64_t ht_parse_varstep_values(const char *buf, int64_t len,
                                int64_t *pos, double *val, int64_t cap) {
    int64_t n = 0;
    const char *p = buf;
    const char *end = buf + len;
    while (p < end) {
        while (p < end && (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t')) ++p;
        if (p >= end) break;
        if (n >= cap) return -2;
        char *q;
        long long ip = strtoll(p, &q, 10);
        if (q == p) return -1;
        p = q;
        double v = strtod(p, &q);
        if (q == p) return -1;
        pos[n] = ip - 1;  // 0-based
        val[n] = v;
        ++n;
        p = q;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Wiggle value formatting: one %g per line (the hal2* wiggle emitters'
// inner loop; Python string formatting dominates genome-scale outputs).
// Returns bytes written, or -(needed) if cap too small.
// ---------------------------------------------------------------------------
int64_t ht_format_wiggle_values(const double *vals, int64_t n,
                                char *out, int64_t cap) {
    char *w = out;
    char *lim = out + cap;
    for (int64_t i = 0; i < n; ++i) {
        if (w + 32 >= lim) return -(int64_t)((w - out) + (n - i) * 32 + 1);
        double v = vals[i];
        long long iv = (long long)v;
        // integral fast path, bounded where "%g" also prints plain digits
        if ((double)iv == v && v > -1e6 && v < 1e6) {
            w += sprintf(w, "%lld\n", iv);
        } else {
            w += snprintf(w, 32, "%g\n", v);
        }
    }
    return w - out;
}

// ---------------------------------------------------------------------------
// Dense signal accumulation (reference WiggleTiles<T>,
// liftover/inc/halWiggleTiles.h:55-114): scatter values into a tile,
// last-writer-wins (matching the reference's overwrite semantics).
// ---------------------------------------------------------------------------
int64_t ht_scatter_values(const int64_t *pos, const double *val, int64_t n,
                          double *tile, uint8_t *mask, int64_t tile_len) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = pos[i];
        if (p < 0 || p >= tile_len) continue;
        tile[p] = val[i];
        mask[p] = 1;
    }
    return 0;
}

}  // extern "C"
