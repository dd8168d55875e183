// hal_tpu native column engine: the exact hal2maf hot path in C++17.
//
// This is the native-runtime implementation of the same two algorithms the
// Python package defines and tests:
//
//   * the run-hoisted column DFS of hal_tpu/ops/column.py (ColumnDFS /
//     iter_slices_exact): one tree spreading per RUN of identical columns
//     instead of the reference's per-column recursion
//     (/root/reference/api/impl/halColumnIterator.cpp:65-145, 246-356,
//     557-745 — behaviourally equivalent, structurally re-designed),
//   * the MAF block entry state machine of hal_tpu/io/maf_io.py
//     (MafBlockBuilder), reproducing the reference's MafBlock rules
//     (/root/reference/maf/impl/halMafBlock.cpp: initBlock :294,
//     appendColumn :370, canAppendColumn :401, printBlock :499,
//     resetEntries :36-79) byte-for-byte.
//
// It reads the columnar genome arrays (int64 starts/links, uint8 flags,
// nibble-packed DNA) in place — zero copies — and emits finished MAF text
// into a growing buffer the Python binding drains per window.  Python
// remains the oracle: tests assert byte equality against the pure-Python
// path on every flag combination.
//
// Round 5 adds the --maxRefGap indel stacks (ColumnDFS eval_del_site/
// eval_ins_site + the iter_slices_exact stack walker) and the --global
// shared visit cache (PosCache, persisted across ce_set_ref passes).
// Not handled here (Python fallback): --printTree gene trees.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <string>
#include <vector>

namespace {

constexpr int64_t NULL_INDEX = -1;

// 4-bit nibble code -> ASCII base (hal_tpu/dna.py UNPACK_MAP; layout per
// /root/reference/api/inc/halCommon.h:183-196: even position = high nibble)
const char UNPACK[16] = {'a', 'c', 'g', 't', 'n', 0, 0, 0,
                         'A', 'C', 'G', 'T', 'N', 0, 0, 0};

struct CompTable {
  char m[256];
  CompTable() {
    for (int i = 0; i < 256; ++i) m[i] = static_cast<char>(i);
    const char* a = "acgtACGT";
    const char* b = "tgcaTGCA";
    for (int i = 0; i < 8; ++i) m[static_cast<unsigned char>(a[i])] = b[i];
  }
};
const CompTable COMP;

inline char base_at(const uint8_t* dna, int64_t i) {
  uint8_t byte = dna[i >> 1];
  return UNPACK[(i & 1) ? (byte & 0xF) : (byte >> 4)];
}

struct GenomeT {
  std::string name;
  const int64_t* seq_start = nullptr;  // n_seq+1
  const int64_t* seq_top = nullptr;    // n_seq+1
  const int64_t* seq_bot = nullptr;    // n_seq+1
  const int64_t* top_start = nullptr;  // n_top+1
  const int64_t* top_parent = nullptr;
  const uint8_t* top_rev = nullptr;
  const int64_t* top_para = nullptr;    // may be null
  const int64_t* top_bparse = nullptr;  // may be null
  const int64_t* bot_start = nullptr;   // n_bot+1
  const int64_t* bot_tparse = nullptr;  // may be null
  const int64_t* bot_child = nullptr;   // (n_bot, n_children) row-major
  const uint8_t* bot_crev = nullptr;
  const uint8_t* dna = nullptr;  // nibble-packed, may be null
  int64_t n_seq = 0, n_top = 0, n_bot = 0, n_children = 0;
  int64_t parent = -1;          // genome id
  int64_t slot_in_parent = -1;  // my column in parent's bot_child
  std::vector<int64_t> children;
  std::vector<std::string> seq_names;  // display names (ucsc applied)
  int64_t name_rank = 0;
  bool in_scope = true, is_target = true, is_leaf = true;

  inline int64_t seq_of(int64_t pos) const {
    if (n_seq <= 1) return 0;
    return std::upper_bound(seq_start, seq_start + n_seq + 1, pos) -
           seq_start - 1;
  }
  inline int64_t top_at(int64_t pos) const {
    return std::upper_bound(top_start, top_start + n_top + 1, pos) -
           top_start - 1;
  }
  inline int64_t bot_at(int64_t pos) const {
    return std::upper_bound(bot_start, bot_start + n_bot + 1, pos) -
           bot_start - 1;
  }
};

struct RowRef {  // one DFS-inserted position
  int32_t gid;
  uint8_t rev;
  int64_t pos;
};

struct BRow {  // a run row fed to the block machine
  int32_t gid;
  int32_t seq;
  uint8_t rev;
  int64_t lo, hi;  // remaining target range of the (possibly split) run
};

// --------------------------------------------------------------------------
// MAF block entry machine (mirror of hal_tpu/io/maf_io.py MafBlockBuilder,
// reference halMafBlock.cpp).
// --------------------------------------------------------------------------

struct Entry {
  int64_t key_rank;  // genome name rank (SequenceLess major key)
  int64_t key_seq;   // sequence array index (minor key)
  const std::string* name;
  int32_t gid;
  int64_t src_length;
  int64_t seq_start0;  // genome coordinate of the sequence start
  int64_t start = -1;  // strand coords; -1 == NULL
  int64_t length = 0;
  bool neg = false;
  int last_used = 0;
  std::string text;
};

// PositionCache: sorted disjoint half-open [lo, hi) interval set
// (mirror of hal_tpu/ops/poscache.py; reference halPositionCache.cpp)
struct PosCache {
  std::map<int64_t, int64_t> iv;  // lo -> hi

  void add(int64_t lo, int64_t hi) {
    if (hi <= lo) return;
    auto it = iv.upper_bound(lo);
    if (it != iv.begin()) {
      auto prev = std::prev(it);
      if (prev->second >= lo) {
        lo = prev->first;
        it = prev;
      }
    }
    while (it != iv.end() && it->first <= hi) {
      hi = std::max(hi, it->second);
      it = iv.erase(it);
    }
    iv[lo] = hi;
  }

  bool covers(int64_t lo, int64_t hi) const {
    auto it = iv.upper_bound(lo);
    if (it == iv.begin()) return false;
    return std::prev(it)->second >= hi;
  }

  // interval containing p, or false
  bool interval_at(int64_t p, int64_t* lo, int64_t* hi) const {
    auto it = iv.upper_bound(p);
    if (it == iv.begin()) return false;
    auto prev = std::prev(it);
    if (prev->second > p) {
      *lo = prev->first;
      *hi = prev->second;
      return true;
    }
    return false;
  }

  int64_t free_run(int64_t p, bool forward) const {
    auto it = iv.upper_bound(p);
    if (it != iv.begin() && std::prev(it)->second > p) return 0;
    if (forward) {
      if (it != iv.end()) return it->first - p;
    } else {
      if (it != iv.begin()) return p - std::prev(it)->second + 1;
    }
    return int64_t(1) << 62;
  }

  // pieces of cached intervals clamped to [lo, hi)
  template <class F>
  void overlaps(int64_t lo, int64_t hi, F&& fn) const {
    auto it = iv.upper_bound(lo);
    if (it != iv.begin()) --it;
    for (; it != iv.end() && it->first < hi; ++it) {
      int64_t a = std::max(it->first, lo);
      int64_t b = std::min(it->second, hi);
      if (a < b) fn(a, b);
    }
  }
};

struct Engine {
  std::vector<GenomeT> g;
  int32_t ref = 0;
  bool no_dupes = false, no_ancestors = false, only_orthologs = false;
  bool unique = false, has_scope = false, has_targets = false;
  bool keep_empty_ref_blocks = true;
  int64_t max_len = 1000;

  // --maxRefGap indel stacks + --global shared visit cache (ports of
  // hal_tpu/ops/column.py ColumnDFS indel machinery + iter_slices_exact's
  // stack walker / shared_visit branch — the Python implementations are
  // the tested spec; reference halColumnIterator.cpp:357-440 indel
  // recursion + halMafExport.cpp:90-160 global mode)
  int64_t max_ref_gap = 0;
  bool global_mode = false;
  struct Site {
    int32_t gid;
    int64_t i, rem;
    bool o;
  };
  std::vector<Site> del_sites, ins_sites;
  bool track_visits = false;
  std::vector<RowRef> visits;
  std::map<int32_t, PosCache> visit;         // per-window indel cache
  std::map<int32_t, PosCache> shared_visit;  // --global, across refs

  // DFS state
  std::vector<RowRef> rows;
  std::vector<std::pair<int64_t, uint8_t>> refpos;
  int64_t limit = 0;

  // block machine state
  std::vector<std::unique_ptr<Entry>> entries;
  Entry* reference = nullptr;
  int64_t ref_index = -1;  // -1 == None
  bool started = false;

  std::string out;  // finished MAF text, drained by the binding
  std::vector<BRow> brows;

  // ---------------------------------------------------------- DFS helpers
  inline void limit_seg(const int64_t* starts, int64_t i, int64_t pos,
                        bool rev) {
    int64_t rem = rev ? pos - starts[i] + 1 : starts[i + 1] - pos;
    if (rem < limit) limit = rem;
  }

  inline void insert(int32_t gid, int64_t pos, bool rev) {
    if (unique && gid == ref) refpos.emplace_back(pos, rev ? 1 : 0);
    if (track_visits)
      visits.push_back({gid, static_cast<uint8_t>(rev ? 1 : 0), pos});
    const GenomeT& t = g[gid];
    if (no_ancestors && !t.is_leaf) return;
    if (has_targets && !t.is_target) return;
    rows.push_back({gid, static_cast<uint8_t>(rev ? 1 : 0), pos});
  }

  inline bool parent_in_scope(int32_t gid) const {
    if (!has_scope) return true;
    int64_t p = g[gid].parent;
    return p >= 0 && g[p].in_scope;
  }

  inline bool is_canonical(const GenomeT& t, int64_t i) const {
    int64_t pi = t.top_parent[i];
    if (pi < 0) return false;
    const GenomeT& pt = g[t.parent];
    return pt.bot_child[pi * pt.n_children + t.slot_in_parent] == i;
  }

  // mirror of ColumnDFS._update_parent (column.py:411-430)
  void update_parent(int32_t gid, const GenomeT& t, int64_t i, int64_t pos,
                     bool rev) {
    int64_t pi = t.top_parent[i];
    if (pi < 0 || !parent_in_scope(gid)) return;
    if (no_dupes && !is_canonical(t, i)) return;
    int32_t parent = static_cast<int32_t>(t.parent);
    const GenomeT& pt = g[parent];
    bool prev = t.top_rev[i] != 0;
    int64_t off = pos - t.top_start[i];
    int64_t seg_len = t.top_start[i + 1] - t.top_start[i];
    int64_t ppos = pt.bot_start[pi] + (prev ? seg_len - 1 - off : off);
    bool nrev = rev ^ prev;
    limit_seg(pt.bot_start, pi, ppos, nrev);
    insert(parent, ppos, nrev);
    parse_up(parent, pt, pi, ppos, nrev);
    int64_t my_slot = t.slot_in_parent;
    for (int64_t slot = 0; slot < pt.n_children; ++slot) {
      if (slot != my_slot)
        update_child(parent, pt, pi, ppos, nrev, slot,
                     static_cast<int32_t>(pt.children[slot]));
    }
  }

  // mirror of ColumnDFS._update_child (column.py:432-447)
  void update_child(int32_t gid, const GenomeT& t, int64_t b, int64_t pos,
                    bool rev, int64_t slot, int32_t child) {
    int64_t j = t.bot_child[b * t.n_children + slot];
    if (j < 0 || (has_scope && !g[child].in_scope)) return;
    const GenomeT& ct = g[child];
    bool crev = t.bot_crev[b * t.n_children + slot] != 0;
    int64_t off = pos - t.bot_start[b];
    int64_t seg_len = t.bot_start[b + 1] - t.bot_start[b];
    int64_t cpos = ct.top_start[j] + (crev ? seg_len - 1 - off : off);
    bool nrev = rev ^ crev;
    limit_seg(ct.top_start, j, cpos, nrev);
    insert(child, cpos, nrev);
    if (max_ref_gap > 0) site(ins_sites, child, ct, j, cpos, nrev);
    next_top_dup(child, ct, j, cpos, nrev);
    parse_down(child, ct, j, cpos, nrev);
  }

  // ColumnDFS._site (column.py:370-377): record an indel discovery site;
  // it fires only when the run ends exactly at the segment's traversal end
  inline void site(std::vector<Site>& sites, int32_t gid, const GenomeT& t,
                   int64_t i, int64_t pos, bool o) {
    int64_t rem = o ? pos - t.top_start[i] + 1 : t.top_start[i + 1] - pos;
    sites.push_back({gid, i, rem, o});
  }

  // mirror of ColumnDFS._next_top_dup (column.py:449-473)
  void next_top_dup(int32_t gid, const GenomeT& t, int64_t i, int64_t pos,
                    bool rev) {
    if (no_dupes || t.top_para == nullptr || t.top_para[i] < 0 ||
        t.parent < 0 || !parent_in_scope(gid))
      return;
    int64_t first = i;
    int64_t cur = i, cpos = pos;
    bool crev = rev;
    while (true) {
      int64_t m = t.top_para[cur];
      bool flip = (t.top_rev[cur] != 0) != (t.top_rev[m] != 0);
      int64_t off = cpos - t.top_start[cur];
      int64_t seg_len = t.top_start[cur + 1] - t.top_start[cur];
      int64_t mpos = t.top_start[m] + (flip ? seg_len - 1 - off : off);
      bool mrev = crev ^ flip;
      limit_seg(t.top_start, m, mpos, mrev);
      insert(gid, mpos, mrev);
      if (max_ref_gap > 0) site(ins_sites, gid, t, m, mpos, mrev);
      parse_down(gid, t, m, mpos, mrev);
      cur = m;
      cpos = mpos;
      crev = mrev;
      int64_t nxt = t.top_para[cur];
      if (nxt < 0 || nxt == first) break;
    }
  }

  // mirror of ColumnDFS._parse_up (column.py:475-489, sans indel sites)
  void parse_up(int32_t gid, const GenomeT& t, int64_t b, int64_t pos,
                bool rev) {
    if (t.bot_tparse == nullptr || t.bot_tparse[b] < 0) return;
    int64_t i = t.top_at(pos);
    limit_seg(t.top_start, i, pos, rev);
    update_parent(gid, t, i, pos, rev);
    if (!only_orthologs) next_top_dup(gid, t, i, pos, rev);
    if (max_ref_gap > 0) site(del_sites, gid, t, i, pos, rev);
  }

  // mirror of ColumnDFS._parse_down (column.py:491-499)
  void parse_down(int32_t gid, const GenomeT& t, int64_t i, int64_t pos,
                  bool rev) {
    if (t.top_bparse == nullptr || t.top_bparse[i] < 0) return;
    int64_t b = t.bot_at(pos);
    limit_seg(t.bot_start, b, pos, rev);
    for (int64_t slot = 0; slot < t.n_children; ++slot)
      update_child(gid, t, b, pos, rev, slot,
                   static_cast<int32_t>(t.children[slot]));
  }

  // mirror of ColumnDFS.run_from (column.py:324-368): DFS from any
  // (genome, pos, rev) — rev walks the entry right-to-left (a reversed
  // indel stack entry)
  void run_from(int32_t gid, int64_t pos, bool rev) {
    rows.clear();
    refpos.clear();
    if (max_ref_gap > 0) {
      del_sites.clear();
      ins_sites.clear();
    }
    if (track_visits) visits.clear();
    const GenomeT& t = g[gid];
    int64_t si = t.seq_of(pos);
    bool seq_has_tops = t.seq_top[si + 1] - t.seq_top[si] > 0;
    limit = rev ? pos - t.seq_start[si] + 1 : t.seq_start[si + 1] - pos;
    if (seq_has_tops) {
      int64_t i = t.top_at(pos);
      limit_seg(t.top_start, i, pos, rev);
      insert(gid, pos, rev);
      if (max_ref_gap > 0) site(del_sites, gid, t, i, pos, rev);
      update_parent(gid, t, i, pos, rev);
      if (!only_orthologs) next_top_dup(gid, t, i, pos, rev);
      parse_down(gid, t, i, pos, rev);
    } else {
      int64_t b = t.bot_at(pos);
      limit_seg(t.bot_start, b, pos, rev);
      insert(gid, pos, rev);
      for (int64_t slot = 0; slot < t.n_children; ++slot)
        update_child(gid, t, b, pos, rev, slot,
                     static_cast<int32_t>(t.children[slot]));
    }
  }

  void run_dfs(int64_t pos) { run_from(ref, pos, false); }

  // -------------------------------------------------------- block machine

  static inline bool key_less(const Entry* e, int64_t rank, int64_t seq) {
    return e->key_rank != rank ? e->key_rank < rank : e->key_seq < seq;
  }

  void reset_entries() {  // resetEntries (halMafBlock.cpp:36-79)
    size_t w = 0;
    for (size_t i = 0; i < entries.size(); ++i) {
      Entry* e = entries[i].get();
      if (e->start == -1) {
        if (e->last_used > 10) continue;
        e->last_used += 1;
      } else {
        e->last_used = 0;
      }
      e->start = -1;
      e->neg = false;
      e->length = 0;
      e->text.clear();
      if (w != i) entries[w] = std::move(entries[i]);
      ++w;
    }
    entries.resize(w);
    reference = nullptr;
    ref_index = -1;
  }

  inline int64_t row_start_strand(const BRow& r, int64_t* src_len) const {
    const GenomeT& t = g[r.gid];
    int64_t s0 = t.seq_start[r.seq];
    int64_t sl = t.seq_start[r.seq + 1] - s0;
    *src_len = sl;
    return r.rev ? sl - 1 - (r.hi - 1 - s0) : r.lo - s0;
  }

  void init_block(int64_t slice_lo) {  // initBlock (halMafBlock.cpp:294-368)
    reset_entries();
    // dupe counting: d-th row of a key -> d-th entry of that key
    for (size_t ri = 0; ri < brows.size(); ++ri) {
      const BRow& row = brows[ri];
      int64_t rank = g[row.gid].name_rank;
      // d = how many earlier rows share this key
      int64_t d = 0;
      for (size_t q = 0; q < ri; ++q)
        if (brows[q].gid == row.gid && brows[q].seq == row.seq) ++d;
      // base = bisect_left(keys, key)
      size_t base = std::lower_bound(entries.begin(), entries.end(), 0,
                                     [&](const std::unique_ptr<Entry>& e,
                                         int) {
                                       return key_less(e.get(), rank, row.seq);
                                     }) -
                    entries.begin();
      size_t idx = base + d;
      Entry* entry;
      if (idx >= entries.size() || entries[idx]->key_rank != rank ||
          entries[idx]->key_seq != row.seq) {
        auto ne = std::make_unique<Entry>();
        ne->key_rank = rank;
        ne->key_seq = row.seq;
        ne->gid = row.gid;
        ne->name = &g[row.gid].seq_names[row.seq];
        ne->seq_start0 = g[row.gid].seq_start[row.seq];
        ne->src_length = g[row.gid].seq_start[row.seq + 1] - ne->seq_start0;
        entry = ne.get();
        // insert at bisect_right(keys, key): after every equal key
        size_t ins = entries.size();
        for (size_t q = base; q < entries.size(); ++q) {
          const Entry* cand = entries[q].get();
          if (cand->key_rank > rank ||
              (cand->key_rank == rank && cand->key_seq > row.seq)) {
            ins = q;
            break;
          }
        }
        entries.insert(entries.begin() + ins, std::move(ne));
      } else {
        entry = entries[idx].get();
      }
      int64_t src_len;
      entry->start = row_start_strand(row, &src_len);
      entry->neg = row.rev != 0;
      entry->length = 0;
      entry->text.clear();
    }

    // reference selection (halMafBlock.cpp:353-363)
    reference = nullptr;
    ref_index = -1;
    if (!brows.empty()) {
      const GenomeT& rg = g[ref];
      int64_t rsi = rg.seq_of(slice_lo);
      int64_t rrank = rg.name_rank;
      for (auto& e : entries) {
        if (e->key_rank == rrank && e->key_seq == rsi) {
          reference = e.get();
          ref_index = slice_lo - rg.seq_start[rsi];
          break;
        }
      }
    }
    if (reference == nullptr && !entries.empty()) {
      reference = entries[0].get();
      ref_index = -1;
    }
  }

  bool can_append() const {  // canAppendColumn (halMafBlock.cpp:401-450)
    size_t e = 0;
    for (const BRow& row : brows) {
      int64_t rank = g[row.gid].name_rank;
      while (e < entries.size() && !(entries[e]->key_rank == rank &&
                                     entries[e]->key_seq == row.seq))
        ++e;
      if (e >= entries.size()) return false;
      const Entry* entry = entries[e].get();
      if (entry->start != -1) {
        if (entry->length >= max_len) return false;
        if (entry->length > 0 && entry->neg != (row.rev != 0)) return false;
        int64_t src_len;
        int64_t start = row_start_strand(row, &src_len);
        if (start - entry->start != entry->length) return false;
      }
      ++e;
    }
    return true;
  }

  int64_t append_budget() const {
    int64_t budget = max_len;
    size_t e = 0;
    for (const BRow& row : brows) {
      int64_t rank = g[row.gid].name_rank;
      while (e < entries.size() && !(entries[e]->key_rank == rank &&
                                     entries[e]->key_seq == row.seq))
        ++e;
      if (e < entries.size()) {
        int64_t b = max_len - entries[e]->length;
        if (b < budget) budget = b;
        ++e;
      }
    }
    return budget;
  }

  inline void append_text(Entry* entry, const BRow& row, int64_t k) {
    const uint8_t* dna = g[row.gid].dna;
    std::string& t = entry->text;
    size_t base = t.size();
    t.resize(base + k);
    char* dst = &t[base];
    if (row.rev) {
      // columns run right-to-left from hi-1, complemented
      for (int64_t p = row.hi - 1; p >= row.hi - k; --p)
        *dst++ = COMP.m[static_cast<unsigned char>(base_at(dna, p))];
    } else {
      for (int64_t p = row.lo; p < row.lo + k; ++p) *dst++ = base_at(dna, p);
    }
  }

  // appendColumn for k columns of the current run (halMafBlock.cpp:370-395);
  // advances each row's remaining range in place
  void append_run(int64_t k) {
    size_t e = 0;
    for (BRow& row : brows) {
      int64_t rank = g[row.gid].name_rank;
      while (e < entries.size() && !(entries[e]->key_rank == rank &&
                                     entries[e]->key_seq == row.seq)) {
        entries[e]->text.append(k, '-');
        ++e;
      }
      Entry* entry = entries[e].get();
      if (entry->start == -1) {
        // late joiner keeps accumulated '-' padding (initEntry
        // clearSequence=false, halMafBlock.cpp:109-113)
        int64_t src_len;
        entry->start = row_start_strand(row, &src_len);
        entry->neg = row.rev != 0;
      }
      entry->length += k;
      append_text(entry, row, k);
      if (row.rev)
        row.hi -= k;
      else
        row.lo += k;
      ++e;
    }
    for (; e < entries.size(); ++e) entries[e]->text.append(k, '-');
  }

  void entry_line(const Entry* e, int64_t start_override) {
    out += "s\t";
    out += *e->name;
    out += '\t';
    append_int(start_override >= 0 ? start_override : e->start);
    out += '\t';
    append_int(e->length);
    out += '\t';
    out += e->neg ? '-' : '+';
    out += '\t';
    append_int(e->src_length);
    out += '\t';
    out += e->text;
    out += '\n';
  }

  inline void append_int(int64_t v) {
    char buf[24];
    char* p = buf + 24;
    bool neg = v < 0;
    uint64_t u = neg ? static_cast<uint64_t>(-v) : static_cast<uint64_t>(v);
    do {
      *--p = static_cast<char>('0' + (u % 10));
      u /= 10;
    } while (u);
    if (neg) *--p = '-';
    out.append(p, buf + 24 - p);
  }

  // printBlock (halMafBlock.cpp:499-519); emits block + trailing '\n'
  // (the tool writes `block + "\n"` per yielded block)
  bool flush() {
    if (reference == nullptr) return false;
    if (!keep_empty_ref_blocks &&
        reference->text.find_first_not_of('-') == std::string::npos)
      return false;
    out += "a\n";
    if (reference->start == -1) {
      if (ref_index >= 0) entry_line(reference, ref_index);
    } else {
      entry_line(reference, -1);
    }
    for (auto& e : entries)
      if (e->start != -1 && e.get() != reference) entry_line(e.get(), -1);
    out += '\n';
    return true;
  }

  // ------------------------------------------------------------- feed loop
  // mirror of MafBlockBuilder.feed for one run (maf_io.py:383-407)
  void feed_run(int64_t pos, int64_t width) {
    while (width > 0) {
      if (!started) {
        init_block(pos);
        started = true;
      } else if (!can_append()) {
        flush();
        init_block(pos);
      }
      int64_t budget = append_budget();
      int64_t k = width > budget ? budget : width;
      append_run(k);
      pos += k;
      width -= k;
      if (width > 0) {
        flush();
        started = false;
      }
    }
  }

  int export_window(int64_t gs, int64_t ge) {
    // `started` recomputed like Python feed() does on entry
    started = reference != nullptr;
    if (started) {
      bool any = false;
      for (auto& e : entries)
        if (e->start != -1) {
          any = true;
          break;
        }
      started = any;
    }
    int64_t pos = gs;
    while (pos < ge) {
      run_dfs(pos);
      int64_t run = limit < ge - pos ? limit : ge - pos;
      if (run <= 0) return -1;  // defensive: malformed tables
      int64_t kemit = run;
      if (unique) {
        // leftmost-ref-position canonicality (column.py:797-806,
        // reference isCanonicalOnRef halColumnIterator.cpp:208)
        for (auto& pr : refpos) {
          int64_t p0 = pr.first;
          if (pr.second) {
            if (p0 < pos)
              kemit = 0;
            else if (p0 > pos) {
              int64_t k2 = (p0 - pos) / 2 + 1;
              if (k2 < kemit) kemit = k2;
            }
          } else if (p0 < pos) {
            kemit = 0;
          }
        }
      }
      if (kemit > 0) {
        // rows -> BRows in SequenceLess order, stable (DFS order within key)
        brows.clear();
        brows.reserve(rows.size());
        for (const RowRef& r : rows) {
          const GenomeT& t = g[r.gid];
          int64_t si = t.seq_of(r.pos);
          BRow b;
          b.gid = r.gid;
          b.seq = static_cast<int32_t>(si);
          b.rev = r.rev;
          if (r.rev) {
            b.lo = r.pos - kemit + 1;
            b.hi = r.pos + 1;
          } else {
            b.lo = r.pos;
            b.hi = r.pos + kemit;
          }
          brows.push_back(b);
        }
        std::stable_sort(brows.begin(), brows.end(),
                         [this](const BRow& a, const BRow& b) {
                           int64_t ra = g[a.gid].name_rank;
                           int64_t rb = g[b.gid].name_rank;
                           return ra != rb ? ra < rb : a.seq < b.seq;
                         });
        // empty slices (every row filtered) are never yielded in Python
        // (iter_slices_exact: `if out_rows:`) — skip them here too
        if (!brows.empty()) feed_run(pos, kemit);
      }
      pos += run;
    }
    return 0;
  }

  // --------------------------------------- indel stacks (column.py ports)

  struct StackE {
    int32_t gid;
    int64_t idx, first, last;
    bool rev;
    int64_t cum;
  };

  static inline void seq_span(const int64_t* bounds, int64_t n_seq,
                              int64_t i, int64_t* first, int64_t* last) {
    int64_t s = std::upper_bound(bounds, bounds + n_seq + 1, i) - bounds - 1;
    *first = bounds[s];
    *last = bounds[s + 1] - 1;
  }

  // ColumnDFS._eval_del_site (column.py:513-555)
  bool eval_del_site(int32_t gid, int64_t i, bool o, int64_t cum,
                     StackE* out) {
    const GenomeT& t = g[gid];
    int64_t pi = t.top_parent[i];
    if (pi < 0 || t.parent < 0) return false;
    const GenomeT& pt = g[t.parent];
    bool pori = o ^ (t.top_rev[i] != 0);
    int64_t pfirst, plast, sfirst, slast;
    seq_span(pt.seq_bot, pt.n_seq, pi, &pfirst, &plast);
    seq_span(t.seq_top, t.n_seq, i, &sfirst, &slast);
    int64_t cand;
    if (o ? i == sfirst : i == slast) {
      bool p_is_first = pori ? pi == plast : pi == pfirst;
      bool p_is_last = pori ? pi == pfirst : pi == plast;
      if (!p_is_first)
        cand = pori ? pi + 1 : pi - 1;
      else if (!p_is_last)
        cand = pori ? pi - 1 : pi + 1;
      else
        return false;
    } else {
      int64_t j = o ? i - 1 : i + 1;
      int64_t pj = t.top_parent[j];
      if (pj < 0) return false;
      int64_t lo_i = pi <= pj ? pi : pj;
      int64_t hi_i = pi <= pj ? pj : pi;
      int64_t jf, jl;
      seq_span(pt.seq_bot, pt.n_seq, pj, &jf, &jl);
      if (hi_i != lo_i + 2 || jf != pfirst || jl != plast) return false;
      cand = lo_i + 1;
    }
    if (pt.bot_child != nullptr && pt.n_children > 0) {
      const GenomeT& ct = g[static_cast<size_t>(t.parent)];
      int64_t slot = t.slot_in_parent;
      if (ct.bot_child[cand * ct.n_children + slot] >= 0) return false;
    }
    int64_t lo = pt.bot_start[cand];
    int64_t hi = pt.bot_start[cand + 1];
    if (hi - lo + cum > max_ref_gap) return false;
    out->gid = static_cast<int32_t>(t.parent);
    out->first = lo;
    out->last = hi - 1;
    out->rev = pori;
    return true;
  }

  // ColumnDFS._eval_ins_site (column.py:557-601)
  bool eval_ins_site(int32_t gid, int64_t i, bool o, int64_t cum,
                     StackE* out) {
    const GenomeT& t = g[gid];
    if (t.top_parent[i] < 0) return false;
    int64_t sfirst, slast;
    seq_span(t.seq_top, t.n_seq, i, &sfirst, &slast);
    if (o ? i == sfirst : i == slast) return false;
    int64_t step = o ? -1 : 1;
    int64_t j = i + step;
    if (t.top_parent[j] >= 0) return false;
    int64_t k = j;
    while (true) {
      int64_t nxt = k + step;
      if (nxt < sfirst || nxt > slast || t.top_parent[nxt] >= 0) break;
      k = nxt;
    }
    bool first_iter = o ? j == slast : j == sfirst;
    bool last_iter = o ? k == sfirst : k == slast;
    if (!(first_iter || last_iter)) {
      int64_t b = k + step;
      int64_t pa = t.top_parent[i], pb = t.top_parent[b];
      if (pb < 0) return false;
      const GenomeT& pt = g[t.parent];
      int64_t fa, la, fb, lb;
      seq_span(pt.seq_bot, pt.n_seq, pa, &fa, &la);
      seq_span(pt.seq_bot, pt.n_seq, pb, &fb, &lb);
      int64_t d = pa > pb ? pa - pb : pb - pa;
      if (d == 1) {
      } else if (fa == fb && la == lb &&
                 (pa == fa || pa == la || pb == fb || pb == lb)) {
      } else {
        return false;
      }
    }
    int64_t lo = t.top_start[j];
    int64_t hi = t.top_start[j + 1];
    if (hi - lo + cum > max_ref_gap) return false;
    out->gid = gid;
    out->first = lo;
    out->last = hi - 1;
    out->rev = o;
    return true;
  }

  // ColumnDFS.collect_indels (column.py:603-634): deletions REVERSED then
  // insertions, entry cumulative sizes per fresh stack
  void collect_indels(int64_t run, int64_t cum, std::vector<StackE>* out) {
    std::vector<StackE> dels, inss;
    StackE e;
    for (const Site& s : del_sites) {
      if (s.rem != run) continue;
      if (eval_del_site(s.gid, s.i, s.o, cum, &e)) {
        e.cum = dels.empty() ? 0
                             : dels.back().cum +
                                   (dels.back().last - dels.back().first + 1);
        e.idx = e.rev ? e.last : e.first;
        dels.push_back(e);
      }
    }
    for (const Site& s : ins_sites) {
      if (s.rem != run) continue;
      if (eval_ins_site(s.gid, s.i, s.o, cum, &e)) {
        e.cum = inss.empty() ? 0
                             : inss.back().cum +
                                   (inss.back().last - inss.back().first + 1);
        e.idx = e.rev ? e.last : e.first;
        inss.push_back(e);
      }
    }
    for (auto it = dels.rbegin(); it != dels.rend(); ++it) out->push_back(*it);
    for (const StackE& s : inss) out->push_back(s);
  }

  // iter_slices_exact._filter_and_record (column.py:704-719): build brows
  // from `rows` over k columns, drop rows fully covered by the visit
  // cache, record this run's visits for the live genomes.  Returns true
  // when any row survived.
  bool make_filtered_brows(int64_t k, const std::set<int32_t>& live) {
    brows.clear();
    brows.reserve(rows.size());
    for (const RowRef& r : rows) {
      BRow b;
      b.gid = r.gid;
      b.seq = static_cast<int32_t>(g[r.gid].seq_of(r.pos));
      b.rev = r.rev;
      if (r.rev) {
        b.lo = r.pos - k + 1;
        b.hi = r.pos + 1;
      } else {
        b.lo = r.pos;
        b.hi = r.pos + k;
      }
      auto it = visit.find(r.gid);
      if (it != visit.end() && it->second.covers(b.lo, b.hi)) continue;
      brows.push_back(b);
    }
    std::stable_sort(brows.begin(), brows.end(),
                     [this](const BRow& a, const BRow& b) {
                       int64_t ra = g[a.gid].name_rank;
                       int64_t rb = g[b.gid].name_rank;
                       return ra != rb ? ra < rb : a.seq < b.seq;
                     });
    for (const RowRef& v : visits) {
      if (!live.count(v.gid)) continue;
      PosCache& pc = visit[v.gid];
      if (v.rev)
        pc.add(v.pos - k + 1, v.pos + 1);
      else
        pc.add(v.pos, v.pos + k);
    }
    return !brows.empty();
  }

  // iter_slices_exact with max_ref_gap > 0 (column.py:721-816)
  int export_window_indel(int64_t gs, int64_t ge) {
    started = reference != nullptr;
    if (started) {
      bool any = false;
      for (auto& e : entries)
        if (e->start != -1) {
          any = true;
          break;
        }
      started = any;
    }
    track_visits = true;
    visit.clear();
    std::vector<StackE> stack;
    int64_t pos = gs;
    while (pos < ge || !stack.empty()) {
      if (!stack.empty()) {
        StackE& e = stack.back();
        auto vit = visit.find(e.gid);
        if (vit != visit.end()) {
          int64_t idx = e.idx, lo, hi;
          while (idx <= e.last && vit->second.interval_at(idx, &lo, &hi))
            idx = hi;  // nextFreeIndex (column.py:726-737)
          e.idx = idx;
          if (idx < e.first || idx > e.last) {
            stack.pop_back();
            continue;
          }
        }
        run_from(e.gid, e.idx, e.rev);
        int64_t remaining = e.rev ? e.idx - e.first + 1 : e.last - e.idx + 1;
        int64_t run = limit < remaining ? limit : remaining;
        if (run <= 0) return -1;
        if (vit != visit.end()) {
          int64_t fr = vit->second.free_run(e.idx, !e.rev);
          if (fr < run) run = fr;
        }
        std::set<int32_t> live;
        live.insert(ref);
        for (const StackE& s : stack) live.insert(s.gid);
        if (make_filtered_brows(run, live)) feed_run(pos, run);
        std::vector<StackE> subs;
        if (stack.size() < 64) collect_indels(run, e.cum, &subs);
        // e may dangle after push_back — update via index
        size_t ei = stack.size() - 1;
        stack[ei].idx = stack[ei].rev ? stack[ei].idx - run
                                      : stack[ei].idx + run;
        bool done = stack[ei].rev ? stack[ei].idx < stack[ei].first
                                  : stack[ei].idx > stack[ei].last;
        if (done) stack.erase(stack.begin() + ei);
        for (const StackE& s : subs) stack.push_back(s);
        continue;
      }
      run_from(ref, pos, false);
      int64_t run = limit < ge - pos ? limit : ge - pos;
      if (run <= 0) return -1;
      int64_t kemit = run;
      if (unique) {
        for (auto& pr : refpos) {
          int64_t p0 = pr.first;
          if (pr.second) {
            if (p0 < pos)
              kemit = 0;
            else if (p0 > pos) {
              int64_t k2 = (p0 - pos) / 2 + 1;
              if (k2 < kemit) kemit = k2;
            }
          } else if (p0 < pos) {
            kemit = 0;
          }
        }
      }
      if (kemit > 0) {
        // rows built over kemit columns, visits recorded over the RUN
        // (column.py:807-812 passes run to _filter_and_record)
        std::set<int32_t> live;
        live.insert(ref);
        // build rows at kemit width, then record at run width: mirror by
        // temporarily building brows at kemit and recording separately
        brows.clear();
        for (const RowRef& r : rows) {
          BRow b;
          b.gid = r.gid;
          b.seq = static_cast<int32_t>(g[r.gid].seq_of(r.pos));
          b.rev = r.rev;
          if (r.rev) {
            b.lo = r.pos - kemit + 1;
            b.hi = r.pos + 1;
          } else {
            b.lo = r.pos;
            b.hi = r.pos + kemit;
          }
          auto it = visit.find(r.gid);
          if (it != visit.end() && it->second.covers(b.lo, b.hi)) continue;
          brows.push_back(b);
        }
        std::stable_sort(brows.begin(), brows.end(),
                         [this](const BRow& a, const BRow& b) {
                           int64_t ra = g[a.gid].name_rank;
                           int64_t rb = g[b.gid].name_rank;
                           return ra != rb ? ra < rb : a.seq < b.seq;
                         });
        for (const RowRef& v : visits) {
          if (v.gid != ref) continue;
          PosCache& pc = visit[v.gid];
          if (v.rev)
            pc.add(v.pos - run + 1, v.pos + 1);
          else
            pc.add(v.pos, v.pos + run);
        }
        if (!brows.empty()) feed_run(pos, kemit);
      }
      std::vector<StackE> subs;
      collect_indels(run, 0, &subs);
      for (const StackE& s : subs) stack.push_back(s);
      pos += run;
    }
    return 0;
  }

  // iter_slices_exact shared_visit branch (column.py:756-796) — one
  // --global pass for the current ref; shared_visit persists across refs
  int export_window_global(int64_t gs, int64_t ge) {
    started = reference != nullptr;
    if (started) {
      bool any = false;
      for (auto& e : entries)
        if (e->start != -1) {
          any = true;
          break;
        }
      started = any;
    }
    track_visits = true;
    int64_t pos = gs;
    std::vector<char> bad;
    while (pos < ge) {
      run_from(ref, pos, false);
      int64_t run = limit < ge - pos ? limit : ge - pos;
      if (run <= 0) return -1;
      int64_t k = run;
      bad.assign(static_cast<size_t>(k), 0);
      for (const RowRef& v : visits) {
        auto it = shared_visit.find(v.gid);
        if (it == shared_visit.end()) continue;
        int64_t vlo = v.rev ? v.pos - k + 1 : v.pos;
        int64_t vhi = v.rev ? v.pos + 1 : v.pos + k;
        it->second.overlaps(vlo, vhi, [&](int64_t a, int64_t b) {
          int64_t o0 = v.rev ? v.pos - b + 1 : a - v.pos;
          int64_t o1 = v.rev ? v.pos - a + 1 : b - v.pos;
          for (int64_t x = o0; x < o1; ++x) bad[static_cast<size_t>(x)] = 1;
        });
      }
      PosCache& pc = shared_visit[ref];
      for (const RowRef& v : visits) {
        if (v.gid != ref) continue;
        if (v.rev)
          pc.add(v.pos - k + 1, v.pos + 1);
        else
          pc.add(v.pos, v.pos + k);
      }
      int64_t o = 0;
      while (o < k) {
        if (bad[static_cast<size_t>(o)]) {
          ++o;
          continue;
        }
        int64_t o1 = o;
        while (o1 < k && !bad[static_cast<size_t>(o1)]) ++o1;
        brows.clear();
        for (const RowRef& r : rows) {
          int64_t p2 = r.rev ? r.pos - o : r.pos + o;
          BRow b;
          b.gid = r.gid;
          b.seq = static_cast<int32_t>(g[r.gid].seq_of(p2));
          b.rev = r.rev;
          if (r.rev) {
            b.lo = p2 - (o1 - o) + 1;
            b.hi = p2 + 1;
          } else {
            b.lo = p2;
            b.hi = p2 + (o1 - o);
          }
          brows.push_back(b);
        }
        std::stable_sort(brows.begin(), brows.end(),
                         [this](const BRow& a, const BRow& b) {
                           int64_t ra = g[a.gid].name_rank;
                           int64_t rb = g[b.gid].name_rank;
                           return ra != rb ? ra < rb : a.seq < b.seq;
                         });
        if (!brows.empty()) feed_run(pos + o, o1 - o);
        o = o1;
      }
      pos += run;
    }
    return 0;
  }

  // ---------------------------------------------------- fragment assembler
  // Consumer for the DEVICE column engine (hal_tpu/ops/column_jax.py):
  // fragments arrive pre-sorted by global row precedence (genome name
  // rank, sequence, DFS program ordinal, DFS key) and pre-filtered; this
  // sweep cuts them into atomic slices and drives the same MAF entry
  // machine the DFS path uses, so the emitted bytes match ce_export /
  // the exact-Python path for the covered flag surface.
  int export_frags(int64_t n_frag, const int64_t* fs_lo, const int64_t* ft_lo,
                   const int64_t* fln, const uint8_t* frev,
                   const int64_t* fgid, int64_t n_cuts, const int64_t* cuts) {
    started = reference != nullptr;
    if (started) {
      bool any = false;
      for (auto& e : entries)
        if (e->start != -1) {
          any = true;
          break;
        }
      started = any;
    }
    // index fragments by src start/end for the sweep
    std::vector<int64_t> by_start(n_frag), by_end(n_frag);
    for (int64_t i = 0; i < n_frag; ++i) by_start[i] = by_end[i] = i;
    std::sort(by_start.begin(), by_start.end(),
              [&](int64_t a, int64_t b) { return fs_lo[a] < fs_lo[b]; });
    std::sort(by_end.begin(), by_end.end(), [&](int64_t a, int64_t b) {
      return fs_lo[a] + fln[a] < fs_lo[b] + fln[b];
    });
    std::vector<int32_t> fseq(static_cast<size_t>(n_frag));
    for (int64_t i = 0; i < n_frag; ++i)
      fseq[static_cast<size_t>(i)] =
          static_cast<int32_t>(g[fgid[i]].seq_of(ft_lo[i]));
    std::set<int64_t> active;  // fragment index == global precedence
    size_t si = 0, ei = 0;
    for (int64_t ci = 0; ci + 1 < n_cuts; ++ci) {
      int64_t a = cuts[ci], b = cuts[ci + 1];
      if (b <= a) continue;
      while (ei < by_end.size() &&
             fs_lo[by_end[ei]] + fln[by_end[ei]] <= a)
        active.erase(by_end[ei++]);
      while (si < by_start.size() && fs_lo[by_start[si]] <= a) {
        if (fs_lo[by_start[si]] + fln[by_start[si]] > a)
          active.insert(by_start[si]);
        ++si;
      }
      if (active.empty()) continue;
      brows.clear();
      brows.reserve(active.size());
      for (int64_t fi : active) {
        BRow r;
        r.gid = static_cast<int32_t>(fgid[fi]);
        r.seq = fseq[static_cast<size_t>(fi)];
        r.rev = frev[fi];
        int64_t adv = a - fs_lo[fi];
        if (r.rev) {
          r.hi = ft_lo[fi] + fln[fi] - adv;
          r.lo = r.hi - (b - a);
        } else {
          r.lo = ft_lo[fi] + adv;
          r.hi = r.lo + (b - a);
        }
        brows.push_back(r);
      }
      feed_run(a, b - a);
    }
    return 0;
  }

  void finish() {  // flush_end (maf_io.py:409-416)
    bool any = false;
    for (auto& e : entries)
      if (e->start != -1) {
        any = true;
        break;
      }
    if (any) {
      flush();
      reset_entries();
    }
  }
};

}  // namespace

extern "C" {

void* ce_new(int64_t n_genomes, int64_t ref_gid, int64_t flags,
             int64_t max_block_len) {
  Engine* e = new Engine();
  e->g.resize(static_cast<size_t>(n_genomes));
  e->ref = static_cast<int32_t>(ref_gid);
  e->no_dupes = flags & 1;
  e->no_ancestors = flags & 2;
  e->only_orthologs = flags & 4;
  e->unique = flags & 8;
  e->has_scope = flags & 16;
  e->has_targets = flags & 32;
  e->keep_empty_ref_blocks = (flags & 64) == 0;
  e->max_len = max_block_len > 0 ? max_block_len : 1000;
  return e;
}

void ce_add_genome(void* h, int64_t gid, const char* name, int64_t parent_gid,
                   int64_t slot_in_parent, int64_t n_children,
                   const int64_t* child_gids, int64_t n_seq,
                   const int64_t* seq_start, const int64_t* seq_top,
                   const int64_t* seq_bot, const char* seq_names_blob,
                   int64_t n_top, const int64_t* top_start,
                   const int64_t* top_parent, const uint8_t* top_rev,
                   const int64_t* top_para, const int64_t* top_bparse,
                   int64_t n_bot, const int64_t* bot_start,
                   const int64_t* bot_tparse, const int64_t* bot_child,
                   const uint8_t* bot_crev, const uint8_t* dna_packed,
                   int64_t name_rank, int64_t in_scope, int64_t is_target,
                   int64_t is_leaf) {
  Engine* e = static_cast<Engine*>(h);
  GenomeT& t = e->g[static_cast<size_t>(gid)];
  t.name = name;
  t.parent = parent_gid;
  t.slot_in_parent = slot_in_parent;
  t.n_children = n_children;
  t.children.assign(child_gids, child_gids + n_children);
  t.n_seq = n_seq;
  t.seq_start = seq_start;
  t.seq_top = seq_top;
  t.seq_bot = seq_bot;
  t.seq_names.clear();
  const char* p = seq_names_blob;
  for (int64_t i = 0; i < n_seq; ++i) {
    t.seq_names.emplace_back(p);
    p += t.seq_names.back().size() + 1;
  }
  t.n_top = n_top;
  t.top_start = top_start;
  t.top_parent = top_parent;
  t.top_rev = top_rev;
  t.top_para = top_para;
  t.top_bparse = top_bparse;
  t.n_bot = n_bot;
  t.bot_start = bot_start;
  t.bot_tparse = bot_tparse;
  t.bot_child = bot_child;
  t.bot_crev = bot_crev;
  t.dna = dna_packed;
  t.name_rank = name_rank;
  t.in_scope = in_scope != 0;
  t.is_target = is_target != 0;
  t.is_leaf = is_leaf != 0;
}

int64_t ce_export(void* h, int64_t gs, int64_t ge) {
  Engine* e = static_cast<Engine*>(h);
  int rc;
  if (e->global_mode)
    rc = e->export_window_global(gs, ge);
  else if (e->max_ref_gap > 0)
    rc = e->export_window_indel(gs, ge);
  else
    rc = e->export_window(gs, ge);
  if (rc != 0) return -1;
  return static_cast<int64_t>(e->out.size());
}

void ce_set_opts(void* h, int64_t max_ref_gap, int64_t global_mode) {
  Engine* e = static_cast<Engine*>(h);
  e->max_ref_gap = max_ref_gap;
  e->global_mode = global_mode != 0;
  e->track_visits = e->max_ref_gap > 0 || e->global_mode;
}

// --global: re-target the engine to a new reference genome, resetting the
// block machine (the Python driver builds a fresh MafBlockBuilder per
// ref pass, halMafExport.cpp:90-160) while shared_visit persists
void ce_set_ref(void* h, int64_t ref_gid) {
  Engine* e = static_cast<Engine*>(h);
  e->ref = static_cast<int32_t>(ref_gid);
  e->entries.clear();
  e->reference = nullptr;
  e->ref_index = -1;
  e->started = false;
}

int64_t ce_export_frags(void* h, int64_t n_frag, const int64_t* s_lo,
                        const int64_t* t_lo, const int64_t* ln,
                        const uint8_t* rev, const int64_t* gid,
                        int64_t n_cuts, const int64_t* cuts) {
  Engine* e = static_cast<Engine*>(h);
  if (e->export_frags(n_frag, s_lo, t_lo, ln, rev, gid, n_cuts, cuts) != 0)
    return -1;
  return static_cast<int64_t>(e->out.size());
}

int64_t ce_finish(void* h) {
  Engine* e = static_cast<Engine*>(h);
  e->finish();
  return static_cast<int64_t>(e->out.size());
}

// zero-extra-copy drain: expose the buffer, then consume
const char* ce_data(void* h, int64_t* n) {
  Engine* e = static_cast<Engine*>(h);
  *n = static_cast<int64_t>(e->out.size());
  return e->out.data();
}

void ce_consume(void* h, int64_t n) {
  Engine* e = static_cast<Engine*>(h);
  e->out.erase(0, static_cast<size_t>(n));
}

int64_t ce_read(void* h, char* dst, int64_t cap) {
  Engine* e = static_cast<Engine*>(h);
  int64_t n = static_cast<int64_t>(e->out.size());
  if (n > cap) n = cap;
  std::memcpy(dst, e->out.data(), static_cast<size_t>(n));
  e->out.erase(0, static_cast<size_t>(n));
  return n;
}

void ce_free(void* h) { delete static_cast<Engine*>(h); }

}  // extern "C"
