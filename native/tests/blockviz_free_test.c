/* ASan leak/double-free check for the halBlockViz C ABI deallocation
 * contract (halFreeBlockResults / halFreeBlocks / halFreeTargetDupeLists /
 * halFreeSpeciesList, reference blockViz/impl/halBlockViz.cpp:195-241).
 *
 * The driver is ASan-instrumented; it dlopens the regular
 * libhalblockviz.so, hand-builds result lists with exactly the allocation
 * discipline the shim uses (calloc per node, strdup per string), and frees
 * them through the ABI.  ASan's interposed allocator sees every malloc and
 * free on both sides, so a leaked node, a leaked string, or a double free
 * in the ABI's free paths fails the run (run with
 * ASAN_OPTIONS=detect_leaks=1).  The Python-marshaling query paths are
 * covered separately by tests/test_native.py::test_blockviz_c_abi.
 *
 * Usage: blockviz_free_test <libhalblockviz.so>
 */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef int64_t hal_int_t;

struct hal_target_range_t {
    struct hal_target_range_t *next;
    hal_int_t tStart;
    hal_int_t size;
};

struct hal_target_dupe_list_t {
    struct hal_target_dupe_list_t *next;
    hal_int_t id;
    struct hal_target_range_t *tRange;
    char *qChrom;
};

struct hal_block_t {
    struct hal_block_t *next;
    char *qChrom;
    hal_int_t tStart;
    hal_int_t qStart;
    hal_int_t size;
    char strand;
    char *qSequence;
    char *tSequence;
};

struct hal_block_results_t {
    struct hal_block_t *mappedBlocks;
    struct hal_target_dupe_list_t *targetDupeBlocks;
};

struct hal_species_t {
    struct hal_species_t *next;
    char *name;
    hal_int_t length;
    hal_int_t numChroms;
    char *parentName;
    double parentBranchLength;
};

typedef void (*free_results_fn)(struct hal_block_results_t *);
typedef void (*free_blocks_fn)(struct hal_block_t *);
typedef void (*free_dupes_fn)(struct hal_target_dupe_list_t *);
typedef void (*free_species_fn)(struct hal_species_t *);

static struct hal_block_t *make_block(int with_seq) {
    struct hal_block_t *b =
        (struct hal_block_t *)calloc(1, sizeof(struct hal_block_t));
    b->qChrom = strdup("q_chrom");
    b->tStart = 1;
    b->qStart = 2;
    b->size = 3;
    b->strand = '+';
    if (with_seq) {
        b->qSequence = strdup("ACG");
        b->tSequence = strdup("ACG");
    }
    return b;
}

static struct hal_target_dupe_list_t *make_dupe(int nranges) {
    struct hal_target_dupe_list_t *d = (struct hal_target_dupe_list_t *)calloc(
        1, sizeof(struct hal_target_dupe_list_t));
    d->qChrom = strdup("q_chrom");
    struct hal_target_range_t *prev = NULL;
    for (int i = 0; i < nranges; ++i) {
        struct hal_target_range_t *r = (struct hal_target_range_t *)calloc(
            1, sizeof(struct hal_target_range_t));
        r->tStart = i * 10;
        r->size = 5;
        if (prev == NULL) {
            d->tRange = r;
        } else {
            prev->next = r;
        }
        prev = r;
    }
    return d;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <libhalblockviz.so>\n", argv[0]);
        return 2;
    }
    void *lib = dlopen(argv[1], RTLD_NOW | RTLD_GLOBAL);
    if (lib == NULL) {
        fprintf(stderr, "dlopen: %s\n", dlerror());
        return 2;
    }
    free_results_fn free_results =
        (free_results_fn)dlsym(lib, "halFreeBlockResults");
    free_blocks_fn free_blocks = (free_blocks_fn)dlsym(lib, "halFreeBlocks");
    free_dupes_fn free_dupes =
        (free_dupes_fn)dlsym(lib, "halFreeTargetDupeLists");
    free_species_fn free_species =
        (free_species_fn)dlsym(lib, "halFreeSpeciesList");
    if (!free_results || !free_blocks || !free_dupes || !free_species) {
        fprintf(stderr, "missing symbol\n");
        return 2;
    }

    /* NULL handling */
    free_results(NULL);
    free_blocks(NULL);
    free_dupes(NULL);
    free_species(NULL);

    /* full results object: 3 blocks (one sequence-less, one with NULL
     * qChrom), 2 dupe lists (0 and 3 ranges) */
    struct hal_block_results_t *res = (struct hal_block_results_t *)calloc(
        1, sizeof(struct hal_block_results_t));
    struct hal_block_t *b0 = make_block(1);
    struct hal_block_t *b1 = make_block(0);
    struct hal_block_t *b2 = make_block(1);
    free(b2->qChrom);
    b2->qChrom = NULL;
    b0->next = b1;
    b1->next = b2;
    res->mappedBlocks = b0;
    struct hal_target_dupe_list_t *d0 = make_dupe(0);
    struct hal_target_dupe_list_t *d1 = make_dupe(3);
    d0->next = d1;
    res->targetDupeBlocks = d0;
    free_results(res);

    /* empty results object */
    res = (struct hal_block_results_t *)calloc(
        1, sizeof(struct hal_block_results_t));
    free_results(res);

    /* standalone block chain + dupe chain */
    b0 = make_block(1);
    b0->next = make_block(0);
    free_blocks(b0);
    d0 = make_dupe(2);
    d0->next = make_dupe(1);
    free_dupes(d0);

    /* species list with and without parent */
    struct hal_species_t *s0 =
        (struct hal_species_t *)calloc(1, sizeof(struct hal_species_t));
    s0->name = strdup("root");
    struct hal_species_t *s1 =
        (struct hal_species_t *)calloc(1, sizeof(struct hal_species_t));
    s1->name = strdup("leaf");
    s1->parentName = strdup("root");
    s0->next = s1;
    free_species(s0);

    dlclose(lib);
    printf("OK\n");
    return 0;
}
