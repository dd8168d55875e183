/* blockVizMaf equivalent (reference blockViz/tests/blockVizMaf.cpp):
 * query a target range through the C ABI with sequence retrieval on and
 * print a pairwise MAF-like record per block (target row then query row).
 * usage: blockviz_maf <lib> <hal> <qSpecies> <tSpecies> <tChrom>
 *                     <tStart> <tEnd> */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef int64_t hal_int_t;
struct hal_block_t {
    struct hal_block_t *next;
    char *qChrom;
    hal_int_t tStart, qStart, size;
    char strand;
    char *qSequence, *tSequence;
};
struct hal_block_results_t {
    struct hal_block_t *mappedBlocks;
    void *targetDupeBlocks;
};

int main(int argc, char **argv) {
    if (argc != 8) {
        fprintf(stderr, "usage: %s <lib> <hal> <qSpecies> <tSpecies> "
                        "<tChrom> <tStart> <tEnd>\n", argv[0]);
        return 2;
    }
    void *lib = dlopen(argv[1], RTLD_NOW);
    if (!lib) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
    int (*halOpen)(char *, char **) = (int (*)(char *, char **))dlsym(lib, "halOpen");
    struct hal_block_results_t *(*getBlocks)(
        int, char *, char *, char *, hal_int_t, hal_int_t, hal_int_t, int,
        int, int, const char *, char **) =
        (struct hal_block_results_t * (*)(int, char *, char *, char *,
                                          hal_int_t, hal_int_t, hal_int_t,
                                          int, int, int, const char *,
                                          char **))
            dlsym(lib, "halGetBlocksInTargetRange");
    void (*freeResults)(struct hal_block_results_t *) =
        (void (*)(struct hal_block_results_t *))dlsym(lib, "halFreeBlockResults");
    if (!halOpen || !getBlocks || !freeResults) {
        fprintf(stderr, "dlsym failed\n");
        return 2;
    }
    char *err = 0;
    int h = halOpen(argv[2], &err);
    if (h < 0) { fprintf(stderr, "open: %s\n", err ? err : "?"); return 1; }
    struct hal_block_results_t *r = getBlocks(
        h, argv[3], argv[4], argv[5], atoll(argv[6]), atoll(argv[7]), 0,
        2 /* HAL_LOD0_SEQUENCE */, 0, 1, 0, &err);
    if (!r) { fprintf(stderr, "blocks: %s\n", err ? err : "?"); return 1; }
    printf("##maf version=1 scoring=N/A\n");
    for (struct hal_block_t *b = r->mappedBlocks; b; b = b->next) {
        if (!b->tSequence || !b->qSequence) continue;
        printf("a\ns\t%s.%s\t%ld\t%ld\t+\t0\t%s\ns\t%s.%s\t%ld\t%ld\t%c\t0\t%s\n\n",
               argv[4], argv[5], (long)b->tStart, (long)b->size,
               b->tSequence, argv[3], b->qChrom, (long)b->qStart,
               (long)b->size, b->strand ? b->strand : '+', b->qSequence);
    }
    freeResults(r);
    return 0;
}
