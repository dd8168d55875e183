/* blockVizBed equivalent (reference blockViz/tests/blockVizBed.cpp):
 * dlopen libhalblockviz.so, query a target range through the C ABI and
 * print each mapped block as a BED line on the query genome.
 * usage: blockviz_bed <lib> <hal> <qSpecies> <tSpecies> <tChrom>
 *                     <tStart> <tEnd> [doSeq] [doDupes] */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

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
    if (argc < 8) {
        fprintf(stderr, "usage: %s <lib> <hal> <qSpecies> <tSpecies> "
                        "<tChrom> <tStart> <tEnd> [doSeq] [doDupes]\n",
                argv[0]);
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
    hal_int_t t0 = atoll(argv[6]), t1 = atoll(argv[7]);
    int doSeq = argc > 8 ? atoi(argv[8]) : 0;
    int doDupes = argc > 9 ? atoi(argv[9]) : 0;
    struct hal_block_results_t *r = getBlocks(
        h, argv[3], argv[4], argv[5], t0, t1, 0, doSeq, doDupes ? 1 : 0, 1,
        0, &err);
    if (!r) { fprintf(stderr, "blocks: %s\n", err ? err : "?"); return 1; }
    /* BED on the query genome (reference printBlocksBed) */
    for (struct hal_block_t *b = r->mappedBlocks; b; b = b->next)
        printf("%s\t%ld\t%ld\t%s:%ld\t0\t%c\n", b->qChrom, (long)b->qStart,
               (long)(b->qStart + b->size), argv[5], (long)b->tStart,
               b->strand ? b->strand : '+');
    freeResults(r);
    return 0;
}
