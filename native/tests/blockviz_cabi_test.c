/* C driver: dlopen libhalblockviz.so and exercise the halBlockViz ABI. */
#include <dlfcn.h>
#include <stdio.h>
#include <stdint.h>
typedef int64_t hal_int_t;
struct hal_block_t { struct hal_block_t *next; char *qChrom; hal_int_t tStart, qStart, size; char strand; char *qSequence, *tSequence; };
struct hal_block_results_t { struct hal_block_t *mappedBlocks; void *targetDupeBlocks; };
int main(int argc, char **argv) {
    void *lib = dlopen(argv[1], RTLD_NOW);
    if (!lib) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
    int (*halOpen)(char*, char**) = dlsym(lib, "halOpen");
    struct hal_block_results_t *(*getBlocks)(int, char*, char*, char*, hal_int_t, hal_int_t, hal_int_t, int, int, int, const char*, char**) = dlsym(lib, "halGetBlocksInTargetRange");
    void (*freeResults)(struct hal_block_results_t*) = dlsym(lib, "halFreeBlockResults");
    if (!halOpen || !getBlocks || !freeResults) { fprintf(stderr, "dlsym failed\n"); return 2; }
    char *err = 0;
    int h = halOpen(argv[2], &err);
    if (h < 0) { fprintf(stderr, "open: %s\n", err ? err : "?"); return 1; }
    struct hal_block_results_t *r = getBlocks(h, argv[3], argv[4], argv[5], 0, 3000, 0, 1, 2, 1, 0, &err);
    if (!r) { fprintf(stderr, "blocks: %s\n", err ? err : "?"); return 1; }
    for (struct hal_block_t *b = r->mappedBlocks; b; b = b->next)
        printf("chr:%s, tSt:%ld, qSt:%ld, size:%ld, strand:%c: tgt : %.10s query: %.10s\n",
               b->qChrom, (long)b->tStart, (long)b->qStart, (long)b->size, b->strand, b->tSequence, b->qSequence);
    freeResults(r);
    return 0;
}
