/* ASan driver for the Python-free blockViz server: open a halz fixture,
 * exercise every entry point (blocks across dup/seq/adjacency modes,
 * target dupes, species, chroms, dna), free everything — leak detection
 * on, any OOB/UAF/leak fails.
 * usage: blockviz_server_asan_test <lib> <halz> <qSpecies> <tSpecies>
 *        <tChrom> */
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef int64_t hal_int_t;
struct hal_target_range_t { struct hal_target_range_t *next; hal_int_t tStart, size; };
struct hal_target_dupe_list_t { struct hal_target_dupe_list_t *next; hal_int_t id; struct hal_target_range_t *tRange; char *qChrom; };
struct hal_block_t { struct hal_block_t *next; char *qChrom; hal_int_t tStart, qStart, size; char strand; char *qSequence, *tSequence; };
struct hal_block_results_t { struct hal_block_t *mappedBlocks; struct hal_target_dupe_list_t *targetDupeBlocks; };
struct hal_species_t { struct hal_species_t *next; char *name; hal_int_t length, numChroms; char *parentName; double parentBranchLength; };
struct hal_chromosome_t { struct hal_chromosome_t *next; char *name; hal_int_t length; };

int main(int argc, char **argv) {
    if (argc != 6) { fprintf(stderr, "usage error\n"); return 2; }
    void *lib = dlopen(argv[1], RTLD_NOW);
    if (!lib) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
    int (*halOpen)(char*, char**) = dlsym(lib, "halOpen");
    struct hal_block_results_t *(*getBlocks)(int, char*, char*, char*, hal_int_t, hal_int_t, hal_int_t, int, int, int, const char*, char**) = dlsym(lib, "halGetBlocksInTargetRange");
    void (*freeResults)(struct hal_block_results_t*) = dlsym(lib, "halFreeBlockResults");
    struct hal_species_t *(*getSpecies)(int, char**) = dlsym(lib, "halGetSpecies");
    void (*freeSpecies)(struct hal_species_t*) = dlsym(lib, "halFreeSpeciesList");
    struct hal_chromosome_t *(*getChroms)(int, char*, char**) = dlsym(lib, "halGetChroms");
    void (*freeChroms)(struct hal_chromosome_t*) = dlsym(lib, "halFreeChromList");
    char *(*getDna)(int, char*, char*, hal_int_t, hal_int_t, char**) = dlsym(lib, "halGetDna");
    if (!halOpen || !getBlocks || !freeResults || !getSpecies || !freeSpecies
        || !getChroms || !freeChroms || !getDna) {
        fprintf(stderr, "dlsym failed\n");
        return 2;
    }
    char *err = 0;
    int h = halOpen(argv[2], &err);
    if (h < 0) { fprintf(stderr, "open: %s\n", err ? err : "?"); return 1; }
    long nblocks = 0;
    int modes[4][3] = {{0, 1, 0}, {1, 1, 1}, {1, 0, 0}, {1, 2, 0}};
    for (int m = 0; m < 4; ++m) {
        struct hal_block_results_t *r = getBlocks(
            h, argv[3], argv[4], argv[5], 0, 40, 0, modes[m][0], modes[m][1],
            modes[m][2], 0, &err);
        if (!r) { fprintf(stderr, "blocks: %s\n", err ? err : "?"); return 1; }
        for (struct hal_block_t *b = r->mappedBlocks; b; b = b->next) ++nblocks;
        freeResults(r);
    }
    /* error path must also be leak-free */
    struct hal_block_results_t *bad = getBlocks(h, "nope", argv[4], argv[5],
                                                0, 10, 0, 0, 1, 0, 0, &err);
    if (bad) { fprintf(stderr, "expected error\n"); return 1; }
    free(err);
    err = 0;
    struct hal_species_t *sp = getSpecies(h, &err);
    if (!sp) { fprintf(stderr, "species: %s\n", err ? err : "?"); return 1; }
    long nsp = 0;
    for (struct hal_species_t *s = sp; s; s = s->next) ++nsp;
    freeSpecies(sp);
    struct hal_chromosome_t *ch = getChroms(h, argv[4], &err);
    if (!ch) { fprintf(stderr, "chroms: %s\n", err ? err : "?"); return 1; }
    freeChroms(ch);
    char *dna = getDna(h, argv[4], argv[5], 0, 8, &err);
    if (!dna) { fprintf(stderr, "dna: %s\n", err ? err : "?"); return 1; }
    free(dna);
    printf("OK blocks=%ld species=%ld\n", nblocks, nsp);
    return 0;
}
