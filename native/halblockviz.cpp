// C ABI for UCSC genome-browser "snake" tracks — the halBlockViz contract
// (reference blockViz/inc/halBlockViz.h:134-328, impl halBlockViz.cpp:99-243).
//
// The reference ships this as a dlopen-able C library the browser links at
// runtime.  hal_tpu's query engine lives in Python (hal_tpu.blockviz over
// the batched mapper), so this shim embeds a CPython interpreter: a C
// caller dlopens libhalblockviz.so, calls halOpen/halGetBlocksInTargetRange
// and receives plain C structs; the shim marshals through the Python API
// under one global mutex (the reference serializes identically,
// halBlockViz.cpp:29-40).
//
// Build: make -C native libhalblockviz.so   (links libpython3.x)
// Test:  tests/test_native.py compiles a C driver and dlopens this.

#include <Python.h>

#include <dlfcn.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include <map>
#include <string>

typedef int64_t hal_int_t;

extern "C" {

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

struct hal_chromosome_t {
    struct hal_chromosome_t *next;
    char *name;
    hal_int_t length;
};

typedef enum { HAL_NO_DUPS = 0, HAL_QUERY_DUPS, HAL_QUERY_AND_TARGET_DUPS } hal_dup_type_t;
typedef enum { HAL_NO_SEQUENCE = 0, HAL_LOD0_SEQUENCE, HAL_FORCE_LOD0_SEQUENCE } hal_seqmode_type_t;

}  // extern "C" (struct decls)

static pthread_mutex_t g_mutex = PTHREAD_MUTEX_INITIALIZER;
static PyObject *g_module = NULL;  // hal_tpu.blockviz
static std::map<int, PyObject *> *g_handles = NULL;
static int g_next_handle = 0;

static void set_err(char **errStr, const std::string &msg) {
    if (errStr != NULL) {
        *errStr = strdup(msg.c_str());
    }
}

static std::string py_err_string() {
    PyObject *type = NULL, *value = NULL, *tb = NULL;
    PyErr_Fetch(&type, &value, &tb);
    std::string out = "python error";
    if (value != NULL) {
        PyObject *s = PyObject_Str(value);
        if (s != NULL) {
            out = PyUnicode_AsUTF8(s);
            Py_DECREF(s);
        }
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
    return out;
}

/* Bring up the interpreter if this process has none.  Py_InitializeEx
 * leaves the calling thread owning the GIL; release it immediately with
 * PyEval_SaveThread so that EVERY entry point — from any thread,
 * including ctypes callers whose GIL was released around the foreign
 * call — acquires it uniformly through PyGILState_Ensure. */
static void ensure_interpreter(void) {
    if (!Py_IsInitialized()) {
        // when this library is dlopen'd (the browser case), libpython comes
        // in RTLD_LOCAL and numpy/jax C extensions cannot resolve Python
        // symbols; promote it to the global namespace first
        char pylib[64];
        snprintf(pylib, sizeof(pylib), "libpython%d.%d.so.1.0",
                 PY_MAJOR_VERSION, PY_MINOR_VERSION);
        if (dlopen(pylib, RTLD_NOW | RTLD_GLOBAL) == NULL) {
            snprintf(pylib, sizeof(pylib), "libpython%d.%d.so",
                     PY_MAJOR_VERSION, PY_MINOR_VERSION);
            dlopen(pylib, RTLD_NOW | RTLD_GLOBAL);
        }
        Py_InitializeEx(0);
        PyEval_SaveThread();
    }
}

/* RAII GIL hold for one entry-point body (call with g_mutex held and the
 * interpreter initialized). */
struct GilHold {
    PyGILState_STATE st;
    GilHold() : st(PyGILState_Ensure()) {
    }
    ~GilHold() {
        PyGILState_Release(st);
    }
};

/* Import hal_tpu.blockviz (GIL must be held).  The repo root is resolved
 * from this shared object's own path (native/.. ) so no environment setup
 * is needed beyond having the library in place. */
static bool ensure_python(char **errStr) {
    if (g_module != NULL) {
        return true;
    }
    Dl_info info;
    std::string root;
    if (dladdr((void *)&ensure_python, &info) && info.dli_fname != NULL) {
        std::string p(info.dli_fname);
        size_t slash = p.rfind('/');
        if (slash != std::string::npos) {
            p = p.substr(0, slash);        // .../native
            slash = p.rfind('/');
            if (slash != std::string::npos) {
                root = p.substr(0, slash); // repo root
            }
        }
    }
    PyObject *sys_path = PySys_GetObject("path");
    if (sys_path != NULL && !root.empty()) {
        PyObject *s = PyUnicode_FromString(root.c_str());
        PyList_Insert(sys_path, 0, s);
        Py_DECREF(s);
    }
    // the embedded interpreter starts from the base prefix; add the active
    // virtualenv's site-packages (numpy, jax, h5py live there)
    const char *venv = getenv("VIRTUAL_ENV");
    if (venv == NULL) {
        venv = getenv("HAL_TPU_VENV");
    }
    if (venv != NULL) {
        std::string code =
            "import site, sys\n"
            "site.addsitedir('" + std::string(venv) + "/lib/python" +
            std::to_string(PY_MAJOR_VERSION) + "." +
            std::to_string(PY_MINOR_VERSION) + "/site-packages')\n";
        PyRun_SimpleString(code.c_str());
    }
    g_module = PyImport_ImportModule("hal_tpu.blockviz");
    if (g_module == NULL) {
        set_err(errStr, "cannot import hal_tpu.blockviz: " + py_err_string());
        return false;
    }
    g_handles = new std::map<int, PyObject *>();
    return true;
}

extern "C" {

int halOpenHalOrLod(char *lodFilePath, char **errStr) {
    pthread_mutex_lock(&g_mutex);
    ensure_interpreter();
    int handle = -1;
    {
        GilHold gil;
        if (ensure_python(errStr)) {
            PyObject *h = PyObject_CallMethod(g_module, "hal_open", "s", lodFilePath);
            if (h == NULL) {
                set_err(errStr, py_err_string());
            } else {
                handle = g_next_handle++;
                (*g_handles)[handle] = h;
            }
        }
    }
    pthread_mutex_unlock(&g_mutex);
    return handle;
}

int halOpenLOD(char *lodFilePath, char **errStr) {
    return halOpenHalOrLod(lodFilePath, errStr);
}

int halOpen(char *halFilePath, char **errStr) {
    return halOpenHalOrLod(halFilePath, errStr);
}

void halClose(int handle, char **errStr) {
    pthread_mutex_lock(&g_mutex);
    if (g_handles != NULL && g_handles->count(handle)) {
        GilHold gil;
        Py_DECREF((*g_handles)[handle]);
        g_handles->erase(handle);
    }
    pthread_mutex_unlock(&g_mutex);
}

void halFreeBlocks(struct hal_block_t *head) {
    while (head != NULL) {
        struct hal_block_t *next = head->next;
        free(head->qChrom);
        free(head->qSequence);
        free(head->tSequence);
        free(head);
        head = next;
    }
}

static void free_dupe_lists(struct hal_target_dupe_list_t *head) {
    while (head != NULL) {
        struct hal_target_dupe_list_t *next = head->next;
        struct hal_target_range_t *r = head->tRange;
        while (r != NULL) {
            struct hal_target_range_t *rn = r->next;
            free(r);
            r = rn;
        }
        free(head->qChrom);
        free(head);
        head = next;
    }
}

void halFreeTargetDupeLists(struct hal_target_dupe_list_t *head) {
    free_dupe_lists(head);
}

void halFreeBlockResults(struct hal_block_results_t *results) {
    if (results != NULL) {
        halFreeBlocks(results->mappedBlocks);
        free_dupe_lists(results->targetDupeBlocks);
        free(results);
    }
}

static char *attr_str_or_null(PyObject *o, const char *name) {
    PyObject *a = PyObject_GetAttrString(o, name);
    char *out = NULL;
    if (a != NULL && a != Py_None) {
        out = strdup(PyUnicode_AsUTF8(a));
    }
    Py_XDECREF(a);
    PyErr_Clear();
    return out;
}

static hal_int_t attr_int(PyObject *o, const char *name) {
    PyObject *a = PyObject_GetAttrString(o, name);
    hal_int_t v = a != NULL ? PyLong_AsLongLong(a) : 0;
    Py_XDECREF(a);
    PyErr_Clear();
    return v;
}

struct hal_block_results_t *halGetBlocksInTargetRange(
    int halHandle, char *qSpecies, char *tSpecies, char *tChrom,
    hal_int_t tStart, hal_int_t tEnd, hal_int_t tReversed,
    hal_seqmode_type_t seqMode, hal_dup_type_t dupMode,
    int mapBackAdjacencies, const char *coalescenceLimitName, char **errStr) {
    // reference-parity validation (halBlockViz.cpp:259-267)
    if (tReversed != 0 && mapBackAdjacencies != 0) {
        set_err(errStr, "halGetBlocksInTargetRange tReversed can only be set "
                        "when mapBackAdjacencies is 0");
        return NULL;
    }
    if (tReversed != 0 && dupMode == HAL_QUERY_AND_TARGET_DUPS) {
        set_err(errStr, "tReversed cannot be set in conjunction with "
                        "dupMode=HAL_QUERY_AND_TARGET_DUPS");
        return NULL;
    }
    pthread_mutex_lock(&g_mutex);
    struct hal_block_results_t *results = NULL;
    GilHold *gil = NULL;
    do {
        if (g_handles == NULL || !g_handles->count(halHandle)) {
            set_err(errStr, "bad handle");
            break;
        }
        gil = new GilHold();
        PyObject *h = (*g_handles)[halHandle];
        PyObject *kw = Py_BuildValue(
            "{s:i,s:i,s:O,s:z,s:O}", "seq_mode", (int)seqMode, "dup_mode",
            (int)dupMode, "map_back_adjacencies",
            mapBackAdjacencies ? Py_True : Py_False, "coalescence_limit",
            coalescenceLimitName, "t_reversed",
            tReversed ? Py_True : Py_False);
        PyObject *args = Py_BuildValue("(OsssLL)", h, qSpecies, tSpecies,
                                       tChrom, (long long)tStart,
                                       (long long)tEnd);
        PyObject *fn = PyObject_GetAttrString(g_module,
                                              "get_blocks_in_target_range");
        PyObject *res = (fn && args && kw) ? PyObject_Call(fn, args, kw) : NULL;
        Py_XDECREF(fn);
        Py_XDECREF(args);
        Py_XDECREF(kw);
        if (res == NULL) {
            set_err(errStr, py_err_string());
            break;
        }
        PyObject *blocks = PyTuple_GetItem(res, 0);
        PyObject *dupes = PyTuple_GetItem(res, 1);
        results = (struct hal_block_results_t *)calloc(1, sizeof(*results));
        struct hal_block_t *prev = NULL;
        for (Py_ssize_t i = 0; i < PyList_Size(blocks); ++i) {
            PyObject *b = PyList_GetItem(blocks, i);
            struct hal_block_t *cur =
                (struct hal_block_t *)calloc(1, sizeof(*cur));
            cur->qChrom = attr_str_or_null(b, "q_chrom");
            cur->tStart = attr_int(b, "t_start");
            cur->qStart = attr_int(b, "q_start");
            cur->size = attr_int(b, "size");
            char *s = attr_str_or_null(b, "strand");
            cur->strand = s != NULL ? s[0] : '+';
            free(s);
            cur->qSequence = attr_str_or_null(b, "q_sequence");
            cur->tSequence = attr_str_or_null(b, "t_sequence");
            if (prev == NULL) {
                results->mappedBlocks = cur;
            } else {
                prev->next = cur;
            }
            prev = cur;
        }
        struct hal_target_dupe_list_t *dprev = NULL;
        for (Py_ssize_t i = 0; i < PyList_Size(dupes); ++i) {
            PyObject *d = PyList_GetItem(dupes, i);
            struct hal_target_dupe_list_t *cur =
                (struct hal_target_dupe_list_t *)calloc(1, sizeof(*cur));
            cur->id = (hal_int_t)i;
            cur->qChrom = attr_str_or_null(d, "q_chrom");
            PyObject *ranges = PyObject_GetAttrString(d, "t_ranges");
            struct hal_target_range_t *rprev = NULL;
            for (Py_ssize_t k = 0; ranges && k < PyList_Size(ranges); ++k) {
                PyObject *iv = PyList_GetItem(ranges, k);
                struct hal_target_range_t *r =
                    (struct hal_target_range_t *)calloc(1, sizeof(*r));
                r->tStart = PyLong_AsLongLong(PyTuple_GetItem(iv, 0));
                r->size = PyLong_AsLongLong(PyTuple_GetItem(iv, 1)) - r->tStart;
                if (rprev == NULL) {
                    cur->tRange = r;
                } else {
                    rprev->next = r;
                }
                rprev = r;
            }
            Py_XDECREF(ranges);
            if (dprev == NULL) {
                results->targetDupeBlocks = cur;
            } else {
                dprev->next = cur;
            }
            dprev = cur;
        }
        Py_DECREF(res);
    } while (0);
    delete gil;
    pthread_mutex_unlock(&g_mutex);
    return results;
}

struct hal_species_t *halGetSpecies(int halHandle, char **errStr) {
    pthread_mutex_lock(&g_mutex);
    struct hal_species_t *head = NULL;
    GilHold *gil = NULL;
    do {
        if (g_handles == NULL || !g_handles->count(halHandle)) {
            set_err(errStr, "bad handle");
            break;
        }
        gil = new GilHold();
        PyObject *res = PyObject_CallMethod(
            g_module, "get_species_info", "O", (*g_handles)[halHandle]);
        if (res == NULL) {
            set_err(errStr, py_err_string());
            break;
        }
        struct hal_species_t *prev = NULL;
        for (Py_ssize_t i = 0; i < PyList_Size(res); ++i) {
            PyObject *t = PyList_GetItem(res, i);  // (name,len,nchrom,parent,bl)
            struct hal_species_t *cur =
                (struct hal_species_t *)calloc(1, sizeof(*cur));
            cur->name = strdup(PyUnicode_AsUTF8(PyTuple_GetItem(t, 0)));
            cur->length = PyLong_AsLongLong(PyTuple_GetItem(t, 1));
            cur->numChroms = PyLong_AsLongLong(PyTuple_GetItem(t, 2));
            PyObject *p = PyTuple_GetItem(t, 3);
            cur->parentName = p == Py_None ? NULL : strdup(PyUnicode_AsUTF8(p));
            cur->parentBranchLength = PyFloat_AsDouble(PyTuple_GetItem(t, 4));
            if (prev == NULL) {
                head = cur;
            } else {
                prev->next = cur;
            }
            prev = cur;
        }
        Py_DECREF(res);
    } while (0);
    delete gil;
    pthread_mutex_unlock(&g_mutex);
    return head;
}

void halFreeSpeciesList(struct hal_species_t *head) {
    while (head != NULL) {
        struct hal_species_t *next = head->next;
        free(head->name);
        free(head->parentName);
        free(head);
        head = next;
    }
}

char *halGetDna(int halHandle, char *speciesName, char *chromName,
                hal_int_t start, hal_int_t end, char **errStr) {
    pthread_mutex_lock(&g_mutex);
    char *out = NULL;
    GilHold *gil = NULL;
    do {
        if (g_handles == NULL || !g_handles->count(halHandle)) {
            set_err(errStr, "bad handle");
            break;
        }
        gil = new GilHold();
        PyObject *res = PyObject_CallMethod(
            g_module, "get_dna", "OssLL", (*g_handles)[halHandle], speciesName,
            chromName, (long long)start, (long long)end);
        if (res == NULL) {
            set_err(errStr, py_err_string());
            break;
        }
        out = strdup(PyUnicode_AsUTF8(res));
        Py_DECREF(res);
    } while (0);
    delete gil;
    pthread_mutex_unlock(&g_mutex);
    return out;
}

}  // extern "C"
