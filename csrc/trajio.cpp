// Fast trajectory text I/O for hexpyro.
//
// np.savetxt/np.loadtxt dominate host time when a sweep writes hundreds of
// (n_steps+1) x 14 trajectory files (the reference does the same with
// np.savetxt, simul_data_gene_fix_chain_2D.py:224-226). This library formats/
// parses the same "%.18e"-space-separated layout ~20x faster. Exposed through
// ctypes (hexpyro/pipeline/native.py) with a pure-numpy fallback.
//
// Build: make -C csrc   (produces csrc/libtrajio.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Write a rows x cols row-major matrix in numpy-savetxt default format
// ("%.18e" columns separated by single spaces, "\n" line ends).
// Returns 0 on success, negative errno-style codes on failure.
int trajio_write(const char* path, const double* data, long rows, long cols) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    // one formatted row is at most cols * 26 bytes; buffer a chunk of rows
    const long row_bytes = cols * 26 + 2;
    const long chunk_rows = 256;
    char* buf = static_cast<char*>(std::malloc(row_bytes * chunk_rows));
    if (!buf) {
        std::fclose(f);
        return -2;
    }
    long r = 0;
    while (r < rows) {
        long n = (rows - r) < chunk_rows ? (rows - r) : chunk_rows;
        char* p = buf;
        for (long i = 0; i < n; ++i) {
            const double* row = data + (r + i) * cols;
            for (long j = 0; j < cols; ++j) {
                p += std::sprintf(p, j ? " %.18e" : "%.18e", row[j]);
            }
            *p++ = '\n';
        }
        if (std::fwrite(buf, 1, p - buf, f) != static_cast<size_t>(p - buf)) {
            std::free(buf);
            std::fclose(f);
            return -3;
        }
        r += n;
    }
    std::free(buf);
    return std::fclose(f) == 0 ? 0 : -4;
}

// Count rows/cols of a whitespace-separated numeric text file.
// Returns 0 on success.
int trajio_shape(const char* path, long* rows, long* cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* text = static_cast<char*>(std::malloc(size + 1));
    if (!text) {
        std::fclose(f);
        return -2;
    }
    if (std::fread(text, 1, size, f) != static_cast<size_t>(size)) {
        std::free(text);
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    text[size] = '\0';
    long r = 0, c = 0, first_c = -1;
    const char* p = text;
    while (*p) {
        // one line
        long nc = 0;
        while (*p && *p != '\n') {
            while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
            if (*p && *p != '\n') {
                ++nc;
                while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
            }
        }
        if (*p == '\n') ++p;
        if (nc > 0) {
            if (first_c < 0) first_c = nc;
            ++r;
            c = first_c;
        }
    }
    std::free(text);
    *rows = r;
    *cols = c;
    return 0;
}

// Parse the file into a preallocated rows*cols buffer (row-major).
int trajio_read(const char* path, double* out, long rows, long cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    char* text = static_cast<char*>(std::malloc(size + 1));
    if (!text) {
        std::fclose(f);
        return -2;
    }
    if (std::fread(text, 1, size, f) != static_cast<size_t>(size)) {
        std::free(text);
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    text[size] = '\0';
    char* p = text;
    long count = rows * cols;
    for (long i = 0; i < count; ++i) {
        char* end = nullptr;
        out[i] = std::strtod(p, &end);
        if (end == p) {
            std::free(text);
            return -4;  // fewer values than expected
        }
        p = end;
    }
    std::free(text);
    return 0;
}

}  // extern "C"
