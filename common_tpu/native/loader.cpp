// Multithreaded CSV/TSV -> float32 matrix loader (host-side data ingest).
//
// Reference analog: the dataview layer of `common` is C++ (recarray etc.);
// here device-side data handling is JAX, but bulk TEXT ingest still runs
// hot on the host and numpy's loadtxt is single-threaded Python.  This
// parser reads the whole file once, splits it into per-thread blocks
// aligned to line starts, and strtof-parses in parallel.
//
// Exposed via ctypes (see native/__init__.py):
//   ct_csv_shape(path, *cols)            -> rows   (or <0 on error)
//   ct_csv_load_f32(path, out, max_rows, cols, n_threads)
//                                        -> rows   (or <0 on error)
// Errors: -1 open/read failure, -2 no data, -3 ragged rows / parse error.
// Separators: comma, semicolon, tab, spaces.  Lines starting with '#'
// and blank lines are skipped.

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

bool read_file(const char* path, std::string& buf) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    if (sz < 0) { std::fclose(f); return false; }
    std::fseek(f, 0, SEEK_SET);
    buf.resize(static_cast<size_t>(sz));
    size_t got = sz ? std::fread(&buf[0], 1, static_cast<size_t>(sz), f) : 0;
    std::fclose(f);
    return got == static_cast<size_t>(sz);
}

inline bool is_sep(char c) { return c == ',' || c == ';' || c == '\t' || c == ' '; }

// '\r' terminates a line like '\n' so CRLF files parse identically to LF
// (a trailing '\r' must never read as field content or an extra field).
inline bool is_eol(char c) { return c == '\n' || c == '\r'; }

inline const char* skip_seps(const char* p, const char* end) {
    while (p < end && is_sep(*p)) ++p;
    return p;
}

// Fast decimal float parse (fast_float-style): mantissa in uint64, scale
// by a power-of-ten table.  Covers [+-]?d+[.d*][eE[+-]d+] — the form
// numeric CSV data actually takes — to within ~1 ulp of float32 (the
// target dtype); anything else (inf/nan/hex/overlong) falls back to
// strtof.  ~4x glibc strtof, which dominates single-thread parse time.
inline double pow10_table(long e) {
    static const double tab[] = {
        1e-20, 1e-19, 1e-18, 1e-17, 1e-16, 1e-15, 1e-14, 1e-13, 1e-12,
        1e-11, 1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2,
        1e-1, 1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10,
        1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20,
    };
    if (e < -20 || e > 20) return 0.0;  // sentinel: caller falls back
    return tab[e + 20];
}

inline float fast_strtof(const char* p, const char* end, char** next) {
    const char* s = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    uint64_t mant = 0;
    int digits = 0;
    long exp10 = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
        if (digits < 19) { mant = mant * 10 + (*p - '0'); ++digits; }
        else ++exp10;
        ++p; any = true;
    }
    if (p < end && *p == '.') {
        ++p;
        while (p < end && *p >= '0' && *p <= '9') {
            if (digits < 19) { mant = mant * 10 + (*p - '0'); ++digits; --exp10; }
            ++p; any = true;
        }
    }
    if (!any) { return std::strtof(s, next); }
    if (p < end && (*p == 'e' || *p == 'E')) {
        const char* q = p + 1;
        bool eneg = false;
        if (q < end && (*q == '-' || *q == '+')) { eneg = (*q == '-'); ++q; }
        long e = 0;
        bool edig = false;
        while (q < end && *q >= '0' && *q <= '9') {
            e = e * 10 + (*q - '0'); ++q; edig = true;
        }
        if (edig) { exp10 += eneg ? -e : e; p = q; }
    }
    double scale = pow10_table(exp10);
    if (scale == 0.0 && exp10 != 0) { return std::strtof(s, next); }
    *next = const_cast<char*>(p);
    double v = static_cast<double>(mant) * (exp10 == 0 ? 1.0 : scale);
    return static_cast<float>(neg ? -v : v);
}

// collect the byte offset of every data line (non-blank, non-comment)
void line_starts(const std::string& buf, std::vector<size_t>& starts) {
    size_t n = buf.size();
    size_t i = 0;
    while (i < n) {
        size_t j = i;
        while (j < n && buf[j] != '\n') ++j;
        size_t k = i;
        while (k < j && std::isspace(static_cast<unsigned char>(buf[k]))) ++k;
        if (k < j && buf[k] != '#') starts.push_back(i);
        i = j + 1;
    }
}

// count fields in the line starting at s
long count_cols(const std::string& buf, size_t s) {
    const char* p = buf.data() + s;
    const char* end = buf.data() + buf.size();
    long cols = 0;
    while (p < end && !is_eol(*p)) {
        p = skip_seps(p, end);
        if (p >= end || is_eol(*p)) break;
        ++cols;
        while (p < end && !is_eol(*p) && !is_sep(*p)) ++p;
    }
    return cols;
}

}  // namespace

extern "C" {

long ct_csv_shape(const char* path, long* out_cols) {
    std::string buf;
    if (!read_file(path, buf)) return -1;
    std::vector<size_t> starts;
    line_starts(buf, starts);
    if (starts.empty()) return -2;
    *out_cols = count_cols(buf, starts[0]);
    return static_cast<long>(starts.size());
}

long ct_csv_load_f32(const char* path, float* out, long max_rows, long cols,
                     int n_threads) {
    std::string buf;
    if (!read_file(path, buf)) return -1;
    std::vector<size_t> starts;
    line_starts(buf, starts);
    long rows = static_cast<long>(starts.size());
    if (rows == 0) return -2;
    if (rows > max_rows) rows = max_rows;

    if (n_threads <= 0) {
        unsigned hw = std::thread::hardware_concurrency();
        n_threads = hw ? static_cast<int>(hw) : 4;
    }
    if (n_threads > rows) n_threads = static_cast<int>(rows);

    std::atomic<long> bad{0};
    const char* data = buf.data();
    const char* end = data + buf.size();

    auto work = [&](long r0, long r1) {
        for (long r = r0; r < r1; ++r) {
            const char* p = data + starts[static_cast<size_t>(r)];
            float* row = out + r * cols;
            long c = 0;
            while (p < end && !is_eol(*p) && c < cols) {
                p = skip_seps(p, end);
                if (p >= end || is_eol(*p)) break;
                char* next = nullptr;
                row[c] = fast_strtof(p, end, &next);
                if (next == p) { bad.fetch_add(1); break; }
                p = next;
                ++c;
            }
            // any trailing field or shortfall = ragged row
            p = skip_seps(p, end);
            if (c != cols || (p < end && *p != '\n' && *p != '\r')) {
                bad.fetch_add(1);
            }
        }
    };

    std::vector<std::thread> threads;
    long per = (rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        long r0 = t * per;
        long r1 = r0 + per < rows ? r0 + per : rows;
        if (r0 >= r1) break;
        threads.emplace_back(work, r0, r1);
    }
    for (auto& th : threads) th.join();
    if (bad.load() != 0) return -3;
    return rows;
}

}  // extern "C"
