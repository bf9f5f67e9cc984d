"""Build & drive the reference ARCADE runner as a correctness/size
oracle (BASELINE.md §2, SURVEY.md §5.2 item 4).

The reference Makefile clones snappy from the network
(src/Makefile:10-12) — unavailable here — so the build copies the
source tree to /tmp and supplies:

- a ~15-line local ``snappy.h`` stand-in (Compress/Uncompress as
  pass-through; the snappy path is never taken because our output
  filenames don't contain "snappy", src/writer.cpp:406-409);
- a ``gtest/gtest.h`` shim that only pulls the std headers the
  reference transitively relied on (<algorithm>, <exception>, <ctime>);
- a C++20 compatibility patch for runner.cpp's ``cin >> char*`` reads
  (the overload was removed in C++20; bridged via std::string
  temporaries — I/O plumbing only, no behavior change).

Nothing from the reference tree is copied into this repo; the build
lives entirely under /tmp.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess

BUILD_DIR = "/tmp/arcade_ref/src"
_ANSI = re.compile(r"\x1b\[[0-9;]*m")

_SNAPPY_STUB = """\
#pragma once
#include <cstring>
#include <string>
#include <cstddef>
namespace snappy {
inline void Compress(const char* input, size_t n, std::string* output) {
  output->assign(input, n);
}
inline bool Uncompress(const char* input, size_t n, std::string* output) {
  output->assign(input, n);
  return true;
}
}
"""

_GTEST_SHIM = """\
#pragma once
#include <algorithm>
#include <exception>
#include <stdexcept>
#include <ctime>
"""

_MAKEFILE = """\
CPPFLAGS = -O3 -std=c++20 -Isnappy -Isnappy/build -Isnappy/third_party/googletest/googletest/include/ -fcoroutines -freorder-blocks-algorithm=simple -fPIC

%.o: %.cpp
\t$(CXX) -c -o $@ $< $(CPPFLAGS)

libarcade.a: reader.o cache.o process.o writer.o
\tar rcs libarcade.a reader.o cache.o process.o writer.o

runner: runner.cpp libarcade.a
\t$(CXX) -O3 -std=c++20 -fcoroutines -freorder-blocks-algorithm=simple -o runner runner.cpp -L. -larcade $(CPPFLAGS)
"""

_CIN_PATCHES = [
    ("cin >> filename >> outfile >> init >> row_count >> retcols;",
     "{ std::string _a,_b,_c; cin >> _a >> _b >> init >> row_count >> _c; "
     "strcpy(filename,_a.c_str()); strcpy(outfile,_b.c_str()); strcpy(retcols,_c.c_str()); }"),
    ("cin >> filename >> col_num >> val >> retcols;",
     "{ std::string _a,_b,_c; cin >> _a >> col_num >> _b >> _c; "
     "strcpy(filename,_a.c_str()); strcpy(val,_b.c_str()); strcpy(retcols,_c.c_str()); }"),
    ("cin >> filename >> retcols;",
     "{ std::string _a,_b; cin >> _a >> _b; "
     "strcpy(filename,_a.c_str()); strcpy(retcols,_b.c_str()); }"),
    ("cin >> filename >> rids >> retcols;",
     "{ std::string _a,_b,_c; cin >> _a >> _b >> _c; "
     "strcpy(filename,_a.c_str()); strcpy(rids,_b.c_str()); strcpy(retcols,_c.c_str()); }"),
]


def build_runner(reference_src: str = "/root/reference/src") -> str | None:
    """Build the reference runner; returns its path, or None if the
    toolchain is unavailable (callers fall back per BASELINE.md §2.4)."""
    runner = os.path.join(BUILD_DIR, "runner")
    if os.path.exists(runner):
        return runner
    if shutil.which("g++") is None or not os.path.isdir(reference_src):
        return None
    shutil.rmtree(BUILD_DIR, ignore_errors=True)
    shutil.copytree(reference_src, BUILD_DIR)
    gdir = os.path.join(BUILD_DIR, "snappy/third_party/googletest/googletest/include/gtest")
    os.makedirs(os.path.join(BUILD_DIR, "snappy/build"), exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(BUILD_DIR, "snappy/snappy.h"), "w") as f:
        f.write(_SNAPPY_STUB)
    with open(os.path.join(gdir, "gtest.h"), "w") as f:
        f.write(_GTEST_SHIM)
    with open(os.path.join(BUILD_DIR, "Makefile"), "w") as f:
        f.write(_MAKEFILE)
    rpath = os.path.join(BUILD_DIR, "runner.cpp")
    src = open(rpath).read()
    for old, new in _CIN_PATCHES:
        src = src.replace(old, new)
    if "#include <cstring>" not in src:
        src = src.replace("#include", "#include <cstring>\n#include", 1)
    open(rpath, "w").write(src)
    try:
        subprocess.run(["make", "libarcade.a", "runner"], cwd=BUILD_DIR,
                       check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return runner if os.path.exists(runner) else None


def _run(commands: str, timeout: int = 600) -> str:
    runner = build_runner()
    if runner is None:
        raise RuntimeError("reference runner unavailable")
    out = subprocess.run([runner], input=commands + "\nQ\n",
                         capture_output=True, text=True, timeout=timeout,
                         cwd=BUILD_DIR)
    return out.stdout


def reference_compress(csv_path: str, out_path: str, n_rows: int,
                       columns: list[int]) -> int:
    """Run the reference `C` command; returns the .arcade file size."""
    cols = ",".join(str(c) for c in columns)
    _run(f"C {csv_path} {out_path} 0 {n_rows} {cols}")
    return os.path.getsize(out_path)


def reference_scan(arcade_path: str, columns: list[int]) -> list[list[str]]:
    """Run the reference `S` command; returns decoded rows (list of
    column-value lists), ANSI separators stripped."""
    cols = ",".join(str(c) for c in columns)
    out = _run(f"S {arcade_path} {cols}")
    rows = []
    for line in out.splitlines():
        if (not line or line.startswith("Returned ")
                or line.startswith("The file is not")
                or line.startswith("exiting")):
            continue
        clean = _ANSI.sub("", line)
        rows.append(clean.split("|"))
    return rows


def reference_filter_count(arcade_path: str, col_num: int, value: str,
                           retcols: list[int]) -> int:
    """Run the reference `F` command (equi-filter on compressed data);
    returns its match count (the runner prints counts only,
    src/runner.cpp:60-70)."""
    cols = ",".join(str(c) for c in retcols)
    out = _run(f"F {arcade_path} {col_num} {value} {cols}")
    m = re.search(r"Returned (\d+) rows", out)
    return int(m.group(1)) if m else -1


def reference_random_access(arcade_path: str, row_ids: list[int],
                            retcols: list[int]) -> list[list[str]]:
    """Run the reference `R` command; returns the decoded rows."""
    cols = ",".join(str(c) for c in retcols)
    rids = ",".join(str(r) for r in row_ids)
    out = _run(f"R {arcade_path} {rids} {cols}")
    rows = []
    for line in out.splitlines():
        if (not line or line.startswith("Returned ")
                or line.startswith("The file is not")
                or line.startswith("exiting")):
            continue
        rows.append(_ANSI.sub("", line).split("|"))
    return rows


def export_csv(columns: list[list[str]], path: str) -> int:
    """Write columns as a reference-ingestible CSV. Every line gets a
    trailing comma so the reference's last-character truncation bug
    (src/writer.cpp:20-21, SURVEY.md §1.3) cannot corrupt the final
    column."""
    n = len(columns[0])
    with open(path, "w") as f:
        for i in range(n):
            f.write(",".join(col[i] for col in columns))
            f.write(",\n")
    return n
