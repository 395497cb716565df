"""One-command verification runbook (VERDICT r8 #7).

Reproduces every judge-checked piece of evidence in one sitting and
prints a single PASS/FAIL table:

1. driver   — tools/driver_sim.py oracle replay at sf0.01 (the
              correctness gate: rows + schema + value-hash per query).
2. pytest   — the full test suite.
3. plans    — regenerate the physical-plan audit and diff against the
              committed PLANS.md (plan drift must be committed, not
              discovered at judging time); also re-assert its hard
              invariants (0 cartesian products, 0 row-at-a-time Python).
4. leaks    — grep the source tree for non-public references: URLs
              outside public hosts, cloud bucket schemes, internal-TLD
              hostnames, credential-looking assignments, non-allowlisted
              env vars and third-party imports.
5. bench    — the committed bench artifact carries the contamination
              stamp fields (cal_ratio + host, steal, spread, load) and
              stamps clean.

Usage:
  python tools/verify_all.py            # everything (~15-20 min)
  python tools/verify_all.py --skip pytest,driver   # subset

Exit code 0 iff every selected check passed.
"""

from __future__ import annotations

import ast
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --- leak grep ---------------------------------------------------------

PUBLIC_HOSTS = (
    "apache.org", "github.com", "githubusercontent.com", "python.org",
    "pypi.org", "duckdb.org", "pandas.pydata.org", "numpy.org",
    "arrow.apache.org", "spark.apache.org", "beam.apache.org",
    "avro.apache.org", "w3.org", "ietf.org", "wikipedia.org",
    "localhost", "example.com", "protobuf.dev", "grpc.io",
    "cloud.google.com", "terraform.io", "json.org", "unicode.org",
    # Synthetic fixture domains used by the PII-redaction tests/docs —
    # single-letter placeholders, not real services.
    "a.com", "b.com", "ex.com",
)
ENV_PREFIXES = (
    "SPARK_", "PYSPARK_", "JAVA_", "PYTHON", "HADOOP_", "TZ",
    # repo-local tool knobs (documented where read)
    "SIM_", "PANE_", "PROTOSHIM_",
)
ALLOWED_IMPORTS = {
    # baked-in third-party surface; everything else must be stdlib,
    # package-internal, or import-try gated.
    "pyspark", "pandas", "numpy", "pyarrow", "duckdb", "pytest",
    "hypothesis", "tutorial_apache_beam_spark", "vendor", "tests",
    "tools", "bench", "__spark_entry__", "demo1", "demo2",
    # public namespace the vendored clean-room protoshim provides
    "google",
    # import-try-gated optional codecs/decoders (absent in this image)
    "PIL", "snappy", "zstandard",
}
STDLIB = {
    "__future__", "abc", "argparse", "ast", "base64", "binascii", "bisect",
    "bz2", "collections", "contextlib", "copy", "dataclasses",
    "datetime", "decimal", "difflib", "enum", "errno", "fcntl",
    "functools", "gc", "glob", "gzip", "hashlib", "heapq", "hmac",
    "html", "importlib", "inspect", "io", "itertools", "json", "lzma",
    "math", "multiprocessing", "operator", "os", "pathlib", "pickle",
    "platform", "queue", "random", "re", "resource", "secrets",
    "select", "shlex", "shutil", "signal", "socket", "stat", "string",
    "struct", "subprocess", "sys", "tempfile", "textwrap", "threading",
    "time", "traceback", "types", "typing", "unicodedata", "urllib",
    "uuid", "warnings", "wave", "zipfile", "zlib",
}

LEAK_PATTERNS = [
    # `://bucket` alone is a docstring placeholder; a named bucket leaks.
    ("bucket-scheme", re.compile(
        r"\b(?:s3a?|gs|wasbs?|abfss?)://(?!bucket\b)[\w.-]+"
    )),
    # '.internal' is deliberately absent: google.protobuf.internal is a
    # public Python module path the vendored shim must reference.
    ("internal-host", re.compile(
        r"\b[\w.-]+\.(?:corp|intranet)\b"
    )),
    ("credential", re.compile(
        r"(?i)\b(?:aws_secret|api[_-]?key|access[_-]?token|password)\s*=\s*['\"][^'\"]{8,}"
    )),
]
URL_RE = re.compile(r"https?://([\w.-]+)")
ENV_RE = re.compile(r"(?:os\.environ(?:\.get)?[\[(]|getenv\()\s*['\"]([A-Z][A-Z0-9_]*)['\"]")


def _py_sources() -> list[str]:
    out = []
    for base in ("tutorial_apache_beam_spark", "tools", "tests", "vendor", "."):
        d = os.path.join(REPO, base)
        if base == ".":
            out += [
                os.path.join(REPO, f)
                for f in os.listdir(REPO)
                if f.endswith(".py")
            ]
            continue
        for root, _dirs, files in os.walk(d):
            out += [os.path.join(root, f) for f in files if f.endswith(".py")]
    return sorted(set(out))


def check_leaks() -> tuple[bool, str]:
    hits: list[str] = []
    for path in _py_sources():
        rel = os.path.relpath(path, REPO)
        text = open(path, encoding="utf-8", errors="replace").read()
        for label, pat in LEAK_PATTERNS:
            for m in pat.finditer(text):
                hits.append(f"{rel}: {label}: {m.group(0)[:60]}")
        for m in URL_RE.finditer(text):
            host = m.group(1).lower()  # DNS is case-insensitive
            if not any(host == h or host.endswith("." + h) for h in PUBLIC_HOSTS):
                hits.append(f"{rel}: non-public-url: {host}")
        for m in ENV_RE.finditer(text):
            var = m.group(1)
            if not var.startswith(ENV_PREFIXES) and var not in ("HOME", "PATH", "USER"):
                hits.append(f"{rel}: env-var: {var}")
        # Imports via AST, not regex — prose like "from the index" inside
        # docstrings must not count.
        try:
            tree = ast.parse(text)
        except SyntaxError:
            hits.append(f"{rel}: unparseable")
            continue
        for node in ast.walk(tree):
            mods: list[str] = []
            if isinstance(node, ast.Import):
                mods = [a.name.split(".")[0] for a in node.names]
            elif isinstance(node, ast.ImportFrom) and node.level == 0 and node.module:
                mods = [node.module.split(".")[0]]
            for mod in mods:
                if mod not in STDLIB and mod not in ALLOWED_IMPORTS:
                    hits.append(f"{rel}: import: {mod}")
    detail = "; ".join(hits[:8]) + (f" (+{len(hits)-8} more)" if len(hits) > 8 else "")
    return (not hits, detail or "0 hits in all categories")


# --- subprocess checks -------------------------------------------------


def check_driver() -> tuple[bool, str]:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_sim.py")],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    tail = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
    m = re.search(r"(\d+)/(\d+) green", tail)
    ok = p.returncode == 0 and m is not None and m.group(1) == m.group(2)
    return ok, tail


def check_pytest() -> tuple[bool, str]:
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in p.stdout.strip().splitlines() if "passed" in l or "failed" in l]
    tail = lines[-1] if lines else "<no summary>"
    return p.returncode == 0, tail


def check_plans() -> tuple[bool, str]:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py")],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    if p.returncode != 0:
        return False, f"plan_audit failed: {p.stderr.strip()[-120:]}"
    fresh = p.stdout
    committed = open(os.path.join(REPO, "PLANS.md"), encoding="utf-8").read()
    if fresh != committed:
        # Name the first differing line so the fix is obvious: re-run
        # `python tools/plan_audit.py > PLANS.md` and commit the drift.
        for i, (a, b) in enumerate(zip(committed.splitlines(), fresh.splitlines())):
            if a != b:
                return False, f"PLANS.md drift at line {i+1}: {b[:80]!r}"
        return False, "PLANS.md drift (length differs)"
    bad = re.search(r"CartesianProduct\s*\|\s*[1-9]", fresh) or re.search(
        r"BatchEvalPython\s*\|\s*[1-9]", fresh
    )
    if bad:
        return False, f"forbidden node in plans: {bad.group(0)}"
    return True, "plan audit matches PLANS.md; 0 cartesian, 0 row-Python"


def check_bench() -> tuple[bool, str]:
    path = os.path.join(REPO, "bench_last.json")
    rec = json.loads(open(path).read())
    extra = rec.get("extra", {})
    need = ["cal_ratio", "steal_pct", "load_contaminated", "cal_ref_host"]
    missing = [k for k in need if k not in extra]
    if missing:
        return False, f"bench_last.json missing stamp fields: {missing}"
    if extra["load_contaminated"]:
        return False, "committed bench record stamped contaminated"
    return True, (
        f"stamp clean: cal_ratio={extra['cal_ratio']}, "
        f"steal={extra['steal_pct']}%, value={rec.get('value')}s"
    )


CHECKS = {
    "driver": check_driver,
    "pytest": check_pytest,
    "plans": check_plans,
    "leaks": check_leaks,
    "bench": check_bench,
}


def main(argv: list[str]) -> int:
    skip: set[str] = set()
    it = iter(argv)
    for tok in it:
        if tok == "--skip":
            skip = set(next(it).split(","))
        else:
            raise SystemExit(f"unknown arg {tok!r}\n{__doc__}")
    results = {}
    for name, fn in CHECKS.items():
        if name in skip:
            results[name] = (None, "skipped")
            continue
        t0 = time.monotonic()
        try:
            ok, detail = fn()
        except Exception as exc:  # noqa: BLE001 - reported in the table
            ok, detail = False, f"{type(exc).__name__}: {exc}"[:160]
        results[name] = (ok, f"{detail}  [{time.monotonic()-t0:.0f}s]")
    width = max(len(n) for n in results)
    failed = False
    for name, (ok, detail) in results.items():
        status = "SKIP" if ok is None else "PASS" if ok else "FAIL"
        failed |= ok is False
        print(f"{status}  {name:<{width}}  {detail}")
    print("VERDICT:", "FAIL" if failed else "PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
