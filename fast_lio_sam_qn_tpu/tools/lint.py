"""In-repo lint — the reference's pre-commit layer equivalent.

The reference ships `.pre-commit-config.yaml` running clang-format +
cpplint over its C++ (`/root/reference/.pre-commit-config.yaml:30-63`,
`.clang-format:2-4`). This environment has no ruff/flake8/clang-format
binaries (and installs are not allowed), so the equivalent gate is
implemented here and enforced by `tests/test_lint.py` — same effect:
style violations fail CI.

Checks (Python + C++):
  - line length (<= 88 for Python (black-compatible), <= 100 for C++ like the
    reference's clang-format ColumnLimit)
  - no tabs, no trailing whitespace, file ends with exactly one newline
Python only:
  - the file parses (ast)
  - unused top-level `import x` / `from x import y` bindings

Usage: python -m fast_lio_sam_qn_tpu.tools.lint [paths...]
Exit code 0 = clean.
"""
from __future__ import annotations

import ast
import os
import sys

PY_MAX_LINE = 88
CPP_MAX_LINE = 100

# names that are imported for side effects / re-export, not direct use
_IMPORT_ALLOW = {"annotations"}


def _iter_source_files(root: str):
    skip_dirs = {".git", "__pycache__", ".claude", "build", "dist"}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in skip_dirs]
        for f in sorted(filenames):
            if f.endswith((".py", ".cpp", ".cc", ".h", ".hpp")):
                yield os.path.join(dirpath, f)


def _check_common(path: str, text: str, max_line: int, errors: list):
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if len(line) > max_line:
            errors.append(f"{path}:{i}: line too long ({len(line)} > "
                          f"{max_line})")
        if line != line.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            errors.append(f"{path}:{i}: tab character")
    if text and not text.endswith("\n"):
        errors.append(f"{path}: no newline at end of file")
    if text.endswith("\n\n"):
        errors.append(f"{path}: multiple trailing newlines")


def _check_python(path: str, text: str, errors: list):
    try:
        tree = ast.parse(text, filename=path)
    except SyntaxError as e:
        errors.append(f"{path}:{e.lineno}: syntax error: {e.msg}")
        return
    # unused imports: top-level only, skip __init__.py (re-export surface)
    if os.path.basename(path) == "__init__.py":
        return
    imported: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # base captured via its Name node
    # names in __all__ or docstring-level re-exports count as used
    for name, lineno in imported.items():
        if name in used or name in _IMPORT_ALLOW:
            continue
        errors.append(f"{path}:{lineno}: unused import '{name}'")


def lint_paths(paths) -> list:
    errors: list = []
    for p in paths:
        files = _iter_source_files(p) if os.path.isdir(p) else [p]
        for f in files:
            with open(f, encoding="utf-8") as fh:
                text = fh.read()
            if f.endswith(".py"):
                _check_common(f, text, PY_MAX_LINE, errors)
                _check_python(f, text, errors)
            else:
                _check_common(f, text, CPP_MAX_LINE, errors)
    return errors


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    roots = argv or ["fast_lio_sam_qn_tpu", "tests", "bench.py", "run.py"
                     if os.path.exists("run.py") else "bench.py"]
    roots = [r for r in dict.fromkeys(roots) if os.path.exists(r)]
    errors = lint_paths(roots)
    for e in errors:
        print(e)
    print(f"{len(errors)} issue(s)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
