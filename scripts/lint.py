#!/usr/bin/env python
"""Static analysis for CI (`make lint`).

The reference CI runs fmt+clippy (.github/workflows/ci.yml:12-22); no
ruff/flake8 is baked into this image and installs are disallowed, so
this is a small stdlib-AST linter covering the highest-value checks:

* syntax errors (ast.parse)
* unused imports (skipped in __init__.py re-export surfaces)
* duplicate top-level def/class names
* mutable default arguments
* bare `except:` clauses
* comparisons `== None` / `!= None`
* debug breakpoints (pdb.set_trace / breakpoint())

Exit code 1 on any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOTS = ["idsp_tpu", "tests", "benches", "scripts", "pipelines"]
ROOT_FILES = ["bench.py", "__graft_entry__.py"]


def iter_files(repo: Path):
    for r in ROOTS:
        d = repo / r
        if d.is_dir():
            yield from sorted(d.rglob("*.py"))
    for f in ROOT_FILES:
        p = repo / f
        if p.exists():
            yield p


class Visitor(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, ast.AST] = {}
        self.used: set[str] = set()
        self.findings: list[tuple[int, str]] = []
        self.toplevel: dict[str, int] = {}

    def visit_Import(self, node: ast.Import):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = node
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute):
        root = node
        while isinstance(root, ast.Attribute):
            root = root.value
        if isinstance(root, ast.Name):
            self.used.add(root.id)
        self.generic_visit(node)

    def _check_args(self, node):
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.findings.append(
                    (node.lineno, f"mutable default argument in {node.name}")
                )

    def visit_FunctionDef(self, node):
        self._check_args(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node):
        self._check_args(node)
        self.generic_visit(node)

    def visit_ExceptHandler(self, node: ast.ExceptHandler):
        if node.type is None:
            self.findings.append((node.lineno, "bare except:"))
        self.generic_visit(node)

    def visit_Compare(self, node: ast.Compare):
        for op, cmp_ in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(cmp_, ast.Constant) and cmp_.value is None
            ):
                self.findings.append(
                    (node.lineno, "use `is None` / `is not None`")
                )
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call):
        f = node.func
        if isinstance(f, ast.Name) and f.id == "breakpoint":
            self.findings.append((node.lineno, "breakpoint() left in"))
        if (
            isinstance(f, ast.Attribute)
            and f.attr == "set_trace"
            and isinstance(f.value, ast.Name)
            and f.value.id == "pdb"
        ):
            self.findings.append((node.lineno, "pdb.set_trace() left in"))
        self.generic_visit(node)


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    v = Visitor()
    v.visit(tree)
    out = [f"{path}:{ln}: {msg}" for ln, msg in v.findings]

    # duplicate top-level definitions
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                out.append(
                    f"{path}:{node.lineno}: `{node.name}` redefines "
                    f"line {seen[node.name]}"
                )
            seen[node.name] = node.lineno

    # unused imports (re-export files excepted)
    if path.name != "__init__.py":
        exported = set()
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        if isinstance(node.value, (ast.List, ast.Tuple)):
                            exported = {
                                e.value
                                for e in node.value.elts
                                if isinstance(e, ast.Constant)
                            }
        for name, node in v.imports.items():
            if name not in v.used and name not in exported:
                out.append(f"{path}:{node.lineno}: unused import `{name}`")
    return out


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    findings: list[str] = []
    n = 0
    for f in iter_files(repo):
        n += 1
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"# lint: {n} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
