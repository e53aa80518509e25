"""Extraction parity on REAL Python files, oracled by Python's own ``ast``.

The reference's L1 eval design (``evals/README.md:5-13``) compares extracted
structure against ground truth; here the ground truth is the stdlib ``ast``
module and the corpus is the reference repo's own source files (read-only
test input — no code is copied). For every sampled file the kernel must
recover the exact set of function/class/method definitions (qualified by
nesting) and the exact set of locally-bound import names: P/R = 1.0.
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

from code_graph_rag_spark.extract.pylite import module_qn_for, parse_document

REF = Path("/root/reference/codebase_rag")


def _sample_files(n: int = 24) -> list[Path]:
    if not REF.exists():
        return []
    files = [
        p
        for p in sorted(REF.rglob("*.py"))
        if 500 < p.stat().st_size < 120_000 and p.name != "__init__.py"
    ]
    # spread across the tree: every k-th file
    step = max(1, len(files) // n)
    return files[::step][:n]


FILES = _sample_files()


def _ast_truth(path: Path) -> tuple[set[tuple[str, str]], set[str]]:
    """(defs, import_locals): defs = {(nested_qn, kind)} with kind
    function|class|method; import_locals = locally bound import names."""
    tree = ast.parse(path.read_text())
    defs: set[tuple[str, str]] = set()
    imports: set[str] = set()

    def walk(node: ast.AST, prefix: str, in_class: bool) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                qn = f"{prefix}.{child.name}" if prefix else child.name
                defs.add((qn, "method" if in_class else "function"))
                walk(child, qn, False)
            elif isinstance(child, ast.ClassDef):
                qn = f"{prefix}.{child.name}" if prefix else child.name
                defs.add((qn, "class"))
                walk(child, qn, True)
            elif isinstance(child, ast.Import):
                for a in child.names:
                    imports.add(a.asname or a.name.split(".")[0])
            elif isinstance(child, ast.ImportFrom):
                for a in child.names:
                    if a.name != "*":
                        imports.add(a.asname or a.name)
            else:
                walk(child, prefix, in_class)

    walk(tree, "", False)
    return defs, imports


@pytest.mark.parametrize("path", FILES, ids=lambda p: p.name)
def test_structure_parity_vs_ast(path: Path):
    doc_id = "ref/" + str(path.relative_to(REF.parent))
    module_qn, _ = module_qn_for(doc_id)
    ms = parse_document(doc_id, path.read_text())

    got_defs = {
        (m["qn"][len(module_qn) + 1 :], m["kind"])
        for m in ms
        if m["kind"] in ("function", "class", "method")
        and not m["name"].startswith("lambda_")
    }
    got_imports = {m["local_name"] for m in ms if m["kind"] == "import"}

    want_defs, want_imports = _ast_truth(path)
    missing = want_defs - got_defs
    extra = got_defs - want_defs
    assert not missing and not extra, (
        f"{path.name}: missing={sorted(missing)[:8]} extra={sorted(extra)[:8]}"
    )
    assert want_imports == got_imports, (
        f"{path.name}: imports missing={sorted(want_imports - got_imports)[:8]} "
        f"extra={sorted(got_imports - want_imports)[:8]}"
    )


def test_sampled_enough_files():
    assert len(FILES) >= 20, f"only {len(FILES)} real files sampled"
