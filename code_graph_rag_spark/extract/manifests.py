"""Dependency-manifest parsing (shared by every language tier).

Nine manifest flavors → ``dependency`` mentions → Project
DEPENDS_ON_EXTERNAL ExternalPackage edges (reference
``parsers/dependency_parser.py`` + ``definition_processor.py:451-478``).
Split out of ``pylite.py`` (which routes to it for extension-less files
like Gemfile/go.mod) so the Python kernel stays a parser, not a registry.
"""

from __future__ import annotations

import json
import re

_REQ_RE = re.compile(r"^\s*([A-Za-z_][\w.\-]*)\s*(?:[=<>!~]=+\s*([\w.*]+))?\s*$")
_PKGJSON_DEP_RE = re.compile(r'^\s*"([^"]+)"\s*:\s*"([^"]*)"\s*,?\s*$')

MANIFEST_FILES = {
    "requirements.txt": "requirements",
    "pyproject.toml": "pyproject",
    "package.json": "package_json",
    "go.mod": "gomod",
    "Cargo.toml": "cargo",
    "Gemfile": "gemfile",
    "composer.json": "composer",
    "pubspec.yaml": "pubspec",
    # *.csproj matches by suffix in parse_document (any project name)
}
_GOMOD_REQ_RE = re.compile(r"^\s*(?:require\s+)?([\w./\-]+)\s+(v[\w.\-+]+)")
# Gemfile `gem "name", "~> 1.0"` (reference dependency_parser.py GemfileParser)
_GEMFILE_RE = re.compile(
    r"""gem\s+["']([^"']+)["'](?:\s*,\s*["']([^"']+)["'])?"""
)
# .csproj `<PackageReference Include="X" Version="Y" />` (CsprojParser; the
# reference uses an XML walk — attribute order is Include-first in practice
# and both orders are matched here)
_CSPROJ_RE = re.compile(
    r"""<PackageReference\s+(?:Include="([^"]+)"(?:\s+Version="([^"]*)")?"""
    r"""|Version="([^"]*)"\s+Include="([^"]+)")"""
)
_CARGO_DEP_RE = re.compile(
    r'^\s*([A-Za-z_][\w\-]*)\s*=\s*(?:"([^"]*)"'
    r'|\{[^}]*version\s*=\s*"([^"]*)")'
)

def parse_manifest(doc_id: str, text: str, flavor: str) -> list[dict]:
    """Dependency manifests → ``dependency`` mentions (name, version prop)."""
    project = doc_id.split("/")[0]
    out: list[dict] = []

    def dep(idx: int, name: str, spec: str) -> dict:
        return {
            "kind": "dependency",
            "name": name,
            "parent_qn": project,
            "parent_kind": "Project",
            "start_line": idx + 1,
            "props": json.dumps({"version_spec": spec or ""}),
        }

    in_dep_block = flavor not in ("package_json", "composer")
    # pubspec block-entry indent: packages sit at the FIRST entry's indent;
    # deeper lines are a nested block's keys (sdk:/git:/path:) and skip
    # (reference dependency_parser.py PubspecYamlParser)
    pubspec_entry_indent: int | None = None
    for idx, raw in enumerate(text.split("\n")):
        line = raw.strip()
        if not line or line.startswith(("#", "//")):
            continue
        if flavor == "gemfile":
            if line.startswith("gem "):
                m = _GEMFILE_RE.match(line)
                if m:
                    out.append(dep(idx, m.group(1), m.group(2)))
            continue
        if flavor == "csproj":
            for m in _CSPROJ_RE.finditer(line):
                name = m.group(1) or m.group(4)
                if name:
                    out.append(dep(idx, name, m.group(2) or m.group(3)))
            continue
        if flavor == "composer":
            # require / require-dev maps, php pseudo-package excluded
            if line.startswith(('"require"', '"require-dev"')):
                in_dep_block = True
                continue
            if line.startswith(("}", "]")):
                in_dep_block = False
                continue
            m = _PKGJSON_DEP_RE.match(line)
            if in_dep_block and m and m.group(1) != "php":
                out.append(dep(idx, m.group(1), m.group(2)))
            continue
        if flavor == "pubspec":
            indent = len(raw) - len(raw.lstrip())
            if indent == 0:
                key = line.split(":", 1)[0]
                in_dep_block = key in ("dependencies", "dev_dependencies")
                pubspec_entry_indent = None
                continue
            if not in_dep_block or ":" not in line:
                continue
            if pubspec_entry_indent is None:
                pubspec_entry_indent = indent
            if indent != pubspec_entry_indent:
                continue
            name, _, spec = line.partition(":")
            if name.strip():
                out.append(dep(idx, name.strip(), spec.strip()))
            continue
        if flavor == "package_json":
            if line.startswith('"dependencies"') or line.startswith(
                '"devDependencies"'
            ):
                in_dep_block = True
                continue
            if line.startswith(("}", "]")):
                in_dep_block = False
                continue
            m = _PKGJSON_DEP_RE.match(line)
            if in_dep_block and m:
                out.append(
                    {
                        "kind": "dependency",
                        "name": m.group(1),
                        "parent_qn": project,
                        "parent_kind": "Project",
                        "start_line": idx + 1,
                        "props": json.dumps({"version_spec": m.group(2)}),
                    }
                )
            continue
        if flavor == "gomod":
            # `require path v1.2.3` (single or inside a require block);
            # the `module`/`go`/`replace` directives are not dependencies
            # (reference parsers/dependency_parser.py go.mod handling)
            if line.startswith(("module ", "go ", "replace ", ")", "require (")):
                continue
            m = _GOMOD_REQ_RE.match(line)
            if m:
                out.append(
                    {
                        "kind": "dependency",
                        "name": m.group(1),
                        "parent_qn": project,
                        "parent_kind": "Project",
                        "start_line": idx + 1,
                        "props": json.dumps({"version_spec": m.group(2)}),
                    }
                )
            continue
        if flavor == "cargo":
            # [dependencies]/[dev-dependencies]/[build-dependencies]
            # sections; `name = "1.0"` or `name = { version = "1.0", .. }`
            if line.startswith("["):
                in_dep_block = line.strip("[]").endswith("dependencies")
                continue
            m = _CARGO_DEP_RE.match(line)
            if in_dep_block and m:
                out.append(
                    {
                        "kind": "dependency",
                        "name": m.group(1),
                        "parent_qn": project,
                        "parent_kind": "Project",
                        "start_line": idx + 1,
                        "props": json.dumps(
                            {"version_spec": m.group(2) or m.group(3) or ""}
                        ),
                    }
                )
            continue
        if flavor == "pyproject":
            if line.startswith("["):
                in_dep_block = "dependencies" in line
                continue
            line = line.strip('",')
        m = _REQ_RE.match(line)
        if in_dep_block and m and m.group(1) not in ("name", "version"):
            out.append(
                {
                    "kind": "dependency",
                    "name": m.group(1),
                    "parent_qn": project,
                    "parent_kind": "Project",
                    "start_line": idx + 1,
                    "props": json.dumps({"version_spec": m.group(2) or ""}),
                }
            )
    return out


