"""Contract-file kernel: .proto service blocks + OpenAPI specs →
``contract_op`` mentions (reference ``parsers/contracts.py``).

Discovery is deliberately narrow (the reference's rule): a JSON/YAML
document counts as a spec only when it declares an ``openapi``/``swagger``
version key AND a ``paths`` mapping, so manifests/lockfiles/fixtures
contribute nothing; a ``.proto`` yields operations only from inside a
``service`` block.

Mention row shape (MENTIONS_SCHEMA):
  kind        = "contract_op"
  local_name  = contract name (proto: package.Service; spec: doc path
                without suffix — the FILE names the contract, two specs
                never fold)
  name        = operation (rpc name / operationId)
  target      = HTTP method, None for an rpc (addressed by name)
  arg0_lit    = path template incl. basePath/servers prefix, None for rpc
"""

from __future__ import annotations

import json
import re

_SPEC_MARKERS = ('"openapi"', '"swagger"', "openapi:", "swagger:")
_SPEC_VERSION_KEYS = ("openapi", "swagger")
_OPERATION_METHODS = frozenset(
    {"get", "put", "post", "delete", "options", "head", "patch", "trace"}
)
_PROTO_SERVICE_RE = re.compile(r"\bservice\s+(\w+)\s*\{")
_PROTO_PACKAGE_RE = re.compile(r"\bpackage\s+([\w.]+)\s*;")
_PROTO_RPC_RE = re.compile(r"\brpc\s+(\w+)\s*\(")
_PROTO_COMMENT_RE = re.compile(r"//[^\n]*|/\*.*?\*/", re.DOTALL)

CONTRACT_EXTENSIONS = frozenset({"proto"})
SPEC_EXTENSIONS = frozenset({"json", "yaml", "yml"})


def is_spec_text(text: str) -> bool:
    return any(m in text for m in _SPEC_MARKERS)


def _row(doc_id: str, contract: str, op: str, method, path, line: int) -> dict:
    return {
        "kind": "contract_op",
        "name": op,
        "local_name": contract,
        "target": method,
        "arg0_lit": path,
        "parent_qn": doc_id.split("/")[0],
        "parent_kind": "Project",
        "start_line": line,
        "start_col": 0,
    }


def parse_proto(doc_id: str, text: str) -> list[dict]:
    code = _PROTO_COMMENT_RE.sub(
        lambda m: re.sub(r"[^\n]", " ", m.group(0)), text
    )
    pm = _PROTO_PACKAGE_RE.search(code)
    package = f"{pm.group(1)}." if pm else ""
    out: list[dict] = []
    for sm in _PROTO_SERVICE_RE.finditer(code):
        service = f"{package}{sm.group(1)}"
        body, body_start = _block_body(code, sm.end() - 1)
        for rm in _PROTO_RPC_RE.finditer(body):
            line = code.count("\n", 0, body_start + rm.start()) + 1
            out.append(_row(doc_id, service, rm.group(1), None, None, line))
    return out


def _block_body(code: str, brace_index: int) -> tuple[str, int]:
    depth = 0
    for index in range(brace_index, len(code)):
        if code[index] == "{":
            depth += 1
        elif code[index] == "}":
            depth -= 1
            if depth == 0:
                return code[brace_index + 1 : index], brace_index + 1
    return code[brace_index + 1 :], brace_index + 1


def parse_spec(doc_id: str, text: str) -> list[dict]:
    if not is_spec_text(text):
        return []
    doc = _parse_document(doc_id, text)
    if not isinstance(doc, dict):
        return []
    if not any(k in doc for k in _SPEC_VERSION_KEYS):
        return []
    paths = doc.get("paths")
    if not isinstance(paths, dict):
        return []
    # the FILE names the contract (doc path without suffix)
    contract = doc_id.rsplit(".", 1)[0]
    prefix = _base_path(doc)
    out: list[dict] = []
    for template, methods in paths.items():
        if not isinstance(template, str) or not isinstance(methods, dict):
            continue
        for method, op in methods.items():
            if (
                not isinstance(op, dict)
                or str(method).lower() not in _OPERATION_METHODS
            ):
                continue
            op_id = op.get("operationId")
            if isinstance(op_id, str) and op_id:
                out.append(
                    _row(
                        doc_id,
                        contract,
                        op_id,
                        str(method).upper(),
                        f"{prefix}{template}",
                        1,
                    )
                )
    out.sort(key=lambda r: (r["local_name"], r["name"], r["target"] or ""))
    return out


def _parse_document(doc_id: str, text: str):
    if doc_id.endswith(".json"):
        try:
            return json.loads(text)
        except ValueError:
            return None
    try:
        import yaml

        return yaml.safe_load(text)
    except Exception:
        return None


def _base_path(doc: dict) -> str:
    """Swagger 2 ``basePath``, or the prefix EVERY OpenAPI 3 server agrees
    on (one server rooted differently means there is none)."""
    from urllib.parse import urlparse

    base = doc.get("basePath")
    if isinstance(base, str) and base.startswith("/"):
        return base.rstrip("/")
    servers = doc.get("servers")
    if not isinstance(servers, list) or not servers:
        return ""
    prefixes = set()
    for server in servers:
        if not isinstance(server, dict):
            return ""
        url = server.get("url")
        if not isinstance(url, str):
            return ""
        prefixes.add(urlparse(url).path.rstrip("/"))
    if len(prefixes) != 1:
        return ""
    only = prefixes.pop()
    return only if only.startswith("/") else ""
