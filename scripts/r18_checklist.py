"""r18 per-key checklist table — key sets DERIVED FROM CODE, not
hand-maintained (ADVICE r17 item 4: r17_checklist.py's literal
CHANGED/SPREAD lists would silently drift).

- "changed" keys: registry fingerprints (the same AST machinery the
  rotation uses) diffed against the blobs at the round-start commit.
- "spread"/"spread-gated" keys: AST scan of operators/llm.py for
  _docs_norm call sites and their spread= kwarg.

Usage:
    python scripts/r18_checklist.py BEFORE.json AFTER.json > table.md
where the JSONs are measure_noop.py outputs.
"""

from __future__ import annotations

import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catena_spark import registry

#: last commit of round 17 — the r18 baseline tree.
BASE_COMMIT = "95d77b5"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def docs_norm_call_map() -> dict[str, bool | None]:
    """{function name: spread flag} for every module-level function in
    operators/llm.py that calls _docs_norm (True = fanned out, False =
    opted out via spread=False, per the r18 gate)."""
    path = os.path.join(REPO, "catena_spark", "operators", "llm.py")
    tree = ast.parse(open(path, encoding="utf-8").read())
    out: dict[str, bool | None] = {}
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef):
            continue
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Name)
                and sub.func.id == "_docs_norm"
            ):
                spread = True
                for kw in sub.keywords:
                    if kw.arg == "spread" and isinstance(kw.value, ast.Constant):
                        spread = bool(kw.value.value)
                out[node.name] = spread
    return out


def changed_keys_since_base() -> set[str]:
    """Keys whose implementation fingerprint differs from BASE_COMMIT —
    reuses registry's _impl_fingerprint/_fn_index so this can never use
    a different definition of "changed" than the rotation does."""
    registry._load_all()
    changed: set[str] = set()
    blob_cache: dict[str, dict[str, str] | None] = {}
    for key, spec in registry._REGISTRY.items():
        try:
            cur = registry._impl_fingerprint(spec.fn)
        except Exception:
            continue
        for (rel, name), src in cur.items():
            # the r18 tables.py path-helper refactor is a semantic no-op
            # reaching EVERY key through tables.load; excluding that file
            # keeps "changed" meaning "this key's own pipeline changed"
            if rel == os.path.join("catena_spark", "tables.py"):
                continue
            if rel not in blob_cache:
                blob = registry._git(REPO, "show", f"{BASE_COMMIT}:{rel}")
                try:
                    blob_cache[rel] = (
                        registry._fn_index(blob) if blob is not None else None
                    )
                except SyntaxError:
                    blob_cache[rel] = None
            idx = blob_cache[rel]
            if idx is None or idx.get(name) != src:
                changed.add(key)
                break
    return changed


def main() -> None:
    before = json.load(open(sys.argv[1]))["keys"] if len(sys.argv) > 1 else {}
    after_payload = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else {}
    after = after_payload.get("keys", {})
    spread_map = docs_norm_call_map()
    changed = changed_keys_since_base()
    registry._load_all()
    print("| §2 | key | r18 open s | r18 close s | status |")
    print("|---|---|---|---|---|")
    for key, spec in sorted(
        registry._REGISTRY.items(), key=lambda kv: (kv[1].section, kv[0])
    ):
        b = before.get(key, {}).get("median_s", "")
        a = after.get(key, {}).get("median_s", "")
        notes = []
        if key in changed:
            notes.append("changed r18")
        flag = spread_map.get(key)
        if flag is True:
            notes.append("spread ON")
        elif flag is False:
            notes.append("spread gated OFF (r18)")
        status = "; ".join(notes) or "examined, unchanged"
        print(f"| {spec.section} | {key} | {b} | {a} | {status} |")


if __name__ == "__main__":
    main()
