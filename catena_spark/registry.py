"""Query registry backing the driver contract in __spark_entry__.py.

Each operator family registers its driver-checked queries here with a
``@query(...)`` decorator; __spark_entry__.py just re-exports the two
dicts. A spec without ``oracle`` SQL is a rows-only check (the driver's
weaker gate for non-SQL-expressible ops, __spark_entry__.py:35-36).

SURVEY.md §2's *key* column is the registry key namespace.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    section: str  # SURVEY.md §2 row id, e.g. "D7"


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, section: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable as a driver query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, section)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .functions import udtfs  # noqa: F401
    from .operators import graph, llm, multimodal, relational, timeseries  # noqa: F401
    from .sources import ingest  # noqa: F401
    from .streaming import ops  # noqa: F401


def _scan_history(
    root: str | None = None,
) -> tuple[dict[str, int], set[str], dict[str, int]]:
    """ONE pass over past rounds' CORRECTNESS_r*.json (under ``root``,
    default the repo root), classifying every record with the single
    green-record predicate. Returns (settled counts, non-green keys,
    latest settling round per key) so the rotation signals can never
    desync (the shared-definition rule ADVICE r4 applied to the
    canonicalizer).

    A hash-green row always settles. A rows-only `no_oracle` row settles
    ONLY while the spec still has no oracle: once an oracle is added
    (round-3 conversions: minhash/ann/lttb), the old rows-only record is
    no longer the strongest available check, so the key re-enters the
    unverified pool and rotates back into the driver's window for a real
    hash comparison. Any record that does not settle (ERR, mismatch,
    stale rows-only) marks its key non-green.
    """
    import glob
    import json
    import os
    import re

    counts: dict[str, int] = {}
    nongreen: set[str] = set()
    latest: dict[str, int] = {}
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                report = json.load(f)
        except Exception:
            continue
        for key, res in report.items():
            spec = _REGISTRY.get(key)
            ok = isinstance(res, dict) and (
                res.get("hash_match") is True
                or (
                    res.get("err") == "no_oracle"
                    and res.get("spark_rows") is not None
                    and (spec is None or spec.oracle is None)
                )
            )
            if ok:
                counts[key] = counts.get(key, 0) + 1
                latest[key] = max(latest.get(key, 0), rnd)
            else:
                nongreen.add(key)
    return counts, nongreen, latest


def _settled_counts(root: str | None = None) -> dict[str, int]:
    """Per-key count of successful driver verifications (see
    _scan_history; round 1 showed the driver checks a 50-key PREFIX of
    queries() in dict order, so least-verified-first ordering rotates
    the whole inventory through the window across rounds)."""
    return _scan_history(root)[0]


def _nongreen_keys(root: str | None = None) -> set[str]:
    """Keys with any past driver record that did NOT settle (see
    _scan_history). Rotation tie-break (VERDICT r4 item 5): within the
    same settled count, a key whose history contains a non-green record
    gets its confirming re-check before keys that have only ever been
    green, closing flakiness arguments fastest."""
    return _scan_history(root)[1]


# --------------------------------------------------------------------
# Runtime-change recency (VERDICT r11 item 2): a key whose
# IMPLEMENTATION changed after its latest green driver record must
# front the next rotation window, regardless of how many old records it
# has — otherwise a rewrite verified only by builder probes waits
# several rounds for a driver re-record (the r11 grouped_positions
# rewrite left win_ntile_dense/win_percent_rank_cume with pre-rewrite
# records until r13 under age-only ordering).
#
# "Implementation" = the key's function plus every catena_spark
# FUNCTION reachable from it (Name/Attribute references resolved
# through module globals, recursively) — so a shared-helper edit
# (twophase.py) boosts its callers (token packing, pagerank, ntile,
# percent_rank) even though their own bodies are untouched. Sources are
# AST-normalized (ast.unparse: comment-insensitive, docstring- and
# code-sensitive) and compared against the same functions extracted
# from each file's blob at the commit that ADDED the key's latest
# CORRECTNESS record (the driver commits records on the verified final
# tree, so that blob is the verified implementation). Granularity is
# module-level functions: a module-CONSTANT edit is not detected —
# acceptable, constants that matter are read inside some fingerprinted
# function. Reference RESOLUTION is likewise depth-limited by design
# (ADVICE r12): only bare Names and single-level module.attr chains
# resolve (``twophase.global_running_sum`` yes; a multi-level
# ``catena_spark.twophase.fn`` chain, a bound method, or a closure is
# INVISIBLE to the fingerprint and its edits never trigger the boost) —
# keep helper call sites in the visible style (import the module, call
# ``module.fn``), which is already the house import convention. Any
# git/parse failure degrades to "unchanged" so the rotation never
# breaks where git is unavailable.


def _fn_index(src: str) -> dict[str, str]:
    """{module-level function name: ast-normalized source} for a file."""
    import ast

    return {
        n.name: ast.unparse(n)
        for n in ast.parse(src).body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }


#: Working-tree parse cache shared across all 166 keys' fingerprints
#: (mtime-validated): {abspath: (mtime, {name: unparsed}, {name: node})}.
_FP_PARSE_CACHE: dict[str, tuple[float, dict[str, str], dict[str, object]]] = {}


def _parsed_file(path: str) -> tuple[dict[str, str], dict[str, object]]:
    import ast
    import os

    mtime = os.path.getmtime(path)
    hit = _FP_PARSE_CACHE.get(path)
    if hit is not None and hit[0] == mtime:
        return hit[1], hit[2]
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    nodes = {
        n.name: n
        for n in ast.parse(src).body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    srcs = {name: ast.unparse(n) for name, n in nodes.items()}
    _FP_PARSE_CACHE[path] = (mtime, srcs, nodes)
    return srcs, nodes


def _impl_fingerprint(fn) -> dict[tuple[str, str], str]:
    """{(repo-relative path, function name): normalized source} for
    ``fn`` and every catena_spark function transitively reachable from
    it via Name / module.attr references."""
    import ast
    import inspect
    import os
    import types

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[tuple[str, str], str] = {}
    seen: set[tuple[str, str]] = set()

    def visit(f) -> None:
        mod = inspect.getmodule(f)
        if mod is None or not getattr(mod, "__name__", "").startswith(
            "catena_spark"
        ):
            return
        path = os.path.abspath(mod.__file__)
        rel = os.path.relpath(path, root)
        key = (rel, f.__name__)
        if key in seen:
            return
        seen.add(key)
        srcs, nodes = _parsed_file(path)
        node = nodes.get(f.__name__)
        if node is None:  # not module-level (closure/lambda): skip
            return
        out[key] = srcs[f.__name__]
        for sub in ast.walk(node):
            tgt = None
            if isinstance(sub, ast.Name):
                tgt = mod.__dict__.get(sub.id)
            elif isinstance(sub, ast.Attribute) and isinstance(
                sub.value, ast.Name
            ):
                base = mod.__dict__.get(sub.value.id)
                if isinstance(base, types.ModuleType) and getattr(
                    base, "__name__", ""
                ).startswith("catena_spark"):
                    tgt = getattr(base, sub.attr, None)
            if isinstance(tgt, types.FunctionType) and getattr(
                tgt, "__module__", ""
            ).startswith("catena_spark"):
                visit(tgt)

    visit(fn)
    return out


def _git(root: str, *args: str) -> str | None:
    import subprocess

    try:
        p = subprocess.run(
            ["git", "-C", root, *args],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except Exception:
        return None
    return p.stdout if p.returncode == 0 else None


def _changed_since_record(root: str | None = None) -> dict[str, str]:
    """{key: "direct" | "transitive"} for keys whose implementation
    fingerprint differs from the blob at the commit that added their
    latest green CORRECTNESS record.

    "direct" = the key's OWN registered function body changed;
    "transitive" = only a reachable helper changed. The distinction is
    the VERDICT r16 item 2 sub-tier: a shared-helper edit (tables.load,
    encodings) can flag 60+ keys at once, and with >50 changed keys
    competing for the 50-slot window, a settled-count-only tiebreak can
    push out exactly the keys carrying the round's real semantic edits
    (r16: llm_centroid_by_label / llm_kmeans_assign missed the window
    behind 65 transitively-flagged keys). Direct changes must never
    wait rounds for a driver re-record (VERDICT r11 item 2), so they
    outrank every transitively-flagged key regardless of settled count.

    The own-function entry is always the FIRST key of the fingerprint
    dict (_impl_fingerprint records ``fn`` before recursing into its
    callees), so direct detection needs no extra git work.
    """
    import os

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _load_all()  # fingerprints need the populated registry
    try:
        latest = _scan_history(root)[2]
    except Exception:
        return {}
    commit_cache: dict[int, str | None] = {}
    old_index_cache: dict[tuple[str, str], dict[str, str] | None] = {}
    changed: dict[str, str] = {}
    for key, spec in _REGISTRY.items():
        rnd = latest.get(key)
        if rnd is None:
            continue  # never recorded: age-ordering already fronts it
        if rnd not in commit_cache:
            sha = _git(
                root,
                "log",
                "--format=%H",
                "--diff-filter=A",
                "-n",
                "1",
                "--",
                f"CORRECTNESS_r{rnd:02d}.json",
            )
            commit_cache[rnd] = sha.strip() if sha else None
        sha = commit_cache[rnd]
        if sha is None:
            continue
        try:
            cur = _impl_fingerprint(spec.fn)
        except Exception:
            continue
        own_key = next(iter(cur), None)
        for (rel, name), src in cur.items():
            ck = (sha, rel)
            if ck not in old_index_cache:
                blob = _git(root, "show", f"{sha}:{rel}")
                try:
                    old_index_cache[ck] = (
                        _fn_index(blob) if blob is not None else None
                    )
                except SyntaxError:
                    old_index_cache[ck] = None
            idx = old_index_cache[ck]
            # a file that did not exist (or parse) at the record commit
            # means the implementation moved/was created since: changed
            if idx is None or idx.get(name) != src:
                changed[key] = (
                    "direct" if (rel, name) == own_key else "transitive"
                )
                break
    return changed


_CHANGED_CACHE: dict[str, str] | None = None

#: Rotation tier per change kind (specs() sort key, VERDICT r16 item 2):
#: direct edits front the window unconditionally, transitive flags beat
#: unchanged keys but yield to direct ones.
_CHANGE_TIER = {"direct": 0, "transitive": 1}


def _changed_keys() -> dict[str, str]:
    """Process-cached _changed_since_record (specs() is called several
    times per driver run; the git scan is ~1s and cannot change
    mid-process — the working tree and record commits are fixed)."""
    global _CHANGED_CACHE
    if _CHANGED_CACHE is None:
        _CHANGED_CACHE = _changed_since_record()
    return _CHANGED_CACHE


def specs() -> dict[str, QuerySpec]:
    """Registry in driver-rotation order (the driver checks a 50-key
    PREFIX). Sort key, most significant first:

    1. change tier — direct edits, then transitive flags, then
       unchanged (VERDICT r16 item 2);
    2. latest green record round, ascending — oldest-record-first
       makes the rotation a true LRU (VERDICT r16 item 3): with 166
       keys and a 50-key window, a key just re-recorded waits behind at
       most 116 older keys = ceil(116/50) = 3 rounds, so steady-state
       staleness is bounded at 3 rounds REGARDLESS of how many keys a
       shared-helper edit flags (never-recorded keys sort as round 0
       and front everything in their tier);
    3. settled count ascending (least-verified tiebreak);
    4. non-green history first (VERDICT r4 item 5: flaky keys get
       their confirming re-check soonest);
    5. registration order (stable).
    """
    _load_all()
    try:
        settled, shaky, latest = _scan_history()
    except Exception:
        settled, shaky, latest = {}, set(), {}
    try:
        changed = _changed_keys()
    except Exception:
        changed = {}
    order = {k: i for i, k in enumerate(_REGISTRY)}
    keys = sorted(
        _REGISTRY,
        key=lambda k: (
            _CHANGE_TIER.get(changed.get(k), 2),
            latest.get(k, 0),
            settled.get(k, 0),
            0 if k in shaky else 1,
            order[k],
        ),
    )
    return {k: _REGISTRY[k] for k in keys}


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in specs().items()}


def next_window(n: int = 50) -> list[str]:
    """The driver's NEXT n-key rotation window — the prefix of the
    least-verified-first ordering. r9 (ADVICE r7 item 3): the single
    definition shared by scripts/preflight_driver.py (gate rehearsal)
    and scripts/stress_window.sh (hostile-conf matrix), so the two can
    never silently cover different windows."""
    return list(specs())[:n]


def oracles() -> dict[str, str]:
    return {k: s.oracle for k, s in specs().items() if s.oracle is not None}
