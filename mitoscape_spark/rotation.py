"""Mechanical rotation-pin derivation (round-7 verdict item 4).

A declared query's driver-recorded green goes STALE when code on its
execution path changes after the round that recorded the verdict. The
hand-maintained ``_ROTATION_PINS`` list this automates had exactly one
failure mode: a forgotten consumer keeps a stale green that can mask a
regression. Derive the set instead:

    pin(name)  ⇔  path(name) changed after boundary(latest_verdict(name))

where ``boundary(rN)`` is the driver's ``round N: verdict/...`` commit
(the verdict was recorded at that point in history) and ``path(name)``
is a static over-approximation of the query's code path:

* the query function itself plus every top-level helper / constant it
  transitively references inside its defining file — compared by
  ``ast.dump`` of the OLD vs NEW definition, so formatting and line
  shifts never pin, only real content changes do;
* its ORACLE sql entry (dict-literal key or ``ORACLE[...] =`` assign)
  — an oracle edit needs a re-check exactly like a plan edit;
* every ``mitoscape_spark`` module imported inside those bodies (the
  queries import operators function-locally by convention), expanded
  through the package's module-level import graph to a transitive
  closure — a change to ``operators/graph.py`` pins queries that only
  import ``operators/dedup.py`` because dedup imports graph;
* EXCEPT ubiquitous modules — ones on more than half of all declared
  queries' paths (``catalog.py`` grade). They discriminate nothing: a
  change there staleness-marks every name equally, which is what the
  tier-4 oldest-verdict-first rotation already covers; pinning all 251
  would re-sort tier 4 into itself while crowding the handful of
  genuinely-touched names out of the driver's 50-name cap. The COST of
  that trade (round-8 advice item 1): a *semantic* change to a
  ubiquitous module pins nothing — its dependents are only re-checked
  at tier-4 cap-rate. ``derive_pins`` therefore SURFACES every changed
  module it dropped as ubiquitous (stderr + the ``explain`` dict's
  ``__ubiquitous_dropped__`` key) so a round can consciously hand-pin
  a broad re-check instead of silently relying on tier 4.

Boundary-commit convention (a CONTRACT with the driver): round closes
are recognized by commit subjects matching ``round N: verdict...``.
If the driver's commit style ever changes, ``_boundaries`` finds
nothing and the whole derivation fails open to the hand list —
``tests/test_rotation.py::test_real_history_has_boundaries`` pins the
convention against the live repo history so the degradation is caught
in CI, not discovered as a silent staleness regression.

Fail-open contract: ANY git or parse failure returns ``None`` and the
caller falls back to the hand list — the derived set AUGMENTS the hand
overrides (union), it never silently replaces a working pin.

Cache validity (round-8 advice item 5): the memoized git/parse state
is keyed on a cheap worktree fingerprint (max mtime + file count over
package ``.py`` files, plus HEAD for history queries), so derivations
stay correct in a long-lived process that edits files between calls —
not just at process start.
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
from functools import lru_cache

_PKG = "mitoscape_spark"

# query-registry files get per-FUNCTION change detection (they hold 200+
# independent queries each — file-level granularity would pin everything
# on every round); all other modules are compared at file granularity
_QUERY_FILES = (
    f"{_PKG}/queries/relational.py",
    f"{_PKG}/queries/extensions.py",
    f"{_PKG}/queries/domain.py",
)

# fraction of declared queries a module must sit under to be considered
# ubiquitous (non-discriminating) and excluded from pin derivation
_UBIQUITY = 0.5


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(root: str, *args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", root, *args],
            capture_output=True,
            text=True,
            timeout=60,
        )
    except Exception:  # noqa: BLE001 — fail-open by contract
        return None
    return out.stdout if out.returncode == 0 else None


def _worktree_fingerprint(root: str) -> tuple[int, float]:
    """(file count, max mtime) over the package's .py files — a cheap
    stat-only key that changes whenever any package file is edited,
    added, or removed. Cache-busts the worktree-dependent memoizations
    below in long-lived processes (round-8 advice item 5)."""
    n, newest = 0, 0.0
    for dirpath, _dirs, files in os.walk(os.path.join(root, _PKG)):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                n += 1
                try:
                    mt = os.stat(os.path.join(dirpath, fn)).st_mtime
                except OSError:
                    continue
                newest = max(newest, mt)
    return n, newest


def _boundaries(root: str) -> tuple[tuple[int, str], ...] | None:
    head = _git(root, "rev-parse", "HEAD")
    return _boundaries_at(root, head.strip() if head else None)


@lru_cache(maxsize=8)
def _boundaries_at(
    root: str, head: str | None
) -> tuple[tuple[int, str], ...] | None:
    """(round, sha) pairs for the driver's round-close commits, oldest
    first. The verdict recorded as round N postdates every commit up to
    and including the ``round N: verdict/...`` commit. Keyed on HEAD so
    commits made after the first call are seen (advice item 5)."""
    if head is None:
        return None
    out = _git(root, "log", "--format=%H %s")
    if out is None:
        return None
    found: dict[int, str] = {}
    for line in out.splitlines():  # newest → oldest
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            found.setdefault(int(m.group(2)), m.group(1))
    return tuple(sorted(found.items()))


def _diff_since(root: str, sha: str) -> frozenset[str] | None:
    return _diff_since_keyed(root, sha, _worktree_fingerprint(root))


@lru_cache(maxsize=64)
def _diff_since_keyed(
    root: str, sha: str, wt_key: tuple[int, float]
) -> frozenset[str] | None:
    """Package .py files changed between ``sha`` and the WORKING TREE
    (committed + uncommitted), plus untracked new modules. ``wt_key``
    (the worktree fingerprint) only busts the cache — the memo would
    otherwise serve stale diffs after in-process edits."""
    out = _git(root, "diff", "--name-only", sha)
    if out is None:
        return None
    changed = set(out.splitlines())
    untracked = _git(root, "ls-files", "--others", "--exclude-standard", _PKG)
    if untracked is not None:
        changed |= set(untracked.splitlines())
    return frozenset(
        p
        for p in changed
        if p.startswith(_PKG + "/") and p.endswith(".py")
    )


def _known_mod(dotted: str, known: dict[str, str]) -> str | None:
    """Longest known-module prefix of a dotted import target."""
    parts = dotted.split(".")
    for i in range(len(parts), 0, -1):
        cand = ".".join(parts[:i])
        if cand in known:
            return cand
    return None


def _imported_mods(node: ast.AST, known: dict[str, str]) -> frozenset[str]:
    mods: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Import):
            for a in n.names:
                if a.name.split(".")[0] == _PKG:
                    m = _known_mod(a.name, known)
                    if m:
                        mods.add(m)
        elif isinstance(n, ast.ImportFrom) and n.module:
            if n.module.split(".")[0] != _PKG:
                continue
            for a in n.names:
                m = _known_mod(f"{n.module}.{a.name}", known)
                if m:
                    mods.add(m)
    return frozenset(mods)


def _module_index(
    root: str,
) -> tuple[dict[str, str], dict[str, frozenset[str]]] | None:
    return _module_index_keyed(root, _worktree_fingerprint(root))


@lru_cache(maxsize=8)
def _module_index_keyed(
    root: str, wt_key: tuple[int, float]
) -> tuple[dict[str, str], dict[str, frozenset[str]]] | None:
    """modname -> relpath, and the module-level import graph (ALL
    package-internal import edges anywhere in each file). ``wt_key``
    busts the cache on worktree edits (advice item 5)."""
    paths: dict[str, str] = {}
    pkg_dir = os.path.join(root, _PKG)
    for dirpath, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), root)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            paths[mod] = rel
    imports: dict[str, frozenset[str]] = {}
    for mod, rel in paths.items():
        try:
            with open(os.path.join(root, rel)) as fh:
                tree = ast.parse(fh.read())
        except (OSError, SyntaxError):
            return None
        imports[mod] = _imported_mods(tree, paths)
    return paths, imports


def _mod_closure(
    imports: dict[str, frozenset[str]],
) -> dict[str, frozenset[str]]:
    """Reflexive-transitive closure by fixpoint (cycle-safe; ~40 nodes)."""
    clo: dict[str, set[str]] = {m: set(v) | {m} for m, v in imports.items()}
    changed = True
    while changed:
        changed = False
        for deps in clo.values():
            add: set[str] = set()
            for d in list(deps):
                add |= clo.get(d, set())
            if not add <= deps:
                deps |= add
                changed = True
    return {m: frozenset(v) for m, v in clo.items()}


class _Entry:
    """One top-level definition: content hash + intra-file name refs +
    package modules imported inside it."""

    __slots__ = ("dump", "refs", "mods")

    def __init__(self, node: ast.AST, known: dict[str, str]) -> None:
        self.dump = ast.dump(node)
        self.refs = frozenset(
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        )
        self.mods = _imported_mods(node, known)


def _parse_entries(
    src: str, known: dict[str, str]
) -> tuple[dict[str, _Entry], dict[str, str]] | None:
    """Top-level entries of a query file.

    Keys: function/constant names; ``oracle::<q>`` / ``queries::<q>``
    for registry dict-literal items and subscript assigns. Second value
    maps module-level import bindings (``load_table`` →
    ``mitoscape_spark.catalog``) for ref-based module attribution.
    """
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    entries: dict[str, _Entry] = {}
    import_names: dict[str, str] = {}

    def add_registry(reg: str, value: ast.AST) -> None:
        if isinstance(value, ast.Dict):
            for k, v in zip(value.keys, value.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    entries[f"{reg.lower()}::{k.value}"] = _Entry(v, known)

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            entries[node.name] = _Entry(node, known)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            value = node.value
            if value is None or len(targets) != 1:
                continue
            t = targets[0]
            if isinstance(t, ast.Name):
                if t.id in ("QUERIES", "ORACLE"):
                    add_registry(t.id, value)
                else:
                    entries[t.id] = _Entry(value, known)
            elif (
                isinstance(t, ast.Subscript)
                and isinstance(t.value, ast.Name)
                and t.value.id in ("QUERIES", "ORACLE")
                and isinstance(t.slice, ast.Constant)
                and isinstance(t.slice.value, str)
            ):
                key = f"{t.value.id.lower()}::{t.slice.value}"
                entries[key] = _Entry(value, known)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.split(".")[0] != _PKG:
                continue
            for a in node.names:
                m = _known_mod(f"{node.module}.{a.name}", known)
                if m:
                    import_names[a.asname or a.name] = m
        elif isinstance(node, ast.Import):
            # plain `import mitoscape_spark.x.y as z`: bind z -> module
            # so body refs through the alias still attribute the module
            # (without an alias the body references the bare package
            # root — too coarse to discriminate, skip)
            for a in node.names:
                if a.asname and a.name.split(".")[0] == _PKG:
                    m = _known_mod(a.name, known)
                    if m:
                        import_names[a.asname] = m
    return entries, import_names


@lru_cache(maxsize=64)
def _entries_at(
    root: str, relpath: str, sha: str | None, mtime_key: float | None
) -> tuple[dict[str, _Entry], dict[str, str]] | None:
    """Parsed entries of ``relpath`` at commit ``sha`` (or the working
    tree when sha is None; ``mtime_key`` only busts the cache)."""
    idx = _module_index(root)
    if idx is None:
        return None
    known = idx[0]
    if sha is None:
        try:
            with open(os.path.join(root, relpath)) as fh:
                src = fh.read()
        except OSError:
            return None
    else:
        src = _git(root, "show", f"{sha}:{relpath}")
        if src is None:
            return None
    return _parse_entries(src, known)


def _worktree_entries(root: str, relpath: str):
    try:
        mtime = os.stat(os.path.join(root, relpath)).st_mtime
    except OSError:
        return None
    return _entries_at(root, relpath, None, mtime)


def _reach(
    start: set[str], entries: dict[str, _Entry]
) -> frozenset[str]:
    """Intra-file reachable entry keys: start set closed over name refs."""
    seen = set(k for k in start if k in entries)
    frontier = list(seen)
    while frontier:
        key = frontier.pop()
        for ref in entries[key].refs:
            if ref in entries and ref not in seen:
                seen.add(ref)
                frontier.append(ref)
    return frozenset(seen)


def derive_pins(
    latest_round: dict[str, int],
    declared: dict[str, object],
    root: str | None = None,
    explain: dict[str, str] | None = None,
) -> frozenset[str] | None:
    """Names whose statically-derived code path changed after their
    latest driver verdict. ``latest_round`` maps name -> round of its
    newest CORRECTNESS record (names absent are never-checked: tier 0
    upstream, no pin needed). ``declared`` is the QUERIES registry
    (name -> function). Returns None on any failure (fall back to the
    hand list). ``explain``, when given, is filled with a short
    pin-reason per pinned name (tools/rotation_report.py)."""
    if root is None:
        root = _repo_root()
    bounds = _boundaries(root)
    idx = _module_index(root)
    if bounds is None or not bounds or idx is None:
        return None
    mod_paths, mod_imports = idx
    closure = _mod_closure(mod_imports)

    # ---- per-query static path: entries reach + module closure -------
    per_name: dict[str, tuple[str, frozenset[str], frozenset[str]]] = {}
    for name, fn in declared.items():
        modname = getattr(fn, "__module__", None)
        fname = getattr(fn, "__name__", None)
        relpath = mod_paths.get(modname or "")
        if relpath is None or fname is None:
            return None  # non-function registry value — bail to hand list
        parsed = _worktree_entries(root, relpath)
        if parsed is None:
            return None
        entries, import_names = parsed
        reach = _reach(
            {fname, f"oracle::{name}", f"queries::{name}"}, entries
        )
        mods: set[str] = set()
        for key in reach:
            mods |= entries[key].mods
            for ref in entries[key].refs:
                if ref in import_names:
                    mods.add(import_names[ref])
        expanded: set[str] = set()
        for m in mods:
            expanded |= closure.get(m, frozenset({m}))
        per_name[name] = (relpath, reach, frozenset(expanded))

    # ---- ubiquity filter: modules on >half the paths don't pin -------
    freq: dict[str, int] = {}
    for _rp, _reach_keys, mods in per_name.values():
        for m in mods:
            freq[m] = freq.get(m, 0) + 1
    cutoff = _UBIQUITY * max(len(per_name), 1)
    ubiquitous = {m for m, c in freq.items() if c > cutoff}

    # ---- per-name staleness vs its own verdict boundary ---------------
    pins: set[str] = set()
    ubiquitous_dropped: set[str] = set()
    for name, rnd in latest_round.items():
        info = per_name.get(name)
        if info is None:
            continue
        relpath, reach, mods = info
        # boundary = newest round-close commit at or before the verdict
        sha = None
        for b_rnd, b_sha in bounds:
            if b_rnd <= rnd:
                sha = b_sha
        if sha is None:
            pins.add(name)  # verdict predates recorded history — re-check
            if explain is not None:
                explain[name] = f"no boundary commit at or before r{rnd:02d}"
            continue
        diff = _diff_since(root, sha)
        if diff is None:
            return None
        if not diff:
            continue
        # surface (don't pin on) changed-but-ubiquitous modules: the
        # stated tier-4 freshness guarantee does NOT cover these, and a
        # silent drop would let a semantic infra change hide behind it
        # (round-8 advice item 1)
        ubiquitous_dropped |= {
            mod_paths[m]
            for m in mods & ubiquitous
            if mod_paths.get(m) in diff
            and mod_paths.get(m) not in _QUERY_FILES
        }
        mod_hits = sorted(
            mod_paths[m]
            for m in mods - ubiquitous
            if mod_paths.get(m) in diff
            and mod_paths.get(m) not in _QUERY_FILES
        )
        if mod_hits:
            pins.add(name)
            if explain is not None:
                explain[name] = (
                    f"module(s) changed since r{rnd:02d}: "
                    + ", ".join(mod_hits)
                )
            continue
        if relpath in diff:
            old = _entries_at(root, relpath, sha, None)
            if old is None:
                pins.add(name)  # file new/unparsable at boundary
                if explain is not None:
                    explain[name] = f"{relpath} unreadable at r{rnd:02d}"
                continue
            old_entries = old[0]
            new_entries = _worktree_entries(root, relpath)[0]
            for key in reach:
                o = old_entries.get(key)
                if o is None or o.dump != new_entries[key].dump:
                    pins.add(name)
                    if explain is not None:
                        what = "added" if o is None else "changed"
                        explain[name] = (
                            f"{relpath}::{key} {what} since r{rnd:02d}"
                        )
                    break
    if ubiquitous_dropped:
        import sys

        names = ", ".join(sorted(ubiquitous_dropped))
        print(
            f"rotation: changed module(s) excluded from pin derivation "
            f"as ubiquitous (>{_UBIQUITY:.0%} of query paths): {names} "
            f"— dependents are re-checked only at tier-4 cap-rate; "
            f"hand-pin (_ROTATION_PINS) a broad re-check if the change "
            f"was semantic",
            file=sys.stderr,
        )
        if explain is not None:
            explain["__ubiquitous_dropped__"] = names
    return frozenset(pins & set(declared))


def clear_caches() -> None:
    """Reset memoized git/parse state (tests mutate the worktree)."""
    _boundaries_at.cache_clear()
    _diff_since_keyed.cache_clear()
    _module_index_keyed.cache_clear()
    _entries_at.cache_clear()
