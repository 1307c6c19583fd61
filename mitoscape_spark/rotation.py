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
* every ``mitoscape_spark`` DEFINITION imported inside those bodies
  (the queries import operators function-locally by convention),
  followed at ENTRY granularity across modules (round 9): the walk
  recurses into exactly the imported functions/classes/constants and
  THEIR intra-file reach + imports, so a change to
  ``dedup.connected_components`` pins its consumers while a change to
  an unrelated function in the same 1,400-line file pins nobody.
  Whole-module imports (``import m`` / re-exports through package
  ``__init__``) and unresolvable names degrade to FILE granularity
  for that module plus its file-level import closure — a safe
  over-approximation, never an under-approximation. Each touched
  module also contributes a synthetic ``::toplevel`` entry
  (module-level guards/registrations) and a binding-redirect check
  (an import line re-pointing a name pins exactly the consumers whose
  refs resolve through it);
* EXCEPT ubiquitous ENTRIES — ones on more than half of all declared
  queries' paths (``catalog.load_table`` grade). They discriminate
  nothing: a change there staleness-marks every name equally, which is
  what the tier-4 oldest-verdict-first rotation already covers;
  pinning all 251 would re-sort tier 4 into itself while crowding the
  handful of genuinely-touched names out of the driver's 50-name cap.
  The COST of that trade (round-8 advice item 1): a *semantic* change
  to a ubiquitous entry pins nothing — its dependents are only
  re-checked at tier-4 cap-rate. ``derive_pins`` therefore SURFACES
  every changed entry it dropped as ubiquitous (stderr + the
  ``explain`` dict's ``__ubiquitous_dropped__`` key) so a round can
  consciously hand-pin a broad re-check instead of silently relying
  on tier 4.

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
is keyed on a cheap worktree fingerprint (hashed stat listing over
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

# the query-registry files. Since round 9 EVERY package file gets
# per-definition change detection (entry granularity), so these need no
# special-casing in the derivation anymore; the constant remains as the
# contract surface for tests/test_rotation.py's import-disjointness
# check (cross-file query helpers stay banned for plain readability —
# operators belong in operators/)
_QUERY_FILES = (
    f"{_PKG}/queries/relational.py",
    f"{_PKG}/queries/extensions.py",
    f"{_PKG}/queries/domain.py",
)

# fraction of declared queries a path ENTRY must sit under to be
# considered ubiquitous (non-discriminating) and excluded from pin
# derivation
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


def _worktree_fingerprint(root: str) -> tuple[int, int]:
    """(file count, hash of per-file (path, size, mtime_ns)) over the
    package's .py files — a cheap stat-only key that changes whenever
    any package file is edited, added, removed, or renamed.
    Cache-busts the worktree-dependent memoizations below in
    long-lived processes (round-8 advice item 5). Hashing the FULL
    stat listing (not just the max mtime) also catches edits that
    preserve or back-date timestamps when the size changes
    (cp -p / rsync -a restores — round-9 review finding 3); the
    residual blind spot is a same-size edit with an identically
    preserved mtime_ns, which no stat-only scheme can see."""
    n = 0
    stats: list[tuple[str, int, int]] = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, _PKG)):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                n += 1
                p = os.path.join(dirpath, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                stats.append(
                    (os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
                )
    return n, hash(tuple(sorted(stats)))


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


@lru_cache(maxsize=64)
def _diff_since_keyed(
    root: str, sha: str, wt_key: tuple[int, int]
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


# sentinel module name for imports the static analysis cannot resolve
# (relative imports parsed without knowing the containing module).
# Reaching the walker, it fails the whole derivation open to the hand
# list — never a silent skip (round-9 review finding 1)
_UNRESOLVED = "<unresolved-import>"


def _resolve_from(
    n: ast.ImportFrom, pkg_parts: tuple[str, ...] | None
) -> str | None:
    """Effective absolute dotted module of an ImportFrom, resolving
    relative imports against the containing module's package parts.
    Returns None for non-package imports, _UNRESOLVED when a relative
    import cannot be resolved (unknown container / over-deep level)."""
    if n.level == 0:
        if n.module and n.module.split(".")[0] == _PKG:
            return n.module
        return None
    if pkg_parts is None or n.level - 1 > len(pkg_parts):
        return _UNRESOLVED
    base = pkg_parts[: len(pkg_parts) - (n.level - 1)]
    parts = list(base) + (n.module.split(".") if n.module else [])
    if not parts or parts[0] != _PKG:
        return _UNRESOLVED  # relative import escaping the package
    return ".".join(parts)


def _imported_targets(
    node: ast.AST,
    known: dict[str, str],
    pkg_parts: tuple[str, ...] | None = None,
) -> frozenset[tuple[str, str | None]]:
    """(module, name) pairs imported anywhere inside ``node``; name is
    None for whole-module imports (``import m`` / ``from pkg import
    m``) — the walker then falls back to file granularity for that
    target (round-9: entry-granular staleness). ``pkg_parts`` is the
    containing module's package path for relative-import resolution;
    unresolvable relatives surface as (_UNRESOLVED, None), which makes
    the derivation fail open rather than silently dropping the edge."""
    out: set[tuple[str, str | None]] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Import):
            for a in n.names:
                if a.name.split(".")[0] == _PKG:
                    m = _known_mod(a.name, known)
                    if m:
                        out.add((m, None))
        elif isinstance(n, ast.ImportFrom):
            eff = _resolve_from(n, pkg_parts)
            if eff is None:
                continue
            if eff == _UNRESOLVED:
                out.add((_UNRESOLVED, None))
                continue
            for a in n.names:
                full = f"{eff}.{a.name}"
                if full in known:  # importing a MODULE object
                    out.add((full, None))
                    continue
                m = _known_mod(eff, known)
                if m == eff:
                    out.add((m, a.name))
                elif m:  # import through a package __init__ re-export:
                    # name resolution is dynamic — whole-module fallback
                    out.add((m, None))
                else:
                    out.add((_UNRESOLVED, None))
    return frozenset(out)


def _module_index(
    root: str,
) -> tuple[dict[str, str], dict[str, frozenset[str]]] | None:
    return _module_index_keyed(root, _worktree_fingerprint(root))


@lru_cache(maxsize=8)
def _module_index_keyed(
    root: str, wt_key: tuple[int, int]
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
    package imports inside it (entry-granular where resolvable)."""

    __slots__ = ("dump", "refs", "imports")

    def __init__(
        self,
        node: ast.AST,
        known: dict[str, str],
        pkg_parts: tuple[str, ...] | None = None,
    ) -> None:
        self.dump = ast.dump(node)
        self.refs = frozenset(
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        )
        self.imports = _imported_targets(node, known, pkg_parts)

    @property
    def mods(self) -> frozenset[str]:
        return frozenset(m for m, _n in self.imports)


class _ToplevelEntry:
    """Synthetic ``::toplevel`` pseudo-entry: everything at module
    level that is NOT a named entry or an import — multi-target /
    unpacking assigns, ``__main__`` guards, try-gates, registration
    calls. A change here pins every consumer of the module:
    module-level statements run at import time, so no per-entry
    attribution is possible. (Import-line changes are handled
    separately as binding redirects, per consumer.)"""

    __slots__ = ("dump", "refs", "imports")

    def __init__(
        self,
        nodes: list[ast.stmt],
        known: dict[str, str],
        pkg_parts: tuple[str, ...] | None = None,
    ) -> None:
        mod = ast.Module(body=nodes, type_ignores=[])
        self.dump = ast.dump(mod)
        # refs ARE tracked: module-level code that calls a definition
        # (registration patterns) puts that definition on every
        # consumer's path via the reach closure
        self.refs = frozenset(
            n.id for n in ast.walk(mod) if isinstance(n, ast.Name)
        )
        self.imports = _imported_targets(mod, known, pkg_parts)

    @property
    def mods(self) -> frozenset[str]:
        return frozenset(m for m, _n in self.imports)


_TOPLEVEL = "::toplevel"


def _parse_entries(
    src: str,
    known: dict[str, str],
    pkg_parts: tuple[str, ...] | None = None,
) -> tuple[dict[str, _Entry], dict[str, tuple[str, str | None]]] | None:
    """Top-level entries of a package file.

    Keys: function/class/constant names; ``oracle::<q>`` /
    ``queries::<q>`` for registry dict-literal items and subscript
    assigns; ``::toplevel`` for the synthetic residual (module-level
    guards, multi-target non-Name assigns — everything unnameable).
    Second value maps module-level import bindings to their target:
    ``load_table`` → ``("mitoscape_spark.catalog", "load_table")``;
    the name is None for whole-module bindings. ``pkg_parts`` (the
    containing module's package path) resolves relative imports;
    without it a relative package import maps to _UNRESOLVED, which
    fails the derivation open instead of dropping the edge.
    """
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    entries: dict[str, _Entry] = {}
    import_names: dict[str, tuple[str, str | None]] = {}
    residual: list[ast.stmt] = []

    def add_registry(reg: str, value: ast.AST) -> None:
        if isinstance(value, ast.Dict):
            for k, v in zip(value.keys, value.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    entries[f"{reg.lower()}::{k.value}"] = _Entry(v, known, pkg_parts)
        # the registry name itself also resolves (``from queries import
        # QUERIES``-style consumers see any item change)
        entries[reg] = _Entry(value, known, pkg_parts)

    for i, node in enumerate(tree.body):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            entries[node.name] = _Entry(node, known, pkg_parts)
        elif isinstance(node, ast.ClassDef):
            entries[node.name] = _Entry(node, known, pkg_parts)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            value = node.value
            if value is None:
                continue  # bare annotation: no runtime effect
            # collect every Name the statement binds — including
            # tuple-unpack (`A, B = 1, 2`) and chained (`a = b = e`)
            # targets, each keyed to the WHOLE value node so a change
            # pins all consumers of any bound name (round 9: these
            # were previously invisible to staleness detection)
            names: list[str] = []
            resolvable = True
            for t in targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)) and all(
                    isinstance(el, ast.Name) for el in t.elts
                ):
                    names.extend(el.id for el in t.elts)
                else:
                    resolvable = False
            t0 = targets[0]
            if (
                len(targets) == 1
                and isinstance(t0, ast.Subscript)
                and isinstance(t0.value, ast.Name)
                and t0.value.id in ("QUERIES", "ORACLE")
                and isinstance(t0.slice, ast.Constant)
                and isinstance(t0.slice.value, str)
            ):
                key = f"{t0.value.id.lower()}::{t0.slice.value}"
                entries[key] = _Entry(value, known, pkg_parts)
            elif resolvable:
                for nm in names:
                    if nm in ("QUERIES", "ORACLE"):
                        add_registry(nm, value)
                    else:
                        entries[nm] = _Entry(value, known, pkg_parts)
            else:
                residual.append(node)  # attribute/starred target
        elif isinstance(node, ast.ImportFrom):
            # imports are NOT part of the toplevel residual: a binding
            # redirect (same name, different source module) is detected
            # precisely per consumer via the import_names comparison in
            # derive_pins, so an import-line edit in a 10k-line query
            # file pins only the queries whose refs actually use it.
            # Relative imports resolve against pkg_parts (round-9
            # review finding 1); unresolvable ones bind _UNRESOLVED.
            eff = _resolve_from(node, pkg_parts)
            if eff is None:
                continue
            for a in node.names:
                if eff == _UNRESOLVED:
                    import_names[a.asname or a.name] = (_UNRESOLVED, None)
                    continue
                full = f"{eff}.{a.name}"
                if full in known:
                    import_names[a.asname or a.name] = (full, None)
                    continue
                m = _known_mod(eff, known)
                if m == eff:
                    import_names[a.asname or a.name] = (m, a.name)
                elif m:  # re-export through a package __init__
                    import_names[a.asname or a.name] = (m, None)
                else:
                    import_names[a.asname or a.name] = (_UNRESOLVED, None)
        elif isinstance(node, ast.Import):
            # plain `import mitoscape_spark.x.y as z`: bind z -> module
            # so body refs through the alias still attribute the module
            # (without an alias the body references the bare package
            # root — too coarse to discriminate, skip)
            for a in node.names:
                if a.asname and a.name.split(".")[0] == _PKG:
                    m = _known_mod(a.name, known)
                    if m:
                        import_names[a.asname] = (m, None)
        elif (
            i == 0
            and isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
        ):
            pass  # module docstring: doc-only edits never pin
        else:
            residual.append(node)
    entries[_TOPLEVEL] = _ToplevelEntry(residual, known, pkg_parts)
    return entries, import_names


@lru_cache(maxsize=1024)  # working set = package files × boundary SHAs;
# 64 thrashed (evictions forced ~80 re-parses per warm derivation)
def _entries_at(
    root: str, relpath: str, sha: str | None, mtime_key: float | None
) -> tuple[dict[str, _Entry], dict[str, tuple[str, str | None]]] | None:
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
    mod = relpath[: -len(".py")].replace(os.sep, ".")
    if mod.endswith(".__init__"):
        pkg_parts = tuple(mod[: -len(".__init__")].split("."))
    else:
        pkg_parts = tuple(mod.split(".")[:-1])
    return _parse_entries(src, known, pkg_parts)


def _worktree_entries(
    root: str, relpath: str
) -> tuple[dict[str, _Entry], dict[str, tuple[str, str | None]]] | None:
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


def _entry_path(
    root: str,
    start_rel: str,
    start_names: set[str],
    mod_paths: dict[str, str],
    closure: dict[str, frozenset[str]],
) -> dict[str, frozenset[str] | None] | None:
    """Function-granular static path: relpath -> entry keys reachable
    from ``start_names`` (None = whole file, the coarse fallback for
    whole-module imports and unresolvable names). Follows intra-file
    name refs (``_reach``) and cross-module imports at ENTRY
    granularity — a change to ``dedup.connected_components`` pins its
    consumers, not every importer of dedup.py (round 9; the file-level
    version re-pinned ~60 names per touched operator file).

    Returns None on a parse failure (caller fails open)."""
    path: dict[str, set[str] | None] = {}
    queue: list[tuple[str, str | None]] = []
    visited: set[tuple[str, str]] = set()

    def whole_module(mod: str) -> None:
        # coarse fallback: the module and its full file-level import
        # closure join the path at file granularity
        for dep in closure.get(mod, frozenset({mod})):
            rel = mod_paths.get(dep)
            if rel is not None:
                path[rel] = None

    def enter(rel: str, names: set[str]) -> bool:
        if path.get(rel, ()) is None:
            return True  # already whole-file — nothing finer to add
        parsed = _worktree_entries(root, rel)
        if parsed is None:
            return False
        entries, imap = parsed
        bucket = path.setdefault(rel, set())
        for key in _reach(set(names) | {_TOPLEVEL}, entries):
            if (rel, key) in visited:
                continue
            visited.add((rel, key))
            bucket.add(key)
            e = entries[key]
            for mod, nm in e.imports:
                queue.append((mod, nm))
            for ref in e.refs:
                if ref in imap:
                    queue.append(imap[ref])
        return True

    if not enter(start_rel, start_names):
        return None
    while queue:
        mod, nm = queue.pop()
        if mod == _UNRESOLVED:
            # an import the static analysis could not resolve is on
            # this path — failing open (hand pins + oldest-first) beats
            # silently dropping the edge (round-9 review finding 1)
            return None
        rel = mod_paths.get(mod)
        if rel is None:
            continue  # not a package file (stale index entry)
        if path.get(rel, ()) is None:
            continue
        if nm is None:
            whole_module(mod)
            continue
        parsed = _worktree_entries(root, rel)
        if parsed is None:
            return None
        entries, _imap = parsed
        if nm not in entries:
            # re-export / dynamic attribute — can't attribute, go coarse
            whole_module(mod)
            continue
        if not enter(rel, {nm}):
            return None
    return {
        rel: (frozenset(keys) if keys is not None else None)
        for rel, keys in path.items()
    }


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
    # ONE worktree fingerprint per derivation: snapshot-consistent, and
    # avoids 251 redundant os.walk passes (one per diff lookup)
    wt_fp = _worktree_fingerprint(root)
    idx = _module_index_keyed(root, wt_fp)
    if bounds is None or not bounds or idx is None:
        return None
    mod_paths, mod_imports = idx
    closure = _mod_closure(mod_imports)

    # ---- per-query static path, ENTRY-granular (round 9) -------------
    per_name: dict[str, dict[str, frozenset[str] | None]] = {}
    for name, fn in declared.items():
        modname = getattr(fn, "__module__", None)
        fname = getattr(fn, "__name__", None)
        relpath = mod_paths.get(modname or "")
        if relpath is None or fname is None:
            return None  # non-function registry value — bail to hand list
        fpath = _entry_path(
            root,
            relpath,
            {fname, f"oracle::{name}", f"queries::{name}"},
            mod_paths,
            closure,
        )
        if fpath is None:
            return None
        per_name[name] = fpath

    # ---- ubiquity filter, entry-granular: an ENTRY on >half of all
    # paths (load_table grade) discriminates nothing and would flood
    # the cap; whole-file path members count as all their current keys
    freq: dict[tuple[str, str], int] = {}
    for fpath in per_name.values():
        for rel, keys in fpath.items():
            if keys is None:
                parsed = _worktree_entries(root, rel)
                keys = frozenset(parsed[0]) if parsed else frozenset()
            for key in keys:
                freq[(rel, key)] = freq.get((rel, key), 0) + 1
    cutoff = _UBIQUITY * max(len(per_name), 1)
    ubiquitous = {rk for rk, c in freq.items() if c > cutoff}

    # ---- per-name staleness vs its own verdict boundary ---------------
    pins: set[str] = set()
    ubiquitous_dropped: set[str] = set()
    for name, rnd in latest_round.items():
        fpath = per_name.get(name)
        if fpath is None:
            continue
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
        diff = _diff_since_keyed(root, sha, wt_fp)
        if diff is None:
            return None
        if not diff:
            continue
        reason = None
        for rel, keys in sorted(fpath.items()):
            if rel not in diff:
                continue
            old = _entries_at(root, rel, sha, None)
            if old is None:
                reason = f"{rel} unreadable/new at r{rnd:02d}"
                break
            old_entries, old_imap = old
            new_parsed = _worktree_entries(root, rel)
            if new_parsed is None:
                return None
            new_entries, new_imap = new_parsed
            if keys is None:  # whole-file member: any entry change pins
                check = set(old_entries) | set(new_entries)
                if old_imap != new_imap:
                    reason = f"{rel} import bindings changed since r{rnd:02d}"
                    break
            else:
                check = set(keys)
            for key in sorted(check):
                o = old_entries.get(key)
                nn = new_entries.get(key)
                changed = (
                    (o is None) != (nn is None)
                    or (o is not None and nn is not None and o.dump != nn.dump)
                )
                # binding redirect: same entry body, its module-level
                # import now resolves somewhere else
                redirect = False
                if not changed and nn is not None:
                    for ref in nn.refs:
                        if (
                            ref in old_imap or ref in new_imap
                        ) and old_imap.get(ref) != new_imap.get(ref):
                            changed = redirect = True
                            break
                if not changed:
                    continue
                if (rel, key) in ubiquitous:
                    # surface (don't pin on) changed-but-ubiquitous
                    # entries: tier-4's freshness guarantee does NOT
                    # cover these (round-8 advice item 1)
                    ubiquitous_dropped.add(f"{rel}::{key}")
                    continue
                if o is None:
                    what = "added"
                elif nn is None:
                    what = "removed"
                elif redirect:
                    what = "import binding redirected"
                else:
                    what = "changed"
                reason = f"{rel}::{key} {what} since r{rnd:02d}"
                break
            if reason:
                break
        if reason:
            pins.add(name)
            if explain is not None:
                explain[name] = reason
    if ubiquitous_dropped:
        import sys

        names = ", ".join(sorted(ubiquitous_dropped))
        print(
            f"rotation: changed path entr(ies) excluded from pin "
            f"derivation as ubiquitous (>{_UBIQUITY:.0%} of query "
            f"paths): {names} — dependents are re-checked only at "
            f"tier-4 cap-rate; hand-pin (_ROTATION_PINS) a broad "
            f"re-check if the change was semantic",
            file=sys.stderr,
        )
        if explain is not None:
            explain["__ubiquitous_dropped__"] = names
    return frozenset(pins & set(declared))


def adjudication_token(root: str, dropped: str) -> str:
    """Round-scoped adjudication token for a ``__ubiquitous_dropped__``
    entry (``rel::key``): the entry name suffixed with the first 12 hex
    chars of a SHA-256 over its CURRENT ast dump. COVERAGE.md must
    contain this exact token for the drop to count as adjudicated
    (tests/test_rotation.py) — hashing the content means a LATER
    semantic change to the same entry invalidates the old adjudication
    and forces a fresh conscious call, instead of a stale past-round
    mention satisfying the gate forever (round-10 review finding 1).
    Removed entries hash the sentinel ``<removed>``."""
    import hashlib

    rel, _, key = dropped.partition("::")
    parsed = _worktree_entries(root, rel)
    entry = parsed[0].get(key) if parsed else None
    dump = entry.dump if entry is not None else "<removed>"
    digest = hashlib.sha256(dump.encode()).hexdigest()[:12]
    return f"{dropped}@{digest}"


def clear_caches() -> None:
    """Reset memoized git/parse state (tests mutate the worktree)."""
    _boundaries_at.cache_clear()
    _diff_since_keyed.cache_clear()
    _module_index_keyed.cache_clear()
    _entries_at.cache_clear()
