"""Mechanical rotation-pin derivation (mitoscape_spark/rotation.py).

No SparkSession needed — the derivation is pure git + ast analysis.
Round-7 verdict item 4 (derive pins from the diff) and advice item 4
(dangling hand pins must fail loudly).
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from mitoscape_spark import rotation as R


def _entry_module():
    return importlib.import_module("__spark_entry__")


# ---------------------------------------------------------------------
# pure parsing layer
# ---------------------------------------------------------------------

_SRC = '''
from mitoscape_spark.catalog import load_table

_K = 5

def _helper(df):
    from mitoscape_spark.operators.sampling import cap_per_key
    return cap_per_key(df, "k", _K)

def ext_fake(spark, sf_dir):
    from mitoscape_spark.operators.dedup import exact_dedup
    df = load_table(spark, sf_dir, "documents")
    return _helper(exact_dedup(df, ["doc_id"]))

QUERIES = {"ext_fake": ext_fake}
ORACLE = {"ext_fake": "SELECT 1 AS one"}
ORACLE["ext_other"] = "SELECT 2 AS two"
'''


def _known():
    idx = R._module_index(R._repo_root())
    assert idx is not None
    return idx[0]


def test_parse_entries_keys_and_refs():
    entries, import_names = R._parse_entries(_SRC, _known())
    assert {"_K", "_helper", "ext_fake", "queries::ext_fake",
            "oracle::ext_fake", "oracle::ext_other",
            R._TOPLEVEL} <= set(entries)
    # module-level import binding recorded ENTRY-granular (round 9)
    assert import_names["load_table"] == (
        "mitoscape_spark.catalog", "load_table"
    )
    # body imports resolve to (module, name) targets
    assert (
        "mitoscape_spark.operators.dedup", "exact_dedup"
    ) in entries["ext_fake"].imports
    assert (
        "mitoscape_spark.operators.sampling", "cap_per_key"
    ) in entries["_helper"].imports
    # coarse module view still derivable (mods property)
    assert "mitoscape_spark.operators.dedup" in entries["ext_fake"].mods
    # intra-file reachability: query -> helper -> constant, + oracle
    reach = R._reach(
        {"ext_fake", "oracle::ext_fake", "queries::ext_fake"}, entries
    )
    assert {"ext_fake", "_helper", "_K", "oracle::ext_fake"} <= reach
    assert "oracle::ext_other" not in reach


def test_formatting_only_change_keeps_dump_stable():
    reformatted = _SRC.replace(
        'return cap_per_key(df, "k", _K)',
        'return cap_per_key(\n        df, "k", _K\n    )  # comment',
    )
    a, _ = R._parse_entries(_SRC, _known())
    b, _ = R._parse_entries(reformatted, _known())
    assert a["_helper"].dump == b["_helper"].dump
    # ...while a real content change does alter the dump
    changed = _SRC.replace('cap_per_key(df, "k", _K)', 'cap_per_key(df, "k", 9)')
    c, _ = R._parse_entries(changed, _known())
    assert a["_helper"].dump != c["_helper"].dump


def test_oracle_edit_changes_its_entry_only():
    changed = _SRC.replace("SELECT 1 AS one", "SELECT 10 AS one")
    a, _ = R._parse_entries(_SRC, _known())
    b, _ = R._parse_entries(changed, _known())
    assert a["oracle::ext_fake"].dump != b["oracle::ext_fake"].dump
    assert a["ext_fake"].dump == b["ext_fake"].dump


# ---------------------------------------------------------------------
# module graph
# ---------------------------------------------------------------------

def test_module_closure_is_transitive():
    idx = R._module_index(R._repo_root())
    assert idx is not None
    paths, imports = idx
    clo = R._mod_closure(imports)
    # dedup imports graph (connected components); closure must carry it
    dd = "mitoscape_spark.operators.dedup"
    assert dd in clo and dd in clo[dd]  # reflexive
    for m in clo[dd]:
        assert clo[m] <= clo[dd]  # transitive


# ---------------------------------------------------------------------
# end-to-end derivation against the real repo
# ---------------------------------------------------------------------

def test_derive_pins_returns_valid_subset():
    e = _entry_module()
    from mitoscape_spark.queries import QUERIES

    latest = {n: rnd for n, (rnd, _r) in e._verdict_history().items()}
    pins = R.derive_pins(latest, QUERIES)
    assert pins is not None, "derivation must succeed inside the repo"
    assert pins <= set(QUERIES)
    # names never driver-checked are tier 0 upstream, never pinned
    assert pins <= set(latest)


def test_catalog_load_table_is_ubiquitous_not_discriminating():
    """catalog.load_table sits on (nearly) every query's path; the
    entry-granular ubiquity filter must drop it so an infra touch
    cannot flood the driver's 50-name cap — while OTHER catalog
    entries stay discriminating (round-9 entry granularity)."""
    from mitoscape_spark.queries import QUERIES

    root = R._repo_root()
    idx = R._module_index(root)
    paths, imports = idx
    clo = R._mod_closure(imports)
    n_with_load_table = 0
    for name, fn in QUERIES.items():
        fpath = R._entry_path(
            root,
            paths[fn.__module__],
            {fn.__name__, f"oracle::{name}", f"queries::{name}"},
            paths,
            clo,
        )
        assert fpath is not None
        keys = fpath.get("mitoscape_spark/catalog.py")
        if keys is None and "mitoscape_spark/catalog.py" in fpath:
            n_with_load_table += 1  # whole-file: load_table included
        elif keys and "load_table" in keys:
            n_with_load_table += 1
    assert n_with_load_table > 0.5 * len(QUERIES)


def test_queries_ordering_survives_with_pins():
    """queries() must build (assert passes, derivation wired in) and
    keep tier structure: tier-3 pins precede tier-4 by verdict age."""
    e = _entry_module()
    ordered = list(e.queries())
    from mitoscape_spark.queries import QUERIES

    assert set(ordered) == set(QUERIES)


def test_rows_only_unchanged_names_sink_to_tier5(monkeypatch):
    """Rows-only (``no_oracle``) names with no declared oracle and an
    unchanged code path sink to tier 5 so they don't displace
    oracle-checkable re-records (round-9 verdict item 5) — EXCEPT the
    single oldest, which drips back into tier 4 each round so the
    'still executes' safety net survives at one slot per round
    (round-10 review finding 2)."""
    e = _entry_module()
    from mitoscape_spark.queries import ORACLE, QUERIES

    oracle_names = [n for n in QUERIES if n in ORACLE]
    ro = [n for n in QUERIES if n not in ORACLE][:2]
    a, c = oracle_names[0], oracle_names[1]
    # rounds chosen INSIDE the staleness ceiling (lag < _TIER5_MAX_LAG
    # vs latest round 9) so this test isolates the one-per-round drip;
    # the ceiling has its own test below
    fake = {
        a: (7, {"err": None}),        # tier 4, old verdict
        c: (9, {"err": None}),        # tier 4, fresh verdict
        ro[0]: (5, {"err": "no_oracle"}),  # oldest rows-only: the drip
        ro[1]: (6, {"err": "no_oracle"}),  # second rows-only: tier 5
    }
    monkeypatch.setattr(e, "_verdict_history", lambda: dict(fake))
    monkeypatch.setattr(e, "_rotation_pins", frozenset)
    ordered = list(e.queries())
    # the oldest rows-only name is the drip: tier 4, oldest-first
    assert ordered.index(ro[0]) < ordered.index(a) < ordered.index(c)
    # every OTHER rows-only name sinks below all of tier 4
    assert ordered.index(ro[1]) > ordered.index(c)
    # a gained oracle promotes a stale rows-only record to tier 2,
    # ahead of everything tier-3+: simulate by marking an
    # ORACLE-declaring name's last verdict as no_oracle
    fake2 = dict(fake)
    fake2[a] = (7, {"err": "no_oracle"})
    monkeypatch.setattr(e, "_verdict_history", lambda: dict(fake2))
    ordered2 = list(e.queries())
    assert ordered2.index(a) < ordered2.index(c)
    assert ordered2.index(a) < ordered2.index(ro[1])


def test_tier5_ghost_name_cannot_hijack_the_drip(monkeypatch):
    """Round-10 advice item 1: a no_oracle verdict for a name that was
    later removed/renamed must not become the permanent min-key drip
    (its round never advances, so no real tier-5 name would ever be
    promoted). Ghosts are excluded from tier 5 entirely."""
    e = _entry_module()
    from mitoscape_spark.queries import ORACLE, QUERIES

    ro = [n for n in QUERIES if n not in ORACLE][:2]
    a = next(n for n in QUERIES if n in ORACLE)
    fake = {
        "ext_ghost_removed_query": (1, {"err": "no_oracle"}),  # ghost
        a: (8, {"err": None}),
        ro[0]: (8, {"err": "no_oracle"}),  # real tier-5: must be drip
        ro[1]: (9, {"err": "no_oracle"}),
    }
    monkeypatch.setattr(e, "_verdict_history", lambda: dict(fake))
    monkeypatch.setattr(e, "_rotation_pins", frozenset)
    ordered = list(e.queries())
    # ro[0] is the drip (tier 4, r08) — it precedes ro[1] (tier 5)
    # even though the ghost's r01 verdict is older than both; the
    # ghost itself never appears (it is not a declared query)
    assert ordered.index(ro[0]) < ordered.index(ro[1])
    assert ordered.index(a) < ordered.index(ro[1])
    assert "ext_ghost_removed_query" not in ordered


def test_tier5_staleness_ceiling_promotes_overdue_names(monkeypatch):
    """Round-10 verdict item 1: tier-5 names >= _TIER5_MAX_LAG rounds
    behind the latest driver round are promoted into tier 4 in the
    same round (not one-per-round dripped), so rows-only records can
    never age past the tier-4 freshness ledger."""
    e = _entry_module()
    from mitoscape_spark.queries import ORACLE, QUERIES

    ro = [n for n in QUERIES if n not in ORACLE][:3]
    a = next(n for n in QUERIES if n in ORACLE)
    lag = e._TIER5_MAX_LAG
    fake = {
        a: (10, {"err": None}),                       # sets latest_round
        ro[0]: (10 - lag, {"err": "no_oracle"}),      # overdue: ceiling
        ro[1]: (10 - lag, {"err": "no_oracle"}),      # overdue: ceiling
        ro[2]: (10 - lag + 1, {"err": "no_oracle"}),  # fresh enough: drip
    }
    monkeypatch.setattr(e, "_verdict_history", lambda: dict(fake))
    monkeypatch.setattr(e, "_rotation_pins", frozenset)
    ordered = list(e.queries())
    # BOTH overdue names promote (tier 4, oldest-first), and the drip
    # still fires for the non-overdue pool — nothing stays tier 5 here
    for n in ro:
        assert ordered.index(n) < ordered.index(a), n
    assert ordered.index(ro[0]) < ordered.index(ro[2])
    assert ordered.index(ro[1]) < ordered.index(ro[2])


def test_ubiquitous_drops_are_adjudicated_in_coverage():
    """Round-9 verdict item 4: derive_pins deliberately refuses to pin
    on changed-but-ubiquitous entries (>50% of query paths) — the one
    path a semantic change could reach tier-4 names only at cap-rate.
    This gate forces the call to be CONSCIOUS: every entry surfaced in
    ``__ubiquitous_dropped__`` for the current worktree must be named
    in COVERAGE.md (the round's adjudication record: either 'benign,
    tier-4 cap-rate is fine' or 'semantic, hand-pinned')."""
    e = _entry_module()
    from mitoscape_spark.queries import QUERIES

    latest = {n: rnd for n, (rnd, _r) in e._verdict_history().items()}
    explain: dict[str, str] = {}
    pins = R.derive_pins(latest, QUERIES, explain=explain)
    if pins is None:
        pytest.skip("derivation unavailable (no git history)")
    dropped = explain.get("__ubiquitous_dropped__")
    if not dropped:
        return  # nothing ubiquitous changed — nothing to adjudicate
    root = R._repo_root()
    coverage = open(os.path.join(root, "COVERAGE.md")).read()
    # content-hashed token, not a bare substring: a LATER change to an
    # already-adjudicated entry mints a new token and re-fails the gate
    # (round-10 review finding 1 — stale adjudications must not satisfy)
    missing = [
        tok
        for d in dropped.split(", ")
        for tok in [R.adjudication_token(root, d)]
        if tok not in coverage
    ]
    assert not missing, (
        f"ubiquitous path entries changed since their consumers' last "
        f"driver verdicts but are not adjudicated in COVERAGE.md: add "
        f"an adjudication line (benign / hand-pinned) containing each "
        f"token verbatim: {missing}"
    )


def test_adjudication_token_shape_and_sentinel():
    """Tokens are ``rel::key@sha12`` over the entry's CURRENT ast dump
    (so a content change mints a new token); unknown/removed entries
    hash a deterministic sentinel instead of crashing."""
    import hashlib

    root = R._repo_root()
    tok = R.adjudication_token(root, "mitoscape_spark/catalog.py::load_table")
    name, _, digest = tok.partition("@")
    assert name == "mitoscape_spark/catalog.py::load_table"
    assert len(digest) == 12 and int(digest, 16) >= 0
    # stable across calls (pure function of worktree content)
    assert tok == R.adjudication_token(
        root, "mitoscape_spark/catalog.py::load_table"
    )
    gone = R.adjudication_token(
        root, "mitoscape_spark/catalog.py::no_such_entry"
    )
    assert gone.endswith(
        "@" + hashlib.sha256(b"<removed>").hexdigest()[:12]
    )


def test_dangling_hand_pin_fails_loudly():
    e = _entry_module()
    saved = e._ROTATION_PINS
    e._ROTATION_PINS = frozenset({"ext_definitely_not_a_query"})
    try:
        # ValueError, not AssertionError: must fail loudly under -O too
        # (round-8 advice item 3)
        with pytest.raises(ValueError, match="not in QUERIES"):
            e.queries()
    finally:
        e._ROTATION_PINS = saved


# ---------------------------------------------------------------------
# end-to-end against a SYNTHETIC git repo: boundary commits, diffs,
# per-name staleness, carry-over
# ---------------------------------------------------------------------

_MINI_OPS = """\
from pyspark.sql import functions as F

def cap(df):
    return df.limit(5)
"""

_MINI_QUERIES = """\
from mitoscape_spark.catalog import load_table

K = 3

def ext_alpha(spark, sf_dir):
    from mitoscape_spark.operators.sampling import cap_per_key
    return cap_per_key(load_table(spark, sf_dir, "documents"), "k", K)

def ext_beta(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(2)

QUERIES = {"ext_alpha": ext_alpha, "ext_beta": ext_beta}
ORACLE = {"ext_alpha": "SELECT 1 AS one", "ext_beta": "SELECT 2 AS two"}
"""


def _mini_repo(tmp_path):
    """A throwaway package mirroring the real layout, with round-1 and
    round-2 boundary commits."""
    import subprocess

    root = tmp_path / "repo"
    pkg = root / "mitoscape_spark"
    (pkg / "operators").mkdir(parents=True)
    (pkg / "queries").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "operators" / "__init__.py").write_text("")
    (pkg / "queries" / "__init__.py").write_text("")
    (pkg / "catalog.py").write_text("def load_table(s, d, n):\n    return None\n")
    (pkg / "operators" / "sampling.py").write_text(
        "def cap_per_key(df, k, n):\n    return df\n"
    )
    (pkg / "operators" / "other.py").write_text(_MINI_OPS)
    (pkg / "queries" / "extensions.py").write_text(_MINI_QUERIES)

    def git(*args):
        subprocess.run(
            ["git", "-C", str(root), *args],
            check=True,
            capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": os.environ["PATH"], "HOME": os.environ.get("HOME", "/tmp")},
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "round 1: verdict/advice/correctness/bench")
    # round 2: touch sampling.py (ext_alpha's operator), then boundary
    (pkg / "operators" / "sampling.py").write_text(
        "def cap_per_key(df, k, n):\n    return df.limit(n)\n"
    )
    git("add", "-A")
    git("commit", "-qm", "change sampling op")
    git("commit", "-q", "--allow-empty", "-m",
        "round 2: verdict/advice/correctness/bench")
    return root


class _FakeFn:
    def __init__(self, module, name):
        self.__module__ = module
        self.__name__ = name


def test_mini_repo_pin_semantics(tmp_path):
    root = str(_mini_repo(tmp_path))
    declared = {
        "ext_alpha": _FakeFn("mitoscape_spark.queries.extensions", "ext_alpha"),
        "ext_beta": _FakeFn("mitoscape_spark.queries.extensions", "ext_beta"),
    }
    R.clear_caches()
    try:
        # both last verified in round 1; sampling.py changed after ->
        # alpha pinned, beta (path untouched) not
        explain = {}
        pins = R.derive_pins(
            {"ext_alpha": 1, "ext_beta": 1}, declared, root=root,
            explain=explain,
        )
        assert pins == {"ext_alpha"}, explain
        assert "sampling.py" in explain["ext_alpha"]
        # verified in round 2 (after the change) -> fresh, no pins:
        # this is the carry-over-until-re-recorded property inverted
        assert R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2}, declared, root=root
        ) == frozenset()
        # an ORACLE edit in the worktree pins its query only
        qfile = os.path.join(root, "mitoscape_spark/queries/extensions.py")
        src = open(qfile).read()
        open(qfile, "w").write(
            src.replace("SELECT 2 AS two", "SELECT 20 AS two")
        )
        R.clear_caches()
        pins = R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2}, declared, root=root
        )
        assert pins == {"ext_beta"}
        # a formatting-only edit does NOT pin (AST-dump comparison)
        open(qfile, "w").write(
            src.replace(
                "    return load_table(spark, sf_dir, \"documents\").limit(2)",
                "    return (load_table(spark, sf_dir,\n"
                "        \"documents\")).limit(2)  # comment",
            )
        )
        R.clear_caches()
        pins = R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2}, declared, root=root
        )
        assert pins == frozenset()
    finally:
        R.clear_caches()  # drop mini-repo state from the shared caches


def test_derivation_fails_open_without_git(tmp_path):
    """No git history (tarball checkout, shallow copy) must yield None
    — the caller then falls back to hand pins + oldest-first, never a
    crash or a silently-empty pin set presented as authoritative."""
    root = tmp_path / "nogit"
    pkg = root / "mitoscape_spark" / "queries"
    pkg.mkdir(parents=True)
    (root / "mitoscape_spark" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("")
    (pkg / "extensions.py").write_text(_MINI_QUERIES)
    declared = {
        "ext_beta": _FakeFn("mitoscape_spark.queries.extensions", "ext_beta"),
    }
    R.clear_caches()
    try:
        assert R.derive_pins({"ext_beta": 1}, declared, root=str(root)) is None
    finally:
        R.clear_caches()


def test_real_history_has_boundaries():
    """The boundary-commit convention (`round N: verdict...` subjects)
    is a CONTRACT with the driver: if its commit style changes, the
    whole derivation silently degrades to fail-open. Pin it against the
    live repo history — 8 rounds have closed, so >=7 boundaries must
    parse (round-8 verdict item 5)."""
    bounds = R._boundaries(R._repo_root())
    assert bounds is not None, "boundary scan must work inside the repo"
    assert len(bounds) >= 7, (
        f"only {len(bounds)} round-boundary commits recognized — the "
        "driver's round-close commit subject convention changed? "
        "rotation.py::_boundaries must be updated to match"
    )
    rounds = [r for r, _sha in bounds]
    assert rounds == sorted(rounds)


def test_query_files_never_import_each_other():
    """Round-8 advice item 2 (historical): under file-granular
    derivation a helper defined in one _QUERY_FILES file but imported
    by a query in another was invisible to staleness detection. The
    round-9 entry-granular walker follows cross-file imports into any
    file, so the blind spot is gone — this test remains as a style
    contract: query files stay import-disjoint; shared helpers belong
    in operators/."""
    import ast as _ast

    root = R._repo_root()
    qmods = {
        rel[: -len(".py")].replace("/", ".") for rel in R._QUERY_FILES
    }
    for rel in R._QUERY_FILES:
        with open(os.path.join(root, rel)) as fh:
            tree = _ast.parse(fh.read())
        for node in _ast.walk(tree):
            targets: list[str] = []
            if isinstance(node, _ast.Import):
                targets = [a.name for a in node.names]
            elif isinstance(node, _ast.ImportFrom) and node.module:
                targets = [node.module] + [
                    f"{node.module}.{a.name}" for a in node.names
                ]
            for t in targets:
                assert t not in qmods, (
                    f"{rel} imports query file {t}: cross-query-file "
                    "helpers are invisible to rotation staleness "
                    "detection — move the helper into an operators/ "
                    "module instead"
                )


def test_ubiquitous_change_is_surfaced_not_silently_dropped(tmp_path):
    """Round-8 advice item 1: a changed module excluded as ubiquitous
    must be reported via explain['__ubiquitous_dropped__'] (and
    stderr), never silently ignored. In the mini repo catalog.py sits
    on 2/2 query paths -> ubiquitous."""
    root = _mini_repo(tmp_path)
    declared = {
        "ext_alpha": _FakeFn("mitoscape_spark.queries.extensions", "ext_alpha"),
        "ext_beta": _FakeFn("mitoscape_spark.queries.extensions", "ext_beta"),
    }
    (root / "mitoscape_spark" / "catalog.py").write_text(
        "def load_table(s, d, n):\n    return 'CHANGED'\n"
    )
    R.clear_caches()
    try:
        explain: dict[str, str] = {}
        pins = R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2},
            declared,
            root=str(root),
            explain=explain,
        )
        assert pins == frozenset()  # ubiquitous: deliberately not pinned
        assert "catalog.py" in explain.get("__ubiquitous_dropped__", "")
    finally:
        R.clear_caches()


def test_worktree_edit_busts_caches_without_clear(tmp_path):
    """Round-8 advice item 5: a long-lived process that edits files
    between derive_pins calls must see fresh pins — the memoized diff/
    index state is keyed on a worktree fingerprint, so NO clear_caches
    call happens between the two derivations here."""
    import time

    root = _mini_repo(tmp_path)
    declared = {
        "ext_alpha": _FakeFn("mitoscape_spark.queries.extensions", "ext_alpha"),
        "ext_beta": _FakeFn("mitoscape_spark.queries.extensions", "ext_beta"),
    }
    R.clear_caches()
    try:
        latest = {"ext_alpha": 2, "ext_beta": 2}
        assert R.derive_pins(latest, declared, root=str(root)) == frozenset()
        # edit beta's oracle in the worktree; mtime resolution can be
        # coarse, so nudge the clock past it
        qfile = root / "mitoscape_spark" / "queries" / "extensions.py"
        src = qfile.read_text()
        time.sleep(0.02)
        qfile.write_text(src.replace("SELECT 2 AS two", "SELECT 99 AS two"))
        os.utime(qfile, (time.time() + 2, time.time() + 2))
        pins = R.derive_pins(latest, declared, root=str(root))
        assert pins == {"ext_beta"}, "stale cache served after worktree edit"
    finally:
        R.clear_caches()


_OPS2 = """\
from mitoscape_spark.operators.sampling import cap_per_key

K1, K2 = 3, 4

def f_used(df):
    return cap_per_key(df, "k", K1)

def f_unused(df):
    return df.limit(K2)
"""

_QUERIES2 = """\
from mitoscape_spark.catalog import load_table

def ext_alpha(spark, sf_dir):
    from mitoscape_spark.operators.ops2 import f_used
    return f_used(load_table(spark, sf_dir, "documents"))

def ext_beta(spark, sf_dir):
    import mitoscape_spark.operators.other as O
    return O.cap(load_table(spark, sf_dir, "documents"))

QUERIES = {"ext_alpha": ext_alpha, "ext_beta": ext_beta}
ORACLE = {"ext_alpha": "SELECT 1 AS one", "ext_beta": "SELECT 2 AS two"}
"""


def _mini_repo2(tmp_path):
    """Mini repo exercising ENTRY-granular attribution: ext_alpha
    consumes ops2.f_used (fine-grained), ext_beta consumes
    operators.other as a whole-module alias (coarse fallback)."""
    import subprocess

    root = tmp_path / "repo2"
    pkg = root / "mitoscape_spark"
    (pkg / "operators").mkdir(parents=True)
    (pkg / "queries").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "operators" / "__init__.py").write_text("")
    (pkg / "queries" / "__init__.py").write_text("")
    (pkg / "catalog.py").write_text("def load_table(s, d, n):\n    return None\n")
    (pkg / "operators" / "sampling.py").write_text(
        "def cap_per_key(df, k, n):\n    return df\n"
    )
    (pkg / "operators" / "other.py").write_text(_MINI_OPS)
    (pkg / "operators" / "ops2.py").write_text(_OPS2)
    (pkg / "queries" / "extensions.py").write_text(_QUERIES2)

    def git(*args):
        subprocess.run(
            ["git", "-C", str(root), *args],
            check=True,
            capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": os.environ["PATH"], "HOME": os.environ.get("HOME", "/tmp")},
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "round 1: verdict/advice/correctness/bench")
    return root


def _derive2(root):
    declared = {
        "ext_alpha": _FakeFn("mitoscape_spark.queries.extensions", "ext_alpha"),
        "ext_beta": _FakeFn("mitoscape_spark.queries.extensions", "ext_beta"),
    }
    R.clear_caches()
    explain = {}
    pins = R.derive_pins(
        {"ext_alpha": 1, "ext_beta": 1}, declared, root=str(root),
        explain=explain,
    )
    return pins, explain


def test_entry_granular_function_change_pins_only_consumers(tmp_path):
    """A change to ops2.f_unused pins NOBODY (no consumer); a change
    to f_used pins only ext_alpha — not every importer of the file
    (round-9 entry granularity: the file-level version re-pinned ~60
    names per touched operator module)."""
    root = _mini_repo2(tmp_path)
    ops2 = root / "mitoscape_spark" / "operators" / "ops2.py"
    try:
        # untouched repo: no pins
        pins, _ = _derive2(root)
        assert pins == frozenset()
        # change the UNUSED function only
        ops2.write_text(_OPS2.replace("df.limit(K2)", "df.limit(99)"))
        pins, explain = _derive2(root)
        assert pins == frozenset(), explain
        # change the USED function
        ops2.write_text(_OPS2.replace('cap_per_key(df, "k", K1)',
                                      'cap_per_key(df, "kk", K1)'))
        pins, explain = _derive2(root)
        assert pins == {"ext_alpha"}, explain
        assert "f_used" in explain["ext_alpha"]
    finally:
        R.clear_caches()


def test_entry_granular_unpacked_constant_pins_consumer(tmp_path):
    """K1, K2 = 3, 4 binds TWO entries; changing the tuple pins
    ext_alpha (f_used refs K1). Previously tuple-unpack assigns were
    invisible to staleness detection."""
    root = _mini_repo2(tmp_path)
    ops2 = root / "mitoscape_spark" / "operators" / "ops2.py"
    try:
        ops2.write_text(_OPS2.replace("K1, K2 = 3, 4", "K1, K2 = 5, 4"))
        pins, explain = _derive2(root)
        assert pins == {"ext_alpha"}, explain
        assert "K1" in explain["ext_alpha"] or "K2" in explain["ext_alpha"]
    finally:
        R.clear_caches()


def test_entry_granular_toplevel_statement_pins_consumers(tmp_path):
    """A module-level executable statement (registration call, guard)
    changing pins every consumer of the module via ::toplevel."""
    root = _mini_repo2(tmp_path)
    ops2 = root / "mitoscape_spark" / "operators" / "ops2.py"
    try:
        ops2.write_text(_OPS2 + "\nif True:\n    _x = f_used\n")
        pins, explain = _derive2(root)
        assert pins == {"ext_alpha"}, explain
        assert "toplevel" in explain["ext_alpha"]
    finally:
        R.clear_caches()


def test_entry_granular_binding_redirect_pins_consumer(tmp_path):
    """Same entry body, import line re-pointed to another module:
    the binding-redirect check pins the consumer even though no AST
    dump on its path changed."""
    root = _mini_repo2(tmp_path)
    ops2 = root / "mitoscape_spark" / "operators" / "ops2.py"
    (root / "mitoscape_spark" / "operators" / "sampling2.py").write_text(
        "def cap_per_key(df, k, n):\n    return df.limit(1)\n"
    )
    try:
        ops2.write_text(
            _OPS2.replace(
                "from mitoscape_spark.operators.sampling import cap_per_key",
                "from mitoscape_spark.operators.sampling2 import cap_per_key",
            )
        )
        pins, explain = _derive2(root)
        assert pins == {"ext_alpha"}, explain
        assert "import bindings" in explain["ext_alpha"] or "binding" in str(
            explain
        )
    finally:
        R.clear_caches()


def test_relative_imports_resolve_and_pin(tmp_path):
    """`from .sampling import cap_per_key` must create the same
    staleness edge as the absolute form — relative imports were
    invisible to the derivation (round-9 review finding 1)."""
    root = _mini_repo2(tmp_path)
    ops2 = root / "mitoscape_spark" / "operators" / "ops2.py"
    sampling = root / "mitoscape_spark" / "operators" / "sampling.py"
    import subprocess

    ops2.write_text(
        _OPS2.replace(
            "from mitoscape_spark.operators.sampling import cap_per_key",
            "from .sampling import cap_per_key",
        )
    )
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "PATH": os.environ["PATH"], "HOME": os.environ.get("HOME", "/tmp")}
    subprocess.run(["git", "-C", str(root), "commit", "-aqm", "relative"],
                   check=True, capture_output=True, env=env)
    subprocess.run(
        ["git", "-C", str(root), "commit", "-q", "--allow-empty", "-m",
         "round 2: verdict/advice/correctness/bench"],
        check=True, capture_output=True, env=env)
    try:
        declared = {
            "ext_alpha": _FakeFn(
                "mitoscape_spark.queries.extensions", "ext_alpha"),
            "ext_beta": _FakeFn(
                "mitoscape_spark.queries.extensions", "ext_beta"),
        }
        R.clear_caches()
        assert R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2}, declared, root=str(root)
        ) == frozenset()
        # change the relatively-imported operator: alpha must pin
        sampling.write_text("def cap_per_key(df, k, n):\n    return df.limit(n)\n")
        R.clear_caches()
        explain = {}
        pins = R.derive_pins(
            {"ext_alpha": 2, "ext_beta": 2}, declared, root=str(root),
            explain=explain,
        )
        assert pins == {"ext_alpha"}, explain
        assert "cap_per_key" in explain["ext_alpha"]
    finally:
        R.clear_caches()


def test_unresolvable_relative_import_fails_open():
    """Parsing a relative import WITHOUT knowing the containing module
    must surface _UNRESOLVED (never a silent drop), and a path that
    touches it makes the walker fail open."""
    src = "from .catalog import load_table\n\ndef q(df):\n    return load_table(df)\n"
    entries, imap = R._parse_entries(src, _known())  # no pkg_parts
    assert imap["load_table"] == (R._UNRESOLVED, None)
    # with pkg_parts it resolves to the absolute module
    entries2, imap2 = R._parse_entries(
        src, _known(), pkg_parts=("mitoscape_spark",)
    )
    assert imap2["load_table"] == ("mitoscape_spark.catalog", "load_table")


def test_whole_module_alias_falls_back_to_file_granularity(tmp_path):
    """ext_beta uses `import operators.other as O` — any content
    change in other.py must pin it (coarse fallback is an
    OVER-approximation, never an under-approximation)."""
    root = _mini_repo2(tmp_path)
    other = root / "mitoscape_spark" / "operators" / "other.py"
    try:
        other.write_text(_MINI_OPS.replace("df.limit(5)", "df.limit(6)"))
        pins, explain = _derive2(root)
        assert "ext_beta" in pins, explain
        assert "ext_alpha" not in pins
    finally:
        R.clear_caches()


def test_warm_derivation_is_fully_cached():
    """A second derive_pins over an unchanged worktree must be served
    entirely from the parse caches — cache thrash here cost 1.7 s per
    driver queries() call until the lru was sized to the real working
    set (package files x boundary SHAs)."""
    e = _entry_module()
    from mitoscape_spark.queries import QUERIES

    latest = {n: rnd for n, (rnd, _r) in e._verdict_history().items()}
    R.clear_caches()
    try:
        assert R.derive_pins(latest, QUERIES) is not None
        before = R._entries_at.cache_info()
        assert R.derive_pins(latest, QUERIES) is not None
        after = R._entries_at.cache_info()
        assert after.misses == before.misses, (
            f"warm derivation re-parsed {after.misses - before.misses} "
            "files — lru maxsize below the working set again?"
        )
    finally:
        R.clear_caches()


def test_mod_closure_matches_bfs_reachability():
    """_mod_closure's fixpoint must equal BFS reachability (reflexive)
    on arbitrary digraphs, including cycles — property-tested with
    seeded random graphs (pure Python, no Spark)."""
    import random

    rng = random.Random(42)
    for trial in range(25):
        n = rng.randint(1, 12)
        nodes = [f"m{i}" for i in range(n)]
        imports = {
            u: frozenset(
                v for v in nodes if v != u and rng.random() < 0.25
            )
            for u in nodes
        }
        clo = R._mod_closure(imports)
        for u in nodes:
            # BFS reference
            seen = {u}
            frontier = [u]
            while frontier:
                x = frontier.pop()
                for y in imports[x]:
                    if y not in seen:
                        seen.add(y)
                        frontier.append(y)
            assert clo[u] == frozenset(seen), (trial, u, imports)
